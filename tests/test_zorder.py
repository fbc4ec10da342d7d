"""Z-order layout (sources/sinks.py: zvalue / write_zorder).

Pins three things:
- the Morton interleave itself against a pure-Python bit model (and the
  DuckDB oracle rendering against the same model — the two SQL texts can
  never drift apart without this failing);
- clamping and capacity guards;
- the actual pruning payoff: on a 128x128 grid, a y-only box predicate
  touches ~4/16 files under the z-order layout (y's high bits select
  file groups) but ALL files under a single-column x sort (y is smeared
  uniformly) — read straight from the parquet footer min/max stats any
  engine prunes with.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import (
    write_range_partitioned,
    write_zorder,
    zvalue,
    zvalue_oracle_sql,
)


def _morton(values: list[int], bits: int) -> int:
    hi = (1 << bits) - 1
    vals = [min(max(v, 0), hi) for v in values]
    z = 0
    n = len(vals)
    for c, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * n + c)
    return z


@pytest.mark.parametrize(
    "xy",
    [(0, 0), (1, 0), (0, 1), (127, 127), (5, 99), (-3, 200), (4096, 7)],
)
def test_zvalue_matches_python_model(spark, xy):
    x, y = xy
    df = spark.createDataFrame([(x, y)], "x long, y long")
    got = df.select(zvalue(["x", "y"], bits=7, out="z")).collect()[0]["z"]
    assert got == _morton([x, y], 7)


def test_zvalue_oracle_sql_matches_python_model():
    duckdb = pytest.importorskip("duckdb")
    expr = zvalue_oracle_sql(["x", "y"], bits=7)
    rows = duckdb.sql(
        "SELECT x, y, " + expr + " AS z FROM (VALUES (0,0),(5,99),(127,127),"
        "(-3, 200),(4096, 7)) t(x, y)"
    ).fetchall()
    for x, y, z in rows:
        assert z == _morton([x, y], 7), (x, y)


def test_zvalue_guards():
    with pytest.raises(ValueError):
        zvalue([], bits=8)
    with pytest.raises(ValueError):
        zvalue(["a", "b", "c", "d"], bits=16)  # 64 > 63


def _files_intersecting(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(#files whose footer min/max on col intersects [lo, hi], #files)
    — the same stats any parquet reader prunes with."""
    pq = pytest.importorskip("pyarrow.parquet")
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert files
    touch = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin = min(
            md.row_group(i).column(
                next(
                    j
                    for j in range(md.num_columns)
                    if md.schema.column(j).name == col
                )
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(i).column(
                next(
                    j
                    for j in range(md.num_columns)
                    if md.schema.column(j).name == col
                )
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        if fmin <= hi and fmax >= lo:
            touch += 1
    return touch, len(files)


def test_write_zorder_prunes_second_dimension(spark):
    grid = spark.range(128 * 128).select(
        F.col("id"),
        (F.col("id") % 128).alias("x"),
        (F.col("id") / 128).cast("long").alias("y"),
    )
    with tempfile.TemporaryDirectory(prefix="zorder-") as d:
        zpath = os.path.join(d, "z")
        lpath = os.path.join(d, "linear")
        write_zorder(grid, zpath, ["x", "y"], n_files=16, bits=7)
        write_range_partitioned(grid, lpath, "x", n_files=16)

        # layout leaves no schema footprint
        zdf = spark.read.parquet(zpath)
        assert sorted(zdf.columns) == ["id", "x", "y"]

        # y-only box: the second dimension. Single-column x sort smears y
        # over every file; the z layout confines y<32 to the file groups
        # whose high z bits carry y6=y5=0 (~4/16, range-sampling slack).
        ztouch, ztotal = _files_intersecting(zpath, "y", 0, 31)
        ltouch, ltotal = _files_intersecting(lpath, "y", 0, 31)
        assert ltouch == ltotal  # the single-column sort prunes nothing
        assert ztouch <= ztotal // 2, (ztouch, ztotal)

        # and x keeps pruning power under z too (x<32 box)
        zx, _ = _files_intersecting(zpath, "x", 0, 31)
        assert zx <= ztotal // 2, zx

        # correctness: the layout changes nothing about the rows
        got = sorted(
            tuple(r) for r in zdf.filter("y < 32").select("id", "x", "y").collect()
        )
        want = sorted(
            tuple(r) for r in grid.filter("y < 32").select("id", "x", "y").collect()
        )
        assert got == want


def test_quantile_rank_balances_skewed_column(spark):
    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import quantile_rank

    # heavy-tailed: v = id^3 — raw-value interleaving would pack ~90% of
    # rows into the lowest leading-bit prefix
    df = spark.range(4096).select(
        F.col("id"), (F.col("id") * F.col("id") * F.col("id")).alias("v")
    )
    r = quantile_rank(df, "v", bits=4)
    counts = (
        df.select(r.alias("bucket"))
        .groupBy("bucket")
        .count()
        .collect()
    )
    by_bucket = {row["bucket"]: row["count"] for row in counts}
    # every bucket in range, occupied, and roughly balanced (16 buckets
    # of 4096 rows -> ideal 256; GK sketch slack bounded well under 2x)
    assert set(by_bucket) <= set(range(16))
    assert len(by_bucket) == 16
    assert max(by_bucket.values()) < 2 * min(by_bucket.values())

    # monotonic in the raw value: bucket of a larger v never decreases
    rows = df.select("v", r.alias("bucket")).orderBy("v").collect()
    buckets = [row["bucket"] for row in rows]
    assert buckets == sorted(buckets)


def test_write_zorder_accepts_rank_expressions(spark):
    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import quantile_rank

    grid = spark.range(1024).select(
        F.col("id"),
        (F.col("id") % 32).alias("x"),
        ((F.col("id") / 32).cast("long") ** F.lit(3)).cast("double").alias("v"),
    )
    with tempfile.TemporaryDirectory(prefix="zorder-rank-") as d:
        p = os.path.join(d, "z")
        write_zorder(
            grid, p, ["x", quantile_rank(grid, "v", bits=5)], n_files=4, bits=5
        )
        back = spark.read.parquet(p)
        assert sorted(back.columns) == ["id", "v", "x"]
        assert back.count() == 1024


def test_zvalue_hypothesis_random_dims(spark):
    """Property: for random column counts, bit widths, and values
    (in-range, negative, overflowing), the Spark expression equals the
    pure-Python interleave — one batched frame, not one job per case."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import strategies as st

    rng = hypothesis.strategies  # noqa: F841  (import check)
    cases = []
    draw = st.tuples(
        st.integers(min_value=1, max_value=3),        # n cols
        st.integers(min_value=1, max_value=12),       # bits
        st.lists(st.integers(min_value=-10, max_value=1 << 14),
                 min_size=3, max_size=3),
    )
    @hypothesis.given(draw)
    @hypothesis.settings(max_examples=60, deadline=None)
    def _collect(case):
        cases.append(case)
    _collect()

    # group by (n, bits) so each shape is one Spark job
    from collections import defaultdict
    by_shape = defaultdict(list)
    for n, bits, vals in cases:
        by_shape[(n, bits)].append(vals[:n])
    for (n, bits), rows in by_shape.items():
        cols = [f"c{i}" for i in range(n)]
        df = spark.createDataFrame(
            [tuple(r) for r in rows], ", ".join(f"{c} long" for c in cols)
        )
        got = [r["z"] for r in df.select(zvalue(cols, bits=bits, out="z")).collect()]
        want = [_morton(r, bits) for r in rows]
        assert got == want, (n, bits)


def test_zvalue_null_placement_documented_and_dialable(spark):
    """ADVICE r9: NULL inputs clamp to the max bucket by default (both
    engines' least/greatest skip NULLs identically); nulls=<bucket>
    coalesces them to a chosen bucket, mirrored in the oracle SQL."""
    import duckdb

    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import (
        zvalue,
        zvalue_oracle_sql,
    )

    df = spark.createDataFrame(
        [(None, 2), (3, None), (1, 2)], "x int, y int"
    )
    bits = 4
    hi = (1 << bits) - 1
    got = [r.z for r in df.select(
        zvalue(["x", "y"], bits=bits, out="z")).collect()]
    # default: NULL -> max bucket
    def ref(x, y):
        z = 0
        for i in range(bits):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        return z
    assert got == [ref(hi, 2), ref(3, hi), ref(1, 2)]

    got0 = [r.z for r in df.select(
        zvalue(["x", "y"], bits=bits, out="z", nulls=0)).collect()]
    assert got0 == [ref(0, 2), ref(3, 0), ref(1, 2)]

    # oracle twin agrees under both settings
    con = duckdb.connect()
    con.sql("CREATE TABLE t (x INT, y INT)")
    con.sql("INSERT INTO t VALUES (NULL, 2), (3, NULL), (1, 2)")
    for nulls, want in ((None, got), (0, got0)):
        expr = zvalue_oracle_sql(["x", "y"], bits=bits, nulls=nulls)
        assert [r[0] for r in con.sql(f"SELECT {expr} FROM t").fetchall()] == want

    import pytest
    with pytest.raises(ValueError, match="nulls bucket"):
        zvalue(["x"], bits=4, nulls=99)
