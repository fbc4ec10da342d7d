"""Sinks: the reference's output contract, plus general writers.

The reference's only sink is Hadoop ``TextOutputFormat`` — ``key\\tvalue``
text lines — written by both jobs (``BookQuery.java:234-240,251-255``);
Job 2's key is the packed pair string ``"doc - query"``
(``BookQuery.java:167``). Queries in this engine return DataFrames and
leave persistence to the caller (SURVEY §2.2 S7); these helpers cover the
byte-level parity case and the common columnar case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_output_format(
    scores: DataFrame, query_id: str = "query"
) -> DataFrame:
    """``(pair, score)`` rows matching the reference's Job-2 output: pair
    is ``"<doc_id> - <query_id>"`` (``BookQuery.java:167``). The score
    stays a typed double — the tab-joined text rendering happens in
    :func:`write_reference_output`, where Spark's double→string cast uses
    Java ``Double.toString`` exactly like the reference's ``Text`` output.
    """
    return scores.select(
        F.concat_ws(
            " - ", F.col("doc_id").cast("string"), F.col("query_id")
        ).alias("pair"),
        F.col("score"),
    )


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: tab-separated text files, one line per row, no header — the
    ``TextOutputFormat`` wire format."""
    df.select(
        [F.col(c).cast("string").alias(c) for c in df.columns]
    ).write.option("sep", "\t").option("header", "false").mode(mode).csv(path)


def write_reference_output(
    scores: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """End-to-end parity sink: ``doc - query\\tscore`` text lines, the
    reference's final on-disk artifact."""
    write_tsv(reference_output_format(scores), path, mode=mode)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """The production sink: columnar, splittable, predicate-pushdown-able.
    ``partition_by`` is the 100 TB lever — e.g. partition embeddings by
    LSH bucket so similarity search prunes to one partition."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    """Interchange sink: splittable plain CSV (one file per partition)."""
    df.write.option("header", str(header).lower()).mode(mode).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the lingua franca for downstream non-JVM
    consumers; one object per line keeps the output splittable."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (zlib-compressed by default) — same columnar guarantees
    as :func:`write_parquet` (splittable files, min/max stripe stats for
    reader-side skipping) for Hive-era consumers."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_range_partitioned(
    df: DataFrame,
    path: str,
    key: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Layout sink for scan pruning: range-repartition on ``key`` and sort
    within each partition before writing parquet.

    The output files cover disjoint key ranges and every row group's
    min/max stats are tight, so any reader (Spark, DuckDB, Trino — the
    stats are in the format) skips whole files/row groups on a range or
    point predicate over ``key``. At 100 TB this is the cheapest pruning
    there is: it costs one sort at write time and nothing at read time.
    (``write_bucketed`` in operators/skew.py is the hash analog for equi
    joins; this is the ordered analog for ranges and time.)
    """
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode(mode)
        .parquet(path)
    )


def zvalue(cols: list, bits: int = 16, out: str = "zvalue",
           nulls: int | None = None):
    """Morton (Z-order) key: bit-interleave of N integer columns.

    ``write_range_partitioned`` prunes on ONE key; a query filtering two
    or more dimensions at once (user AND time, lat AND lon) gets nothing
    from a single-column sort — the second dimension is uniformly
    smeared across every file. Interleaving the dimensions' bits maps
    multi-dimensional proximity onto one sortable integer, so a range
    layout on the z-key gives every dimension *partial* pruning power
    (each file covers a compact hyper-rectangle-ish region of the
    combined space). This is the layout behind Delta/Iceberg
    ``OPTIMIZE ZORDER BY``.

    Pure integer arithmetic — ``((x >> i) & 1) << (i*n + c)`` summed over
    ``bits`` bit positions and N columns — so the key is deterministic,
    engine-independent, and SQL-replayable (the oracle runs the same
    formula; value-pinned in the registry). Inputs are clamped to
    ``[0, 2**bits)``: callers map raw domains to that range first
    (modulo for ids, bucketed minutes for time, quantile ranks for
    skewed doubles — rank-mapping is the production normalizer, computed
    once per layout build). With ``bits * len(cols) <= 63`` the key fits
    a BIGINT; the whole expression is codegen'd JVM integer math, no UDF.

    **NULL placement** (ADVICE r9): by default a NULL input clamps to
    the MAXIMUM bucket ``2**bits - 1`` — Spark's ``least``/``greatest``
    skip NULLs, so ``greatest(0, least(NULL, hi))`` yields ``hi``, and
    DuckDB's variadic forms agree, keeping the two engines' keys
    identical. That parks all NULL-keyed rows in the far corner of the
    Morton space, which is actually a reasonable layout (they cluster
    in the last files and a box predicate on real values skips them)
    but is surprising if unstated. Pass ``nulls=<bucket>`` to coalesce
    NULLs to a chosen bucket deliberately (e.g. ``0``), mirrored in
    :func:`zvalue_oracle_sql` so the oracle replays the same choice.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zvalue needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds BIGINT capacity")
    hi = (1 << bits) - 1
    if nulls is not None and not (0 <= nulls <= hi):
        raise ValueError(f"nulls bucket {nulls} outside [0, {hi}]")
    z = F.lit(0).cast("long")
    for c_idx, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        col = col.cast("long")
        if nulls is not None:
            col = F.coalesce(col, F.lit(nulls).cast("long"))
        x = F.greatest(F.lit(0).cast("long"), F.least(col, F.lit(hi)))
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + c_idx
            )
    return z.alias(out)


def zvalue_oracle_sql(cols: list[str], bits: int = 16,
                      nulls: int | None = None) -> str:
    """The DuckDB-side rendering of :func:`zvalue`'s exact formula —
    kept next to the Spark expression so the two can never drift apart
    (including the NULL->max-bucket default and the ``nulls`` override).
    Returns a scalar SQL expression over the same column names."""
    n = len(cols)
    hi = (1 << bits) - 1
    terms = []
    for c_idx, c in enumerate(cols):
        src = (
            f"coalesce(CAST({c} AS BIGINT), {nulls})"
            if nulls is not None
            else f"CAST({c} AS BIGINT)"
        )
        x = f"greatest(0, least({src}, {hi}))"
        for i in range(bits):
            terms.append(f"((({x} >> {i}) & 1) << {i * n + c_idx})")
    return "(" + " + ".join(terms) + ")"


def quantile_rank(df: DataFrame, col: str, bits: int = 8,
                  relative_error: float = 1e-3):
    """Map a skewed or continuous column onto ``[0, 2**bits)`` by
    quantile rank — the production normalizer for :func:`zvalue` dims
    whose raw domain is not already small non-negative integers.

    Interleaving raw skewed values wastes the Morton key's bits (a
    heavy-tailed column packs most rows into a few leading-bit
    prefixes, so its files stop being selective); rank-mapping gives
    every bucket ~equal row mass, which is what makes each z-range file
    cover ~equal data. Boundaries come from ONE ``approxQuantile`` pass
    (Greenwald-Khanna sketch, driver state O(2^bits) doubles — the same
    train-once-at-build-time shape as the IVF codebooks) and the per-row
    mapping is a JVM higher-order ``filter`` over the literal boundary
    array: O(2^bits) comparisons per row, paid once at layout-build
    time, embarrassingly parallel, no UDF. Monotonic in the raw value,
    so parquet min/max footer stats on the RAW column stay usable by
    readers that filter on it directly.
    """
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.approxQuantile(col, probs, relative_error)
    # strictly increasing boundary list (ties collapse; fewer distinct
    # boundaries simply means fewer occupied buckets — harmless)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    arr = F.array(*[F.lit(float(b)) for b in uniq])
    x = F.col(col).cast("double")
    return F.size(F.filter(arr, lambda b: b <= x)).cast("long")


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list,
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional layout sink: Z-order the rows on ``cols`` and
    write range-partitioned parquet.

    ``cols`` are column names or Column expressions — pass
    :func:`quantile_rank` outputs for skewed/continuous dimensions
    (with a matching ``bits``) so every Morton bucket carries ~equal
    row mass.

    One range exchange + one in-partition sort on the Morton key —
    exactly :func:`write_range_partitioned`'s cost — but every file's
    parquet min/max stats are now tight in EVERY z-ordered dimension, so
    a reader's box predicate (``a BETWEEN .. AND b BETWEEN ..``) skips
    files/row groups it could not skip under any single-column sort.
    The z column is computed for the shuffle and dropped before the
    write: the layout leaves no schema footprint. Pruning win is
    pinned by a footer-stats test on a grid fixture
    (tests/test_zorder.py)."""
    zc = "_zorder_key"
    (
        df.select("*", zvalue(cols, bits=bits, out=zc))
        .repartitionByRange(n_files, zc)
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.mode(mode)
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Training-shard export: the pipeline's last mile. A curated corpus ships
# as N deterministic shards plus a content manifest, so a training job can
# (a) assign shards to data-loader workers without coordination, (b) verify
# nothing was lost or corrupted between curation and training, and (c)
# reproduce the exact byte split from the id column alone.
# ---------------------------------------------------------------------------

MANIFEST_NAME = "_training_manifest.json"


def _shard_col(id_col: str, n_shards: int):
    """Deterministic shard in [0, n_shards) — md5 hash-of-id, the same
    engine-independent machinery as the split/samplers in
    :mod:`operators.sampling` (NOT ``df.sample``/partition RNGs: a
    document's shard must be a pure function of its identity so backfills
    and re-exports land it in the same shard). NULL ids fail loudly — a
    silent null shard would write a Hive default partition and break the
    manifest's completeness contract."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.sampling import (
        hash_bucket,
    )

    c = F.col(id_col)
    return F.when(
        c.isNull(),
        F.raise_error(
            F.lit(f"write_training_shards: NULL {id_col}; shards require ids")
        ).cast("long"),
    ).otherwise(hash_bucket(c, n_shards))


def shard_manifest(df: DataFrame, shard_col: str = "shard") -> DataFrame:
    """(shard, n_rows, content_hash) per shard — the verification digest.

    ``content_hash`` is the exact decimal SUM of per-row
    ``xxhash64(to_json(struct(<columns sorted by name>)))``: insensitive
    to row order and partitioning (sum commutes), sensitive to any value
    change, duplicate, or loss (unlike XOR, duplicated rows do not
    cancel), and overflow-free (decimal(38,0) accumulator). One
    partial-aggregated exchange on the shard key."""
    cols = sorted(c for c in df.columns if c != shard_col)
    h = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in cols])))
    return df.groupBy(F.col(shard_col).cast("long").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h.cast("decimal(38,0)")).cast("string").alias("content_hash"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> dict:
    """Export ``df`` as ``n_shards`` deterministic parquet shards under
    ``path`` (``shard=K/`` directories, ONE file per shard) and write a
    content manifest (row count + order-insensitive content hash per
    shard, empty shards included) the reader verifies against.

    Layout: assign ``shard = md5-bucket(id)``, repartition ON the shard
    column (each shard's rows land wholly in one task, so each directory
    holds exactly one file — no small-file spray), write partitioned by
    shard. One exchange total; the manifest aggregation is O(n_shards)
    driver state, like a codebook. The manifest file is written
    driver-side — the contract expects a driver-visible filesystem (local
    or fuse-mounted; a pure-HDFS deployment would swap in the Hadoop FS
    API at this single seam).

    Returns the manifest dict; :func:`read_training_shards` re-derives it
    from the stored bytes and refuses to serve a corpus that drifted.
    """
    import json
    import os

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if id_col not in df.columns:
        raise ValueError(f"id column {id_col!r} not in {df.columns}")
    sharded = df.withColumn("shard", _shard_col(id_col, n_shards))
    (
        sharded.repartition(n_shards, "shard")
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )
    stats = {
        int(r["shard"]): (int(r["n_rows"]), r["content_hash"])
        for r in shard_manifest(sharded).collect()
    }
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "columns": sorted(c for c in df.columns),
        "total_rows": sum(n for n, _ in stats.values()),
        "shards": {
            str(k): {
                "n_rows": stats.get(k, (0, None))[0],
                "content_hash": stats.get(k, (0, None))[1],
            }
            for k in range(n_shards)
        },
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_training_shards(spark, path: str, verify: bool = True) -> DataFrame:
    """Read a shard export back; with ``verify`` (default), recompute the
    per-shard row counts and content hashes from the stored bytes and
    raise ``ValueError`` naming every drifted shard — a partial write,
    manual deletion, or bit rot is refused at load time, not discovered
    mid-training. Verification is one aggregation over the export (scan
    speed); pass ``verify=False`` to skip it on a hot path that trusts
    the store."""
    import json
    import os

    df = spark.read.parquet(path)
    if not verify:
        return df
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    got = {
        int(r["shard"]): (int(r["n_rows"]), r["content_hash"])
        for r in shard_manifest(df).collect()
    }
    bad = []
    for k_str, want in manifest["shards"].items():
        k = int(k_str)
        g_rows, g_hash = got.get(k, (0, None))
        if g_rows != want["n_rows"] or g_hash != want["content_hash"]:
            bad.append(
                f"shard {k}: rows {g_rows} vs {want['n_rows']}, "
                f"hash {g_hash} vs {want['content_hash']}"
            )
    extra = sorted(set(got) - {int(k) for k in manifest["shards"]})
    if extra:
        bad.append(f"unmanifested shards present: {extra}")
    if bad:
        raise ValueError(
            "training shard verification failed:\n  " + "\n  ".join(bad)
        )
    return df
