"""Sinks: reference text-output parity and the general writers."""

from __future__ import annotations

import glob

from similarity_search_with_hadoop_mapreduce_spark.operators.similarity import (
    similarity_to_query,
)
from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import (
    reference_output_format,
    write_parquet,
    write_reference_output,
)
from tests.reference_sim import mr_similarity
from tests.test_parity import TOY, _corpus_df


def _read_lines(path: str) -> list[str]:
    lines = []
    for f in glob.glob(f"{path}/part-*"):
        with open(f) as fh:
            lines.extend(line.rstrip("\n") for line in fh)
    return lines


def test_reference_output_lines(spark, tmp_path):
    scores = similarity_to_query(_corpus_df(spark, TOY), "q")
    out = str(tmp_path / "out")
    write_reference_output(scores, out)
    got = sorted(_read_lines(out))
    # exact reference line format: "<doc> - <query>\t<java double repr>"
    want = sorted(
        f"{doc} - q\t{score!r}" for doc, score in mr_similarity(TOY, "q").items()
    )
    assert got == want


def test_reference_output_format_columns(spark):
    rows = reference_output_format(
        similarity_to_query(_corpus_df(spark, TOY), "q")
    ).collect()
    assert {r.pair for r in rows} == {
        f"{d} - q" for d in mr_similarity(TOY, "q")
    }


def test_write_parquet_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)], "id long, k string, v double"
    )
    out = str(tmp_path / "pq")
    write_parquet(df, out, partition_by=["k"])
    back = spark.read.parquet(out)
    assert sorted((r.id, r.k, r.v) for r in back.collect()) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
        (3, "a", 3.0),
    ]
    # partition pruning is real: directory-per-key layout
    assert glob.glob(f"{out}/k=a/*.parquet")


def test_csv_round_trip_preserves_table(spark, tmp_path):
    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import write_csv
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        load_table,
        read_csv,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    out = str(tmp_path / "orders_csv")
    write_csv(orders, out)
    back = read_csv(spark, out, orders.schema)
    assert back.schema == orders.schema
    want = sorted(map(tuple, orders.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_json_round_trip_preserves_table(spark, tmp_path):
    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import write_json
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        load_table,
        read_json,
    )

    cust = load_table(spark, "/root/testdata/sf0.001", "customer")
    out = str(tmp_path / "customer_json")
    write_json(cust, out)
    back = read_json(spark, out, cust.schema)
    assert back.schema == cust.schema
    want = sorted(map(tuple, cust.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_read_csv_never_infers(spark, tmp_path):
    """A wrong explicit schema is honored (no silent inference override):
    reading an int column as string yields strings."""
    from pyspark.sql import types as T

    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import write_csv
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        load_table,
        read_csv,
    )

    region = load_table(spark, "/root/testdata/sf0.001", "region")
    out = str(tmp_path / "region_csv")
    write_csv(region, out)
    as_strings = T.StructType(
        [T.StructField(f.name, T.StringType()) for f in region.schema.fields]
    )
    back = read_csv(spark, out, as_strings)
    assert all(f.dataType == T.StringType() for f in back.schema.fields)
    assert back.count() == region.count()


def test_range_partitioned_files_are_key_disjoint(spark, tmp_path):
    """Every output file covers a disjoint o_orderkey range (tight parquet
    min/max stats => readers skip files on range predicates)."""
    import glob

    import pyarrow.parquet as pq

    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import (
        write_range_partitioned,
    )
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    out = str(tmp_path / "orders_ranged")
    write_range_partitioned(orders, out, "o_orderkey", n_files=4)

    spans = []
    idx = None
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        if idx is None:
            idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "o_orderkey"
            )
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        spans.append((min(los), max(his)))
    assert len(spans) >= 3  # range partitioner actually split
    spans.sort()
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2, f"overlapping file ranges {hi1} >= {lo2}"
    # round trip: nothing lost
    back = spark.read.parquet(out)
    assert back.count() == orders.count()


def test_orc_round_trip_preserves_table(spark, tmp_path):
    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import write_orc
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        load_table,
        read_orc,
    )

    customer = load_table(spark, "/root/testdata/sf0.001", "customer")
    out = str(tmp_path / "customer_orc")
    write_orc(customer, out, partition_by=["c_mktsegment"])
    assert glob.glob(f"{out}/c_mktsegment=*/*.orc")
    back = read_orc(spark, out).select(*customer.columns)  # partition col moves last
    assert {f.name: f.dataType for f in back.schema.fields} == {
        f.name: f.dataType for f in customer.schema.fields
    }
    want = sorted(map(tuple, customer.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_orc_scan_pushes_down_predicates(spark, tmp_path):
    """The ORC reader must expose pushed filters + partition pruning in the
    plan, same as parquet — otherwise it is not a scale-grade source."""
    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import write_orc
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        load_table,
        read_orc,
    )
    from pyspark.sql import functions as F

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(orders, out, partition_by=["o_orderpriority"])
    scan = (
        read_orc(spark, out)
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 1000.0))
        .select("o_orderkey")
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,1000.0)" in plan
    # partition filter never reaches the data filter list — pruned at listing
    assert "o_orderpriority" not in plan.split("PushedFilters")[1].split("]")[0]


def test_training_shards_deterministic_complete_one_file(spark, tmp_path):
    """Export → exactly one parquet file per shard dir, union of shards ==
    input, and a re-export produces the identical manifest (shard
    assignment is a pure function of the id)."""
    import glob

    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import (
        read_training_shards,
        write_training_shards,
    )
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "shards")
    m1 = write_training_shards(docs, out, n_shards=8)
    assert m1["total_rows"] == docs.count()
    for k in range(8):
        files = glob.glob(f"{out}/shard={k}/*.parquet")
        assert len(files) <= 1, (k, files)  # one file, or empty shard
        assert (len(files) == 1) == (m1["shards"][str(k)]["n_rows"] > 0)
    back = read_training_shards(spark, out)  # verify=True passes
    assert sorted(map(tuple, back.drop("shard").collect())) == sorted(
        map(tuple, docs.collect())
    )
    out2 = str(tmp_path / "shards2")
    m2 = write_training_shards(docs, out2, n_shards=8)
    assert m1["shards"] == m2["shards"]


def test_training_shards_verify_catches_drift(spark, tmp_path):
    """A dropped shard and a value edit are both refused at load time."""
    import glob
    import os

    import pytest

    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import (
        read_training_shards,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    write_training_shards(df, out, n_shards=4)
    # tamper: remove one shard's file entirely
    victim = glob.glob(f"{out}/shard=2/*.parquet")[0]
    os.remove(victim)
    with pytest.raises(ValueError, match="shard 2"):
        read_training_shards(spark, out)
    # verify=False trusts the store (documented hot-path escape hatch)
    assert read_training_shards(spark, out, verify=False).count() < 200


def test_training_shards_null_id_and_bad_args_fail_loudly(spark, tmp_path):
    import pytest

    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import (
        write_training_shards,
    )

    out = str(tmp_path / "s")
    df = spark.createDataFrame([(1, "a"), (None, "b")], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL doc_id"):
        write_training_shards(df, out, n_shards=2)
    good = df.filter("doc_id IS NOT NULL")
    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(good, out, n_shards=0)
    with pytest.raises(ValueError, match="id column"):
        write_training_shards(good, out, id_col="nope")
