"""java_split_tokens / trigrams / shingles vs the Python harness,
including Java String.split edge semantics (SURVEY §2.3 Q6)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.functions.text import (
    java_split_tokens,
    shingles,
)
from tests.reference_sim import java_split, shingle_set

EDGES = [
    "",
    "word",
    "two words",
    "a b c",
    "!!! ...",
    "!leading punct words here",
    "trailing words here!!!",
    "!both ends!",
    '"quoted start of text',
    "tab\tand\nnewline separated words",
    "UPPER lower MiXeD case",
    "numbers 123 and_underscores keep",
    "repeat repeat repeat repeat repeat",
]


def _spark_tokens(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = df.select("i", java_split_tokens(F.col("t")).alias("tok")).collect()
    return [r.tok for r in sorted(rows, key=lambda r: r.i)]


def _spark_shingles(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = df.select("i", shingles(F.col("t")).alias("s")).collect()
    return [set(r.s) for r in sorted(rows, key=lambda r: r.i)]


def test_java_split_edge_cases(spark):
    got = _spark_tokens(spark, EDGES)
    want = [java_split(t) for t in EDGES]
    assert got == want


def test_shingle_edge_cases(spark):
    got = _spark_shingles(spark, EDGES)
    want = [shingle_set(t) for t in EDGES]
    assert got == want


@settings(
    max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.text(
            alphabet="ab !.\t\n\"_0", min_size=0, max_size=30
        ),
        min_size=1,
        max_size=20,
    )
)
def test_property_java_split(spark, texts):
    assert _spark_tokens(spark, texts) == [java_split(t) for t in texts]
    assert _spark_shingles(spark, texts) == [shingle_set(t) for t in texts]
