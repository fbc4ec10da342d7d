"""Raw-directory corpus source: the reference's input contract
(one file = one document, doc id = basename before the first dot,
lines joined with spaces — BookQuery.java:48-61)."""

from __future__ import annotations

import math

from similarity_search_with_hadoop_mapreduce_spark.operators.similarity import (
    similarity_to_query,
)
from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
    load_corpus_dir,
)
from tests.reference_sim import mr_similarity


def test_load_corpus_dir_end_to_end(spark, tmp_path):
    files = {
        "query.txt": "the quick brown fox\njumps over the lazy dog",
        "a.b.c.txt": "the quick brown fox sat down",  # dotted name -> id 'a'
        "punct.txt": "!!! ...",
        "short.txt": "two words",
        "other.txt": "completely unrelated text about spark engines and data",
    }
    for name, text in files.items():
        (tmp_path / name).write_text(text)

    corpus = load_corpus_dir(spark, str(tmp_path))
    rows = {r.doc_id: r.text for r in corpus.collect()}
    assert set(rows) == {"query", "a", "punct", "short", "other"}
    assert rows["query"] == "the quick brown fox jumps over the lazy dog"

    got = {
        r.doc_id: r.score
        for r in similarity_to_query(corpus, query_doc_id="query").collect()
    }
    want = mr_similarity(
        {k.split(".")[0]: " ".join(v.splitlines()) for k, v in files.items()},
        "query",
    )
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-12)


def test_corpus_dir_fans_out_few_large_files(spark, tmp_path):
    """wholetext is one-partition-per-file; a directory with fewer files
    than cores must repartition at the source (fan_out's byte heuristic
    cannot see it)."""
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        load_corpus_dir,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "one.txt").write_text("alpha beta gamma delta")
    (d / "two.txt").write_text("beta gamma delta epsilon")
    corpus = load_corpus_dir(spark, str(d))
    parallelism = spark.sparkContext.defaultParallelism
    # plan-level check: a repartition exchange exists when files < cores
    plan = corpus._jdf.queryExecution().optimizedPlan().toString()
    if 2 < parallelism:
        assert "Repartition" in plan or "RoundRobinPartitioning" in plan, plan
    assert {r.doc_id for r in corpus.collect()} == {"one", "two"}
