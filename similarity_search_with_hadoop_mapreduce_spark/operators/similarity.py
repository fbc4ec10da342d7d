"""Query-vs-corpus trigram similarity — the reference's entire engine,
rebuilt as one lazy DataFrame DAG.

Reference: the 2-job MapReduce pipeline in
``/root/reference/BookQuery/src/main/java/BookQuery.java`` (Mapper1/Reducer1
build pruned term→doc posting lists, Mapper2/Reducer2 count shared shingles
per doc and emit a score). Here the two jobs collapse into a single plan
with exactly two shuffle exchanges:

1. ``groupBy(term)``    — the Job-1 shuffle (``BookQuery.java:92``)
2. ``groupBy(doc_id)``  — the Job-2 shuffle (``BookQuery.java:153``)

There is no intermediate HDFS materialization (the reference round-trips
``<output>_temp``, ``BookQuery.java:239-254``), and Spark's hash aggregate
does map-side partial aggregation automatically, fixing the reference's
missing combiner (every literal ``"1"`` crossed the Job-2 shuffle,
``BookQuery.java:145``).

Scale design (100 TB corpus, 1000 executors):

- The query shingle set is tiny → shipped as a **broadcast** one-row
  DataFrame; the semi-join filter (``retainAll``, ``BookQuery.java:77``)
  becomes ``array_intersect`` evaluated map-side *before* the explode, so
  only ``|D∩Q|`` rows per document ever materialize — the explode volume
  is bounded by ``|corpus| × |Q|`` no matter how large documents get.
- Both shuffles key on high-cardinality columns (shingle string, doc id).
  A hyper-common shingle would skew exchange 1; AQE skew handling plus the
  reference's own ``count == n`` prune (which drops exactly those terms)
  keep it bounded.
- Everything before exchange 1 is one whole-stage-codegen'd map stage over
  a columnar Parquet scan that reads only (doc_id, text).

Semantics (SURVEY.md §2.3): ``mode="parity"`` reproduces quirks Q1-Q7
exactly — the score is ``s / ((len1 + |Q|) - s)`` where ``len1 = |D∩Q|``
and ``s`` counts intersection shingles that survive the
``count ∉ {1, n}`` prune; with nothing pruned this equals **query
containment** ``|D∩Q| / |Q|``, not Jaccard. ``mode="jaccard"`` is the
textbook ratio ``|D∩Q| / |D∪Q|`` (no pruning).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.functions.text import (
    staged_shingles_frame,
)
from similarity_search_with_hadoop_mapreduce_spark.sources.tables import fan_out

# Memo for similarity_multi_query's broadcast-guard probe: corpus
# DataFrame identity -> {(query_ids, text_col): n_terms}. The probe is a
# point-lookup aggregate over only the query rows — a per-batch statistic
# a serving deployment computes once when the query battery is registered,
# not on every scoring pass. load_table returns one cached DataFrame per
# (session, table, parquet fingerprint), so identity keying matches that
# reuse and an in-place fixture rewrite starts a fresh memo (the
# ADVICE-r2 invalidation rule, enforced once in load_table).
_qterms_cache: "weakref.WeakKeyDictionary[DataFrame, dict]" = (
    weakref.WeakKeyDictionary()
)


def corpus_shingles(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, shingle_set)`` — distinct trigram set per document (T2-T4).

    ``fan_out`` spreads an under-split scan across the cluster before the
    CPU-heavy shingle projection (no-op when the scan already parallelizes);
    point lookups like the query side still push their filter below it.
    """
    return staged_shingles_frame(
        documents, text_col, alias="shingle_set"
    )


def _query_side(documents: DataFrame, query_doc_id) -> DataFrame:
    """One-row broadcast DataFrame ``(q_set, q_len)`` for the query document.

    The reference ships the raw query text to every task via the job
    ``Configuration`` and re-parses it in every ``setup()``
    (``BookQuery.java:205,31-41,122-133``); broadcasting the *parsed*
    shingle set once is the Spark-native equivalent (O3 in SURVEY §4.1).
    """
    q = (
        corpus_shingles(documents)
        .filter(F.col("doc_id") == F.lit(query_doc_id))
        .select(
            F.col("shingle_set").alias("q_set"),
            F.size("shingle_set").alias("q_len"),
        )
    )
    return F.broadcast(q)


def similarity_to_query(
    documents: DataFrame,
    query_doc_id=0,
    mode: str = "parity",
    total_documents: int | None = None,
) -> DataFrame:
    """Score every document against the query document.

    Returns ``(doc_id, query_id, score)``; documents with zero surviving
    shingle overlap are **absent**, not 0.0 (quirk Q3). Output is unordered
    (quirk Q7) — callers wanting ranked results add
    ``.orderBy(F.desc("score"))`` / ``top_k``.

    ``total_documents`` is the reference's ``totalDocuments`` scalar
    (corpus file count *including* the query doc, ``BookQuery.java:210-214``,
    quirk Q5); computed with one ``count()`` action when not supplied —
    the reference's driver did the same file-count RPC.
    """
    if mode not in ("parity", "jaccard"):
        raise ValueError(f"mode must be 'parity' or 'jaccard', got {mode!r}")

    docs = corpus_shingles(documents)
    qside = _query_side(documents, query_doc_id)

    if mode == "jaccard":
        # Textbook |D∩Q| / |D∪Q|; single map stage, no shuffle at all.
        inter = F.size(F.array_intersect("shingle_set", "q_set"))
        union = F.size(F.array_union("shingle_set", "q_set"))
        return (
            docs.join(qside)  # broadcast nested-loop of a 1-row side
            .filter(F.col("doc_id") != F.lit(query_doc_id))
            .select(
                "doc_id",
                F.lit(str(query_doc_id)).alias("query_id"),
                (inter.cast("double") / union.cast("double")).alias("score"),
            )
            .filter(F.col("score") > 0.0)
        )

    if total_documents is None:
        total_documents = documents.count()
    n = F.lit(total_documents)

    # T5/T6: map-side semi-join with the broadcast query set, *then* take
    # the size — len1 = |D∩Q| (quirk Q1), computed before any shuffle so
    # only intersecting shingles are ever exploded (O1/O6).
    kept = (
        docs.join(qside)
        .select(
            "doc_id",
            "q_len",
            F.array_intersect("shingle_set", "q_set").alias("kept"),
        )
        .select(
            "doc_id",
            "q_len",
            F.size("kept").alias("len1"),
            F.explode("kept").alias("term"),  # T7; includes the query doc (Q5)
        )
    )

    # T8-T10: shuffle 1 — group by shingle, prune terms appearing in every
    # document (count == n) or only in the query (count == 1). The group
    # members are carried along so no re-join with the corpus is needed.
    postings = (
        kept.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.collect_list(F.struct("doc_id", "len1", "q_len")).alias("postings"),
        )
        .filter((F.col("df") != n) & (F.col("df") != F.lit(1)))
    )

    # U2-U6: shuffle 2 — per-document count of surviving shared shingles,
    # then the reference's literal score expression (BookQuery.java:166).
    # The `sum == len1+len2 → 1.0` guard is dead code (quirk Q4) but kept
    # for line-level parity.
    pairs = (
        postings.select(F.explode("postings").alias("p"))
        .select("p.doc_id", "p.len1", "p.q_len")
        .filter(F.col("doc_id") != F.lit(query_doc_id))  # U2
        .groupBy("doc_id", "len1", "q_len")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    score = F.when(
        F.col("s") == F.col("len1") + F.col("q_len"), F.lit(1.0)
    ).otherwise(
        F.col("s").cast("double")
        / (F.col("len1") + F.col("q_len") - F.col("s")).cast("double")
    )
    return pairs.select(
        "doc_id",
        F.lit(str(query_doc_id)).alias("query_id"),
        score.alias("score"),
    )


def similarity_multi_query(
    documents: DataFrame,
    query_ids,
    text_col: str = "text",
    broadcast_term_limit: int = 2_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Score every document against a *batch* of query documents in one
    pass — the engine generalization of the reference's one-query driver
    (``BookQuery.java:194-208`` hard-codes a single query file; serving a
    query batch there means re-running both MR jobs per query).

    Returns ``(doc_id, query_id, shared, containment, jaccard)`` — one row
    per (document, query) pair with ``shared = |D∩Q| > 0``, self-pairs
    excluded; ``containment = |D∩Q|/|Q|`` is the reference's effective
    score with nothing pruned (SURVEY §2.3 Q2), ``jaccard`` the textbook
    ratio. No df-pruning quirks: those are single-query semantics (the
    ``count == n`` prune counts the one query doc, quirk Q5).

    Scale topology (100 TB corpus, thousands of queries):

    - The union of all query terms is broadcast and ``array_intersect``-ed
      map-side before the explode (the reference's O1 semi-filter
      generalized), so explode volume is ``Σ_d |D ∩ ∪Q|`` — bounded by
      corpus × batch vocabulary, never corpus × document length.
    - Surviving (doc, term) rows broadcast-hash-join the exploded query
      term table (tiny vs the corpus; no shuffle of the corpus side).
    - One real exchange: the final ``groupBy(doc_id, query_id)`` count,
      keyed on high-cardinality pairs (no skew key exists — a term shared
      by every doc contributes rows spread over all doc ids).

    Broadcast guard: the plan above ships the union of all query terms to
    every executor, which stops being viable when the query battery's
    vocabulary no longer fits executor memory (tens of thousands of
    queries). A cheap probe — ``sum(q_len)`` over the query rows only, a
    point-lookup aggregate, never a corpus scan — counts the term upper
    bound; above ``broadcast_term_limit`` the operator switches to the
    shuffled plan: corpus shingles explode fully and shuffle-join the
    exploded query terms on ``term`` (both sides hash-partitioned;
    AQE's runtime bloom filter can still prune corpus rows early).
    Result-identical to the broadcast plan (pytest-pinned with a forced
    threshold); ``stats['multi_query_plan']`` records the choice.
    """
    docs = corpus_shingles(documents, text_col)
    query_ids = list(query_ids)  # materialize: consumed twice (filter + memo key)
    qset = docs.filter(F.col("doc_id").isin(query_ids)).select(
        F.col("doc_id").alias("qid"),
        F.col("shingle_set").alias("qs"),
        F.size("shingle_set").alias("q_len"),
    )
    qterms = qset.select("qid", "q_len", F.explode("qs").alias("term"))
    memo = _qterms_cache.setdefault(documents, {})
    memo_key = (tuple(query_ids), text_col)
    n_terms = memo.get(memo_key)
    if n_terms is None:
        n_terms = qset.agg(F.sum("q_len")).first()[0] or 0
        memo[memo_key] = n_terms
    if n_terms <= broadcast_term_limit:
        if stats is not None:
            stats["multi_query_plan"] = "broadcast"
        all_terms = qset.agg(
            F.array_distinct(F.flatten(F.collect_list("qs"))).alias("all_q")
        )
        kept = docs.join(F.broadcast(all_terms)).select(
            "doc_id",
            F.size("shingle_set").alias("sz_d"),
            F.explode(F.array_intersect("shingle_set", "all_q")).alias("term"),
        )
        qterms = F.broadcast(qterms)
    else:
        if stats is not None:
            stats["multi_query_plan"] = "shuffled"
        kept = docs.select(
            "doc_id",
            F.size("shingle_set").alias("sz_d"),
            F.explode("shingle_set").alias("term"),
        )
        # the corpus term stream is orders of magnitude wider than the
        # query term table — a sort-merge join would SORT the corpus
        # stream per partition (measured 2.9 -> 0.7 s at the 10x corpus);
        # build the hash map on the query side instead (same shuffle,
        # no sorts)
        qterms = qterms.hint("shuffle_hash")
    pairs = (
        kept.join(qterms, "term")
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("doc_id", "qid", "sz_d", "q_len")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return pairs.select(
        "doc_id",
        F.col("qid").cast("string").alias("query_id"),
        "shared",
        (F.col("shared").cast("double") / F.col("q_len").cast("double")).alias(
            "containment"
        ),
        (
            F.col("shared").cast("double")
            / (F.col("sz_d") + F.col("q_len") - F.col("shared")).cast("double")
        ).alias("jaccard"),
    )


def top_k_similar(
    documents: DataFrame,
    query_doc_id=0,
    k: int = 10,
    mode: str = "parity",
    total_documents: int | None = None,
) -> DataFrame:
    """Ranked top-k variant — the obvious extension the reference lacks
    (its output is ordered by packed string key, quirk Q7). Spark plans
    this as ``TakeOrderedAndProject`` (no global sort materialization).
    """
    return similarity_to_query(
        documents, query_doc_id, mode=mode, total_documents=total_documents
    ).orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
