"""Deduplication operators for large-scale corpus curation.

The reference engine computes one-query-vs-corpus similarity
(``BookQuery.java``); a training-data pipeline needs the *all-pairs*
versions of the same trigram machinery plus hash/embedding families.
Everything here is native DataFrame expressions (md5/bit math inside
codegen) — no Python UDFs — so every operator scales as ordinary
shuffle/join topology:

- exact:       one hash-groupBy (single shuffle on the digest)
- ngram-Jaccard: inverted index (explode → self-join on term → co-count),
               the distributed all-pairs pattern; document-frequency cap
               prunes hot terms exactly like the reference's ``count==n``
               stop-shingle rule (BookQuery.java:105) — at 100 TB this cap
               is what keeps the term self-join from quadratic blowup
- MinHash+LSH: k deterministic min-hashes per doc (one agg over the
               exploded terms), banded into buckets; only bucket-mates are
               verified — candidate generation is linear in corpus size
- SimHash:     bitwise majority over term hashes; banded halves give
               near-linear candidate pairs at hamming distance <= 2
- embedding:   cosine over dense vectors; all-pairs here, LSH-bucketed in
               operators/ann.py for the scale path

Determinism: all hashing is md5 over explicit strings (same digest in any
engine); min() over fixed-width hex strings equals numeric min, so DuckDB
oracles reproduce signatures exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.functions.text import shingles
from similarity_search_with_hadoop_mapreduce_spark.functions.vector import (
    cosine_similarity,
)

HEX = "0123456789abcdef"


def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content digest: one shuffle on md5(text).

    Returns (text_hash, keeper_doc_id, n_copies) — keeper is the minimum
    doc id of each duplicate group, the standard "keep first" policy.
    """
    return (
        documents.select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    max_df: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """All-pairs trigram-shingle Jaccard via an inverted index.

    explode(shingles) → self-join on term (doc_a < doc_b) → per-pair
    co-occurrence count c → jaccard = c / (|A| + |B| - c) >= threshold.

    ``max_df`` drops terms appearing in more than that many documents
    before the self-join — the pair count a term generates is O(df²), so
    capping df bounds the join output; this is the reference's
    non-discriminative-shingle prune (BookQuery.java:105) generalized.
    """
    sh = documents.select(
        "doc_id", shingles(F.col(text_col)).alias("s")
    ).withColumn("sz", F.size("s"))
    terms = sh.select("doc_id", "sz", F.explode("s").alias("term"))
    if max_df is not None:
        hot = (
            terms.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("term")
        )
        terms = terms.join(hot, "term", "left_anti")
    a = terms.select(
        F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"), "term"
    )
    b = terms.select(
        F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"), "term"
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("c")
    ).cast("double")
    return (
        pairs.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    documents: DataFrame, k: int = 16, text_col: str = "text"
) -> DataFrame:
    """k-permutation MinHash signature per document.

    Hash family i is ``md5(f"{i}:" + term)``; the minimum over a document's
    term set is taken on the 32-hex-digit string (fixed width ⇒ string min
    == numeric min). One explode + one groupBy with k min() aggregates —
    a single shuffle regardless of k.

    Documents with an empty shingle set are absent (no terms to hash).
    """
    sh = documents.select("doc_id", shingles(F.col(text_col)).alias("s"))
    terms = sh.select("doc_id", F.explode("s").alias("term"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("term")))).alias(f"mh_{i}")
        for i in range(k)
    ]
    return terms.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by MinHash banding + exact Jaccard verify.

    The signature is split into ``bands`` bands of ``k // bands`` rows;
    docs sharing any band hash become candidates (linear-time candidate
    generation: one groupBy on (band, band_hash)), then candidates are
    verified with exact shingle-set Jaccard. Returns
    (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    rows = k // bands
    sig = minhash_signatures(documents, k=k, text_col=text_col)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]
                    )
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("doc_id", F.explode(band_structs).alias("x")).select(
        "doc_id", "x.band", "x.bh"
    )
    la = banded.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    lb = banded.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    cand = (
        la.join(lb, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh = documents.select("doc_id", shingles(F.col(text_col)).alias("s"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    jac = F.size(F.array_intersect("s_a", "s_b")).cast("double") / F.size(
        F.array_union("s_a", "s_b")
    ).cast("double")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _hex_val(c):
    """0-15 value of one hex char column (1-based instr into the alphabet)."""
    return F.instr(F.lit(HEX), c) - 1


def simhash(documents: DataFrame, bits: int = 16, text_col: str = "text") -> DataFrame:
    """Per-document SimHash fingerprint over trigram shingles.

    Bit j of a term's hash is bit (3 - j%4) of hex digit j//4 of
    md5(term); the document bit is the sign of the ±1 majority vote over
    its terms. Integer arithmetic end to end ⇒ engine-independent.
    Documents with no shingles are absent.
    """
    assert bits % 4 == 0
    sh = documents.select("doc_id", shingles(F.col(text_col)).alias("s"))
    terms = sh.select("doc_id", F.explode("s").alias("term")).withColumn(
        "h", F.md5("term")
    )
    digit_vals = [
        _hex_val(F.substring("h", i + 1, 1)).cast("long") for i in range(bits // 4)
    ]
    votes = [
        F.sum(
            (
                F.shiftright(digit_vals[j // 4], 3 - j % 4).bitwiseAND(F.lit(1)) * 2
                - 1
            )
        ).alias(f"w_{j}")
        for j in range(bits)
    ]
    weighted = terms.groupBy("doc_id").agg(*votes)
    fp = None
    for j in range(bits):
        term_j = F.when(F.col(f"w_{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        fp = term_j if fp is None else fp + term_j
    return weighted.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_dup_pairs(
    documents: DataFrame,
    bits: int = 16,
    max_hamming: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Near-dup candidate pairs by SimHash banding + hamming verify.

    Pigeonhole: two fingerprints within hamming distance <= 2 over 16
    bits must agree exactly on at least one of 3 bands — so candidates
    are generated with three equi-joins on band values (linear, no
    all-pairs), then verified with bit_count(xor) <= max_hamming.
    """
    fp = simhash(documents, bits=bits, text_col=text_col)
    n_bands = max_hamming + 1
    width = bits // n_bands
    bandcols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bv"),
            )
            for b in range(n_bands)
        ]
    )
    banded = fp.select("doc_id", "simhash", F.explode(bandcols).alias("x")).select(
        "doc_id", "simhash", "x.band", "x.bv"
    )
    la = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "bv"
    )
    lb = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "bv"
    )
    return (
        la.join(lb, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.col("sh_a").bitwiseXOR(F.col("sh_b"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.8, id_col: str = "vec_id"
) -> DataFrame:
    """Embedding-cosine near-dup pairs, brute-force all-pairs.

    Correctness baseline (exact): O(n²) pairs — fine up to ~10⁴ vectors
    per partition-side; at corpus scale use the LSH-bucketed candidate
    generation in operators/ann.py and verify only bucket-mates.
    Scores are rounded to 6 decimals to absorb engine fold differences.
    """
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col("embedding").alias("e_a")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col("embedding").alias("e_b")
    )
    cos = F.round(cosine_similarity(F.col("e_a"), F.col("e_b")), 6)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
