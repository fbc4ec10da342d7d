"""Text-analysis queries with DuckDB oracles.

The oracles re-derive Java-split tokens via the shared TOKENS_CTE and use
RE2 regexes that agree with the Java patterns on this ASCII corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators import textstats as T
from similarity_search_with_hadoop_mapreduce_spark.registry.base import register, table
from similarity_search_with_hadoop_mapreduce_spark.registry.sim import (
    SHINGLES_CTE,
    TOKENS_CTE,
)

_STOPS_SQL = "[" + ", ".join(f"'{s}'" for s in T.EN_STOPWORDS) + "]"

# TOKENS_CTE over lowercase(text) for the fingerprint query
_TOKENS_LOWER_CTE = TOKENS_CTE.replace(
    "regexp_split_to_array(text, '\\W+')",
    "regexp_split_to_array(lower(text), '\\W+')",
)


@register(
    "text_token_count",
    oracle="WITH "
    + TOKENS_CTE
    + r"""
SELECT doc_id,
       CAST(len(tok) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS INTEGER)
         AS n_bpe_tokens,
       CAST(length(text) AS INTEGER) AS n_chars
FROM tokens JOIN documents USING (doc_id)
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counting (scan-speed map stage)."""
    return T.token_counts(table(spark, sf_dir, "documents"))


@register(
    "text_lang_id",
    oracle="WITH "
    + TOKENS_CTE
    + f"""
, r AS (
  SELECT doc_id,
    CASE WHEN len(tok) > 0
         THEN round(CAST(len(list_filter(tok, t -> list_contains({_STOPS_SQL}, t))) AS DOUBLE)
                    / CAST(len(tok) AS DOUBLE), 6)
         ELSE 0.0 END AS stop_ratio
  FROM tokens
)
SELECT doc_id, stop_ratio,
       CASE WHEN stop_ratio >= 0.05 THEN 'en' ELSE 'und' END AS predicted_lang
FROM r
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID heuristic."""
    return T.language_id(table(spark, sf_dir, "documents"))


@register(
    "text_quality",
    oracle="WITH "
    + TOKENS_CTE
    + rf"""
, feats AS (
  SELECT d.doc_id,
    CAST(len(tok) AS INTEGER) AS n_tokens,
    CASE WHEN length(d.text) > 0
         THEN CAST(len(regexp_extract_all(d.text, '[^A-Za-z0-9_\s]')) AS DOUBLE)
              / CAST(length(d.text) AS DOUBLE)
         ELSE 0.0 END AS punct_ratio_raw,
    CASE WHEN len(tok) > 0
         THEN CAST(len(list_filter(tok, t -> list_contains({_STOPS_SQL}, t))) AS DOUBLE)
              / CAST(len(tok) AS DOUBLE)
         ELSE 0.0 END AS stop_ratio_raw,
    CASE WHEN len(tok) > 0
         THEN CAST(list_sum(list_transform(tok, t -> length(t))) AS DOUBLE)
              / CAST(len(tok) AS DOUBLE)
         ELSE 0.0 END AS mean_token_len_raw
  FROM tokens JOIN documents d USING (doc_id)
)
SELECT doc_id, n_tokens,
       round(punct_ratio_raw, 6) AS punct_ratio,
       round(stop_ratio_raw, 6) AS stop_ratio,
       round(mean_token_len_raw, 6) AS mean_token_len,
       round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
             + (1.0 - least(punct_ratio_raw * 5.0, 1.0)) * 0.3
             + least(stop_ratio_raw * 10.0, 1.0) * 0.3, 6) AS quality
FROM feats
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score from length/punctuation/stopword signals."""
    return T.quality_score(table(spark, sf_dir, "documents"))


@register(
    "text_fingerprint",
    oracle="WITH "
    + _TOKENS_LOWER_CTE
    + """
, norm AS (
  SELECT doc_id, array_to_string(tok, ' ') AS n_text FROM tokens
)
SELECT doc_id, md5(n_text) AS fingerprint,
       CAST(length(n_text) AS INTEGER) AS norm_len
FROM norm
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case/whitespace-normalized md5 content fingerprint."""
    return T.fingerprint(table(spark, sf_dir, "documents"))


@register(
    "text_corpus_composition",
    oracle="WITH "
    + TOKENS_CTE
    + rf"""
, feats AS (
  SELECT d.doc_id,
    CAST(len(tok) AS INTEGER) AS n_tokens,
    round(least(CAST(len(tok) AS DOUBLE) / 100.0, 1.0) * 0.4
      + (1.0 - least(
          (CASE WHEN length(d.text) > 0
                THEN CAST(len(regexp_extract_all(d.text, '[^A-Za-z0-9_\s]')) AS DOUBLE)
                     / CAST(length(d.text) AS DOUBLE) ELSE 0.0 END) * 5.0, 1.0)) * 0.3
      + least(
          (CASE WHEN len(tok) > 0
                THEN CAST(len(list_filter(tok, t -> list_contains({_STOPS_SQL}, t))) AS DOUBLE)
                     / CAST(len(tok) AS DOUBLE) ELSE 0.0 END) * 10.0, 1.0) * 0.3,
      6) AS quality
  FROM tokens JOIN documents d USING (doc_id)
),
dups AS (
  SELECT doc_id,
         CASE WHEN row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1
              THEN 1 ELSE 0 END AS is_dup
  FROM documents
)
SELECT d.source, d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(f.n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(CAST(f.quality AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS mean_quality,
       CAST(sum(p.is_dup) AS BIGINT) AS dup_docs,
       round(CAST(sum(p.is_dup) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_rate
FROM documents d JOIN feats f USING (doc_id) JOIN dups p USING (doc_id)
GROUP BY d.source, d.lang
""",
)
def text_corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) dataset-card rollup: docs, tokens, mean quality,
    exact-duplicate share."""
    return T.corpus_composition(table(spark, sf_dir, "documents"))


@register(
    "text_top_ngrams",
    oracle="WITH "
    + SHINGLES_CTE
    + """
, terms AS (SELECT unnest(s) AS term FROM shingle_sets)
SELECT term, CAST(count(*) AS BIGINT) AS df
FROM terms GROUP BY term
ORDER BY df DESC, term
LIMIT 25
""",
)
def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-25 trigrams by document frequency."""
    return T.ngram_frequencies(table(spark, sf_dir, "documents"), top_k=25)


@register(
    "text_vocab_stats",
    oracle="WITH "
    + SHINGLES_CTE
    + """
, ne AS (SELECT s FROM shingle_sets WHERE len(s) > 0),
terms AS (SELECT unnest(s) AS term FROM ne)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ne) AS n_docs,
       CAST(count(DISTINCT term) AS BIGINT) AS vocab_size,
       CAST(count(*) AS BIGINT) AS total_terms,
       (SELECT round(avg(len(s)), 6) FROM ne) AS mean_set_size
FROM terms
""",
)
def text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus vocabulary summary."""
    return T.vocab_stats(table(spark, sf_dir, "documents"))


@register(
    "text_sentences_udtf",
    oracle=r"""
WITH parts AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                    x -> trim(x, E' \t\n\r')),
                     x -> x != '') AS ss
  FROM documents
)
SELECT doc_id,
       CAST(unnest(range(len(ss))) AS INTEGER) AS sent_id,
       unnest(ss) AS sentence
FROM parts
""",
)
def text_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (the engine's one row-level Python operator, by
    design — see make_sentence_udtf): sentence segmentation as a table
    function composed via SQL LATERAL, full-value oracle-checked."""
    spark.udtf.register("split_sentences", T.make_sentence_udtf())
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf_v")
    return spark.sql(
        "SELECT d.doc_id, s.sent_id, s.sentence "
        "FROM documents_udtf_v d, LATERAL split_sentences(d.text) s"
    )


@register(
    "text_repetition",
    oracle="WITH "
    + TOKENS_CTE
    + r"""
, tg AS (
  SELECT doc_id,
    CASE WHEN len(tok) >= 3
         THEN list_transform(range(1, len(tok)-1),
                             i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])
         ELSE [] END AS g
  FROM tokens
),
ex AS (SELECT doc_id, unnest(g) AS term FROM tg),
pt AS (SELECT doc_id, term, count(*) AS c FROM ex GROUP BY 1, 2),
st AS (
  SELECT doc_id, sum(c) AS total, count(*) AS nd, max(c) AS top
  FROM pt GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(st.total, 0) AS BIGINT) AS n_trigrams,
       CAST(coalesce(st.nd, 0) AS BIGINT) AS n_distinct_trigrams,
       coalesce(round(1.0 - CAST(st.nd AS DOUBLE) / CAST(st.total AS DOUBLE), 6),
                0.0) AS dup_trigram_frac,
       coalesce(round(CAST(st.top AS DOUBLE) / CAST(st.total AS DOUBLE), 6),
                0.0) AS top_trigram_frac
FROM documents d LEFT JOIN st USING (doc_id)
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-n-gram quality signals: fraction of repeated
    trigram occurrences and mass of the most frequent trigram per doc."""
    return T.repetition_stats(table(spark, sf_dir, "documents"))


# Shared by the ungated entry and its bloom-gated twin: the bloom has no
# false negatives and the exact join kills its false positives, so BOTH
# plans compute exactly this overlap — one oracle, two physical plans.
_DECON_ORACLE = (
    "WITH "
    + SHINGLES_CTE
    + """
, bench AS (
  SELECT DISTINCT unnest(s) AS gram FROM shingle_sets WHERE doc_id % 17 = 0
),
corp AS (
  SELECT doc_id, len(s) AS n_ngrams, unnest(s) AS gram
  FROM shingle_sets WHERE doc_id % 17 <> 0
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_hits,
       CAST(any_value(c.n_ngrams) AS INTEGER) AS n_ngrams,
       CAST(count(*) AS DOUBLE) / CAST(any_value(c.n_ngrams) AS DOUBLE)
         AS hit_ratio
FROM corp c JOIN bench b USING (gram)
GROUP BY c.doc_id
"""
)


@register(
    "text_decontamination",
    oracle=_DECON_ORACLE,
)
def text_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C n-gram overlap rule):
    every 17th doc plays the held-out eval benchmark; the rest is the
    training corpus, and each corpus doc sharing any word n-gram with
    the benchmark is flagged with its overlap count and ratio. ``n=3``
    here so the synthetic fixture actually collides (the published
    n=13 default is a parameter of the operator); the oracle recomputes
    the same distinct-trigram overlap from the shared shingle CTE."""
    docs = table(spark, sf_dir, "documents")
    return T.benchmark_contamination(
        docs.filter(docs.doc_id % 17 != 0),
        docs.filter(docs.doc_id % 17 == 0),
        n=3,
    )


@register(
    "text_decontamination_bloom",
    oracle=_DECON_ORACLE,
)
def text_decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`text_decontamination` behind the bloom membership
    pre-gate (r11 verdict #2 — the sketch's first in-pipeline
    consumer): corpus grams probe a kilobyte bitmap map-side and only
    ``bloom_hit`` survivors (~5.5% of the gram stream on this fixture)
    pay the exact string join. Same oracle as the ungated entry — the
    gate is purely physical (no false negatives; exact join kills the
    false positives), so the DuckDB value hash pins that the bloom
    dropped nothing it shouldn't have."""
    docs = table(spark, sf_dir, "documents")
    return T.benchmark_contamination_bloom(
        docs.filter(docs.doc_id % 17 != 0),
        docs.filter(docs.doc_id % 17 == 0),
        n=3,
    )


# Deterministic synthetic-PII augmentation: the fixture corpus is a clean
# shared-vocabulary synthetic (zero emails/IPs/phones), so the scrub entry
# plants PII derived from doc_id — IN BOTH ENGINES — and verifies the
# redaction output and counts on non-trivial input. Every 3rd doc is left
# untouched to pin the zero-count path.
_PII_AUG_SQL = """
aug AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN text
         ELSE text || ' reach user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or 10.' || CAST(doc_id % 200 AS VARCHAR)
              || '.0.1 call 555-867-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' end'
    END AS text
  FROM documents
)
"""


@register(
    "text_pii_scrub",
    oracle="WITH "
    + _PII_AUG_SQL
    + rf"""
, p1 AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{T.PII_EMAIL_PATTERN}')) AS INTEGER)
      AS n_emails,
    regexp_replace(text, '{T.PII_EMAIL_PATTERN}', '<EMAIL>', 'g') AS t1
  FROM aug
),
p2 AS (
  SELECT doc_id, n_emails,
    CAST(len(regexp_extract_all(t1, '{T.PII_IPV4_PATTERN}')) AS INTEGER)
      AS n_ipv4,
    regexp_replace(t1, '{T.PII_IPV4_PATTERN}', '<IP>', 'g') AS t2
  FROM p1
),
p3 AS (
  SELECT doc_id, n_emails, n_ipv4,
    CAST(len(regexp_extract_all(t2, '{T.PII_PHONE_PATTERN}')) AS INTEGER)
      AS n_phones,
    regexp_replace(t2, '{T.PII_PHONE_PATTERN}', '<PHONE>', 'g') AS t3
  FROM p2
)
SELECT doc_id, t3 AS clean_text, n_emails, n_ipv4, n_phones,
       n_emails + n_ipv4 + n_phones AS n_pii
FROM p3
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails / IPv4 / phone numbers) with per-category
    counts — the scrub pass a public-web corpus runs before training.
    The fixture text is PII-free, so both engines first plant identical
    doc_id-derived PII in 2/3 of the docs (see ``_PII_AUG_SQL``); the
    entry then value-pins the full redacted text and all four counters,
    including the untouched-doc zero path."""
    docs = table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    aug = docs.select(
        "doc_id",
        F.when(d % 3 == 0, F.col("text"))
        .otherwise(
            F.concat(
                F.col("text"),
                F.lit(" reach user"),
                d.cast("string"),
                F.lit("@mail.example.com or 10."),
                (d % 200).cast("string"),
                F.lit(".0.1 call 555-867-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
                F.lit(" end"),
            )
        )
        .alias("text"),
    )
    return T.pii_scrub(aug)


@register(
    "text_dup_spans",
    oracle="WITH "
    + TOKENS_CTE
    + """
, wins AS (
  SELECT doc_id, unnest(
    CASE WHEN len(tok) >= 5 THEN
      list_distinct(list_transform(range(1, len(tok) - 3),
        i -> md5(tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] || ' '
                 || tok[i+3] || ' ' || tok[i+4])))
    ELSE [] END) AS win
  FROM tokens
),
dfc AS (
  SELECT doc_id, count(*) OVER (PARTITION BY win) AS df FROM wins
),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans
  FROM dfc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(per.dup_spans, 0) AS BIGINT) AS dup_spans,
       coalesce(round(CAST(per.dup_spans AS DOUBLE)
                      / CAST(per.n_spans AS DOUBLE), 6), 0.0) AS dup_span_frac
FROM documents d LEFT JOIN per USING (doc_id)
""",
)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span mass (Lee et al. 2022 exact
    substring dedup, fixed-window realization): fraction of each doc's
    distinct 5-token windows that occur verbatim in at least one OTHER
    document. The fixture's planted near-duplicates light up; unique
    docs pin 0.0. ``span_key='md5'`` for cross-engine digest parity
    (production default is codegen'd xxhash64)."""
    return T.dup_span_stats(
        table(spark, sf_dir, "documents"), w=5, span_key="md5"
    )


@register(
    "text_remove_dup_spans",
    oracle="WITH "
    + TOKENS_CTE
    + """
, pw AS (
  SELECT doc_id,
         unnest(CASE WHEN len(tok) >= 5 THEN
           list_transform(range(1, len(tok) - 3),
             i -> {'pos': i,
                   'win': md5(tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]
                              || ' ' || tok[i+3] || ' ' || tok[i+4])})
         ELSE [] END) AS u
  FROM tokens
),
posw AS (SELECT doc_id, u.pos AS pos, u.win AS win FROM pw),
dwins AS (
  SELECT win FROM (SELECT win, doc_id FROM posw GROUP BY win, doc_id)
  GROUP BY win HAVING count(*) > 1
),
cov AS (
  SELECT DISTINCT p.doc_id, p.pos + offs.o AS idx
  FROM posw p JOIN dwins USING (win)
  CROSS JOIN (SELECT unnest(range(0, 5)) AS o) offs
),
toks AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tok) + 1),
                               i -> {'idx': i, 'tok': tok[i]})) AS u
  FROM tokens
),
kept AS (
  SELECT t.doc_id, (t.u).idx AS idx, (t.u).tok AS tok
  FROM toks t LEFT JOIN cov c
    ON c.doc_id = t.doc_id AND c.idx = (t.u).idx
  WHERE c.doc_id IS NULL
),
cln AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id
),
orig AS (SELECT doc_id, len(tok) AS n0 FROM tokens)
SELECT d.doc_id,
       coalesce(cln.clean_text, '') AS clean_text,
       CAST(coalesce(cln.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(orig.n0 - coalesce(cln.n_kept, 0) AS BIGINT) AS n_removed
FROM documents d JOIN orig USING (doc_id) LEFT JOIN cln USING (doc_id)
""",
)
def text_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup TRANSFORM (Lee et al. 2022 — the removal
    half; text_dup_spans is the metric): every token inside a
    cross-document duplicated 5-token window is dropped and the document
    re-assembled in order. The full cleaned text is value-pinned, so the
    position stream, the distinct-doc frequency, the coverage explode,
    the anti-join, AND the order-restoring re-collect must all agree
    with the SQL replay. ``span_key='md5'`` for cross-engine digest
    parity (production default is codegen'd xxhash64)."""
    return T.remove_dup_spans(
        table(spark, sf_dir, "documents"), w=5, span_key="md5"
    )


@register(
    "text_lm_score",
    oracle="WITH "
    + TOKENS_CTE
    + r"""
, bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tok)), i -> tok[i])) AS w1,
         unnest(list_transform(range(1, len(tok)), i -> tok[i+1])) AS w2
  FROM tokens
),
uni AS (
  SELECT w1, count(*) AS c1
  FROM (SELECT unnest(tok) AS w1 FROM tokens)
  GROUP BY w1
),
voc AS (SELECT count(*) AS v FROM uni),
bg AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
model AS (
  SELECT b.w1, b.w2,
         round(-ln(CAST(b.c12 + 1 AS DOUBLE)
                   / CAST(u.c1 + 1 * voc.v AS DOUBLE)), 6) AS nll6
  FROM bg b JOIN uni u USING (w1) CROSS JOIN voc
),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         sum(CAST(nll6 AS DECIMAL(25,6))) AS s
  FROM bi JOIN model USING (w1, w2)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       coalesce(round(CAST(per.s AS DOUBLE), 6), 0.0) AS nll_sum,
       coalesce(CAST(CAST(per.s * 1000000 AS BIGINT) // per.n_bigrams
                     AS DOUBLE) / 1000000.0, 0.0) AS avg_nll
FROM documents d LEFT JOIN per USING (doc_id)
""",
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-1 bigram LM negative-log-likelihood scoring
    (the CCNet perplexity-filter pattern); the oracle replays the model
    training AND the quantized-decimal score accumulation."""
    return T.lm_bigram_score(table(spark, sf_dir, "documents"), k=1)


@register(
    "text_tfidf_keywords",
    oracle="WITH "
    + TOKENS_CTE
    + f"""
, terms AS (
  SELECT doc_id, unnest(tok) AS term FROM tokens
),
kept AS (
  SELECT doc_id, term FROM terms
  WHERE length(term) > 0 AND NOT list_contains({_STOPS_SQL}, term)
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM kept GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST(t.tf AS DOUBLE) * (CAST(nd.n + 1 AS DOUBLE)
                                 / CAST(d.df + 1 AS DOUBLE)) AS score_raw
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN nd
),
rk AS (
  SELECT doc_id, term, tf, df, score_raw,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_raw DESC, term) AS rk
  FROM scored
)
SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, tf, df,
       floor(score_raw * 1000000.0) / 1000000.0 AS score
FROM rk WHERE rk <= 3
""",
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 keywords by the rational tf-idf weighting
    (score = tf·(N+1)/(df+1), stopwords removed); ranking is pure
    integer-ratio IEEE arithmetic so both engines agree bit-for-bit."""
    return T.tfidf_keywords(table(spark, sf_dir, "documents"), top_k=3)


@register(
    "text_nb_source",
    oracle="WITH "
    + TOKENS_CTE
    + r"""
, toks AS (
  SELECT t.doc_id, d.source AS cls, unnest(t.tok) AS term
  FROM tokens t JOIN documents d USING (doc_id)
),
tf AS (
  SELECT doc_id, cls, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, cls, term
),
wc AS (
  SELECT cls, term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY cls, term
),
voc AS (SELECT count(DISTINCT term) AS v FROM wc),
ct AS (SELECT cls, CAST(sum(cnt) AS BIGINT) AS tok_c FROM wc GROUP BY cls),
pri AS (
  SELECT cls,
         CAST(round(ln(CAST(n_c AS DOUBLE)
                       / CAST(sum(n_c) OVER () AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS prior6
  FROM (SELECT source AS cls, count(*) AS n_c FROM documents GROUP BY source)
),
classes AS (
  SELECT ct.cls, pri.prior6, ct.tok_c + voc.v AS denom,
         CAST(round(ln(1.0 / CAST(ct.tok_c + voc.v AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS dflt6
  FROM ct CROSS JOIN voc JOIN pri USING (cls)
),
llk AS (
  SELECT w.cls, w.term,
         CAST(round(ln(CAST(w.cnt + 1 AS DOUBLE) / CAST(c.denom AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS llk6
  FROM wc w JOIN classes c USING (cls)
),
sc AS (
  SELECT dt.doc_id, dt.cls AS actual, c.cls,
         c.prior6 + sum(CAST(dt.tf AS DECIMAL(12,0))
                        * coalesce(l.llk6, c.dflt6)) AS score_d
  FROM tf dt CROSS JOIN classes c
  LEFT JOIN llk l ON l.cls = c.cls AND l.term = dt.term
  GROUP BY dt.doc_id, dt.cls, c.cls, c.prior6
),
rnk AS (
  SELECT doc_id, cls, score_d,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_d DESC, cls) AS rk
  FROM sc
),
best AS (SELECT doc_id, cls, score_d FROM rnk WHERE rk = 1),
prior_best AS (
  SELECT cls AS bp_cls, round(CAST(prior6 AS DOUBLE), 6) AS bp_score
  FROM pri ORDER BY prior6 DESC, cls LIMIT 1
)
SELECT d.doc_id,
       coalesce(b.cls, pb.bp_cls) AS pred_label,
       d.source AS actual_label,
       coalesce(round(CAST(b.score_d AS DOUBLE), 6), pb.bp_score) AS nb_score,
       CAST(CASE WHEN coalesce(b.cls, pb.bp_cls) = d.source
                 THEN 1 ELSE 0 END AS INTEGER) AS is_correct
FROM documents d LEFT JOIN best b USING (doc_id) CROSS JOIN prior_best pb
""",
)
def text_nb_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes source classifier trained and applied in
    one dataflow (the fastText-style domain/quality-classifier slot);
    the oracle replays model training, the quantized-decimal score
    accumulation, and the argmax."""
    return T.nb_classify(table(spark, sf_dir, "documents"), label_col="source")


@register(
    "text_gopher_rules",
    oracle="WITH "
    + TOKENS_CTE
    + rf"""
, sig AS (
  SELECT d.doc_id,
    len(tok) AS n_words,
    CASE WHEN len(tok) > 0
         THEN CAST(list_sum(list_transform(tok, x -> length(x))) AS DOUBLE)
              / CAST(len(tok) AS DOUBLE) ELSE 0.0 END AS mwl,
    CASE WHEN len(tok) > 0
         THEN CAST(len(regexp_extract_all(d.text, '[#…]')) AS DOUBLE)
              / CAST(len(tok) AS DOUBLE) ELSE 0.0 END AS sym,
    CASE WHEN len(tok) > 0
         THEN CAST(len(list_filter(tok, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
              / CAST(len(tok) AS DOUBLE) ELSE 0.0 END AS alpha,
    len(list_filter(tok, x -> list_contains({_STOPS_SQL}, x))) AS n_stop
  FROM tokens JOIN documents d USING (doc_id)
)
SELECT doc_id,
  CAST(n_words AS INTEGER) AS n_words,
  floor(mwl * 1000000.0) / 1000000.0 AS mean_word_len,
  floor(sym * 1000000.0) / 1000000.0 AS symbol_ratio,
  floor(alpha * 1000000.0) / 1000000.0 AS alpha_frac,
  CAST(n_stop AS INTEGER) AS n_stop_hits,
  CAST(CASE WHEN n_words >= 30 AND n_words <= 100000 THEN 1 ELSE 0 END AS INTEGER) AS ok_words,
  CAST(CASE WHEN mwl >= 3.0 AND mwl <= 5.0 THEN 1 ELSE 0 END AS INTEGER) AS ok_mean_word_len,
  CAST(CASE WHEN sym <= 0.1 THEN 1 ELSE 0 END AS INTEGER) AS ok_symbol_ratio,
  CAST(CASE WHEN alpha >= 0.8 THEN 1 ELSE 0 END AS INTEGER) AS ok_alpha_frac,
  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INTEGER) AS ok_stop_hits,
  CAST(CASE WHEN n_words >= 30 AND n_words <= 100000
             AND mwl >= 3.0 AND mwl <= 5.0 AND sym <= 0.1
             AND alpha >= 0.8 AND n_stop >= 2 THEN 1 ELSE 0 END AS INTEGER) AS passes
FROM sig
""",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-set quality gates (word count, mean word
    length, symbol ratio, alphabetic fraction, function-word count) +
    the conjunction; all signals and flags value-pinned."""
    return T.gopher_rules(table(spark, sf_dir, "documents"))


@register(
    "text_lm_heldout",
    oracle="WITH "
    + TOKENS_CTE
    + r"""
, tr AS (SELECT doc_id, tok FROM tokens WHERE doc_id % 7 = 0),
sc AS (SELECT doc_id, tok FROM tokens WHERE doc_id % 7 <> 0),
bi_tr AS (
  SELECT unnest(list_transform(range(1, len(tok)), i -> tok[i])) AS w1,
         unnest(list_transform(range(1, len(tok)), i -> tok[i+1])) AS w2
  FROM tr
),
uni AS (
  SELECT w1, count(*) AS c1
  FROM (SELECT unnest(tok) AS w1 FROM tr)
  GROUP BY w1
),
voc AS (SELECT count(*) AS v FROM uni),
bg AS (SELECT w1, w2, count(*) AS c12 FROM bi_tr GROUP BY w1, w2),
model AS (
  SELECT b.w1, b.w2,
         round(-ln(CAST(b.c12 + 1 AS DOUBLE)
                   / CAST(u.c1 + 1 * voc.v AS DOUBLE)), 6) AS nll6
  FROM bg b JOIN uni u USING (w1) CROSS JOIN voc
),
bi_sc AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tok)), i -> tok[i])) AS w1,
         unnest(list_transform(range(1, len(tok)), i -> tok[i+1])) AS w2
  FROM sc
),
db AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cnt
  FROM bi_sc GROUP BY doc_id, w1, w2
),
scored AS (
  SELECT d.doc_id, d.cnt,
         coalesce(m.nll6,
                  round(-ln(CAST(1 AS DOUBLE)
                            / CAST(coalesce(u.c1, 0) + 1 * voc.v AS DOUBLE)),
                        6)) AS nll6
  FROM db d
  LEFT JOIN model m USING (w1, w2)
  LEFT JOIN uni u USING (w1)
  CROSS JOIN voc
),
per AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         CAST(sum(CAST(cnt AS DECIMAL(12,0)) * CAST(nll6 AS DECIMAL(25,6)))
              AS DECIMAL(25,6)) AS s
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       coalesce(round(CAST(per.s AS DOUBLE), 6), 0.0) AS nll_sum,
       coalesce(CAST(CAST(per.s * 1000000 AS BIGINT) // per.n_bigrams
                     AS DOUBLE) / 1000000.0, 0.0) AS avg_nll
FROM documents d LEFT JOIN per USING (doc_id)
WHERE d.doc_id % 7 <> 0
""",
)
def text_lm_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-on-slice LM scoring (the real CCNet deployment shape):
    every 7th doc plays the held-out reference slice the bigram model
    trains on; the rest of the corpus is scored against it, with add-1
    backoff for unseen bigrams (known head: k/(c1+V); unknown head:
    1/V). The oracle replays the slice training AND the fallback
    pricing."""
    docs = table(spark, sf_dir, "documents")
    return T.lm_bigram_score(
        docs.filter(docs.doc_id % 7 != 0),
        k=1,
        model_docs=docs.filter(docs.doc_id % 7 == 0),
    )



def _lm_stored_entry_oracle() -> str:
    from similarity_search_with_hadoop_mapreduce_spark.registry.base import (
        ORACLES,
    )

    return ORACLES["text_lm_heldout"]


@register("text_lm_stored", oracle=_lm_stored_entry_oracle())
def text_lm_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORED-model scoring path under the full value-hash oracle:
    the entry saves the bigram model from the every-7th-doc slice into
    bucketed tables (save_lm_model) and scores the rest from those
    frozen tables (lm_score_from_model) — result-equal to the inline
    text_lm_heldout by construction, so it shares that oracle; what
    this entry adds is an oracle-grade pin on the persist/reload path
    the streaming lm_gate depends on (the dedup_incremental_suite
    pattern: stored-lifecycle surface under the same gate as the
    inline one)."""
    docs = table(spark, sf_dir, "documents")
    T.save_lm_model(docs.filter(docs.doc_id % 7 == 0), prefix="oracle_lm_model")
    return T.lm_score_from_model(
        docs.filter(docs.doc_id % 7 != 0), prefix="oracle_lm_model"
    )


@register(
    "text_vocab_coverage",
    oracle="WITH "
    + TOKENS_CTE
    + """
, terms AS (SELECT unnest(tok) AS term FROM tokens),
tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf
  FROM terms WHERE length(term) > 0 GROUP BY term
),
tot AS (SELECT CAST(sum(tf) AS HUGEINT) AS total_tf FROM tf),
head AS (
  SELECT term, tf,
         row_number() OVER (ORDER BY tf DESC, term) AS rank,
         CAST(sum(tf) OVER (ORDER BY tf DESC, term
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
           AS cum_tf
  FROM tf
)
SELECT CAST(rank AS INTEGER) AS rank, term, tf,
       CAST(cum_tf AS BIGINT) AS cum_tf,
       CAST(total_tf AS BIGINT) AS total_tf,
       CAST(cum_tf * 1000000 // total_tf AS BIGINT) AS cum_ppm,
       ((cum_tf - tf) * 1000000 < 900000 * total_tf) AS in_vocab
FROM head CROSS JOIN tot
WHERE rank <= 200
""",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal 90%-token-mass vocabulary head (tokenizer-vocab step):
    WindowGroupLimit head selection, integer-exact coverage booleans."""
    return T.vocab_coverage(
        table(spark, sf_dir, "documents"), coverage_ppm=900000, max_vocab=200
    )


_DRIFT_TF_CTE = (
    TOKENS_CTE
    + """
, flags AS (
  SELECT t.doc_id, t.tok, (d.lang = 'en') AS a
  FROM tokens t JOIN documents d USING (doc_id)
),
dterms AS (SELECT unnest(tok) AS term, a FROM flags),
dtf AS (
  SELECT term,
         CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS tf_a,
         CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS tf_b
  FROM dterms WHERE length(term) > 0 GROUP BY term
),
dtot AS (
  SELECT CAST(sum(tf_a) AS HUGEINT) AS total_a,
         CAST(sum(tf_b) AS HUGEINT) AS total_b
  FROM dtf
)
"""
)


@register(
    "text_term_drift",
    oracle="WITH "
    + _DRIFT_TF_CTE
    + """
, scored AS (
  SELECT term, tf_a, tf_b,
         abs(CAST(tf_a AS HUGEINT) * total_b
             - CAST(tf_b AS HUGEINT) * total_a) AS drift_num,
         CAST(CAST(tf_a AS HUGEINT) * 1000000 // total_a AS BIGINT)
           AS rate_a_ppm,
         CAST(CAST(tf_b AS HUGEINT) * 1000000 // total_b AS BIGINT)
           AS rate_b_ppm
  FROM dtf CROSS JOIN dtot
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY drift_num DESC, term) AS rank
  FROM scored
)
SELECT CAST(rank AS INTEGER) AS rank, term, tf_a, tf_b,
       rate_a_ppm, rate_b_ppm,
       CAST(drift_num AS DECIMAL(38,0)) AS drift_num
FROM ranked WHERE rank <= 50
""",
)
def text_term_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 drifting terms between the 'en' slice and the rest —
    exact integer total-variation numerators (one token-stream pass)."""
    return T.term_drift(
        table(spark, sf_dir, "documents"),
        F.col("lang") == F.lit("en"),
        top_k=50,
    )


@register(
    "text_corpus_drift",
    oracle="WITH "
    + _DRIFT_TF_CTE
    + """
, num AS (
  SELECT abs(CAST(tf_a AS HUGEINT) * total_b
             - CAST(tf_b AS HUGEINT) * total_a) AS n,
         CASE WHEN tf_a > 0 THEN 1 ELSE 0 END AS ia,
         CASE WHEN tf_b > 0 THEN 1 ELSE 0 END AS ib,
         total_a, total_b
  FROM dtf CROSS JOIN dtot
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(ia) AS BIGINT) AS n_terms_a,
       CAST(sum(ib) AS BIGINT) AS n_terms_b,
       CAST(max(total_a) AS BIGINT) AS total_a,
       CAST(max(total_b) AS BIGINT) AS total_b,
       CAST(sum(n) * 500000 // (max(total_a) * max(total_b)) AS BIGINT)
         AS tvd_ppm
FROM num
""",
)
def text_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar total-variation distance (ppm) between the 'en' slice's
    and the rest's term distributions — the drift alert dial."""
    return T.corpus_drift(
        table(spark, sf_dir, "documents"), F.col("lang") == F.lit("en")
    )


@register(
    "text_drift_stored",
    oracle="WITH "
    + TOKENS_CTE
    + """
, ptf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf_p
  FROM (SELECT doc_id, unnest(tok) AS term FROM tokens) u
  JOIN documents d USING (doc_id)
  WHERE length(term) > 0 AND doc_id % 2 = 0
  GROUP BY term
),
btf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf_b
  FROM (SELECT doc_id, unnest(tok) AS term FROM tokens) u
  JOIN documents d USING (doc_id)
  WHERE length(term) > 0 AND doc_id % 2 = 1
  GROUP BY term
),
tot AS (
  SELECT (SELECT CAST(sum(tf_b) AS HUGEINT) FROM btf) AS total_b,
         (SELECT CAST(sum(tf_p) AS HUGEINT) FROM ptf) AS total_p
),
-- the brute-force complement: full outer join over EVERY term of
-- either side (the engine computes the unmatched-profile mass
-- analytically; this oracle pins that algebra against the direct sum)
allnum AS (
  SELECT abs(CAST(COALESCE(b.tf_b, 0) AS HUGEINT) * total_p
             - CAST(COALESCE(p.tf_p, 0) AS HUGEINT) * total_b) AS n
  FROM btf b FULL OUTER JOIN ptf p ON b.term = p.term
  CROSS JOIN tot
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM btf) AS n_batch_terms,
       (SELECT CAST(count(*) AS BIGINT) FROM btf b
        WHERE EXISTS (SELECT 1 FROM ptf p WHERE p.term = b.term))
         AS matched_terms,
       CAST(total_b AS BIGINT) AS total_batch,
       CAST(total_p AS BIGINT) AS total_profile,
       CAST((SELECT sum(n) FROM allnum) * 500000
            // (total_p * total_b) AS BIGINT) AS tvd_ppm
FROM tot
""",
)
def text_drift_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORED-profile drift path under the full value-hash oracle:
    the entry persists the even-doc slice's term profile
    (save_term_profile, bucketed) and drifts the odd-doc slice against
    the frozen tables (drift_from_profile). The engine never scans the
    profile terms the batch lacks — their numerator mass is the
    analytic complement (T_p - matched_tf_p) * T_b — while this oracle
    computes the SAME total the brute way (full outer join over every
    term of either side), so the gate pins the algebra, not just the
    plumbing."""
    docs = table(spark, sf_dir, "documents")
    T.save_term_profile(
        docs.filter(docs.doc_id % 2 == 0), prefix="oracle_term_profile"
    )
    return T.drift_from_profile(
        docs.filter(docs.doc_id % 2 == 1), prefix="oracle_term_profile"
    )


@register(
    "text_encode_vocab",
    oracle="WITH "
    + TOKENS_CTE
    + """
, eterms AS (
  SELECT term FROM (
    SELECT doc_id, unnest(tok) AS term FROM tokens
  ) u JOIN documents d USING (doc_id)
  WHERE length(term) > 0 AND doc_id % 2 = 0
),
etf AS (SELECT term, CAST(count(*) AS BIGINT) AS tf FROM eterms GROUP BY term),
etot AS (SELECT CAST(sum(tf) AS HUGEINT) AS total_tf FROM etf),
ehead AS (
  SELECT term, tf,
         row_number() OVER (ORDER BY tf DESC, term) AS rank,
         CAST(sum(tf) OVER (ORDER BY tf DESC, term
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
           AS cum_tf
  FROM etf
),
vocab AS (
  SELECT term, CAST(rank AS INTEGER) AS id
  FROM ehead CROSS JOIN etot
  WHERE rank <= 200 AND (cum_tf - tf) * 1000000 < 900000 * total_tf
),
pos AS (
  SELECT doc_id, unnest(tok) AS term,
         unnest(range(len(tok))) AS pos
  FROM tokens
),
idrows AS (
  SELECT doc_id, pos, CAST(COALESCE(v.id, 0) AS INTEGER) AS id
  FROM pos LEFT JOIN vocab v USING (term)
  WHERE length(term) > 0
),
enc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
         array_agg(id ORDER BY pos) AS ids
  FROM idrows GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(n_tokens, 0) AS n_tokens,
       COALESCE(n_unk, 0) AS n_unk,
       COALESCE(ids, CAST([] AS INTEGER[])) AS ids
FROM documents d LEFT JOIN enc USING (doc_id)
""",
)
def text_encode_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORED-vocabulary tokenize path under the full value-hash
    oracle: the entry persists the even-doc slice's minimal 90%-mass
    vocabulary (save_vocab, bucketed) and encodes EVERY document from
    the frozen tables (encode_with_vocab) — odd docs exercise real OOV
    (UNK id 0), ids are order-preserving, token-less docs carry empty
    arrays. Composes text -> ids with vocab_coverage (train) and
    pack_sequences (layout)."""
    docs = table(spark, sf_dir, "documents")
    T.save_vocab(
        docs.filter(docs.doc_id % 2 == 0),
        prefix="oracle_vocab_model",
        coverage_ppm=900000,
        max_vocab=200,
    )
    return T.encode_with_vocab(docs, prefix="oracle_vocab_model")


@register(
    "text_chunk_documents",
    oracle="WITH "
    + TOKENS_CTE
    + """
, kept AS (
  SELECT doc_id, list_filter(tok, t -> length(t) > 0) AS kt FROM tokens
),
sized AS (SELECT doc_id, kt, len(kt) AS n FROM kept),
counted AS (
  SELECT doc_id, kt, n,
         CASE WHEN n <= 0 THEN 0
              WHEN n <= 16 THEN 1
              ELSE (n - 16 + 12 - 1) // 12 + 1 END AS k
  FROM sized
),
expl AS (
  SELECT doc_id, kt, unnest(range(k)) AS chunk_id
  FROM counted WHERE k > 0
)
SELECT doc_id,
       CAST(chunk_id AS INTEGER) AS chunk_id,
       CAST(chunk_id * 12 AS BIGINT) AS start_token,
       CAST(len(kt[chunk_id*12+1 : chunk_id*12+16]) AS BIGINT) AS n_tokens,
       array_to_string(kt[chunk_id*12+1 : chunk_id*12+16], ' ') AS chunk_text
FROM expl
""",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 16-token chunks with 4-token overlap (stride 12) —
    the RAG / embedding-index preparation layout, map-only, exact
    integer chunk arithmetic, full chunk text value-pinned."""
    return T.chunk_documents(
        table(spark, sf_dir, "documents"), chunk_tokens=16, overlap_tokens=4
    )
