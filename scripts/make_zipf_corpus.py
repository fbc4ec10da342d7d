#!/usr/bin/env python
"""Deterministic Zipf-skewed `documents` fixture (r11 verdict #4).

The driver's synthetic corpus has a DENSE vocabulary (~27k distinct
trigrams at sf0.1, mean df ≈ 10, BASELINE.md caveat): no term is rare,
so the prefix filter's candidate collapse and the df-cap's hot-term
prune never fire on it — the two skew defenses were only ever exercised
on synthetic KEY skew. This generator builds a corpus with the
rank-frequency law real text actually follows (token probability
∝ 1/rank^s, s≈1.05 — "the" really is ~7-12% of English tokens), so:

- trigram document frequency is long-tailed: a handful of hot trigrams
  with df in the hundreds (the O(df²) join blowup max_df exists to cap)
  over a huge once-only tail (the rare prefixes Vernica-style prefix
  filtering keys on);
- ~8% of docs are near-duplicates of an earlier doc (8% of tokens
  resampled), so the Jaccard/LSH entries return non-trivial pair sets
  at their registry thresholds.

Same schema and conventions as the driver tables (doc_id/text/lang/
source/n_chars; tokens are `\\w+` words so Java-split parity holds);
every OTHER table is symlinked from the base sf dir, so the output dir
is a drop-in `sf_dir` for `queries()` AND the DuckDB oracles.

Deterministic: one seeded numpy Generator drives everything; same args
→ byte-identical parquet (row order and values; pinned in
tests/test_fixtures.py).

Usage:
  python scripts/make_zipf_corpus.py OUT_DIR [--n-docs 500]
      [--base /root/testdata/sf0.01] [--seed 20260816]
Default layout used by certification and the probes:
  .fixtures/zipf0.01  (500 docs,  base sf0.01)
  .fixtures/zipf0.1   (5000 docs, base sf0.1)
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings",
]
LANGS = np.array(["en", "zh", "es", "de", "fr"])
LANG_P = np.array([0.44, 0.15, 0.15, 0.14, 0.12])


def make_documents(
    n_docs: int,
    vocab: int = 20_000,
    s: float = 1.05,
    min_len: int = 40,
    max_len: int = 120,
    dup_rate: float = 0.08,
    perturb: float = 0.08,
    seed: int = 20260816,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    p = np.arange(1, vocab + 1, dtype=np.float64) ** -s
    p /= p.sum()
    words = np.array([f"w{i}" for i in range(vocab)])
    toks: list[np.ndarray] = []
    for i in range(n_docs):
        if i > 0 and rng.random() < dup_rate:
            j = int(rng.integers(0, i))
            t = toks[j].copy()
            m = max(1, int(len(t) * perturb))
            pos = rng.choice(len(t), size=m, replace=False)
            t[pos] = rng.choice(vocab, size=m, p=p)
        else:
            n = int(rng.integers(min_len, max_len + 1))
            t = rng.choice(vocab, size=n, p=p)
        toks.append(t)
    texts = [" ".join(words[t]) for t in toks]
    langs = LANGS[rng.choice(len(LANGS), size=n_docs, p=LANG_P)]
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(
                [f"src{i % 20}" for i in range(n_docs)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--n-docs", type=int, default=500)
    ap.add_argument("--base", default="/root/testdata/sf0.01",
                    help="sf dir whose non-documents tables are symlinked")
    ap.add_argument("--seed", type=int, default=20260816)
    a = ap.parse_args()
    os.makedirs(a.out_dir, exist_ok=True)
    tbl = make_documents(a.n_docs, seed=a.seed)
    pq.write_table(tbl, os.path.join(a.out_dir, "documents.parquet"))
    for t in TABLES:
        src = os.path.join(a.base, f"{t}.parquet")
        dst = os.path.join(a.out_dir, f"{t}.parquet")
        if os.path.lexists(dst):
            os.unlink(dst)
        os.symlink(src, dst)
    import duckdb

    con = duckdb.connect()
    n_tri, mx_df = con.execute(
        "WITH t AS (SELECT regexp_split_to_array(text, '\\W+') AS w "
        f"FROM '{a.out_dir}/documents.parquet'), "
        "g AS (SELECT list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] "
        "for i in range(1, len(w)-1)]) AS s FROM t), "
        "d AS (SELECT unnest(s) AS g FROM g) "
        "SELECT count(DISTINCT g), max(df) FROM "
        "(SELECT g, count(*) AS df FROM d GROUP BY g)"
    ).fetchone()
    print(f"{a.out_dir}: {a.n_docs} docs, {n_tri} distinct trigrams, "
          f"max trigram df {mx_df}")


if __name__ == "__main__":
    main()
