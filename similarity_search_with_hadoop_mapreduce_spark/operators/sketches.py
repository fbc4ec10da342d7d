"""Mergeable-sketch aggregation: the 100-TB path for distinct counts,
quantiles, and frequencies.

Exact ``COUNT(DISTINCT)`` over several columns plans via Expand (input
replicated once per distinct agg) and must re-scan history to extend a
result; exact quantiles need a sort. The sketch versions (Apache
DataSketches, built into Spark: ``hll_sketch_agg`` / ``theta_sketch_agg``
/ ``kll_sketch_agg_*`` / ``count_min_sketch``) are **map-only mergeable
state**: each task folds its slice into an O(2^lgk)-byte summary, merges
are associative and lossless, and a stored per-epoch sketch table makes
"distinct users this quarter" a merge over O(epochs) kilobyte rows — the
corpus is never rescanned. That is the same build-once / probe-per-epoch
lifecycle as the dedup index and the stored term profile
(operators/dedup.py, operators/textstats.py), applied to aggregation.

Determinism contract: a DataSketches sketch is a deterministic function
of the input MULTISET (hash-based, no RNG, order-independent), so
estimates are replay-stable — but they are engine-specific, so the
oracle-checked registry entries emit the EXACT value plus
within-tolerance booleans (TRUE literals on the DuckDB side), pinning
that the sketch path works without asking DuckDB to reproduce
DataSketches internals. Merging per-group sketches is NOT bit-identical
to one direct global sketch (union may coarsen lgK), so the lifecycle
pin is tolerance-vs-exact, not estimate-vs-estimate.

The reference has no aggregation tier at all (one similarity job,
``BookQuery.java``); this module is part of the extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "distinct_count_report",
    "quantile_report",
    "epoch_sketches",
    "merged_distinct_estimate",
    "save_epoch_sketches",
    "distinct_from_stored_sketches",
]

_LGK = 12  # default HLL/theta precision: ~1.6% RSE, 4-32 KB per sketch


def distinct_count_report(
    df: DataFrame,
    keys: list[str],
    col: str,
    rel_tol: float = 0.05,
    lgk: int = _LGK,
) -> DataFrame:
    """Per-key distinct-count report: exact count, HLL and theta
    estimates, and within-``rel_tol`` flags for both.

    One aggregate: the exact ``countDistinct`` (the oracle baseline) and
    both sketches fold in the same ``agg`` pass. At 100 TB drop the
    exact column and keep the sketches — that removes the Expand plan
    and leaves pure map-side mergeable state.
    """
    k = [F.col(c) for c in keys]
    rep = df.groupBy(*k).agg(
        F.countDistinct(col).alias("n_exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg(col, F.lit(lgk))).alias("hll_est"),
        F.theta_sketch_estimate(F.theta_sketch_agg(col, F.lit(lgk))).alias(
            "theta_est"
        ),
    )
    tol = F.lit(float(rel_tol))

    def _ok(est: Column) -> Column:
        return (
            F.abs(est.cast("double") - F.col("n_exact").cast("double"))
            <= tol * F.col("n_exact").cast("double")
        )

    return rep.select(
        *keys,
        "n_exact",
        "hll_est",
        "theta_est",
        _ok(F.col("hll_est")).alias("hll_ok"),
        _ok(F.col("theta_est")).alias("theta_ok"),
    )


def quantile_report(
    df: DataFrame,
    keys: list[str],
    col: str,
    q: float = 0.5,
    rank_tol: float = 0.05,
) -> DataFrame:
    """Per-key KLL quantile estimate, verified against KLL's ACTUAL
    guarantee: rank error, not value error.

    Unlike HLL/theta, a KLL sketch is NOT partitioning-deterministic
    (compaction depends on insertion order), and its error bound is on
    the RANK of the returned value (±ε·n, ε≈1.65% at the default k),
    which translates to arbitrarily large VALUE error on skewed data.
    So the report pins (a) ``kll_n`` — the sketch counted every row,
    an exact integer — and (b) ``rank_ok`` — the exact rank of the
    estimate lies within ``q ± rank_tol``, computed by joining the
    per-key estimate back and counting ``col <= est`` exactly. Two
    aggregates + one broadcast-sized join on the key (the estimate
    table is one row per key); distribution-free, replay-stable.
    """
    k = [F.col(c) for c in keys]
    est = (
        df.groupBy(*k)
        .agg(F.kll_sketch_agg_double(F.col(col).cast("double")).alias("_sk"))
        .select(
            *keys,
            F.kll_sketch_get_quantile_double("_sk", F.lit(float(q))).alias("est"),
            F.kll_sketch_get_n_double("_sk").alias("kll_n"),
        )
    )
    ranked = (
        df.join(F.broadcast(est), keys)
        .groupBy(*k)
        .agg(
            F.count(col).alias("n_rows"),
            F.first("est").alias("est"),
            F.first("kll_n").alias("kll_n"),
            F.sum(
                F.when(F.col(col).cast("double") <= F.col("est"), 1).otherwise(0)
            ).alias("_rank"),
        )
    )
    lo, hi = float(q - rank_tol), float(q + rank_tol)
    return ranked.select(
        *keys,
        "n_rows",
        "est",
        (F.col("kll_n") == F.col("n_rows")).alias("kll_n_ok"),
        (
            (F.col("_rank") >= F.lit(lo) * F.col("n_rows"))
            & (F.col("_rank") <= F.ceil(F.lit(hi) * F.col("n_rows")))
        ).alias("rank_ok"),
    )


def epoch_sketches(
    df: DataFrame, epoch: Column | str, col: str, lgk: int = _LGK
) -> DataFrame:
    """One HLL sketch per epoch — the storable partial. Map-only fold to
    O(2^lgk) bytes per epoch; the exchange moves sketches, not rows."""
    e = F.col(epoch) if isinstance(epoch, str) else epoch
    return df.groupBy(e.alias("epoch")).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merged_distinct_estimate(sketches: DataFrame) -> DataFrame:
    """Union the stored partials to one global estimate: O(epochs)
    kilobyte rows in, one row out — no corpus rescan, ever."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
        F.sum("n_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_epochs"),
    )


def save_epoch_sketches(
    df: DataFrame,
    path: str,
    epoch: Column | str,
    col: str,
    lgk: int = _LGK,
    mode: str = "overwrite",
) -> None:
    """Persist the per-epoch partials (binary sketch column, parquet).

    The stored table is the whole lifecycle: a new epoch appends one
    row (``mode='append'`` with an epoch not yet present — same
    idempotency convention as the ANN layout appends), and any distinct
    question over any epoch range is a scan of that many kilobyte rows.
    """
    epoch_sketches(df, epoch, col, lgk).write.mode(mode).parquet(path)


def distinct_from_stored_sketches(spark, path: str, epochs=None) -> DataFrame:
    """Answer "distinct over these epochs" from the stored partials
    alone. ``epochs`` optionally filters (pushed to the parquet scan);
    the corpus itself is never touched — plan-pinned in tests."""
    sk = spark.read.parquet(path)
    if epochs is not None:
        sk = sk.filter(F.col("epoch").isin(list(epochs)))
    return merged_distinct_estimate(sk)
