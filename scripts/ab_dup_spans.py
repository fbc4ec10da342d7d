#!/usr/bin/env python
"""Measured A/B of dup_span_stats physical plans (r9, VERDICT item 2).

r8 landed the prescribed single-tokenize sentinel plan yet task_compute
ROSE 11.3 -> 13.4 cpu-s and the bench wall 0.73 -> 0.89 s. This harness
benchmarks value-identical variants at matched load, each in a FRESH JVM
subprocess (solo mode, the bench's --solo-one protocol), so the winner is
picked on measurement, not plausibility:

  v1_sent_str   r8 committed plan: sentinel rows, group key
                (win, sdoc STRING-nullable), broadcast join back to the
                doc spine.
  v2_sent_long  sentinel with sdoc as a nullable BIGINT (no string cast)
                and NO spine join — the sentinel already covers every
                doc (docs under w tokens emit the (0, doc) sentinel), so
                the join is redundant coverage.
  v3_flag_key   sentinel keyed by (win, _pos=0 flag BOOLEAN) with the
                span count riding a value column; no spine join.
  v4_spine      the r7 double-tokenize plan: group on win ALONE
                (narrowest possible agg key), per-doc n_spans from a
                second map-only tokenize branch, join on doc_id.

Usage:
  python scripts/ab_dup_spans.py --run VARIANT [SF_DIR]   one variant, one JVM
  python scripts/ab_dup_spans.py --all [SF_DIR]           all variants, one
                                                          subprocess each
  python scripts/ab_dup_spans.py --check [SF_DIR]         value-identity of
                                                          all variants
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

W = 5
VARIANTS = ("v1_sent_str", "v2_sent_long", "v3_flag_key", "v4_spine")


def _build(variant: str, documents, span_key: str = "xxhash64"):
    from pyspark.sql import functions as F

    from similarity_search_with_hadoop_mapreduce_spark.operators.textstats import (
        _stage_tokens,
    )

    keyers = {
        "xxhash64": lambda c: f"xxhash64({c})",
        "md5": lambda c: f"md5({c})",
    }
    key_type = "BIGINT" if span_key == "xxhash64" else "STRING"
    base = _stage_tokens(documents, "text", "doc_id")
    span = "concat_ws(' ', " + ", ".join(
        f"element_at(_toks, i + {j})" for j in range(W)
    ) + ")"
    wins_expr = (
        f"CASE WHEN size(_toks) >= {W} THEN "
        f"array_distinct(transform(sequence(1, size(_toks) - {W - 1}), "
        f"i -> {keyers[span_key](span)})) "
        f"ELSE CAST(array() AS ARRAY<{key_type}>) END"
    )
    staged = base.select("doc_id", F.expr(wins_expr).alias("_wins"))

    def final_from(per_doc):
        return per_doc.select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            (
                F.coalesce("n_spans", F.lit(0))
                - F.coalesce("n_uniq", F.lit(0))
            ).alias("dup_spans"),
            F.coalesce(
                F.round(
                    (
                        F.coalesce("n_spans", F.lit(0))
                        - F.coalesce("n_uniq", F.lit(0))
                    ).cast("double")
                    / F.nullif(F.col("n_spans"), F.lit(0)).cast("double"),
                    6,
                ),
                F.lit(0.0),
            ).alias("dup_span_frac"),
        )

    if variant == "v1_sent_str":
        sent_win = f"CAST(size(_wins) AS {key_type})"
        rows = staged.select(
            "doc_id",
            F.posexplode(F.expr(f"concat(array({sent_win}), _wins)")).alias(
                "_pos", "win"
            ),
        ).select(
            "doc_id",
            "win",
            F.when(F.col("_pos") == 0, F.col("doc_id").cast("string")).alias(
                "sdoc"
            ),
        )
        per_doc = (
            rows.groupBy("win", "sdoc")
            .agg(F.count(F.lit(1)).alias("_df"), F.min("doc_id").alias("_d0"))
            .where(F.col("sdoc").isNotNull() | (F.col("_df") == 1))
            .groupBy(F.col("_d0").alias("doc_id"))
            .agg(
                F.max(F.when(F.col("sdoc").isNotNull(), F.col("win")))
                .cast("bigint")
                .alias("n_spans"),
                F.sum(F.when(F.col("sdoc").isNull(), 1).otherwise(0)).alias(
                    "n_uniq"
                ),
            )
        )
        return final_from(
            documents.select("doc_id").join(
                F.broadcast(per_doc), "doc_id", "left"
            )
        )

    if variant == "v2_sent_long":
        sent_win = f"CAST(size(_wins) AS {key_type})"
        rows = staged.select(
            "doc_id",
            F.posexplode(F.expr(f"concat(array({sent_win}), _wins)")).alias(
                "_pos", "win"
            ),
        ).select(
            "doc_id",
            "win",
            F.when(F.col("_pos") == 0, F.col("doc_id")).alias("sdoc"),
        )
        per_doc = (
            rows.groupBy("win", "sdoc")
            .agg(F.count(F.lit(1)).alias("_df"), F.min("doc_id").alias("_d0"))
            .where(F.col("sdoc").isNotNull() | (F.col("_df") == 1))
            .groupBy(F.col("_d0").alias("doc_id"))
            .agg(
                F.max(F.when(F.col("sdoc").isNotNull(), F.col("win")))
                .cast("bigint")
                .alias("n_spans"),
                F.sum(F.when(F.col("sdoc").isNull(), 1).otherwise(0)).alias(
                    "n_uniq"
                ),
            )
        )
        return final_from(per_doc)

    if variant == "v3_flag_key":
        sent_win = (
            f"CAST(doc_id AS {key_type})"
            if span_key == "md5"
            else "doc_id"
        )
        rows = staged.select(
            "doc_id",
            F.size("_wins").cast("long").alias("_n"),
            F.posexplode(F.expr(f"concat(array({sent_win}), _wins)")).alias(
                "_pos", "win"
            ),
        ).select(
            "doc_id",
            "win",
            (F.col("_pos") == 0).alias("_sent"),
            F.when(F.col("_pos") == 0, F.col("_n")).alias("_cnt"),
        )
        per_doc = (
            rows.groupBy("win", "_sent")
            .agg(
                F.count(F.lit(1)).alias("_df"),
                F.min("doc_id").alias("_d0"),
                F.max("_cnt").alias("_cnt"),
            )
            .where(F.col("_sent") | (F.col("_df") == 1))
            .groupBy(F.col("_d0").alias("doc_id"))
            .agg(
                F.max(F.when(F.col("_sent"), F.col("_cnt"))).alias("n_spans"),
                F.sum(F.when(~F.col("_sent"), 1).otherwise(0)).alias("n_uniq"),
            )
        )
        return final_from(per_doc)

    if variant == "v4_spine":
        rows = staged.select(
            "doc_id", F.explode("_wins").alias("win")
        )
        n_uniq = (
            rows.groupBy("win")
            .agg(F.count(F.lit(1)).alias("_df"), F.min("doc_id").alias("_d0"))
            .where(F.col("_df") == 1)
            .groupBy(F.col("_d0").alias("doc_id"))
            .agg(F.count(F.lit(1)).alias("n_uniq"))
        )
        sizes = staged.select(
            "doc_id", F.size("_wins").cast("long").alias("n_spans")
        )
        return final_from(sizes.join(n_uniq, "doc_id", "left"))

    raise ValueError(variant)


def _session(cpus: str = "32"):
    """Mirror bench.py's _bench_session exactly (shuffle=8, AQE off at
    sf0.1, InferFiltersFromGenerate excluded) — the first A/B run used a
    generic session and measured the session config, not the plans: the
    inferred size(_wins)>0 filter below explode re-evaluates the
    interpreted HOF window array per row (~100x on the spine variant)."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "false")
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
        .getOrCreate()
    )


def run_one(variant: str, sf_dir: str) -> None:
    span_key = os.environ.get("AB_SPAN_KEY", "xxhash64")
    spark = _session()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = _build(variant, docs, span_key=span_key)
    df.write.format("noop").mode("overwrite").save()  # warm codegen/JIT
    sc = spark.sparkContext

    def total_task_ms() -> int:
        store = sc._jsc.sc().statusStore()
        seq = store.stageList(
            sc._jvm.java.util.ArrayList(),
            False,
            False,
            sc._gateway.new_array(sc._jvm.double, 0),
            sc._jvm.java.util.ArrayList(),
        )
        it = seq.iterator()
        total = 0
        while it.hasNext():
            total += it.next().executorRunTime()
        return total

    best, best_cpu = None, None
    for _ in range(3):
        c0 = total_task_ms()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        cpu = (total_task_ms() - c0) / 1000.0
        if best is None or wall < best:
            best, best_cpu = wall, cpu
    print(json.dumps(
        {"variant": variant, "wall": round(best, 3),
         "task_compute": round(best_cpu, 3), "sf_dir": sf_dir,
         "span_key": span_key}
    ))


def check(sf_dir: str) -> None:
    spark = _session(cpus="8")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = None
    for v in VARIANTS:
        for key in ("xxhash64", "md5"):
            got = sorted(
                tuple(r) for r in _build(v, docs, span_key=key).collect()
            )
            if ref is None:
                ref = got
            assert got == ref, f"{v}/{key} diverges from v1"
    print(f"value-identity OK: {len(VARIANTS)} variants x 2 key modes, "
          f"{len(ref)} rows @ {sf_dir}")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = next(
        (a for a in args if not a.startswith("--") and a not in VARIANTS),
        "/root/testdata/sf0.1",
    )
    if "--check" in args:
        check(sf_dir)
        return
    if "--run" in args:
        run_one(next(a for a in args if a in VARIANTS), sf_dir)
        return
    # --all: one fresh JVM per variant, interleaved rounds
    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    chosen = tuple(
        v for v in os.environ.get("AB_VARIANTS", ",".join(VARIANTS)).split(",")
        if v in VARIANTS
    )
    results: dict[str, list] = {v: [] for v in chosen}
    for _ in range(rounds):
        for v in chosen:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", v, sf_dir],
                capture_output=True, text=True, timeout=600,
            )
            line = next(
                (ln for ln in out.stdout.splitlines()
                 if ln.startswith("{")), None
            )
            if line is None:
                print(f"{v}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
                continue
            results[v].append(json.loads(line))
    for v, rs in results.items():
        if rs:
            wall = min(r["wall"] for r in rs)
            cpu = min(r["task_compute"] for r in rs)
            print(json.dumps({"variant": v, "wall_min": wall,
                              "task_compute_min": cpu, "runs": rs}))


if __name__ == "__main__":
    main()
