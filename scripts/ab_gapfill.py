#!/usr/bin/env python
"""Measured A/B for the events_gapfill_locf watch item (r9 verdict #4).

The r9 co-run number (2.3x in the judge's window, 1.85x in the driver's)
sat on a plan that was already the r3 gap-explode optimum — so the A/B
tests plan *periphery*, not the core: where the grid bounds come from,
and the exchange topology around the window. Run at sf0.1 in one session
(fresh-JVM solo numbers quoted in SCALE.md come from separate runs of
each variant via the bench harness).

Variants:

- ``current_r9``    — bounds from a 1-row aggregate of the agg subtree,
                      broadcast-joined into the plan (exchange-reused).
- ``bounds_literal``— bounds injected as LITERALS from the parquet
                      footer span the auto router already probes
                      (driver-side metadata; exact because the registry
                      input is a bare scan — see _is_bare_scan). Deletes
                      the subquery + BroadcastNestedLoopJoin + two
                      barriers + 2 window-riding columns. **WINNER —
                      now the default via gapfill_locf_auto.**
- ``exchange_on_k`` — single exchange: repartition the narrow raw rows
                      by key, complete (k, minute) agg + window + explode
                      all in one post-exchange stage. Fastest here, but
                      shuffles RAW events instead of the partially
                      aggregated (k, minute) rows — loses map-side
                      combine, a 100-1000x shuffle-volume regression at
                      100 TB where many events share a minute. REJECTED
                      as default (measured for the record).
- ``bounds_fanout`` — bounds_literal + fan_out of the narrow scan
                      (the under-split single-file scan runs one task at
                      sf0.1). Measured SLOWER: the round-robin exchange
                      of raw rows costs more than the parallelized
                      date_trunc/partial-agg saves. REJECTED.

r10 measurements (this script, min-of-5 exec in one session; solo via
fresh JVMs):

    current_r9      0.485 s   (solo 0.473; 2.03x DuckDB 0.233)
    bounds_literal  0.288 s   (solo 0.34-0.42, median 0.37; ~1.6x)
    exchange_on_k   0.185 s   (0.79x — beats DuckDB; rejected, above)
    bounds_fanout   0.385 s   (rejected)

All four variants value-identical (count + hash checksum asserted).

Usage: python scripts/ab_gapfill.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    from pyspark.sql import Window, functions as F

    from bench import _bench_session
    from similarity_search_with_hadoop_mapreduce_spark.operators.temporal import (
        _parquet_footer_span,
        gapfill_locf,
    )
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        fan_out,
        load_table,
    )

    spark = _bench_session()
    events = load_table(spark, sf_dir, "events")
    lo, hi = _parquet_footer_span(events, "ts")

    def tail(obs, start, end):
        m = F.explode(F.sequence(start, end, F.expr("interval 1 minute")))
        filled = obs.select(
            "k", "bucket", "n_events", "total_value", "_run", m.alias("_m")
        )
        at_obs = F.col("_m") == F.col("bucket")
        return filled.select(
            F.col("k").alias("event_type"),
            F.col("_m").alias("bucket_start"),
            F.when(at_obs, F.col("n_events")).otherwise(F.lit(0)).alias(
                "n_events"
            ),
            F.when(at_obs, F.col("total_value")).alias("total_value"),
            F.when(F.col("_m") >= F.col("bucket"), F.col("_run")).alias(
                "locf_value"
            ),
        )

    def windowed(agg):
        w = Window.partitionBy("k").orderBy("bucket")
        return agg.select(
            "k",
            "bucket",
            "n_events",
            "total_value",
            F.last("total_value", ignorenulls=True)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("_run"),
            F.lead("bucket").over(w).alias("_nxt"),
            F.row_number().over(w).alias("_rn"),
        )

    lo_m = F.lit(lo.replace(second=0, microsecond=0))
    hi_m = F.lit(hi.replace(second=0, microsecond=0))

    def minute_agg(ev):
        return ev.groupBy(
            F.col("event_type").alias("k"),
            F.date_trunc("minute", F.col("ts")).alias("bucket"),
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_value"),
        )

    def bounds_literal(ev):
        obs = windowed(minute_agg(ev))
        start = F.when(F.col("_rn") == 1, lo_m).otherwise(F.col("bucket"))
        end = F.coalesce(F.col("_nxt") - F.expr("interval 1 minute"), hi_m)
        return tail(obs, start, end)

    def exchange_on_k(ev):
        narrow = ev.select("event_type", "ts", "value").repartition(
            8, "event_type"
        )
        obs = windowed(minute_agg(narrow))
        start = F.when(F.col("_rn") == 1, lo_m).otherwise(F.col("bucket"))
        end = F.coalesce(F.col("_nxt") - F.expr("interval 1 minute"), hi_m)
        return tail(obs, start, end)

    variants = {
        "current_r9": lambda ev: gapfill_locf(ev),  # kb-subquery plan
        "bounds_literal": bounds_literal,
        "exchange_on_k": exchange_on_k,
        "bounds_fanout": lambda ev: bounds_literal(
            fan_out(ev.select("event_type", "ts", "value"))
        ),
    }
    walls, sigs = {}, {}
    for name, fn in variants.items():
        df = fn(events)
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        walls[name] = round(best, 3)
        sigs[name] = tuple(
            df.agg(
                F.count(F.lit(1)),
                F.sum(
                    F.hash("event_type", "bucket_start", "n_events",
                           "locf_value")
                ),
            ).collect()[0]
        )
    print(
        json.dumps(
            {
                "artifact": "ab_gapfill",
                "walls": walls,
                "value_identical": len(set(sigs.values())) == 1,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
