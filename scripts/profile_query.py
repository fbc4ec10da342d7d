#!/usr/bin/env python
"""Stage-level profile of one or more bench queries (guide §1 empirical
loop, without the UI): run the query under the bench session, then dump
per-job/per-stage wall, task count, task-time sum, and max/median task
time from the app status store — enough to tell scheduling floor from
serial stages from skew.

Usage: python scripts/profile_query.py q18_large_volume_customer [more...]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench

    from similarity_search_with_hadoop_mapreduce_spark.registry import QUERIES

    names = sys.argv[1:]
    spark = bench._bench_session()
    sc = spark.sparkContext
    prod = bench._production_impls()

    for name in names:
        if name.endswith("__production"):
            fn = prod[name.removesuffix("__production")]
        else:
            fn = QUERIES[name]
        df = fn(spark, SF_DIR)
        # warm run (JIT/codegen) + one timed run, like the bench
        df.write.format("noop").mode("overwrite").save()
        df.write.format("noop").mode("overwrite").save()
        store = sc._jsc.sc().statusStore()
        before_jobs = {j.jobId() for j in _iter(store.jobsList(None))}
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        print(f"\n=== {name}  wall={wall:.3f}s ===")
        jobs = [
            j for j in _iter(store.jobsList(None))
            if j.jobId() not in before_jobs
        ]
        for j in sorted(jobs, key=lambda j: j.jobId()):
            # ADVICE r12: Scala Options — a job still missing either
            # timestamp (running/failed) must not crash the profiler;
            # mirror the stage-level isDefined guard
            sub_o, done_o = j.submissionTime(), j.completionTime()
            jw = (
                (done_o.get().toInstant().toEpochMilli()
                 - sub_o.get().toInstant().toEpochMilli()) / 1000
                if sub_o.isDefined() and done_o.isDefined() else -1
            )
            print(
                f"job {j.jobId()}  wall={jw:.3f}s  "
                f"stages={list(_iter(j.stageIds()))}"
            )
        seen = set()
        for j in sorted(jobs, key=lambda j: j.jobId()):
            for sid in _iter(j.stageIds()):
                sid = int(str(sid))
                if sid in seen:
                    continue
                seen.add(sid)
                for s in _iter(store.stageData(sid, False, _empty_list(sc),
                                               False, _qt(sc))):
                    sub = s.submissionTime()
                    com = s.completionTime()
                    sw = (
                        (com.get().toInstant().toEpochMilli()
                         - sub.get().toInstant().toEpochMilli()) / 1000
                        if sub.isDefined() and com.isDefined() else -1
                    )
                    print(
                        f"  stage {sid}: wall={sw:.3f}s tasks={s.numCompleteTasks()} "
                        f"taskTime={s.executorRunTime() / 1000:.3f}s "
                        f"cpuTime={s.executorCpuTime() / 1e9:.3f}s "
                        f"shufRead={s.shuffleReadBytes()} shufWrite={s.shuffleWriteBytes()} "
                        f"input={s.inputBytes()}  [{s.name().split(chr(10))[0][:70]}]"
                    )
    spark.stop()


def _iter(jseq):
    it = jseq.iterator()
    while it.hasNext():
        yield it.next()


def _empty_list(sc):
    return sc._jvm.java.util.ArrayList()


def _qt(sc):
    return sc._gateway.new_array(sc._jvm.double, 0)


if __name__ == "__main__":
    main()
