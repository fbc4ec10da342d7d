"""SparkSession factory with confs tuned for this engine.

Local testing runs ``local[N]`` (one JVM); the conf choices below are the
ones that also hold on a large cluster: AQE on (runtime coalescing + skew
join splitting — one hyper-common shingle or a hot join key gets split
automatically), Arrow enabled for the few Pandas-UDF extension operators,
and shuffle partitions sized to the core count rather than the 200 default.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

# One temp warehouse per PROCESS, created lazily and removed at exit
# (ADVICE r10): mkdtemp on every get_session call orphaned a fresh
# directory whenever getOrCreate returned an already-running session
# (the config is ignored then), accumulating spark-warehouse-* dirs in
# /tmp across repeated calls.
_WAREHOUSE_DIR: str | None = None


def _warehouse_dir() -> str:
    env = os.environ.get("SPARK_GRAFT_WAREHOUSE")
    if env:
        return env
    global _WAREHOUSE_DIR
    if _WAREHOUSE_DIR is None:
        import atexit
        import shutil

        _WAREHOUSE_DIR = tempfile.mkdtemp(prefix="spark-warehouse-")
        atexit.register(shutil.rmtree, _WAREHOUSE_DIR, ignore_errors=True)
    return _WAREHOUSE_DIR


def table_location(table_name: str) -> str:
    """Explicit storage location for every ``saveAsTable``-backed stored
    model/index table this engine writes (r11 verdict #3): the writers
    pass it as ``option("path", ...)`` so the files land under the
    per-process temp warehouse (or ``SPARK_GRAFT_WAREHOUSE``) no matter
    WHOSE SparkSession runs them. Relying on the session's
    ``spark.sql.warehouse.dir`` was only clean under this repo's own
    factory — under a caller's default session (the round driver's),
    managed tables silently regrew ``./spark-warehouse`` in cwd."""
    return os.path.join(_warehouse_dir(), table_name)


def tidy_default_warehouse(spark) -> None:
    """Remove the EMPTY ``./spark-warehouse`` directory that catalog
    bootstrap mkdirs under a session with no explicit warehouse conf —
    the last cwd residue once every table writes through
    :func:`table_location`. Strictly scoped: acts only when the
    session's warehouse resolves to Spark's DEFAULT (cwd/spark-
    warehouse as seen from the current cwd) and only via ``rmdir``,
    which refuses a non-empty directory — a caller who configured a
    warehouse, or who has real managed tables there, is untouched.
    Spark needs no standing default-db directory: any later managed
    write mkdirs its own location on demand."""
    try:
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
    except Exception:  # noqa: BLE001 — tidy is best-effort by definition
        return
    p = wh.removeprefix("file:")
    if os.path.abspath(p) == os.path.join(os.getcwd(), "spark-warehouse"):
        try:
            os.rmdir(p)
        except OSError:
            pass


def get_session(
    app_name: str = "similarity_search_with_hadoop_mapreduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a real cluster, ``master`` comes from spark-submit and
    ``spark.sql.shuffle.partitions`` should be ~2-3x total cores (AQE
    coalesces the excess); locally we match the core count.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Delay scheduling buys nothing when shuffle blocks are served by
        # the executor that asks for them (always true in one JVM; true on
        # clusters with fast networks too — 0 is a common production
        # setting). The default 1 s revive timer likewise adds up to a full
        # second of idle wait per short stage: measured 27% of headline
        # suite wall locally.
        .config("spark.locality.wait", "0")
        .config("spark.scheduler.revive.interval", "1ms")
        # InferFiltersFromGenerate rewrites explode(expr) into
        # Filter(size(expr)>0) + explode(expr). With an *inline* expression
        # (our shingle/hash pipelines are interpreted higher-order functions
        # — no codegen, no common-subexpression elimination) the filter
        # duplicates the full per-row computation, and predicate pushdown
        # then sinks that copy below the fan_out repartition, serializing it
        # onto the scan's (often single) input split. explode on an empty
        # array already emits nothing, so the inferred filter buys nothing
        # and costs a second evaluation: measured 4.7x on the corpus n-gram
        # scan at sf0.1. Applies identically on a real cluster.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Fresh per-process warehouse (r9 verdict hygiene item): the
        # stored-model oracle entries (lm_bigram_score, term profiles,
        # vocab heads) saveAsTable within one entry run; nothing reads a
        # table across processes, so a temp warehouse keeps stale stored
        # models from one local run leaking into the next (the default
        # ./spark-warehouse accumulated them in the repo root). Override
        # with SPARK_GRAFT_WAREHOUSE for a deliberately persistent one.
        .config("spark.sql.warehouse.dir", _warehouse_dir())
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
