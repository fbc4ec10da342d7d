"""r11 verdict #3: the stored-model registry entries must be
warehouse-independent — under a DEFAULT SparkSession (no
spark.sql.warehouse.dir, no SPARK_GRAFT_WAREHOUSE, the round driver's
shape) every saveAsTable-backed table writes through
session.table_location, and the cwd ends the run with NO
spark-warehouse/ directory (the driver session used to regrow 9 stale
oracle tables in repo root per correctness run)."""

import os
import subprocess
import sys
import tempfile

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
from similarity_search_with_hadoop_mapreduce_spark.operators.textstats import (
    save_lm_model, lm_score_from_model,
)
from similarity_search_with_hadoop_mapreduce_spark.operators import dedup as D
save_lm_model(docs.limit(80), prefix="hyg_lm")
assert lm_score_from_model(docs.limit(10), prefix="hyg_lm").count() == 10
D.build_dedup_index(docs.limit(100), prefix="hyg_idx")
D.append_dedup_index(
    docs.filter("doc_id >= 100 and doc_id < 140"), prefix="hyg_idx",
    epoch_id=1,
)
D.compact_dedup_index(spark, prefix="hyg_idx")
assert spark.table("hyg_idx_digest").count() == 140
spark.stop()
print("LEFTOVER:" + ",".join(sorted(__import__("os").listdir("."))))
"""


def test_default_session_leaves_cwd_clean():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory(prefix="hyg-") as cwd:
        env = {k: v for k, v in os.environ.items()
               if k != "SPARK_GRAFT_WAREHOUSE"}
        res = subprocess.run(
            [sys.executable, "-c", SCRIPT.format(repo=repo)],
            cwd=cwd, env=env, capture_output=True, text=True, timeout=420,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        leftover = [ln for ln in res.stdout.splitlines()
                    if ln.startswith("LEFTOVER:")]
        assert leftover and leftover[-1] == "LEFTOVER:", (
            leftover, os.listdir(cwd))
        # and nothing survived process exit either (temp warehouse is
        # atexit-removed; cwd must hold no spark-warehouse/)
        assert os.listdir(cwd) == []
