"""Task-retry determinism: on a real cluster tasks fail and re-execute
(speculation, preemption, OOM-kill); the engine's guarantee is that a
retried task reproduces its partition byte-for-byte — which holds only if
every stage is deterministic and side-effect-free. The reference's
analogue is its per-item failure isolation + resume (populators.py:
268-274, export.py:95-114); at Spark scale the contract moves into the
task scheduler.

Runs in a subprocess because task retries need a dedicated master
(``local[4, 2]`` = 4 threads, maxFailures 2) — the shared test session
runs maxFailures=1 where any injected failure kills the job.
"""

import os
import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from stac_populator_spark.session import get_spark
from stac_populator_spark.datagen import footprints_pdf, pages_df
from stac_populator_spark.operators.spatial_join import footprint_cover_df
from stac_populator_spark.plans.pipeline import build_items

spark = get_spark(app_name="retry-test", master="local[4, 2]", shuffle_partitions=8)

@pandas_udf(T.StringType())
def poison(text: pd.Series) -> pd.Series:
    # identity, but the FIRST attempt of partition 3 dies mid-flight —
    # the scheduler must rerun it and the rerun must reproduce the rows
    ctx = TaskContext.get()
    if ctx is not None and ctx.partitionId() == 3 and ctx.attemptNumber() == 0:
        raise RuntimeError("injected task failure (attempt 0)")
    return text

pages = pages_df(spark, 20000, partitions=8).cache()
pages.count()
cover = footprint_cover_df(spark, footprints_pdf())

clean = build_items(pages, cover).select("id", "collection_id", "tile_id", "stac_json")
poisoned = build_items(pages.withColumn("text", poison(F.col("text"))), cover).select(
    "id", "collection_id", "tile_id", "stac_json"
)

cols = ["id", "collection_id", "tile_id", "stac_json"]
a = clean.toPandas().sort_values(cols).reset_index(drop=True)
b = poisoned.toPandas().sort_values(cols).reset_index(drop=True)
# a page overlapping k footprints emits k item rows, so output >= input
assert len(a) >= 20000, f"clean row count {{len(a)}}"
assert a["id"].nunique() == 20000, "every input page must appear"
assert a.equals(b), "retried-task output diverges from clean run"
print("RETRY-DETERMINISM-OK")
"""


def test_task_retry_reproduces_partition(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "retry_check.py"
    script.write_text(SCRIPT.format(repo=repo))
    r = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "RETRY-DETERMINISM-OK" in r.stdout
