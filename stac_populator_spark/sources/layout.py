"""Table layout for the items table at scale — the partitioning story the
Iceberg DDL would carry (SURVEY.md §4.2: partition pages by bucket(url) /
days(warc_ts); items by coarse spatial cell + lang).

``write_items_partitioned`` lays items out as
``lang=<l>/cell_coarse=<s2 parent>/part-*.parquet`` so that:
- spatial queries prune to the touched coarse cells (partition pruning —
  verified by tests/test_layout.py via the plan's ``PartitionFilters``);
- the Zipf lang skew is isolated per partition (a hot 'en' partition
  splits across many files; AQE handles the rest);
- kNN / PIP re-runs read only the cells they need.

Coarse cell = S2 parent at level 4 (~300 km) — ~6k distinct values
worldwide: large enough to prune hard, small enough to avoid the
small-files problem at 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.s2 import s2_parent

COARSE_LEVEL = 4


@pandas_udf(T.LongType())
def s2_coarse_udf(cell: pd.Series) -> pd.Series:
    vals = cell.to_numpy(dtype=np.int64)
    out = s2_parent(vals, COARSE_LEVEL)
    return pd.Series(np.where(vals == 0, 0, out))


def write_items_partitioned(items: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        items.withColumn(
            "cell_coarse",
            F.when(F.col("cell_s2").isNotNull(), s2_coarse_udf(F.col("cell_s2"))).otherwise(F.lit(0)),
        )
        .write.mode(mode)
        .partitionBy("lang", "cell_coarse")
        .parquet(path)
    )


def read_items(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_sorted_layout(df: DataFrame, path: str, key_col: str,
                        n_files: int = 32, mode: str = "overwrite") -> None:
    """Range-partitioned, within-file-sorted layout on ``key_col`` — the
    layout the keyset-pagination reader (sources.paging) and any
    key-range predicate want: repartitionByRange gives each output file a
    disjoint key range and sortWithinPartitions orders rows inside it, so
    parquet writes tight per-row-group min/max stats for the key and a
    ``key > token`` resume predicate skips whole files + row groups
    instead of scanning them (the Iceberg analogue: sort-order metadata).
    One range shuffle at write time buys every later page/range read."""
    (
        df.repartitionByRange(n_files, F.col(key_col))
        .sortWithinPartitions(key_col)
        .write.mode(mode)
        .parquet(path)
    )
