"""DataFrame-level reprojection over the numpy CRS registry.

The reference reprojects scalar bbox corners per item inside a Python
loop (stac_utils.py:110-170); here the same registry
(:mod:`stac_populator_spark.functions.crs`) runs as an Arrow-batched
pandas UDF, so a whole column of projected coordinates transforms per
batch — the DataFrame-native shape a catalog-scale reprojection needs.
The CRS spec is resolved ONCE per executor (closure capture); unknown
CRSs raise NotImplementedError inside the batch, surfacing through the
engine's dead-letter contract exactly like the scalar path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def to_wgs84_udf(crs_spec: str):
    """(x, y) columns in ``crs_spec`` → struct<lon, lat> on WGS84.

    Axis-order semantics match :func:`crs.transform_to_wgs84`: x/y are
    the CRS's declared first/second axes (lat-first geographic CRSs swap
    internally), output is always lon/lat.
    """

    @pandas_udf(T.StructType([
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]))
    def _udf(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        from .crs import transform_to_wgs84

        lon, lat, _ = transform_to_wgs84(
            x.to_numpy(dtype="float64"), y.to_numpy(dtype="float64"),
            None, crs_spec,
        )
        return pd.DataFrame({"lon": lon, "lat": lat})

    return _udf


def to_wgs84(df, x_col: str | Column, y_col: str | Column, crs_spec: str,
             out_col: str = "wgs84"):
    """Append ``out_col`` = struct<lon, lat> transformed from the CRS."""
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    return df.withColumn(out_col, to_wgs84_udf(crs_spec)(x, y))
