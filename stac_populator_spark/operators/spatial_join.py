"""Broadcast point-in-polygon join (J5 in SURVEY.md §2.4).

Strategy (scale-first):
1. **Cover** every footprint polygon with coarse grid cells (driver-side —
   the footprint dimension is small by construction, like the reference's
   collection config /root/reference/STACpopulator/populators.py:156-200).
   Antimeridian-crossing footprints are pre-split into two rectangles
   (reference split rule stac_utils.py:230-251), so every cover entry is a
   simple lon-interval box.
2. **Broadcast** the (cell → footprint) cover table and equi-join items on
   ``cell_grid`` — no shuffle of the fact side at all; the big table
   streams through a BroadcastHashJoin inside whole-stage codegen.
3. **Refine** candidates:
   - rectangle footprints: pure JVM column predicate (between) — the fast
     path, stays in codegen;
   - general rings: vectorized numpy ray-casting pandas UDF
     (functions.pip), batched via Arrow.

At 100 TB the only data movement is the broadcast of the tiny cover table;
item rows never shuffle. Skewed cells (oceans/megacities) don't matter for
a broadcast join — every partition probes the same hash table.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.pip import points_in_ring
from .cells import GRID_DEG, grid_cell_np


def _cover_box(lon_min: float, lat_min: float, lon_max: float, lat_max: float,
               grid_deg: float) -> list[int]:
    """Grid cells covering a non-wrapping box (closed intervals)."""
    eps = 1e-12
    gx0 = int(np.floor((lon_min + 180.0) / grid_deg))
    gx1 = int(np.floor((min(lon_max, 180.0 - eps) + 180.0) / grid_deg))
    gy0 = int(np.floor((lat_min + 90.0) / grid_deg))
    gy1 = int(np.floor((min(lat_max, 90.0 - eps) + 90.0) / grid_deg))
    return [gx * 1000 + gy for gx in range(gx0, gx1 + 1) for gy in range(gy0, gy1 + 1)]


def footprint_cover_pdf(footprints: pd.DataFrame, grid_deg: float = GRID_DEG) -> pd.DataFrame:
    """footprints(collection_id, bbox [lon_min,lat_min,lon_max,lat_max],
    ring) → cover rows (cell_grid, collection_id, part lon/lat bounds,
    ring_json). Crossing footprints yield two parts (split at ±180)."""
    rows = []
    for _, fp in footprints.iterrows():
        lon_min, lat_min, lon_max, lat_max = [float(v) for v in fp["bbox"]]
        crossing = lon_min > lon_max
        if crossing:  # antimeridian split (stac_utils.py:183-186)
            parts = [(lon_min, 180.0), (-180.0, lon_max)]
        else:
            parts = [(lon_min, lon_max)]
        for p_lon_min, p_lon_max in parts:
            if crossing or fp.get("ring") is None:
                # per-part rectangle ring (reference ring vertex order)
                part_ring = [
                    [p_lon_min, lat_min], [p_lon_min, lat_max],
                    [p_lon_max, lat_max], [p_lon_max, lat_min],
                    [p_lon_min, lat_min],
                ]
            else:
                part_ring = list(map(list, fp["ring"]))
            ring_json = json.dumps(part_ring, separators=(",", ":"))
            for cell in _cover_box(p_lon_min, lat_min, p_lon_max, lat_max, grid_deg):
                rows.append(
                    {
                        "cell_grid": cell,
                        "collection_id": fp["collection_id"],
                        "f_lon_min": p_lon_min,
                        "f_lat_min": lat_min,
                        "f_lon_max": p_lon_max,
                        "f_lat_max": lat_max,
                        "ring_json": ring_json,
                    }
                )
    return pd.DataFrame(
        rows,
        columns=["cell_grid", "collection_id", "f_lon_min", "f_lat_min",
                 "f_lon_max", "f_lat_max", "ring_json"],
    )


def footprint_cover_df(spark: SparkSession, footprints: pd.DataFrame,
                       grid_deg: float = GRID_DEG) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("cell_grid", T.LongType()),
            T.StructField("collection_id", T.StringType()),
            T.StructField("f_lon_min", T.DoubleType()),
            T.StructField("f_lat_min", T.DoubleType()),
            T.StructField("f_lon_max", T.DoubleType()),
            T.StructField("f_lat_max", T.DoubleType()),
            T.StructField("ring_json", T.StringType()),
        ]
    )
    return spark.createDataFrame(footprint_cover_pdf(footprints, grid_deg), schema=schema)


@pandas_udf(T.BooleanType())
def pip_refine_udf(lon: pd.Series, lat: pd.Series, ring_json: pd.Series) -> pd.Series:
    """Exact even-odd PIP refinement for general rings. Parses each distinct
    ring once per Arrow batch, then tests all its points vectorized."""
    out = np.zeros(len(lon), dtype=bool)
    lons = lon.to_numpy(dtype=np.float64)
    lats = lat.to_numpy(dtype=np.float64)
    for rj, idx in ring_json.groupby(ring_json, dropna=True).groups.items():
        ring = np.asarray(json.loads(rj), dtype=np.float64)
        ii = np.asarray(idx)
        out[ii] = points_in_ring(lons[ii], lats[ii], ring)
    return pd.Series(out)


def pip_join(
    items: DataFrame,
    cover: DataFrame,
    exact: str = "rect",
) -> DataFrame:
    """Broadcast PIP join: items (with lon/lat/cell_grid) × footprint cover.

    ``exact='rect'`` refines with JVM between-predicates (correct for the
    bbox-ring footprints this engine generates — same shapes the reference
    produces, stac_utils.py:197-228). ``exact='pip'`` refines with the
    general ray-casting UDF. ``exact='none'`` returns raw candidates.
    Returns items joined with matching collection_id (inner join; items in
    no footprint drop out, mirroring items not posted to any collection).
    """
    j = items.join(F.broadcast(cover), "cell_grid")
    if exact == "rect":
        j = j.filter(
            (F.col("lon") >= F.col("f_lon_min"))
            & (F.col("lon") <= F.col("f_lon_max"))
            & (F.col("lat") >= F.col("f_lat_min"))
            & (F.col("lat") <= F.col("f_lat_max"))
        )
    elif exact == "pip":
        j = j.filter(pip_refine_udf(F.col("lon"), F.col("lat"), F.col("ring_json")))
    return j.drop("f_lon_min", "f_lat_min", "f_lon_max", "f_lat_max", "ring_json")
