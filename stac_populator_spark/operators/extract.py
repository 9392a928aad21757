"""pages → STAC-item-record extraction stage (vectorized, shuffle-free).

Replaces the reference's per-item ``extract_metadata`` + ``create_stac_item``
loop (/root/reference/STACpopulator/input.py:152-170, populators.py:257-305)
with one Arrow-batched ``mapInPandas`` pass: every row of the pages table
becomes one item record with id, bbox, geometry, datetime and text — no
shuffle, no network, fully partition-parallel (the stage scales linearly
with executors by construction).

Semantics preserved from the reference:
- id derivation: url → '__'-joined path (extensions/thredds.py:249-262)
- bbox layout + antimeridian MultiPolygon split (stac_utils.py:183-251)
- ``datetime`` vs ``start/end_datetime`` exclusivity (populators.py:169-172)
- null geometry tolerated (collection_update.py:45-48)
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.geometry import item_id_from_url, to_geometry
from ..functions.textextract import extract_page_fields

ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("datetime", T.TimestampType()),
        T.StructField("lon", T.DoubleType()),      # representative point (bbox center)
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon_min", T.DoubleType()),
        T.StructField("lat_min", T.DoubleType()),
        T.StructField("lon_max", T.DoubleType()),
        T.StructField("lat_max", T.DoubleType()),
        T.StructField("crosses_am", T.BooleanType()),
        T.StructField("bbox", T.ArrayType(T.DoubleType())),
        T.StructField("geometry", T.StringType()),  # GeoJSON string (Polygon|MultiPolygon)
        T.StructField("n_chars", T.IntegerType()),
    ]
)


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    html = pdf["html"].map(
        lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else (b or "")
    )
    f = extract_page_fields(html)

    lat_min = f["lat"].to_numpy()
    lon_min = f["lon"].to_numpy()
    lat_max = f["lat_max"].to_numpy()
    lon_max = f["lon_max"].to_numpy()
    # point pages: degenerate bbox (min == max), like a 0-resolution dataset
    lat_max = np.where(np.isnan(lat_max), lat_min, lat_max)
    lon_max = np.where(np.isnan(lon_max), lon_min, lon_max)
    has_geom = ~np.isnan(lon_min) & ~np.isnan(lat_min)
    crosses = has_geom & (lon_min > lon_max)

    # representative point: bbox center, antimeridian-aware
    span = np.where(crosses, lon_max - lon_min + 360.0, lon_max - lon_min)
    rep_lon = lon_min + span / 2.0
    rep_lon = np.where(rep_lon >= 180.0, rep_lon - 360.0, rep_lon)
    rep_lat = (lat_min + lat_max) / 2.0

    bboxes, geoms = [], []
    for k in range(len(pdf)):
        if not has_geom[k]:
            bboxes.append(None)
            geoms.append(None)
            continue
        bboxes.append([float(lon_min[k]), float(lat_min[k]), float(lon_max[k]), float(lat_max[k])])
        geoms.append(
            json.dumps(
                to_geometry(float(lon_min[k]), float(lat_min[k]), float(lon_max[k]), float(lat_max[k])),
                separators=(",", ":"),
            )
        )

    urls = pdf["url"].astype(str)
    out = pd.DataFrame(
        {
            "id": urls.map(item_id_from_url),
            "url": urls,
            "warc_ts": pdf["warc_ts"].values,
            "lang": pdf["lang"].values,
            "title": f["title"].values,
            "text": f["text"].values,
            "datetime": pd.to_datetime(f["meta_date"], errors="coerce", format="ISO8601"),
            "lon": np.where(has_geom, rep_lon, np.nan),
            "lat": np.where(has_geom, rep_lat, np.nan),
            "lon_min": np.where(has_geom, lon_min, np.nan),
            "lat_min": np.where(has_geom, lat_min, np.nan),
            "lon_max": np.where(has_geom, lon_max, np.nan),
            "lat_max": np.where(has_geom, lat_max, np.nan),
            "crosses_am": pd.array(np.where(has_geom, crosses, False), dtype="boolean"),
            "bbox": bboxes,
            "geometry": geoms,
            "n_chars": f["text"].str.len().astype("int32"),
        }
    )
    return out


def extract_items(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → item records. Narrow
    transformation — preserves input partitioning, no shuffle."""

    def run(batches):
        for pdf in batches:
            if len(pdf):
                yield _extract_batch(pdf)

    return pages.mapInPandas(run, schema=ITEM_SCHEMA)
