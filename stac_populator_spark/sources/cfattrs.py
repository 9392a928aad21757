"""CF-metadata-dict source: the reference's raw input shape → item records.

The reference's loaders yield CF metadata dicts produced by
``xncml...to_cf_dict()`` (/root/reference/STACpopulator/input.py:152-170,
checked-in examples /root/reference/tests/data/{rdps,hrdps_*,cordex6_*}.json).
This source parses those documents (one JSON per row, Arrow-batched) into
the engine's item model:

- bbox/vertical from ``groups.CFMetadata.attributes.geospatial_*``
  (GeoData.from_ncattrs, stac_utils.py:140-181); values may be 1-element
  lists (numpy scalar leakage, stac_utils.py:254-273) — unwrapped;
- CRS precedence mirrors GeoData.from_ncattrs (stac_utils.py:144-162):
  ``@stac-populator.force_crs`` > ``geospatial_bounds_crs`` >
  ``@stac-populator.fallback_crs`` > default. Explicit CRSs go through
  ``functions.crs.transform_to_wgs84`` (pure-numpy registry covering the
  reference's tested transforms: 4326/4979 identity + axis order, 0-360
  shifted-PRIMEM WKT, EPSG:4087 equidistant cylindrical, EPSG:3348
  NAD83 Statistics Canada Lambert; unregistered CRSs → ``geo_error``,
  the dead-letter path — and the seam where a pyproj transformer plugs
  in). Without explicit CRS info, longitudes in 0–360 convention are
  normalized to ±180 (lon > 180 → lon − 360), which can produce
  lon_min > lon_max — exactly the reference's antimeridian-crossing
  state (stac_utils.py:183-186);
- temporal extent from ``time_coverage_{start,end}``
  (datacube.py:273-278); item rule: datetime null ⇔ start/end present
  (populators.py:169-172);
- ``variables`` map → array<struct<name, standard_name, units, axis,
  bounds>> ready for operators.datacube classification;
- ``access_urls`` map preserved for extensions.assets_from_access_urls.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.geometry import item_id_from_url, to_geometry

CF_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("lon_min", T.DoubleType()),
        T.StructField("lat_min", T.DoubleType()),
        T.StructField("lon_max", T.DoubleType()),
        T.StructField("lat_max", T.DoubleType()),
        T.StructField("z_min", T.DoubleType()),
        T.StructField("z_max", T.DoubleType()),
        T.StructField("crosses_am", T.BooleanType()),
        T.StructField("bbox", T.ArrayType(T.DoubleType())),
        T.StructField("geometry", T.StringType()),
        T.StructField("start_datetime", T.TimestampType()),
        T.StructField("end_datetime", T.TimestampType()),
        T.StructField("access_urls", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "vars",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("standard_name", T.StringType()),
                        T.StructField("units", T.StringType()),
                        T.StructField("axis", T.StringType()),
                        T.StructField("bounds", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("geo_error", T.StringType()),
    ]
)


def _scalar(v):
    """Unwrap 1-element lists (np2py leakage, stac_utils.py:254-296)."""
    if isinstance(v, list):
        return v[0] if v else None
    return v


def _norm_lon(lon: float | None) -> float | None:
    if lon is None:
        return None
    return lon - 360.0 if lon > 180.0 else lon


def parse_cf_document(doc: dict, fallback_id: str = "") -> dict:
    """One CF dict → one item-record dict (pure python; unit-testable)."""
    cf = (doc.get("groups", {}).get("CFMetadata", {}) or {}).get("attributes", {}) or {}
    sp = doc.get("@stac-populator") or {}
    lat_min = _scalar(cf.get("geospatial_lat_min"))
    lat_max = _scalar(cf.get("geospatial_lat_max"))
    lon_min = _scalar(cf.get("geospatial_lon_min"))
    lon_max = _scalar(cf.get("geospatial_lon_max"))
    z_min = _scalar(cf.get("geospatial_vertical_min"))
    z_max = _scalar(cf.get("geospatial_vertical_max"))

    # CRS precedence (stac_utils.py:144-162); explicit CRS → numpy registry
    crs_spec = (
        sp.get("force_crs")
        or cf.get("geospatial_bounds_crs")
        or sp.get("fallback_crs")
    )
    geo_error = None
    has_vals = lon_min is not None and lat_min is not None
    if has_vals and crs_spec is not None:
        try:
            from ..functions.crs import transform_to_wgs84, x_is_longitude

            lon_vals = [float(lon_min), float(lon_max)]
            lat_vals = [float(lat_min), float(lat_max)]
            if x_is_longitude(crs_spec):
                xs, ys = lon_vals, lat_vals
            else:
                xs, ys = lat_vals, lon_vals
            lon_arr, lat_arr, _ = transform_to_wgs84(xs, ys, None, crs_spec)
            lon_min, lon_max = float(lon_arr[0]), float(lon_arr[1])
            lat_min, lat_max = float(lat_arr[0]), float(lat_arr[1])
        except (NotImplementedError, ValueError) as exc:
            geo_error = str(exc)[:500]
            lon_min = lat_min = lon_max = lat_max = None
    elif has_vals:
        # no CRS info anywhere: the pragmatic THREDDS default — treat as
        # WGS84 with 0-360 longitudes allowed (equivalent to the reference
        # running with its 0-360 fallback WKT)
        lon_min = _norm_lon(lon_min)
        lon_max = _norm_lon(lon_max)

    has_geom = lon_min is not None and lat_min is not None
    bbox = geometry = crosses = None
    if has_geom:
        from ..functions.geometry import make_bbox

        bbox = make_bbox(lon_min, lat_min, lon_max, lat_max, z_min, z_max)
        geometry = json.dumps(
            to_geometry(lon_min, lat_min, lon_max, lat_max, z_min, z_max),
            separators=(",", ":"),
        )
        crosses = lon_min > lon_max

    access = {k: str(v) for k, v in (doc.get("access_urls") or {}).items()}
    loc = doc.get("@location") or ""
    if loc.startswith(("http://", "https://")):
        item_id = item_id_from_url(loc)
    elif access.get("HTTPServer", "").startswith(("http://", "https://")):
        item_id = item_id_from_url(access["HTTPServer"])
    else:
        item_id = fallback_id

    def ts(key):
        v = _scalar(cf.get(key))
        if not v:
            return None
        return pd.to_datetime(str(v).rstrip("Z"), errors="coerce").to_pydatetime()

    variables = []
    for name, spec in (doc.get("variables") or {}).items():
        a = (spec or {}).get("attributes", {}) or {}
        variables.append(
            {
                "name": name,
                "standard_name": a.get("standard_name"),
                "units": a.get("units"),
                "axis": a.get("axis"),
                "bounds": a.get("bounds"),
            }
        )

    return {
        "id": item_id,
        "lon_min": lon_min,
        "lat_min": lat_min,
        "lon_max": lon_max,
        "lat_max": lat_max,
        "z_min": float(z_min) if z_min is not None else None,
        "z_max": float(z_max) if z_max is not None else None,
        "crosses_am": crosses,
        "bbox": bbox,
        "geometry": geometry,
        "start_datetime": ts("time_coverage_start"),
        "end_datetime": ts("time_coverage_end"),
        "access_urls": access,
        "vars": variables,
        "geo_error": geo_error,
    }


def cf_items(df: DataFrame, json_col: str = "value", id_col: str | None = "path") -> DataFrame:
    """DataFrame of CF-dict JSON strings → item records (mapInPandas)."""

    def run(batches):
        cols = [f.name for f in CF_ITEM_SCHEMA.fields]
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for _, r in pdf.iterrows():
                fallback = str(r[id_col]) if id_col and id_col in pdf.columns else ""
                try:
                    doc = json.loads(r[json_col])
                    rows.append(parse_cf_document(doc, fallback_id=fallback))
                except (json.JSONDecodeError, TypeError, AttributeError) as exc:
                    # dead-letter contract: malformed documents are ROUTED,
                    # never silently dropped (reference populators.py:268-274).
                    # AttributeError: valid JSON that is not an object
                    # (list/int/string) — .get() on it must route too
                    row = {c: None for c in cols}
                    row["id"] = fallback
                    row["geo_error"] = f"malformed_cf_json: {str(exc)[:200]}"
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=CF_ITEM_SCHEMA)
