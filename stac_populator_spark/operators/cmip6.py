"""CMIP6 STAC-item assembly from CF metadata dicts — the Spark reading of
the reference's CMIP6Helper + THREDDSExtension chain
(/root/reference/STACpopulator/extensions/cmip6.py:135-200,
extensions/thredds.py:56-172), verified byte-for-byte against the
checked-in golden item
(/root/reference/tests/data/stac_item_testdata_xclim_cmip6_ncml.json) by
tests/test_golden_ncml_item.py.

Semantics preserved:
- uid: '_'-join of 8 CV attrs (cmip6.py:145-157)
- properties: CMIP6Properties field set with the reference's validators —
  ``only_item`` for the four *_index ints, space-``split`` for
  realm/source_type, prefix ``cmip6:`` except names containing 'datetime'
  (base.py:100-105); ``datetime`` null ⇔ start/end present
- geometry/bbox: GeoData path (0-360 → ±180 normalization + antimeridian
  MultiPolygon split) via sources.cfattrs.parse_cf_document
- assets: keyed by canonical ServiceType value ('OPENDAP' → 'OpenDAP'),
  media types/roles per thredds.py:20-41
- links: one rel=source link titled with the path after 'fileServer/'
  (stac_utils.py:299-312)

This is dimension-side work (one document per THREDDS dataset, not per
page); rows flow through mapInPandas in Arrow batches.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..sources.cfattrs import parse_cf_document
from .extensions import SERVICE_CANONICAL, SERVICE_MEDIA_TYPES, SERVICE_ROLES

SCHEMA_URI = "https://raw.githubusercontent.com/dchandan/stac-extension-cmip6/v1.0.0/json-schema/schema.json"
PREFIX = "cmip6"

UID_KEYS = (
    "activity_id", "institution_id", "source_id", "experiment_id",
    "variant_label", "table_id", "variable_id", "grid_label",
)

# CMIP6Properties fields in declaration order (cmip6.py:77-110)
_STR_FIELDS = (
    "Conventions", "activity_id", "creation_date", "data_specs_version",
    "experiment", "experiment_id", "frequency", "further_info_url",
    "grid_label", "institution", "institution_id", "nominal_resolution",
)
_LIST_FIELDS_1 = ("realm",)
_STR_FIELDS_2 = ("source", "source_id")
_LIST_FIELDS_2 = ("source_type",)
_STR_FIELDS_3 = (
    "sub_experiment", "sub_experiment_id", "table_id", "variable_id",
    "variant_label",
)
_INT_FIELDS = (
    "initialization_index", "physics_index", "realization_index", "forcing_index",
)
_TAIL_FIELDS = ("tracking_id", "version", "product", "license", "grid", "mip_era")


def _only_item(v):
    """1-element list → scalar (cmip6.py:112-118)."""
    if isinstance(v, list):
        if len(v) != 1:
            raise ValueError("expected single-item list")
        return v[0]
    return v


def _norm_service(svc: str) -> str:
    s = svc.lower()
    return s[: -len("_service")] if s.endswith("_service") else s


def cmip6_item_dict(attrs: dict) -> dict:
    """CF dict (to_cf_dict shape + access_urls) → STAC item dict matching
    the reference's ``stac_item().to_dict()`` output."""
    a = attrs["attributes"]
    rec = parse_cf_document(attrs)

    props: dict = {
        "start_datetime": (attrs["groups"]["CFMetadata"]["attributes"]["time_coverage_start"]),
        "end_datetime": (attrs["groups"]["CFMetadata"]["attributes"]["time_coverage_end"]),
        "datetime": None,
    }

    def put(name, value):
        key = name if "datetime" in name else f"{PREFIX}:{name}"
        props[key] = value

    for f in _STR_FIELDS:
        put(f, a[f])
    for f in _LIST_FIELDS_1:
        put(f, str(a[f]).split(" "))
    for f in _STR_FIELDS_2:
        put(f, a[f])
    for f in _LIST_FIELDS_2:
        put(f, str(a[f]).split(" "))
    for f in _STR_FIELDS_3:
        put(f, a[f])
    for f in _INT_FIELDS:
        put(f, int(_only_item(a[f])))
    for f in _TAIL_FIELDS:
        put(f, a.get(f, ""))

    version = props[f"{PREFIX}:version"]
    if version and not (version[0] == "v" and version[1:].isdigit()):
        raise ValueError(f"invalid CMIP6 version string: {version}")

    assets = {}
    for svc, href in (attrs.get("access_urls") or {}).items():
        norm = _norm_service(svc)
        key = SERVICE_CANONICAL.get(norm, svc)
        assets[key] = {
            "href": href,
            "type": SERVICE_MEDIA_TYPES.get(norm, ""),
            "roles": SERVICE_ROLES.get(norm, ["data"]),
        }

    links = []
    http = (attrs.get("access_urls") or {}).get("HTTPServer")
    if http:
        # title = the path after the 'fileServer/' segment; a URL without
        # that segment yields a null title (same rule as
        # extensions.magpie_source_link's regexp_extract — find()==-1 used
        # to silently chop the URL's first char instead, r4 review)
        i = http.find("fileServer/")
        links.append(
            {
                "href": http,
                "type": "application/x-netcdf",
                "title": http[i + len("fileServer/"):] if i != -1 else None,
                "rel": "source",
            }
        )

    return {
        "type": "Feature",
        "stac_version": "1.0.0",
        "stac_extensions": [SCHEMA_URI],
        "id": "_".join(str(a[k]) for k in UID_KEYS),
        "bbox": rec["bbox"],
        "geometry": json.loads(rec["geometry"]) if rec["geometry"] else None,
        "properties": props,
        "assets": assets,
        "links": links,
    }


CMIP6_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("stac_json", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def cmip6_items(df: DataFrame, json_col: str = "value") -> DataFrame:
    """DataFrame of CF-dict JSON strings → (id, stac_json, error) rows.
    Malformed documents land in the error column (dead-letter pattern,
    reference populators.py:268-274) instead of failing the task."""

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for _, r in pdf.iterrows():
                try:
                    item = cmip6_item_dict(json.loads(r[json_col]))
                    rows.append(
                        {"id": item["id"],
                         "stac_json": json.dumps(item, separators=(",", ":")),
                         "error": None}
                    )
                except Exception as exc:  # noqa: BLE001 — dead-letter contract
                    rows.append({"id": None, "stac_json": None, "error": str(exc)[:500]})
            yield pd.DataFrame(rows, columns=["id", "stac_json", "error"])

    return df.mapInPandas(run, schema=CMIP6_SCHEMA)
