"""CORDEX-CMIP6 (+ xscen) item assembly — the Spark-side port of
Cordex6DataModel / Cordex6DataModelNcML (/root/reference/STACpopulator/
extensions/cordex6.py:14-104, xscen.py:8-18), exercised over the
reference's checked-in fixtures (tests/data/cordex6_{raw,ncml}.json) by
tests/test_cordex_items.py with the reference's own assertions
(tests/test_cordex.py:41-62).

- cordex6: a fixed global-attribute field set, emitted as
  ``cordex6:<field>`` (prefix rule: names containing 'datetime' keep
  their bare name, extensions/base.py:100-105)
- uid: '_'-join of 11 CV attributes + start/end dates as %Y%m%d
  (cordex6.py:58-76)
- xscen (NcML variant only): type/processing_level/license_type with
  ``xscen:`` prefix, validated against the Literal vocabularies
- assets/links from access_urls (thredds helper), cube:dimensions /
  cube:variables from operators.cubedict (datacube helper) — the same
  helper set the reference composes (`{"cordex6","thredds","datacube"
  [,"xscen"]}`)
"""

from __future__ import annotations

from datetime import datetime

from ..sources.cfattrs import parse_cf_document
from .cubedict import cube_dimensions, cube_variables
from .extensions import SERVICE_CANONICAL, SERVICE_MEDIA_TYPES, SERVICE_ROLES

CORDEX6_FIELDS = (
    "activity_id", "contact", "creation_date", "domain_id", "domain",
    "driving_experiment_id", "driving_experiment", "driving_institution_id",
    "driving_source_id", "driving_variant_label", "frequency", "grid",
    "institution", "institution_id", "license", "mip_era", "product",
    "project_id", "source", "source_id", "source_type", "tracking_id",
    "variable_id", "version_realization", "external_variables",
)

UID_KEYS = (
    "activity_id", "driving_institution_id", "driving_source_id",
    "institution_id", "source_id", "driving_experiment_id",
    "driving_variant_label", "version_realization", "variable_id",
    "domain_id", "frequency",
)

XSCEN_CV = {
    "type": ("forecast", "station-obs", "gridded-obs", "reconstruction", "simulation"),
    "processing_level": ("raw", "extracted", "regridded", "biasadjusted"),
    "license_type": ("permissive", "permissive non-commercial"),
}


def _prefixed(prefix: str, name: str) -> str:
    return name if "datetime" in name else f"{prefix}:{name}"


def cordex6_uid(attrs: dict) -> str:
    a = attrs["attributes"]
    cf = attrs["groups"]["CFMetadata"]["attributes"]
    start = datetime.fromisoformat(str(cf["time_coverage_start"]).rstrip("Z"))
    end = datetime.fromisoformat(str(cf["time_coverage_end"]).rstrip("Z"))
    values = [str(a[k]) for k in UID_KEYS]
    values.append(start.strftime("%Y%m%d"))
    values.append(end.strftime("%Y%m%d"))
    return "_".join(values)


def cordex6_item_dict(attrs: dict, ncml: bool = False) -> dict:
    """CF dict → CORDEX6 STAC item dict; ``ncml=True`` adds the xscen
    helper (Cordex6DataModelNcML)."""
    a = attrs["attributes"]
    cf = attrs["groups"]["CFMetadata"]["attributes"]
    rec = parse_cf_document(attrs)

    props: dict = {
        "start_datetime": cf["time_coverage_start"],
        "end_datetime": cf["time_coverage_end"],
        "datetime": None,
    }
    for f in CORDEX6_FIELDS:
        if f in a:
            props[_prefixed("cordex6", f)] = a[f]
    if ncml:
        for f, vocab in XSCEN_CV.items():
            v = a.get(f)
            if v is not None and v not in vocab:
                raise ValueError(f"xscen:{f} value {v!r} outside CV {vocab}")
            if v is not None:
                props[_prefixed("xscen", f)] = v

    # datacube helper
    props["cube:dimensions"] = cube_dimensions(attrs)
    props["cube:variables"] = cube_variables(attrs)

    import json as _json

    assets = {}
    for svc, href in (attrs.get("access_urls") or {}).items():
        norm = svc.lower()
        key = SERVICE_CANONICAL.get(norm, svc)
        assets[key] = {
            "href": href,
            "type": SERVICE_MEDIA_TYPES.get(norm, ""),
            "roles": SERVICE_ROLES.get(norm, ["data"]),
        }

    return {
        "type": "Feature",
        "stac_version": "1.0.0",
        "id": cordex6_uid(attrs),
        "bbox": rec["bbox"],
        "geometry": _json.loads(rec["geometry"]) if rec["geometry"] else None,
        "properties": props,
        "assets": assets,
        "helpers": ["cordex6", "thredds", "datacube"] + (["xscen"] if ncml else []),
    }


def cordex6_items(df, json_col: str = "value", ncml: bool = False):
    """DataFrame of CF-dict JSON strings → (id, stac_json, error) rows —
    the same mapInPandas dead-letter shape as operators.cmip6.cmip6_items,
    for CORDEX6 catalogs."""
    import json as _json

    import pandas as _pd
    from pyspark.sql import types as _T

    schema = _T.StructType(
        [
            _T.StructField("id", _T.StringType()),
            _T.StructField("stac_json", _T.StringType()),
            _T.StructField("error", _T.StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for _, r in pdf.iterrows():
                try:
                    item = cordex6_item_dict(_json.loads(r[json_col]), ncml=ncml)
                    item.pop("helpers", None)
                    rows.append(
                        {"id": item["id"],
                         "stac_json": _json.dumps(item, separators=(",", ":")),
                         "error": None}
                    )
                except Exception as exc:  # noqa: BLE001 — dead-letter contract
                    rows.append({"id": None, "stac_json": None, "error": str(exc)[:500]})
            yield _pd.DataFrame(rows, columns=["id", "stac_json", "error"])

    return df.mapInPandas(run, schema=schema)
