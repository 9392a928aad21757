"""NcML (THREDDS dataset description XML) → CF-metadata dict.

The reference converts NcML to a CF dict with ``xncml.Dataset.from_text(
text).to_cf_dict()`` (/root/reference/STACpopulator/input.py:152-170). No
xncml wheel ships in this sandbox, so this module re-derives the subset of
that translation the STAC pipeline consumes — verified byte-for-byte
against the reference's checked-in ``to_cf_dict`` outputs
(tests/data/{rdps,hrdps_*,cordex6_ncml}.json) and the golden item
(tests/data/stac_item_testdata_xclim_cmip6_ncml.json):

- global ``<attribute>`` elements → ``attributes`` (typed: xncml parses
  ``type="float"`` as numpy float32 — widening float32("359.99493") to
  float64 yields 359.99493408203125, which is exactly where the golden
  item's bbox digits come from);
- ``<group name=...>`` → ``groups.<name>.attributes`` (CFMetadata carries
  the geospatial_*/time_coverage_* values, NCISOMetadata the iso info);
- ``<dimension>`` → ``dimensions`` {name: length};
- ``<variable>`` → ``variables`` {name: {type, shape: [dims], attributes}};
- ``@location`` from the root element's ``location`` attribute.

Pure python/ElementTree — this is dimension-side metadata parsing (one
document per THREDDS dataset), applied per-row inside mapInPandas batches
by sources.cfattrs-style operators, never on the page fact table.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

_NS = "{http://www.unidata.ucar.edu/namespaces/netcdf/ncml-2.2}"


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_value(value: str | None, vtype: str | None):
    """Typed NcML attribute value, mirroring xncml's numpy-backed parsing.

    float → np.float32 (the float32→float64 widening artifact is part of
    the reference's golden output); double → float; int/uint/short/long →
    int. Whitespace-separated numeric values become lists.
    """
    if value is None:
        return None
    t = (vtype or "String").lower()
    if t in ("string", "char"):
        return value
    parts = value.split()
    if t == "float":
        out = [float(np.float32(p)) for p in parts]
    elif t == "double":
        out = [float(p) for p in parts]
    elif t in ("int", "uint", "short", "ushort", "long", "ulong", "byte", "ubyte"):
        out = [int(p) for p in parts]
    else:
        return value
    if not out:
        return None
    return out[0] if len(out) == 1 else out


def _attrs_of(elem) -> dict:
    out = {}
    for child in elem:
        if _localname(child.tag) != "attribute":
            continue
        name = child.attrib.get("name")
        out[name] = _parse_value(child.attrib.get("value"), child.attrib.get("type"))
    return out


def ncml_to_cf_dict(text: str) -> dict:
    """NcML XML text → CF dict in the reference's ``to_cf_dict`` shape."""
    root = ET.fromstring(text)
    doc: dict = {
        "@location": root.attrib.get("location", ""),
        "@xmlns": {"": _NS.strip("{}")},
        "attributes": _attrs_of(root),
        "dimensions": {},
        "groups": {},
        "variables": {},
    }
    for child in root:
        tag = _localname(child.tag)
        if tag == "dimension":
            try:
                doc["dimensions"][child.attrib["name"]] = int(child.attrib.get("length", 0))
            except ValueError:
                doc["dimensions"][child.attrib["name"]] = child.attrib.get("length")
        elif tag == "group":
            doc["groups"][child.attrib.get("name")] = {"attributes": _attrs_of(child)}
        elif tag == "variable":
            name = child.attrib.get("name")
            doc["variables"][name] = {
                "type": child.attrib.get("type"),
                "shape": (child.attrib.get("shape") or "").split(),
                "attributes": _attrs_of(child),
            }
    return doc
