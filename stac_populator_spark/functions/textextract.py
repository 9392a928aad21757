"""Deterministic HTML → text/metadata extraction kernel.

This is the graft analogue of the reference's per-dataset metadata fetch +
parse (THREDDSLoader.extract_metadata, /root/reference/STACpopulator/
input.py:152-170): instead of one NcML GET + xncml parse per item, a pure
pandas/numpy function processes an Arrow batch of page HTML at a time.

Hard invariant (driver input_hint): **byte-identical extracted text per
url**, independent of batch boundaries, partitioning, or parallelism level.
Every operation below is stateless per row (regex substitutions only), so
text extraction commutes with any repartitioning.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Tags whose content is dropped entirely (not just the tags).
_DROP_CONTENT = re.compile(
    r"(?is)<(script|style|noscript)\b[^>]*>.*?</\1\s*>",
)
_COMMENTS = re.compile(r"(?s)<!--.*?-->")
# Block-level tags become newlines so paragraph structure survives.
_BLOCK_TAGS = re.compile(
    r"(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|header|footer|title)\b[^>]*>"
)
_ANY_TAG = re.compile(r"(?s)<[^>]*>")
_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&nbsp;": " ",
}
_WS_RUN = re.compile(r"[ \t\r\f\v]+")
_NL_RUN = re.compile(r"\n\s*\n+")

# <meta name="geo.position" content="{lat};{lon}"> — the page-world analogue
# of the reference's CF geospatial_{lat,lon}_{min,max} attributes
# (/root/reference/STACpopulator/stac_utils.py:166-176).
_GEO_META = re.compile(
    r'(?i)<meta\s+name="geo\.position"\s+content="([^";]*);([^"]*)"'
)
_GEO_BOX_META = re.compile(
    r'(?i)<meta\s+name="geo\.box"\s+content="([^";]*);([^";]*);([^";]*);([^"]*)"'
)
_DATE_META = re.compile(r'(?i)<meta\s+name="date"\s+content="([^"]*)"')
_TITLE = re.compile(r"(?is)<title[^>]*>(.*?)</title>")


def extract_text(html: pd.Series) -> pd.Series:
    """HTML string Series → extracted plain text (deterministic, row-local).

    Pipeline: drop script/style/noscript + comments → block tags to
    newlines → strip remaining tags → decode the 6 common entities →
    collapse whitespace → strip.
    """
    s = html.fillna("")
    s = s.str.replace(_DROP_CONTENT, "", regex=True)
    s = s.str.replace(_COMMENTS, "", regex=True)
    s = s.str.replace(_BLOCK_TAGS, "\n", regex=True)
    s = s.str.replace(_ANY_TAG, " ", regex=True)
    for ent, ch in _ENTITIES.items():
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(_WS_RUN, " ", regex=True)
    s = s.str.replace(re.compile(r" ?\n ?"), "\n", regex=True)
    s = s.str.replace(_NL_RUN, "\n", regex=True)
    return s.str.strip()


def extract_page_fields(html: pd.Series) -> pd.DataFrame:
    """HTML string Series → DataFrame(lat, lon, lat_max, lon_max, meta_date,
    title, text).

    ``lat``/``lon`` come from ``geo.position`` (point pages); pages with a
    ``geo.box`` meta instead yield a bbox (lat..lat_max / lon..lon_max —
    lon may exceed lon_max when the box crosses the antimeridian, mirroring
    GeoData.crosses_antimeridian /root/reference/STACpopulator/
    stac_utils.py:183-186). Pages with neither yield NaN (null-geometry
    path, /root/reference/STACpopulator/collection_update.py:45-48).
    """
    s = html.fillna("")
    pos = s.str.extract(_GEO_META)
    box = s.str.extract(_GEO_BOX_META)
    lat = pd.to_numeric(pos[0], errors="coerce")
    lon = pd.to_numeric(pos[1], errors="coerce")
    blat = pd.to_numeric(box[0], errors="coerce")
    blon = pd.to_numeric(box[1], errors="coerce")
    blat2 = pd.to_numeric(box[2], errors="coerce")
    blon2 = pd.to_numeric(box[3], errors="coerce")
    lat = lat.where(lat.notna(), blat)
    lon = lon.where(lon.notna(), blon)
    out = pd.DataFrame(
        {
            "lat": lat.astype(np.float64),
            "lon": lon.astype(np.float64),
            "lat_max": blat2.astype(np.float64),
            "lon_max": blon2.astype(np.float64),
            "meta_date": s.str.extract(_DATE_META)[0],
            "title": s.str.extract(_TITLE)[0].str.strip(),
            "text": extract_text(s),
        }
    )
    return out
