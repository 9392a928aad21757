"""Catalog preflight (P24) — the reference aborts a run when the STAC host
is unreachable or runs a different STAC version
(/root/reference/STACpopulator/api_requests.py:14-44 — GET the catalog,
require type=="Catalog" and a matching stac_version). The Spark engine's
"host" is the output catalog location (a directory / table root with a
``catalog.json``); the same three checks run driver-side before any job is
submitted, so a misconfigured destination fails in milliseconds instead of
after a cluster-scale write."""

from __future__ import annotations

import json
import os

ENGINE_STAC_VERSION = "1.0.0"


def catalog_info(root: str) -> dict:
    """Parse <root>/catalog.json; {} when missing/unreadable (the
    reference's error-tolerant stac_host_catalog_info shape)."""
    path = os.path.join(root, "catalog.json")
    try:
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return {}


def host_reachable(root: str) -> bool:
    """True iff the destination holds a readable STAC Catalog document
    (api_requests.py:27-30)."""
    body = catalog_info(root)
    return body.get("type") == "Catalog" and "stac_version" in body


def version_match(root: str, engine_version: str = ENGINE_STAC_VERSION) -> bool:
    """True iff the catalog's stac_version equals the engine's
    (api_requests.py:33-44)."""
    return catalog_info(root).get("stac_version") == engine_version


def preflight(root: str, require_version: bool = True) -> tuple[bool, str]:
    """(ok, reason). Run before submitting any Spark job against ``root``."""
    if not host_reachable(root):
        return False, f"no STAC catalog at {root} (missing/invalid catalog.json)"
    if require_version and not version_match(root):
        got = catalog_info(root).get("stac_version")
        return False, f"stac_version mismatch: catalog={got} engine={ENGINE_STAC_VERSION}"
    return True, "ok"
