"""cube:dimensions / cube:variables dict assembly from CF metadata —
reference-faithful port of DataCubeHelper (/root/reference/STACpopulator/
extensions/datacube.py:144-284), verified against the reference's own
expected dicts over its checked-in NcML files
(tests/test_cmip6_datacube.py:60-125) by tests/test_cubedict_golden.py.

The coordinate criteria table is cf-xarray's public coordinate-detection
table (the reference embeds the same data, datacube.py:30-142). Two
reference behaviors are reproduced deliberately:

- the criteria loop does NOT break on first match, so a later-matching key
  OVERWRITES an earlier one (a latitude variable with ``axis: Y`` ends up
  under the "Y" projection criteria — which is why the reference's own
  expected description for ``lat`` is "projection_y_coordinate");
- bounds variables always get the generated description (the reference's
  ``"description" not in "attrs"`` checks string membership — always
  true — so the description is always set).

This is dimension-side metadata work (one dict per dataset); the fact-side
Spark classification lives in operators/datacube.py.
"""

from __future__ import annotations

from typing import Any

from ..functions.crs import crs_axis_units, crs_reference_system, x_is_longitude

AXIS = {"X": "x", "Y": "y", "Z": "z", "T": None,
        "longitude": "x", "latitude": "y", "vertical": "z", "time": "t"}

_Z_NAMES = (
    "model_level_number", "atmosphere_ln_pressure_coordinate",
    "atmosphere_sigma_coordinate", "atmosphere_hybrid_sigma_pressure_coordinate",
    "atmosphere_hybrid_height_coordinate", "atmosphere_sleve_coordinate",
    "ocean_sigma_coordinate", "ocean_s_coordinate", "ocean_s_coordinate_g1",
    "ocean_s_coordinate_g2", "ocean_sigma_z_coordinate",
    "ocean_double_sigma_coordinate",
)
_VERT_NAMES = (
    "air_pressure", "height", "depth", "geopotential_height", "altitude",
    "height_above_geopotential_datum", "height_above_reference_ellipsoid",
    "height_above_mean_sea_level",
)

# cf-xarray coordinate criteria (public table; same data the reference embeds)
CRITERIA: dict[str, dict[str, tuple]] = {
    "latitude": {
        "standard_name": ("latitude",),
        "units": ("degree_north", "degree_N", "degreeN", "degrees_north",
                  "degrees_N", "degreesN"),
        "_CoordinateAxisType": ("Lat",),
        "long_name": ("latitude",),
    },
    "longitude": {
        "standard_name": ("longitude",),
        "units": ("degree_east", "degree_E", "degreeE", "degrees_east",
                  "degrees_E", "degreesE"),
        "_CoordinateAxisType": ("Lon",),
        "long_name": ("longitude",),
    },
    "Z": {
        "standard_name": _Z_NAMES,
        "_CoordinateAxisType": ("GeoZ", "Height", "Pressure"),
        "axis": ("Z",),
        "cartesian_axis": ("Z",),
        "grads_dim": ("z",),
        "long_name": _Z_NAMES,
    },
    "vertical": {
        "standard_name": _VERT_NAMES,
        "positive": ("up", "down"),
        "long_name": _VERT_NAMES,
    },
    "X": {
        "standard_name": ("projection_x_coordinate", "grid_longitude",
                          "projection_x_angular_coordinate"),
        "_CoordinateAxisType": ("GeoX",),
        "axis": ("X",),
        "cartesian_axis": ("X",),
        "grads_dim": ("x",),
        "long_name": ("projection_x_coordinate", "grid_longitude",
                      "projection_x_angular_coordinate",
                      "cell index along first dimension"),
    },
    "Y": {
        "standard_name": ("projection_y_coordinate", "grid_latitude",
                          "projection_y_angular_coordinate"),
        "_CoordinateAxisType": ("GeoY",),
        "axis": ("Y",),
        "cartesian_axis": ("Y",),
        "grads_dim": ("y",),
        "long_name": ("projection_y_coordinate", "grid_latitude",
                      "projection_y_angular_coordinate",
                      "cell index along second dimension"),
    },
    "T": {
        "standard_name": ("time",),
        "_CoordinateAxisType": ("Time",),
        "axis": ("T",),
        "cartesian_axis": ("T",),
        "grads_dim": ("t",),
        "long_name": ("time",),
    },
    "time": {
        "standard_name": ("time",),
        "_CoordinateAxisType": ("Time",),
        "axis": ("T",),
        "cartesian_axis": ("T",),
        "grads_dim": ("t",),
        "long_name": ("time",),
    },
}


def _scalar(v):
    if isinstance(v, list):
        return v[0] if v else None
    return v


def _geo(attrs: dict) -> dict:
    """GeoData.from_ncattrs essentials: raw axis extents/resolutions,
    per-axis units from the CRS, CRS precedence (stac_utils.py:144-181)."""
    cf = attrs["groups"]["CFMetadata"]["attributes"]
    sp = attrs.get("@stac-populator") or {}
    has_vert = any("_vertical_" in a for a in cf)
    crs_spec = (
        sp.get("force_crs")
        or cf.get("geospatial_bounds_crs")
        or sp.get("fallback_crs")
        or ("EPSG:4979" if has_vert else "EPSG:4326")
    )
    x_name = "lon" if x_is_longitude(crs_spec) else "lat"
    out: dict[str, Any] = {"crs": crs_spec}
    units = crs_axis_units(crs_spec)
    for axis in ("lat", "lon", "vertical"):
        key = "z" if axis == "vertical" else ("x" if axis == x_name else "y")
        vals = [
            _scalar(cf.get(f"geospatial_{axis}_min")),
            _scalar(cf.get(f"geospatial_{axis}_max")),
        ]
        out[key] = None if vals == [None, None] else [float(v) for v in vals]
        res = _scalar(cf.get(f"geospatial_{axis}_resolution"))
        out[f"{key}_resolution"] = None if res is None else float(res)
    for i, key in enumerate(("x", "y", "z")):
        out[f"{key}_units"] = units[i] if i < len(units) else None
    return out


def cube_dimensions(attrs: dict) -> dict:
    """``cube:dimensions`` dict (datacube.py:153-207 semantics)."""
    geo = _geo(attrs)
    ref_sys = crs_reference_system(geo["crs"])
    cf = attrs["groups"]["CFMetadata"]["attributes"]
    dims: dict[str, dict] = {}
    for name, length in (attrs.get("dimensions") or {}).items():
        v = (attrs.get("variables") or {}).get(name)
        if not v:
            continue
        vattrs = v.get("attributes", {}) or {}
        for key, criteria in CRITERIA.items():  # no break: later keys overwrite
            for criterion, expected in criteria.items():
                if vattrs.get(criterion, None) in expected:
                    axis = AXIS[key]
                    spatial = axis in ("x", "y", "z")
                    unit = step = None
                    if v.get("type") == "int":
                        extent: Any = [0, int(length)]
                    elif key == "X":
                        extent, unit, step = geo["x"], geo["x_units"], geo["x_resolution"]
                    elif key == "Y":
                        extent, unit, step = geo["y"], geo["y_units"], geo["y_resolution"]
                    elif key in ("T", "time"):
                        extent = [cf["time_coverage_start"], cf["time_coverage_end"]]
                    elif key in ("Z", "vertical") and geo["z"]:
                        extent, unit, step = geo["z"], geo["z_units"], geo["z_resolution"]
                    else:
                        extent = [None, None]
                    props: dict[str, Any] = {
                        "type": "spatial" if spatial else "temporal",
                        "extent": extent,
                    }
                    desc = v.get("description", v.get("long_name", criteria["standard_name"][0]))
                    if desc is not None:
                        props["description"] = desc
                    if spatial:
                        props["axis"] = axis
                        props["reference_system"] = ref_sys
                    if unit is not None:
                        props["unit"] = unit
                    if step is not None:
                        props["step"] = step
                    dims[name] = props
    return dims


def _is_coordinate(vattrs: dict) -> bool:
    for criteria in CRITERIA.values():
        for criterion, expected in criteria.items():
            if vattrs.get(criterion, None) in expected:
                return True
    return False


def cube_variables(attrs: dict) -> dict:
    """``cube:variables`` dict (datacube.py:209-250 semantics)."""
    variables = {}
    bounds = {}
    for name, meta in (attrs.get("variables") or {}).items():
        va = meta.get("attributes", {}) or {}
        if "bounds" in va:
            bounds[va["bounds"]] = name
    for name, meta in (attrs.get("variables") or {}).items():
        if name in (attrs.get("dimensions") or {}):
            continue
        va = dict(meta.get("attributes", {}) or {})
        if name in bounds:
            dtype = "auxiliary"
            if "units" not in va:
                owner = (attrs["variables"].get(bounds[name]) or {}).get("attributes", {}) or {}
                if owner.get("units") is not None:
                    va["units"] = owner["units"]
            # reference's membership check is always true → always set
            va["description"] = f"bounds for the {bounds[name]} coordinate"
        elif _is_coordinate(va):
            dtype = "auxiliary"
        else:
            dtype = "data"
        shape = meta.get("shape", [])
        variables[name] = {
            "dimensions": [] if shape == [""] else shape,
            "type": dtype,
            "description": va.get("description", va.get("long_name", "")),
            "unit": va.get("units", ""),
        }
    return variables
