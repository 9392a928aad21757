"""cube: extension derivation — dimension classification, data/auxiliary
variable split, bounds-unit inheritance (DataCubeHelper, /root/reference/
STACpopulator/extensions/datacube.py:153-271, criteria table
datacube.py:30-142, bounds reverse map datacube.py:252-259 = J4 in
SURVEY.md §2.4).

Input column shape: ``vars ARRAY<STRUCT<name, standard_name, units, axis,
bounds>>`` (one entry per netCDF-ish variable). Everything is JVM
higher-order functions (filter/transform/exists) — the per-item "reverse
join" of bounds→owner is an in-array lookup exactly like the reference's
in-dict lookup, no shuffle.

Classification rules (simplified faithfully from the cf-xarray criteria
the reference embeds):
- temporal: axis 'T' | standard_name 'time' | units containing ' since '
- horizontal spatial: axis 'X'/'Y' | standard_name latitude/longitude |
  units degrees_east/degrees_north
- vertical spatial: axis 'Z' | standard_name air_pressure/height/depth |
  units Pa/hPa/m level-ish
- auxiliary variable: classified as a coordinate (any rule above) or
  referenced by another variable's ``bounds``
- bounds variables inherit the owning coordinate's units when their own
  are missing (datacube.py:222-232)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_temporal(v) -> F.Column:
    return (
        (F.upper(F.coalesce(v["axis"], F.lit(""))) == "T")
        | (F.lower(F.coalesce(v["standard_name"], F.lit(""))) == "time")
        | F.coalesce(v["units"], F.lit("")).contains(" since ")
    )


def _is_x(v) -> F.Column:
    return (
        (F.upper(F.coalesce(v["axis"], F.lit(""))) == "X")
        | (F.lower(F.coalesce(v["standard_name"], F.lit(""))) == "longitude")
        | (F.lower(F.coalesce(v["units"], F.lit(""))) == "degrees_east")
    )


def _is_y(v) -> F.Column:
    return (
        (F.upper(F.coalesce(v["axis"], F.lit(""))) == "Y")
        | (F.lower(F.coalesce(v["standard_name"], F.lit(""))) == "latitude")
        | (F.lower(F.coalesce(v["units"], F.lit(""))) == "degrees_north")
    )


def _is_vertical(v) -> F.Column:
    sn = F.lower(F.coalesce(v["standard_name"], F.lit("")))
    units = F.lower(F.coalesce(v["units"], F.lit("")))
    return (
        (F.upper(F.coalesce(v["axis"], F.lit(""))) == "Z")
        | sn.isin("air_pressure", "height", "depth", "altitude", "geopotential_height")
        | units.isin("pa", "hpa", "mbar", "millibar", "level", "sigma_level")
    )


def _is_coordinate(v) -> F.Column:
    """is_coordinate heuristic (datacube.py:261-271)."""
    return _is_temporal(v) | _is_x(v) | _is_y(v) | _is_vertical(v)


def _dim_type(v) -> F.Column:
    return (
        F.when(_is_temporal(v), F.lit("temporal"))
        .when(_is_x(v) | _is_y(v) | _is_vertical(v), F.lit("spatial"))
        .otherwise(F.lit(None).cast("string"))
    )


def _dim_axis(v) -> F.Column:
    return (
        F.when(_is_temporal(v), F.lit("t"))
        .when(_is_x(v), F.lit("x"))
        .when(_is_y(v), F.lit("y"))
        .when(_is_vertical(v), F.lit("z"))
        .otherwise(F.lit(None).cast("string"))
    )


def cube_dimensions(vars_col: F.Column) -> F.Column:
    """array<struct<name, type, axis, unit>> for coordinate variables only
    (DataCubeHelper.dimensions, datacube.py:153-206)."""
    coords = F.filter(vars_col, _is_coordinate)
    return F.transform(
        coords,
        lambda v: F.struct(
            v["name"].alias("name"),
            _dim_type(v).alias("type"),
            _dim_axis(v).alias("axis"),
            v["units"].alias("unit"),
        ),
    )


def _is_bounds_of_any(vars_col: F.Column, v) -> F.Column:
    return F.exists(
        vars_col, lambda o: F.coalesce(o["bounds"], F.lit("")) == v["name"]
    )


def cube_variables(vars_col: F.Column) -> F.Column:
    """array<struct<name, var_type, unit>> — data vs auxiliary split with
    bounds-unit inheritance (datacube.py:208-259)."""
    def owner_units(v):
        owners = F.filter(vars_col, lambda o: F.coalesce(o["bounds"], F.lit("")) == v["name"])
        return F.element_at(owners, 1)["units"]

    return F.transform(
        vars_col,
        lambda v: F.struct(
            v["name"].alias("name"),
            F.when(
                _is_coordinate(v) | _is_bounds_of_any(vars_col, v), F.lit("auxiliary")
            )
            .otherwise(F.lit("data"))
            .alias("var_type"),
            F.coalesce(
                F.when(F.length(F.coalesce(v["units"], F.lit(""))) > 0, v["units"]),
                F.when(_is_bounds_of_any(vars_col, v), owner_units(v)),
            ).alias("unit"),
        ),
    )


def with_datacube(df: DataFrame, vars_col: str = "vars") -> DataFrame:
    """Append cube_dimensions / cube_variables columns."""
    return df.withColumn("cube_dimensions", cube_dimensions(F.col(vars_col))).withColumn(
        "cube_variables", cube_variables(F.col(vars_col))
    )
