"""Raster-tile ↔ vector-footprint / item assignment (J7 in SURVEY.md §2.4).

Two operators:
- ``assign_items_to_tiles``: point/item → containing z-tile by pure
  arithmetic (floor division on the fixed grid) — zero joins, zero
  shuffles; the tile id is a derived column.
- ``assign_tiles_to_footprints``: tile bbox × footprint bbox intersection.
  The tile grid at z=7 is 16k rows and footprints are few hundred — both
  dims are broadcastable; at scale the *result* (assignments) is what's
  large, and it is produced without shuffling either input: tiles are
  covered by coarse grid cells and equi-joined to the footprint cover,
  then refined by closed-interval bbox intersection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TILE_LON_SPAN = 360.0
TILE_LAT_TOP = 85.0
TILE_LAT_SPAN = 170.0


def tile_xy_cols(z: int, lon=None, lat=None):
    """(tile_x, tile_y) column expressions for a point at zoom z —
    equirectangular grid over [-180,180]×[85,-85], matching
    datagen.tiles_pdf. Pure JVM arithmetic (whole-stage codegen)."""
    lon = F.col("lon") if lon is None else lon
    lat = F.col("lat") if lat is None else lat
    n = float(1 << z)
    x = F.floor((lon + F.lit(180.0)) / F.lit(TILE_LON_SPAN / n)).cast("int")
    y = F.floor((F.lit(TILE_LAT_TOP) - lat) / F.lit(TILE_LAT_SPAN / n)).cast("int")
    nmax = (1 << z) - 1
    x = F.least(F.greatest(x, F.lit(0)), F.lit(nmax))
    y = F.least(F.greatest(y, F.lit(0)), F.lit(nmax))
    return x, y


def assign_items_to_tiles(items: DataFrame, z: int = 7) -> DataFrame:
    """Append tile_x/tile_y/tile_id for each item's representative point."""
    x, y = tile_xy_cols(z)
    has = F.col("lon").isNotNull() & F.col("lat").isNotNull()
    return (
        items.withColumn("tile_x", F.when(has, x))
        .withColumn("tile_y", F.when(has, y))
        .withColumn(
            "tile_id",
            F.when(has, F.concat(F.lit(f"z{z}/x"), F.col("tile_x"), F.lit("/y"), F.col("tile_y"))),
        )
    )


def tile_pyramid(items: DataFrame, base_z: int = 7, value_col: str | None = None) -> DataFrame:
    """Tile-pyramid rollup: per-tile aggregates at every zoom 0..base_z.

    Input needs ``tile_x``/``tile_y`` at ``base_z`` (assign_items_to_tiles).
    One explode over the zoom levels + one groupBy — parent tile ids are
    bit-shifts of the base tile, so the whole pyramid is a single shuffle
    keyed on (z, x, y) with map-side partial aggregation (the hypertable-
    rollup shape: each finer level folds into coarser ones exactly).
    Returns (z, x, y, n_items[, sum_value]).
    """
    lv = items.filter(F.col("tile_x").isNotNull()).withColumn(
        "z", F.explode(F.sequence(F.lit(0), F.lit(base_z)))
    )
    # shiftrightunsigned's numBits arg must be a column expression via SQL
    x = F.expr(f"shiftrightunsigned(tile_x, {base_z} - z)").alias("x")
    y = F.expr(f"shiftrightunsigned(tile_y, {base_z} - z)").alias("y")
    aggs = [F.count(F.lit(1)).alias("n_items")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return lv.groupBy("z", x, y).agg(*aggs)


def assign_tiles_to_footprints(tiles: DataFrame, footprints: DataFrame) -> DataFrame:
    """(tile_id, collection_id) pairs where tile bbox intersects footprint
    bbox (closed intervals). Antimeridian-crossing footprints must be
    pre-split (spatial_join.footprint_cover handles that); here footprints
    come as (collection_id, f_lon_min, f_lat_min, f_lon_max, f_lat_max)."""
    t = tiles.select(
        "tile_id",
        F.element_at("bbox", 1).alias("t_lon_min"),
        F.element_at("bbox", 2).alias("t_lat_min"),
        F.element_at("bbox", 3).alias("t_lon_max"),
        F.element_at("bbox", 4).alias("t_lat_max"),
    )
    j = t.join(
        F.broadcast(footprints),
        (F.col("t_lon_min") <= F.col("f_lon_max"))
        & (F.col("t_lon_max") >= F.col("f_lon_min"))
        & (F.col("t_lat_min") <= F.col("f_lat_max"))
        & (F.col("t_lat_max") >= F.col("f_lat_min")),
    )
    return j.select("tile_id", "collection_id")
