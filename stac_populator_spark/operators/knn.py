"""kNN item-to-item matching (J6 in SURVEY.md §2.4).

Scale design: a brute-force kNN is O(n²) shuffle — impossible at 10^12
rows. Instead we bucket items by hex cell at a chosen resolution and
self-join each item against items in its cell's k-ring neighborhood:

    left:  (id, lon, lat, cell)           — exploded to its k-ring cells
    right: (id, lon, lat, cell)           — partitioned by cell
    join on cell  →  candidate pairs  →  haversine distance
    →  Window.partitionBy(left_id).orderBy(dist, right_id) rank ≤ k

The join key (hex cell) is data-skewed (cities vs oceans) — `salt_keys`
(operators.skew) + AQE skew-join handle the hot cells. The k-ring radius
bounds the search; items whose true k-th neighbor lies beyond the ring get
their ring-local top-k (documented approximation; `knn_bruteforce` is the
exact oracle used by tests and small data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.geometry import haversine_km
from ..functions.hexgrid import hex_cell, hex_kring


@pandas_udf(T.DoubleType())
def haversine_udf(lon1: pd.Series, lat1: pd.Series, lon2: pd.Series, lat2: pd.Series) -> pd.Series:
    return pd.Series(haversine_km(lon1.to_numpy(), lat1.to_numpy(), lon2.to_numpy(), lat2.to_numpy()))


def _kring_schema():
    return T.ArrayType(T.LongType())


def kring_udf(radius: int):
    @pandas_udf(_kring_schema())
    def _udf(cell: pd.Series) -> pd.Series:
        cells = cell.to_numpy(dtype=np.int64)
        rings = hex_kring(cells, radius)
        return pd.Series(list(rings))

    return _udf


def hex_cell_at_res(res: int):
    @pandas_udf(T.LongType())
    def _udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(hex_cell(lon.to_numpy(), lat.to_numpy(), res))

    return _udf


def knn_join(
    items: DataFrame,
    k: int = 3,
    res: int = 4,
    radius: int = 1,
    id_col: str = "id",
) -> DataFrame:
    """Cell-bucketed approximate kNN. Returns (id, neighbor_id, dist_km,
    rank). ``res`` picks the bucket size (res 4 hexes ≈ 35 km edge on the
    compat grid); choose so the expected k-th neighbor distance ≪ ring
    extent."""
    pts = (
        items.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())
        .select(
            F.col(id_col).alias("id"),
            "lon",
            "lat",
            hex_cell_at_res(res)(F.col("lon"), F.col("lat")).alias("cell"),
        )
    )
    left = pts.select(
        F.col("id").alias("l_id"),
        F.col("lon").alias("l_lon"),
        F.col("lat").alias("l_lat"),
        F.explode(kring_udf(radius)(F.col("cell"))).alias("cell"),
    )
    right = pts.select(
        F.col("id").alias("r_id"),
        F.col("lon").alias("r_lon"),
        F.col("lat").alias("r_lat"),
        "cell",
    )
    pairs = (
        left.join(right, "cell")
        .filter(F.col("l_id") != F.col("r_id"))
        .withColumn("dist_km", haversine_udf("l_lon", "l_lat", "r_lon", "r_lat"))
    )
    w = Window.partitionBy("l_id").orderBy(F.col("dist_km").asc(), F.col("r_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("l_id").alias("id"), F.col("r_id").alias("neighbor_id"), "dist_km", "rank")
    )


def knn_join_salted(
    items: DataFrame,
    k: int = 3,
    res: int = 4,
    radius: int = 1,
    id_col: str = "id",
    n_salts: int = 8,
    hot_threshold: int = 1000,
) -> DataFrame:
    """Skew-aware kNN (J8): identical results to :func:`knn_join`, but the
    candidate join splits *hot* cells into ``n_salts`` deterministic
    sub-keys so no single task owns a megacity cell.

    Mechanics: hot cells (right-side rows > hot_threshold) are detected
    with one cheap count; the right side gets
    ``salt = pmod(xxhash64(id), n_salts)``, the left (k-ring-exploded)
    side explodes each *hot* neighbor cell into all n_salts sub-keys and
    keeps salt=0 for cold cells. Join key = (cell, salt). Salting is
    hash-derived — rerun/retry identical (no rand()).
    """
    pts = (
        items.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())
        .select(
            F.col(id_col).alias("id"),
            "lon",
            "lat",
            hex_cell_at_res(res)(F.col("lon"), F.col("lat")).alias("cell"),
        )
    )
    hot = pts.groupBy("cell").count().filter(F.col("count") > hot_threshold).select(
        "cell", F.lit(True).alias("is_hot")
    )

    right = (
        pts.join(F.broadcast(hot), "cell", "left")
        .withColumn(
            "salt",
            F.when(F.col("is_hot"), F.pmod(F.xxhash64("id"), F.lit(n_salts))).otherwise(F.lit(0)),
        )
        .select(
            F.col("id").alias("r_id"),
            F.col("lon").alias("r_lon"),
            F.col("lat").alias("r_lat"),
            "cell",
            "salt",
        )
    )
    left = (
        pts.select(
            F.col("id").alias("l_id"),
            F.col("lon").alias("l_lon"),
            F.col("lat").alias("l_lat"),
            F.explode(kring_udf(radius)(F.col("cell"))).alias("cell"),
        )
        .join(F.broadcast(hot), "cell", "left")
        .withColumn(
            "salt",
            F.explode(
                F.when(F.col("is_hot"), F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(
                    F.array(F.lit(0))
                )
            ),
        )
    )
    pairs = (
        left.join(right, ["cell", "salt"])
        .filter(F.col("l_id") != F.col("r_id"))
        .withColumn("dist_km", haversine_udf("l_lon", "l_lat", "r_lon", "r_lat"))
    )
    w = Window.partitionBy("l_id").orderBy(F.col("dist_km").asc(), F.col("r_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("l_id").alias("id"), F.col("r_id").alias("neighbor_id"), "dist_km", "rank")
    )


def knn_join_exact(
    items: DataFrame,
    k: int = 3,
    res: int = 4,
    radius: int = 1,
    id_col: str = "id",
) -> DataFrame:
    """EXACT kNN at scale: ring-local pass, then a per-point distance
    guarantee decides who is done; the (few) unsatisfied points get a
    targeted broadcast brute-force pass.

    Guarantee math (equirectangular hex grid, edge e degrees): any point
    in a cell at hex-distance ≥ radius+1 from p's cell lies at least
    ``D_deg = max(1.5·e·(radius+1) − 2e, e·radius·√3/2)`` degrees from p
    (center spacing ≥ 1.5e per hex step, ±e circumradius each side).
    A neighbor at d km can be at most ``d / (111.32·cos(|lat|+D_deg))``
    degrees away, so a point is *proven complete* when it has ≥ k ring
    candidates and its k-th distance satisfies that bound. Everyone else —
    typically isolated points, a vanishing fraction of a web-scale corpus —
    is re-solved exactly: broadcast(unsatisfied) × all points.
    """
    from ..functions.hexgrid import edge_deg

    pts = items.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull()).select(
        F.col(id_col).alias("id"), "lon", "lat"
    )
    ring = knn_join(pts, k=k, res=res, radius=radius, id_col="id")

    e = edge_deg(res)
    d_deg_safe = max(1.5 * e * (radius + 1) - 2.0 * e, e * radius * (3.0 ** 0.5) / 2.0)

    per_point = ring.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_found"), F.max("dist_km").alias("kth_km")
    )
    stats = pts.join(per_point, "id", "left")
    lat_margin = F.least(F.abs(F.col("lat")) + F.lit(d_deg_safe), F.lit(89.0))
    required_deg = F.col("kth_km") / (F.lit(111.32) * F.cos(F.radians(lat_margin)))
    # the guarantee treats lon as an unwrapped axis while haversine wraps at
    # ±180: a point near the antimeridian (or a pole) may have a closer
    # cross-seam neighbor its k-ring never saw — those points are never
    # 'proven complete' and always take the exact pass. Seam margin =
    # 2·e·(radius+1) degrees (ring extent + one cell of slack); at the poles
    # the lon metric degenerates, same margin on |lat|.
    seam_margin = 2.0 * e * (radius + 1)
    near_seam = (F.abs(F.col("lon")) >= F.lit(180.0 - seam_margin)) | (
        F.abs(F.col("lat")) >= F.lit(90.0 - seam_margin)
    )
    satisfied = (F.col("n_found") >= k) & (required_deg <= F.lit(d_deg_safe)) & ~near_seam
    unsat = stats.filter(~F.coalesce(satisfied, F.lit(False))).select("id", "lon", "lat")

    done = ring.join(unsat.select("id"), "id", "left_anti")

    # targeted exact pass: broadcast the (small) unsatisfied side
    l = unsat.select(F.col("id").alias("l_id"), F.col("lon").alias("l_lon"), F.col("lat").alias("l_lat"))
    r = pts.select(F.col("id").alias("r_id"), F.col("lon").alias("r_lon"), F.col("lat").alias("r_lat"))
    pairs = (
        r.join(F.broadcast(l))
        .filter(F.col("l_id") != F.col("r_id"))
        .withColumn("dist_km", haversine_udf("l_lon", "l_lat", "r_lon", "r_lat"))
    )
    w = Window.partitionBy("l_id").orderBy(F.col("dist_km").asc(), F.col("r_id").asc())
    redo = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("l_id").alias("id"), F.col("r_id").alias("neighbor_id"), "dist_km", "rank")
    )
    return done.unionByName(redo)


def knn_bruteforce(items: DataFrame, k: int = 3, id_col: str = "id") -> DataFrame:
    """Exact O(n²) kNN via cross-join — the correctness oracle for small
    inputs (FIXTURES.md §4); never run at scale."""
    pts = items.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull()).select(
        F.col(id_col).alias("id"), "lon", "lat"
    )
    l = pts.select(F.col("id").alias("l_id"), F.col("lon").alias("l_lon"), F.col("lat").alias("l_lat"))
    r = pts.select(F.col("id").alias("r_id"), F.col("lon").alias("r_lon"), F.col("lat").alias("r_lat"))
    pairs = (
        l.crossJoin(r)
        .filter(F.col("l_id") != F.col("r_id"))
        .withColumn("dist_km", haversine_udf("l_lon", "l_lat", "r_lon", "r_lat"))
    )
    w = Window.partitionBy("l_id").orderBy(F.col("dist_km").asc(), F.col("r_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("l_id").alias("id"), F.col("r_id").alias("neighbor_id"), "dist_km", "rank")
    )
