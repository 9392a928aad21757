"""Directory STAC source: filesystem tree of collection/item JSON files →
DataFrames, with the reference's containment rules re-expressed as joins.

Reference semantics (STACDirectoryLoader, /root/reference/STACpopulator/
input.py:190-283):

- a dir containing a file matching ``collection_pattern`` with
  ``type == "Collection"`` is a *collection dir*; extra collection files in
  the same dir are ignored (first wins — we take the lexicographically
  smallest name; the reference's order is os.walk-dependent and its tests
  are order-insensitive, tests/test_directory_loader.py:113-115);
- item mode: files matching ``item_pattern`` with ``type == "Feature"``
  belong to the *nearest ancestor* collection dir (J2 in SURVEY.md §2.4);
- items under a **nested** collection dir (one that itself has an ancestor
  collection dir) are skipped entirely (input.py:269-276);
- ``prune=True``: nothing below a collection dir is visited — an item
  survives only if its own dir *is* the nearest collection dir, and nested
  collection dirs disappear (input.py:274-276).

Spark shape: one ``spark.read.text(wholetext)`` scan over the tree; the
collection-dir dimension is tiny → every containment rule is a broadcast
prefix-join + window, never a shuffle of the item side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ITEM_PATTERN = r"item.*\.(geo)?json$"
COLLECTION_PATTERN = r"collection\.json$"


def _read_tree(spark: SparkSession, root: str) -> DataFrame:
    """(path, dir, fname, value, type) for every .json file under root."""
    df = (
        spark.read.option("wholetext", True)
        .option("recursiveFileLookup", True)
        .option("pathGlobFilter", "*json")  # .json AND .geojson; exact
        # filename filtering happens via the anchored regex below
        .text(root)
        .withColumn("path", F.input_file_name())
    )
    return df.select(
        F.regexp_replace("path", r"^file:", "").alias("path"),
        F.col("value"),
    ).select(
        "path",
        F.regexp_extract("path", r"^(.*)/[^/]+$", 1).alias("dir"),
        F.regexp_extract("path", r"([^/]+)$", 1).alias("fname"),
        "value",
        F.get_json_object("value", "$.type").alias("type"),
    )


def collection_dirs_df(files: DataFrame, collection_pattern: str = COLLECTION_PATTERN) -> DataFrame:
    """One row per collection dir: (dir, path, value). First (smallest
    fname) collection file per dir wins."""
    # reference matches with re.match (anchored at start, input.py:238-242)
    cols = files.filter(
        F.col("fname").rlike(f"^(?:{collection_pattern})") & (F.col("type") == "Collection")
    )
    w = Window.partitionBy("dir").orderBy(F.col("fname").asc())
    return cols.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def _shadowed(col_dirs: DataFrame) -> DataFrame:
    """Collection dirs having a strict-ancestor collection dir (nested)."""
    a = col_dirs.select(F.col("dir").alias("anc"))
    return (
        col_dirs.join(
            F.broadcast(a),
            F.col("dir").startswith(F.concat(F.col("anc"), F.lit("/"))),
            "left_semi",
        )
        .select("dir")
        .withColumn("nested", F.lit(True))
    )


def load_collections(spark: SparkSession, root: str,
                     collection_pattern: str = COLLECTION_PATTERN,
                     prune: bool = False) -> DataFrame:
    files = _read_tree(spark, root)
    cd = collection_dirs_df(files, collection_pattern)
    if prune:
        cd = cd.join(F.broadcast(_shadowed(cd)), "dir", "left_anti")
    return cd.select("path", "dir", "value")


def load_items(
    spark: SparkSession,
    root: str,
    item_pattern: str = ITEM_PATTERN,
    collection_pattern: str = COLLECTION_PATTERN,
    prune: bool = False,
) -> DataFrame:
    """Items with their owning collection dir (null = no ancestor
    collection). Returns (path, dir, value, collection_dir)."""
    files = _read_tree(spark, root)
    cd = collection_dirs_df(files, collection_pattern)
    shadowed = _shadowed(cd)

    items = files.filter(
        F.col("fname").rlike(f"^(?:{item_pattern})") & (F.col("type") == "Feature")
    ).select("path", "dir", "value")

    # nearest-ancestor containment: broadcast join "item dir is inside the
    # collection dir", keep the longest (deepest) match per item
    cdirs = cd.select(F.col("dir").alias("collection_dir"))
    j = items.join(
        F.broadcast(cdirs),
        (F.col("dir") == F.col("collection_dir"))
        | F.col("dir").startswith(F.concat(F.col("collection_dir"), F.lit("/"))),
        "left",
    )
    w = Window.partitionBy("path").orderBy(F.length("collection_dir").desc_nulls_last())
    nearest = j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    # nested-collection subtrees are skipped entirely (input.py:269-276)
    out = nearest.join(
        F.broadcast(shadowed.withColumnRenamed("dir", "collection_dir")),
        "collection_dir",
        "left_anti",
    )
    if prune:
        # nothing below a collection dir is visited: the item's own dir must
        # BE its nearest collection dir (or it has no collection ancestor)
        out = out.filter(
            F.col("collection_dir").isNull() | (F.col("dir") == F.col("collection_dir"))
        )
    return out.select("path", "dir", "value", "collection_dir")
