"""Directory STAC source: nearest-ancestor containment, nested-collection
skip, prune, duplicate-collection and not-an-item filters — the exact tree
from the reference's docstring (/root/reference/STACpopulator/
input.py:190-214) plus negative cases patterned on
/root/reference/tests/data/test_directory."""

import json
import os

import pytest

from stac_populator_spark.sources.directory import load_collections, load_items


def _write(p, doc):
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        json.dump(doc, f)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("catalog"))
    C = {"type": "Collection", "id": "c"}
    I = {"type": "Feature", "id": "i"}
    _write(f"{root}/collection1/collection.json", C | {"id": "c1"})
    _write(f"{root}/collection1/item1.json", I | {"id": "i1"})
    _write(f"{root}/collection1/collection2/collection.json", C | {"id": "c2"})
    _write(f"{root}/collection1/collection2/item2.json", I | {"id": "i2"})
    _write(f"{root}/collection3/collection.json", C | {"id": "c3"})
    _write(f"{root}/collection3/item3.json", I | {"id": "i3"})
    _write(f"{root}/collection3/collection3-subdir/item3b.json", I | {"id": "i3b"})
    # negative cases
    _write(f"{root}/collection3/not-an-item.json", I | {"id": "bad-name"})      # fname filter
    _write(f"{root}/collection3/item-not-feature.json", C | {"id": "bad-type"})  # type filter
    _write(f"{root}/loose/item-loose.json", I | {"id": "loose"})                 # no collection above
    return root


def _by_id(rows):
    return {json.loads(r["value"])["id"]: r for r in rows}


def test_items_nearest_ancestor(spark, tree):
    rows = load_items(spark, tree).collect()
    got = _by_id(rows)
    # i2 is under a nested collection dir → skipped entirely (input.py:269-276)
    assert set(got) == {"i1", "i3", "i3b", "loose"}
    assert got["i1"]["collection_dir"].endswith("/collection1")
    assert got["i3"]["collection_dir"].endswith("/collection3")
    # subdir item belongs to the nearest ancestor collection
    assert got["i3b"]["collection_dir"].endswith("/collection3")
    assert got["loose"]["collection_dir"] is None


def test_items_prune(spark, tree):
    rows = load_items(spark, tree, prune=True).collect()
    got = _by_id(rows)
    # prune: nothing below a collection dir is visited → i3b gone
    assert set(got) == {"i1", "i3", "loose"}


def test_collections(spark, tree):
    rows = load_collections(spark, tree).collect()
    ids = {json.loads(r["value"])["id"] for r in rows}
    assert ids == {"c1", "c2", "c3"}
    pruned = {json.loads(r["value"])["id"] for r in load_collections(spark, tree, prune=True).collect()}
    assert pruned == {"c1", "c3"}  # nested c2 not visited under prune


def test_duplicate_collection_file_first_wins(spark, tmp_path):
    root = str(tmp_path)
    _write(f"{root}/c/collection.json", {"type": "Collection", "id": "a"})
    _write(f"{root}/c/collection.geojson", {"type": "Collection", "id": "b"})
    rows = load_collections(spark, root, collection_pattern=r"collection\.(geo)?json$").collect()
    assert len(rows) == 1
    # smallest filename wins (reference order is OS-dependent; ours is pinned)
    assert json.loads(rows[0]["value"])["id"] == "b"  # collection.geojson < collection.json
