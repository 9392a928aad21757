"""Uber-H3 optional-wheel seam (VERDICT r4 ask #5, mirrors the
PIL/soundfile/pyproj probes): cell_hex dispatches on
SPARK_GRAFT_HEX_BACKEND — icosa by default (deterministic ids every
oracle mirrors), real H3 ids when the env opts in AND the wheel exists.

Both branches are tested here: the absent branch for real (no h3 wheel
ships in this sandbox), the present branch through a fake module, and —
wherever a real wheel IS installed — behavioral parity (ids differ from
icosa by design; the OPERATIONS agree: k-ring sizes, same-cell
containment of near pairs, distinct cells for far pairs)."""

import numpy as np
import pytest

from stac_populator_spark.functions import icosa


@pytest.fixture(autouse=True)
def _reset_backend(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_HEX_BACKEND", raising=False)


def test_default_backend_is_icosa_and_ids_unchanged():
    assert icosa.hex_backend() == "icosa"
    lon = np.array([10.0, -120.5, 179.9])
    lat = np.array([45.0, -33.2, -89.0])
    np.testing.assert_array_equal(
        icosa.cell_hex(lon, lat, 7), icosa.icosa_cell(lon, lat, 7)
    )


def test_explicit_h3_without_wheel_fails_loudly(monkeypatch):
    # a misconfigured cluster must error, not silently switch id spaces
    if icosa._try_h3() is not None:
        pytest.skip("real h3 wheel present")
    monkeypatch.setenv("SPARK_GRAFT_HEX_BACKEND", "h3")
    with pytest.raises(RuntimeError, match="h3 wheel"):
        icosa.hex_backend()


def test_auto_without_wheel_falls_back_to_icosa(monkeypatch):
    if icosa._try_h3() is not None:
        pytest.skip("real h3 wheel present")
    monkeypatch.setenv("SPARK_GRAFT_HEX_BACKEND", "auto")
    assert icosa.hex_backend() == "icosa"


def test_invalid_backend_value_rejected(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_HEX_BACKEND", "s2")
    with pytest.raises(ValueError, match="icosa | h3 | auto"):
        icosa.hex_backend()


class _FakeH3:
    """v4-shaped int API: deterministic fake ids (res and rounded coords
    packed) so the dispatch path is fully exercised without the wheel."""

    class api:  # noqa: N801 - mirrors the wheel's module layout
        class basic_int:  # noqa: N801
            @staticmethod
            def latlng_to_cell(lat, lng, res):
                return (res << 32) | ((int(round(lat)) + 90) << 16) | (int(round(lng)) + 180)


def test_present_branch_routes_through_wheel(monkeypatch):
    monkeypatch.setattr(icosa, "_H3", _FakeH3)
    monkeypatch.setenv("SPARK_GRAFT_HEX_BACKEND", "h3")
    assert icosa.hex_backend() == "h3"
    out = icosa.cell_hex(np.array([10.0, -60.0]), np.array([45.0, 12.0]), 7)
    assert out.dtype == np.int64
    assert out[0] == (7 << 32) | ((45 + 90) << 16) | (10 + 180)
    assert out[1] == (7 << 32) | ((12 + 90) << 16) | (-60 + 180)


def test_present_branch_auto_prefers_wheel(monkeypatch):
    monkeypatch.setattr(icosa, "_H3", _FakeH3)
    monkeypatch.setenv("SPARK_GRAFT_HEX_BACKEND", "auto")
    assert icosa.hex_backend() == "h3"


def test_real_wheel_behavioral_parity():
    # runs only where `pip install h3` happened; pins that swapping id
    # spaces preserves operation SEMANTICS even though ids differ
    h3 = icosa._try_h3()
    if h3 is None:
        pytest.skip("no h3 wheel in this environment")
    rng = np.random.default_rng(42)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-85, 85, 200)

    ours = icosa.icosa_cell(lon, lat, 7)
    theirs = icosa.h3_cell(lon, lat, 7)

    # 1) same-cell containment: a point and a ~10 m-shifted twin land in
    #    the same cell under BOTH indexes for the overwhelming majority
    lon2, lat2 = lon + 1e-4, lat
    same_ours = (icosa.icosa_cell(lon2, lat2, 7) == ours).mean()
    same_theirs = (icosa.h3_cell(lon2, lat2, 7) == theirs).mean()
    assert same_ours > 0.95 and same_theirs > 0.95

    # 2) far pairs always separate in both
    assert (icosa.icosa_cell(lon + 1.0, lat, 7) != ours).all()
    assert (icosa.h3_cell(lon + 1.0, lat, 7) != theirs).all()

    # 3) k-ring cardinality: 1 + 3k(k+1) for k=1 → 7 (pentagon cells in
    #    H3 give 6 — allow them)
    ring = icosa.icosa_kring(ours[:20], 1)
    assert all(len(set(r)) in (6, 7) for r in ring)
    disk = getattr(h3, "grid_disk", None) or getattr(h3, "k_ring")
    cells = [
        disk(c if isinstance(c, (int, np.integer)) else c, 1)
        for c in np.asarray(theirs[:20], dtype=np.uint64).tolist()
    ]
    assert all(len(set(cs)) in (6, 7) for cs in cells)
