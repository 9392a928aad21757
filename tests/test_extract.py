"""Extract-stage unit tests: geometry fast-path parity with the reference
semantics renderer, and batch extraction on crafted HTML."""

import json

import pandas as pd

from stac_populator_spark.functions.geometry import to_geometry
from stac_populator_spark.operators.extract import _extract_batch


def _page(html: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "url": ["https://x.example/a/1.html"],
            "warc_ts": [pd.Timestamp("2024-01-01")],
            "html": [html.encode()],
            "lang": ["en"],
            "text": [""],
        }
    )


def test_geometry_fastpath_matches_to_geometry():
    cases = [
        (-73.6, 45.5, -73.6, 45.5),       # degenerate point
        (-10.25, -20.5, 30.75, 40.125),   # box
        (170.5, -10.0, -160.25, 10.5),    # antimeridian crossing
    ]
    for a, b, c, d in cases:
        html = f'<meta name="geo.box" content="{b};{a};{d};{c}">'
        out = _extract_batch(_page(html))
        expected = json.dumps(to_geometry(a, b, c, d), separators=(",", ":"))
        assert out["geometry"][0] == expected
        assert json.loads(out["geometry"][0]) == to_geometry(a, b, c, d)


def test_point_page_degenerate_bbox():
    out = _extract_batch(_page('<meta name="geo.position" content="45.5;-73.6">'))
    assert list(out["bbox"][0]) == [-73.6, 45.5, -73.6, 45.5]
    assert out["lon"][0] == -73.6 and out["lat"][0] == 45.5
    assert not out["crosses_am"][0]


def test_no_geo_page():
    out = _extract_batch(_page("<p>hello</p>"))
    assert out["bbox"][0] is None and out["geometry"][0] is None
    assert pd.isna(out["lon"][0])


def test_crossing_rep_point_wraps():
    out = _extract_batch(_page('<meta name="geo.box" content="0;170;10;-170">'))
    assert out["crosses_am"][0]
    assert out["lon"][0] == 180.0 or out["lon"][0] == -180.0  # center of [170,-170]


def test_invalid_utf8_html_survives():
    # real Common-Crawl payloads contain invalid bytes; the batch must not
    # die — errors='replace' fallback, deterministic output
    pdf = _page("<p>ok</p>")
    pdf.loc[0, "html"] = b"<p>\xff\xfe bad bytes</p>"
    out1 = _extract_batch(pdf)
    out2 = _extract_batch(pdf)
    assert out1["text"][0] == out2["text"][0]
    assert "bad bytes" in out1["text"][0]


def test_id_and_datetime():
    html = '<meta name="date" content="2020-03-04T05:06:07">'
    out = _extract_batch(_page(html))
    assert out["id"][0] == "x.example__a__1.html"
    assert out["datetime"][0] == pd.Timestamp("2020-03-04T05:06:07")


def test_page_with_both_position_and_box_takes_box(spark):
    # r4 review: mixing the point's min corner with the box's max corner
    # can yield lat_min > lat_max with no handling — the box wins wholesale
    import pandas as pd

    from stac_populator_spark.operators.extract import extract_items

    html = (
        '<html><head>'
        '<meta name="geo.position" content="50.0;10.0">'
        '<meta name="geo.box" content="20.0;5.0;30.0;15.0">'
        '<title>both</title></head><body>x</body></html>'
    )
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["http://h/p"],
                "warc_ts": pd.to_datetime(["2020-01-01"]),
                "html": [html.encode()],
                "text": [""],
                "lang": ["en"],
            }
        )
    )
    row = extract_items(pages).collect()[0]
    assert row["lat_min"] == 20.0 and row["lat_max"] == 30.0
    assert row["lon_min"] == 5.0 and row["lon_max"] == 15.0
    assert row["lat_min"] <= row["lat_max"]


def test_geometry_vectorized_matches_loop():
    # r6: the Arrow-assembled geometry strings must be byte-equal to the
    # repr()-f-string loop on every row — including integral values
    # (repr's trailing '.0'), negative zero, antimeridian crossings, and
    # the guarded fallback rows (exponent-territory magnitudes, inf)
    import numpy as np

    from stac_populator_spark.operators.extract import _geom_loop, _geom_strings

    rng = np.random.default_rng(7)
    n = 20000
    lon_min = rng.uniform(-180, 180, n)
    lat_min = rng.uniform(-90, 90, n)
    lon_max = lon_min + rng.uniform(-20, 20, n)  # some antimeridian crossings
    lat_max = lat_min + rng.uniform(0, 10, n)
    lon_min[::7] = np.round(lon_min[::7])        # integral → repr '.0'
    lat_max[::11] = np.round(lat_max[::11])
    lon_min[::101] = 1e-7                        # exponent form → fallback
    lat_min[::103] = 3e17
    lon_max[::107] = np.inf                      # non-finite → fallback
    lat_max[::109] = -0.0
    has_geom = np.ones(n, dtype=bool)
    has_geom[::13] = False

    vec = _geom_strings(lon_min, lat_min, lon_max, lat_max, has_geom, n).to_pylist()
    ref = _geom_loop(lon_min, lat_min, lon_max, lat_max, np.nonzero(has_geom)[0])
    assert all(vec[k] == ref.get(k) for k in range(n))
