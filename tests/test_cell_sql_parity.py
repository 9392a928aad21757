"""The flagship oracle recomputes cell_s2/cell_hex in DuckDB SQL
(__spark_entry__._flagship_oracle_sql). These tests pin that the SQL
encoders stay BIT-EXACT vs the numpy encoders on random points + edge
cases — so a refactor of functions/s2.py or functions/icosa.py that
changes ids (or a DuckDB float-semantics change) fails here, not as an
opaque hash mismatch in the driver gate.

No Spark session needed: numpy vs DuckDB directly.
"""

import re

import duckdb
import numpy as np
import pytest

import __spark_entry__ as E
from stac_populator_spark.functions.icosa import icosa_cell
from stac_populator_spark.functions.s2 import s2_cell_id


def _cells_via_sql(lon: np.ndarray, lat: np.ndarray):
    """Run the flagship oracle's cell CTEs over raw points by substituting
    a synthetic documents table whose derived (lon, lat) equal the inputs.

    The oracle derives lon/lat from doc_id arithmetic, so instead we
    extract the cell pipeline: reuse the oracle SQL verbatim but override
    the ``base`` CTE with direct lon/lat columns.
    """
    sql = E._flagship_oracle_sql()
    # replace the base CTE body: keep everything from the s2xyz CTE on,
    # and provide base(doc_id, lon, lat, has_geo) straight from pts
    m = re.search(r"\),\s*-- ==== S2 level-12", sql)
    assert m, "oracle SQL structure changed; update this test's splice"
    head = """
        WITH RECURSIVE base AS (
          SELECT rid AS doc_id, lon, lat, TRUE AS has_geo FROM pts
        """
    tail = sql[m.start() :]
    # cut the final SELECT (it builds stac_json); select just the cells
    tail = tail[: tail.index("joined AS (")]
    q = (
        head
        + tail
        + """
        sel AS (SELECT b.doc_id, s.cell_s2, h.cell_hex
                FROM base b
                LEFT JOIN s2cell s ON b.doc_id = s.doc_id
                LEFT JOIN hcell h ON b.doc_id = h.doc_id)
        SELECT * FROM sel ORDER BY doc_id
        """
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (SELECT unnest(?) AS lon, unnest(?) AS lat, unnest(?) AS rid)",
        [lon.tolist(), lat.tolist(), list(range(len(lon)))],
    )
    df = con.execute(q).df()
    return df["cell_s2"].to_numpy(), df["cell_hex"].to_numpy()


@pytest.fixture(scope="module")
def points():
    rng = np.random.default_rng(17)
    lon = np.concatenate(
        [rng.uniform(-180, 180, 8000), [-180.0, 180.0, 0.0, 179.99, -179.99, 45.0]]
    )
    lat = np.concatenate(
        [rng.uniform(-90, 90, 8000), [90.0, -90.0, 0.0, 45.0, -45.0, 0.0]]
    )
    return lon, lat


def test_s2_sql_matches_numpy(points):
    lon, lat = points
    s2_sql, _ = _cells_via_sql(lon, lat)
    want = s2_cell_id(lon, lat, 12).astype(np.int64)
    assert (s2_sql.astype(np.int64) == want).all()


def test_icosa_sql_matches_numpy(points):
    lon, lat = points
    _, hex_sql = _cells_via_sql(lon, lat)
    want = icosa_cell(lon, lat, 7).astype(np.int64)
    assert (hex_sql.astype(np.int64) == want).all()
