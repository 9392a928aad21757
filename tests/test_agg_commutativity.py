"""Order/partitioning independence of the collection aggregation — the
design decision SURVEY.md §2.5(A3) documents: the reference's fold is
order-dependent; ours must be commutative (hypothesis-driven)."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from stac_populator_spark.operators.collection_agg import collection_extent

item_rows = st.lists(
    st.tuples(
        st.sampled_from(["c1", "c2"]),
        st.floats(min_value=-180, max_value=180, allow_nan=False),
        st.floats(min_value=-90, max_value=90, allow_nan=False),
        st.one_of(st.none(), st.integers(min_value=0, max_value=10**9)),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(rows=item_rows)
def test_extent_commutative(spark, rows):
    def mk(rws, parts):
        data = [
            (
                cid,
                lon,
                lat,
                lon,
                lat,
                dt.datetime(2000, 1, 1) + dt.timedelta(seconds=s) if s is not None else None,
            )
            for cid, lon, lat, s in rws
        ]
        df = spark.createDataFrame(
            data,
            "collection_id string, lon_min double, lat_min double, lon_max double, "
            "lat_max double, datetime timestamp",
        ).repartition(parts)
        out = collection_extent(df).collect()
        return sorted(
            (r["collection_id"], tuple(r["bbox"]), r["interval_start"], r["interval_end"], r["item_count"])
            for r in out
        )

    assert mk(rows, 1) == mk(list(reversed(rows)), 5)
