"""User-parser registry: kwarg injection by signature, composition order,
module:function loading (reference tests/extra_functions/item_parsers.py and
utils.py:9-48), and the A4 mode dispatcher."""

import pandas as pd
import pytest
from pyspark.sql import types as T

from stac_populator_spark.operators.collection_agg import update_collections
from stac_populator_spark.operators.registry import (
    apply_parsers,
    load_parser,
    register_parser,
)


def test_apply_parsers_composition_and_kwargs(spark):
    # parsers defined locally so cloudpickle ships them by value (a real
    # user would have them in an importable module on --py-files)
    def add_tag(pdf: pd.DataFrame, tag: str = "x") -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["tag"] = tag
        return pdf

    def upper_tag(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["tag"] = pdf["tag"].str.upper()
        return pdf

    df = spark.createDataFrame(pd.DataFrame({"id": ["a", "b"]}))
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("tag", T.StringType())]
    )
    register_parser("add_tag", add_tag)
    out = apply_parsers(
        df,
        ["add_tag", upper_tag],
        schema=schema,
        tag="hello",
        irrelevant_kwarg=123,  # silently dropped (signature filtering)
    ).collect()
    assert {r["tag"] for r in out} == {"HELLO"}


def test_load_parser_module_spec():
    fn = load_parser("json:dumps")
    assert fn({"a": 1}) == '{"a": 1}'
    with pytest.raises(ValueError):
        load_parser("no_colon_here")


def test_update_collections_modes(spark):
    items = spark.createDataFrame(
        [("c1", 0.0, 0.0, 1.0, 1.0, None, {"k": "v"})],
        "collection_id string, lon_min double, lat_min double, lon_max double, "
        "lat_max double, datetime timestamp, props map<string,string>",
    )
    assert set(update_collections(items, "all")) == {"extents", "summaries"}
    assert set(update_collections(items, "extents")) == {"extents"}
    assert set(update_collections(items, "summaries")) == {"summaries"}
    assert update_collections(items, "none") == {}
    with pytest.raises(ValueError):
        update_collections(items, "bogus")


def test_zscore_by_group_values_and_degenerate(spark):
    import numpy as np
    import pandas as pd

    from stac_populator_spark.operators.registry import zscore_by_group

    df = spark.createDataFrame(
        pd.DataFrame(
            {"id": [1, 2, 3, 4, 5], "g": ["a", "a", "a", "b", "c"], "v": [1.0, 2.0, 3.0, 7.0, 9.0]}
        )
    )
    # group c... b has one row -> null; a: mean 2, std(ddof=1)=1
    out = {r["id"]: r["zscore"] for r in zscore_by_group(df, "v", "g").collect()}
    assert out[1] == -1.0 and out[2] == 0.0 and out[3] == 1.0
    assert out[4] is None or np.isnan(out[4])
    assert out[5] is None or np.isnan(out[5])
