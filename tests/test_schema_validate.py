"""Schema-driven validation: a jsonschema-subset document (the schema is
DATA, like the reference's per-extension schema files fed to
jsonschema.iter_errors — extensions/base.py:107-125) compiles to column
predicates feeding the dead-letter path."""

import pandas as pd
from pyspark.sql import functions as F

from stac_populator_spark.operators.validate import (
    compile_jsonschema,
    schema_failure_reason,
    split_by_schema,
)


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["a", "b", "c", "d", "e", "f"],
                "kind": ["x", "y", "zz", "x", "y", "x"],
                "version": ["v1", "v2", "v3", "nope", "v5", "v6"],
                "count_s": ["3", "9", "1", "2", "abc", "4"],
                "score": [0.5, 0.9, 0.2, 0.3, 0.4, 1.7],
            }
        )
    )


SCHEMA = {
    "required": ["id", "kind", "missing_col"],
    "properties": {
        "kind": {"type": "string", "enum": ["x", "y"]},
        "version": {"pattern": "^v\\d+$"},
        "count_s": {"type": "integer", "minimum": 2},
        "score": {"type": "number", "maximum": 1.0},
    },
}


def test_first_violation_wins_in_rule_order(spark):
    df = _df(spark)
    # missing_col is absent from the DataFrame → required fails for EVERY
    # row before any value check (jsonschema absent-property semantics)
    reasons = {
        r["id"]: r["r"]
        for r in df.select("id", schema_failure_reason(SCHEMA, df).alias("r")).collect()
    }
    assert set(reasons.values()) == {"required:missing_col"}


def test_value_checks_and_split(spark):
    df = _df(spark)
    schema = {k: v for k, v in SCHEMA.items() if k != "required"}
    valid, dead = split_by_schema(df, schema)
    got = {r["id"]: r["failure_reason"] for r in dead.collect()}
    assert got == {
        "c": "kind:enum",          # 'zz' outside enum
        "d": "version:pattern",    # 'nope'
        "e": "count_s:type",       # 'abc' not an integer string
        "f": "score:maximum",      # 1.7 > 1.0
    }
    assert sorted(r["id"] for r in valid.collect()) == ["a", "b"]
    # 'c': count_s='1' violates minimum too, but enum fired first;
    # re-check minimum alone
    only_min = {"properties": {"count_s": {"minimum": 2}}}
    _, dead2 = split_by_schema(df, only_min)
    assert {r["id"] for r in dead2.collect()} == {"c"}


def test_typed_column_type_check_is_static(spark):
    df = _df(spark)
    # score is DoubleType: "number" is statically satisfied → no rule;
    # "string" on a numeric column is a static mismatch → always fires
    rules_num = compile_jsonschema({"properties": {"score": {"type": "number"}}}, df)
    assert rules_num == []
    _, dead = split_by_schema(df, {"properties": {"score": {"type": "string"}}})
    assert dead.count() == df.count()


def test_boolean_and_lengths(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"flag": ["true", "False", "maybe"], "name": ["ab", "abcdef", "a"]})
    )
    schema = {
        "properties": {
            "flag": {"type": "boolean"},
            "name": {"minLength": 2, "maxLength": 5},
        }
    }
    _, dead = split_by_schema(df, schema)
    got = {r["flag"]: r["failure_reason"] for r in dead.collect()}
    # row ('maybe','a') violates both flag:type and name:minLength —
    # flag:type wins (property order); 'true'/'False' are valid booleans
    assert got == {"maybe": "flag:type", "False": "name:maxLength"}
