"""Streaming composition of the round-3 scrub stages: a file-source
stream runs PII redaction + schema-driven dead-letter routing per
micro-batch (availableNow, exactly-once over the checkpoint) — the same
column-expression operators compose unchanged into Structured Streaming
because they are pure projections/predicates (no batch-only APIs)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stac_populator_spark.operators.scrub import redact_pii
from stac_populator_spark.operators.validate import schema_failure_reason

SCHEMA = {
    "required": ["url", "text"],
    "properties": {"lang": {"enum": ["en", "de"]}},
}


def _write(spark, d, pdf):
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(d)


def test_stream_scrub_and_dead_letter(spark, tmp_path):
    src, out, cp = (str(tmp_path / p) for p in ("in", "out", "cp"))
    _write(
        spark,
        src,
        pd.DataFrame(
            {
                "url": ["u1", "u2", "u3"],
                "text": [
                    "contact alice@example.com for data",
                    "plain text nothing here",
                    "host at 10.1.2.3 works",
                ],
                "lang": ["en", "xx", "de"],
            }
        ),
    )
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    scrubbed = redact_pii(stream).withColumn(
        "failure_reason", schema_failure_reason(SCHEMA, stream)
    )
    q = (
        scrubbed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert rows["u1"]["text_redacted"] == "contact <EMAIL> for data"
    assert rows["u1"]["n_email"] == 1 and rows["u1"]["failure_reason"] is None
    assert rows["u2"]["failure_reason"] == "lang:enum"
    assert rows["u3"]["text_redacted"] == "host at <IPV4> works"

    # restart with no new data: exactly-once (no duplicate output rows)
    q2 = (
        scrubbed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 3
