"""Trino-parity semantics of the JSON function surface (SURVEY §2.7 F1-F3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.functions.json import (
    json_extract,
    json_extract_scalar,
)

DOC = (
    '{"s": "hello", "n": 42, "b": true, "nul": null, '
    '"obj": {"k": 1}, "arr": [1, 2]}'
)


def test_json_extract_scalar_trino_semantics(spark):
    """Scalars come back as strings; non-scalar matches (object/array) are
    NULL — Trino's json_extract_scalar, not get_json_object's serialized
    blob."""
    df = spark.createDataFrame([(DOC,)], "j string")
    row = df.select(
        json_extract_scalar("j", "$.s").alias("s"),
        json_extract_scalar("j", "$.n").alias("n"),
        json_extract_scalar("j", "$.b").alias("b"),
        json_extract_scalar("j", "$.missing").alias("missing"),
        json_extract_scalar("j", "$.obj").alias("obj"),
        json_extract_scalar("j", "$.arr").alias("arr"),
    ).first()
    assert row["s"] == "hello"
    assert row["n"] == "42"
    assert row["b"] == "true"
    assert row["missing"] is None
    assert row["obj"] is None, "object match must be NULL, not '{\"k\":1}'"
    assert row["arr"] is None, "array match must be NULL, not '[1,2]'"


def test_json_extract_keeps_serialized_subjson(spark):
    """json_format(json_extract(...)) parity: non-scalars DO serialize here."""
    df = spark.createDataFrame([(DOC,)], "j string")
    row = df.select(
        json_extract("j", "$.obj").alias("obj"),
        json_extract(F.col("j"), "$.arr").alias("arr"),
    ).first()
    assert row["obj"] == '{"k":1}'
    assert row["arr"] == "[1,2]"
