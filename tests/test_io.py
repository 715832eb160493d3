"""File-format I/O: schema-explicit JSON/CSV with malformed-drop."""

from __future__ import annotations

from pyspark.sql import types as T

from hrtech_etl_spark.sources import io as hio

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_read_json_drops_malformed(spark, tmp_path):
    p = tmp_path / "rows.json"
    p.write_text(
        '{"id": 1, "name": "a", "score": 0.5}\n'
        "this is not json\n"
        '{"id": 2, "name": "b", "score": 1.5}\n'
        '{"id": "not a number", "name": "c", "score": 2.5}\n'
    )
    df = hio.read_json(spark, str(p), SCHEMA)
    rows = {r["id"] for r in df.collect()}
    assert rows == {1, 2}
    # keep-malformed mode exposes the raw record instead
    kept = hio.read_json(spark, str(p), SCHEMA, drop_malformed=False)
    assert kept.count() == 4


def test_read_json_strings_playground_paste(spark):
    df = hio.read_json_strings(
        spark,
        ['{"id": 7, "name": "x", "score": 1.0}', "garbage", '{"id": 8}'],
        SCHEMA,
    )
    got = {r["id"]: r["name"] for r in df.collect()}
    assert got == {7: "x", 8: None}


def test_read_csv_schema_and_malformed(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("id,name,score\n1,a,0.5\nbad,row,NOT\n2,b,1.5\n")
    df = hio.read_csv(spark, str(p), SCHEMA)
    assert {r["id"] for r in df.collect()} == {1, 2}


def test_write_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 1.5), (3, "a", 2.5)], SCHEMA
    )
    out = str(tmp_path / "out")
    hio.write(df, out, mode="overwrite", partition_by=["name"])
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert (tmp_path / "out" / "name=a").exists()
