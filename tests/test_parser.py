"""Parser unit tests — mirrors the reference's SplitTest/QuoteTest
(``batch-tool/src/test/java/preprocess/SplitTest.java:24-80``):
quoted fields with separators/newlines, "" escapes, \\N NULLs, BOM,
\\r\\n, wrong-field-count quarantine."""

import codecs

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from polardbx_tools_spark.changelog.parser import (
    clean_line,
    frodo_event_schema,
    null_escape,
    parse_csv_changelog,
    parse_json_changelog,
    fingerprint_udf,
)

CSV_SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True),
        StructField("name", StringType(), True),
        StructField("note", StringType(), True),
    ]
)


def write(p, content, encoding="utf-8"):
    with open(p, "wb") as f:
        f.write(content.encode(encoding))


def test_csv_quotes_newlines_nulls(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    write(
        p,
        '1,"hello, world","line1\nline2"\n'
        '2,"say ""hi""",\\N\n'
        "3,plain,\n",
    )
    good, bad = parse_csv_changelog(spark, p, CSV_SCHEMA)
    rows = {r["id"]: r for r in good.collect()}
    assert bad.count() == 0
    assert rows[1]["name"] == "hello, world"
    assert rows[1]["note"] == "line1\nline2"
    assert rows[2]["name"] == 'say "hi"'
    assert rows[2]["note"] is None          # \N -> NULL
    assert rows[3]["note"] is None          # empty -> NULL (emptyValue)


def test_csv_wrong_field_count_quarantined(spark, tmp_path):
    p = str(tmp_path / "bad.csv")
    write(p, "1,a,b\nnot_an_int,x,y\n")
    good, bad = parse_csv_changelog(spark, p, CSV_SCHEMA)
    assert good.count() == 1
    assert bad.count() == 1


def test_bom_and_crlf_cleanup(spark):
    df = spark.createDataFrame(
        [("﻿hello\r",), ("plain  ",)], "value string"
    )
    out = [r[0] for r in df.select(clean_line(F.col("value"))).collect()]
    assert out == ["hello", "plain"]


def test_null_escape_custom(spark):
    df = spark.createDataFrame([("\\N",), ("NIL",), ("x",)], "v string")
    out = [r[0] for r in df.select(null_escape(F.col("v"), "NIL")).collect()]
    assert out == ["\\N", None, "x"]


def test_json_changelog_parse_and_quarantine(spark):
    lines = [
        ('{"sqlId":"abc","schema":"s1","session":"sess-1","execTime":12,'
         '"convertSqlText":"INSERT INTO t VALUES (1)","startTime":1700000000000000,'
         '"user":"u"}',),
        ("this is not json",),
    ]
    df = spark.createDataFrame(lines, "value string")
    good, bad = parse_json_changelog(df, frodo_event_schema())
    assert good.count() == 1 and bad.count() == 1
    row = good.collect()[0]
    assert row["session"] == "sess-1" and row["startTime"] == 1700000000000000


def test_fingerprint_udf_templates(spark):
    df = spark.createDataFrame(
        [
            ("SELECT * FROM t WHERE id = 42",),
            ("SELECT * FROM t WHERE id = 99",),
            ("SELECT * FROM t WHERE name = 'bob'",),
            ("SELECT * FROM t WHERE name = 'alice'",),
            ("DELETE FROM t WHERE id = 1",),
        ],
        "sql string",
    )
    fp = fingerprint_udf()
    out = df.select(fp(F.col("sql")).alias("fp")).collect()
    fps = [r["fp"] for r in out]
    assert fps[0] == fps[1]          # same numeric template
    assert fps[2] == fps[3]          # same string-literal template
    assert fps[0] != fps[4]          # different statement
