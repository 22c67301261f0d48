"""Vectorized changelog parsers: text/CSV lines and JSON events → typed
change-event DataFrames.

Reference parity:
* quote-aware line split with ``""`` escapes, arbitrary separator,
  field-count validation — ``batch-tool util/FileUtil.java:152-300`` (P3)
  and the OpenCSV path ``worker/common/reader/CsvReader.java:40-106`` (S2);
* ``\\N`` NULL escape + empty-string→NULL for typed columns —
  ``util/FileUtil.java:45-67``, ``worker/util/ImportUtil.java:136-144``;
* BOM strip / ``\\r\\n`` / trailing-whitespace cleanup —
  ``worker/common/reader/BlockReader.java:157-188`` (P5);
* JSON changelog events ``{sqlId, schema, session, execTime,
  convertSqlText, startTime, user}`` — ``frodo/README.md:45-50`` +
  transfer scripts ``frodo-core/rds_audit_transfer.py:33-67`` (S10).

Spark-first: CSV parsing uses the built-in reader (quote/escape/multiLine
— Catalyst's UnivocityParser, JVM-side); JSON uses ``from_json``. The
only custom logic is the malformed-row quarantine split and the typed
NULL conventions, expressed as column expressions. A pandas UDF appears
ONLY in :func:`fingerprint_udf`, the one genuinely non-relational
transform (regex-heavy SQL normalization), batched via Arrow.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf type-hint resolution

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

NULL_ESC = r"\N"  # MySQL-convention NULL escape (FileUtil.NULL_ESC_STR)


def strip_bom(col: Column) -> Column:
    """Drop a UTF-8 BOM that survived decoding (BlockReader.java:157-169)."""
    return F.regexp_replace(col, "^﻿", "")


def clean_line(col: Column) -> Column:
    """BOM + ``\\r`` + trailing-space cleanup (P5)."""
    return F.rtrim(F.regexp_replace(strip_bom(col), "\r$", ""))


def null_escape(col: Column, null_str: str = NULL_ESC) -> Column:
    """``\\N`` (or custom) → NULL (FileUtil.java:45-67)."""
    return F.when(col == F.lit(null_str), F.lit(None).cast("string")).otherwise(col)


def parse_csv_changelog(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = ",",
    quote: str = '"',
    header: bool = False,
    null_str: str = NULL_ESC,
) -> tuple[DataFrame, DataFrame]:
    """CSV/TXT changelog file(s) → (typed events, quarantined bad lines).

    Built-in CSV reader in PERMISSIVE mode with a ``_corrupt_record``
    column: quote-aware (RFC4180 ``""`` escapes, multi-line fields),
    any separator, ``\\N`` NULLs. Wrong-field-count / untypeable rows go
    to the quarantine frame (reference: broken lines logged + skipped
    under ``-maxError``, ``worker/insert/DirectImportWorker.java:107-128``).
    """
    from pyspark.sql.types import StringType, StructField

    read_schema = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType(), True)]
    )
    raw = (
        spark.read.schema(read_schema)
        .option("sep", sep)
        .option("quote", quote)
        .option("escape", quote)  # RFC4180 "" escaping
        .option("multiLine", True)
        .option("header", header)
        .option("nullValue", null_str)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    # Spark requires a materialized frame to filter on _corrupt_record
    # alone (QUERY_ONLY_CORRUPT_RECORD_COLUMN); cache is per-batch scoped.
    raw = raw.cache()
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return good, bad


def parse_json_changelog(
    df_lines: DataFrame,
    schema: StructType,
    line_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Newline-delimited JSON events (frodo format) → (typed, quarantine).

    ``from_json`` is JVM-side; rows that fail to parse or miss required
    fields are quarantined rather than dropped.
    """
    from pyspark.sql.types import StringType, StructField

    parse_schema = StructType(
        list(schema.fields) + [StructField("_corrupt", StringType(), True)]
    )
    parsed = df_lines.select(
        F.col(line_col).alias("_raw"),
        F.from_json(
            clean_line(F.col(line_col)),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("e"),
    )
    bad = parsed.filter(F.col("e._corrupt").isNotNull()).select("_raw")
    good = parsed.filter(F.col("e._corrupt").isNull()).select("e.*").drop("_corrupt")
    return good, bad


def frodo_event_schema() -> StructType:
    """The reference's JSON changelog event shape (frodo/README.md:45-50)."""
    from pyspark.sql.types import LongType, StringType, StructField

    return StructType(
        [
            StructField("sqlId", StringType(), True),
            StructField("schema", StringType(), True),
            StructField("session", StringType(), True),
            StructField("execTime", LongType(), True),
            StructField("convertSqlText", StringType(), True),
            StructField("startTime", LongType(), True),  # µs epoch
            StructField("user", StringType(), True),
            StructField("parameter", StringType(), True),
        ]
    )


def frodo_events_to_changelog(events: DataFrame) -> DataFrame:
    """frodo JSON events → engine changelog columns: the event-time /
    session / sequence mapping (startTime µs → ts; session → conv_id;
    arrival order → source_lsn; session hash → source_partition), mirror
    of the shard step ``Frodo.java:252-332``."""
    return events.select(
        F.upper(F.substring(F.trim("convertSqlText"), 1, 1)).alias("op_raw"),
        F.col("session").alias("conv_id"),
        F.col("convertSqlText").alias("text"),
        F.timestamp_micros(F.col("startTime")).alias("ts"),
        # content-derived LSN, NOT monotonically_increasing_id(): the
        # merge's idempotent-replay invariant needs the SAME event to get
        # the SAME (ts, lsn, partition) on every evaluation, and
        # monotonically_increasing_id changes with partitioning/replay —
        # equal-startTime events could swap winners between the original
        # run and a retry. The hash gives an arbitrary but STABLE total
        # order among same-microsecond events of a session.
        F.xxhash64("session", "startTime", "convertSqlText").alias("source_lsn"),
        F.pmod(F.xxhash64("session"), F.lit(32)).cast("int").alias("source_partition"),
    )


def fingerprint_udf():
    """Arrow-batched pandas UDF: SQL-template fingerprint (numbers and
    string literals → '?', collapse ws, md5) — frodo's deparameterizer
    (``Util.java:385-462``) over vectorized batches. Exists as the UDF
    exemplar; the pure-SQL variant is operators.text.sql_template_id."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fp(texts: "pd.Series") -> "pd.Series":
        # NULL propagates (str accessors keep NaN; the final map skips
        # non-strings) — SQL md5(regexp_replace(NULL,...)) is NULL, and
        # the oracle comparison depends on matching that, not md5('')
        norm = (
            texts
            .str.replace(r"'[^']*'", "?", regex=True)
            .str.replace(r"\b[0-9]+(\.[0-9]+)?\b", "?", regex=True)
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        return norm.map(
            lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
            if isinstance(s, str) else None
        )

    return _fp
