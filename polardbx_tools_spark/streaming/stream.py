"""Structured-Streaming front-end: binlog-tail → lake upsert.

Reference analog: the changelog *tail* sources — general-log Tailer
(``mysqlsniffer/.../generallog/GLCaptureThread.java:52-87``, S7) and the
SLS consumer (S9) feeding frodo's ordered replay. On Spark this is the
file streaming source: new changelog files landing in a directory are
discovered per microbatch (``maxFilesPerTrigger`` ≙ the reference's
ring-buffer backpressure, ``BaseWorkHandler.java:64-81``), and each
microbatch goes through the SAME ``CdcPipeline.apply_batch`` as the
batch path — one code path for replay and tail.

Exactly-once composition: Spark's streaming checkpoint tracks which
files were consumed; the engine's snapshot offsets + idempotent merge
absorb any replayed microbatch after a crash (both layers must agree,
and they do because apply_batch filters on committed offsets first).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from polardbx_tools_spark.pipeline import CdcPipeline


def start_cdc_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    table_path: str,
    checkpoint_dir: str,
    bucket_count: int = 16,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    fmt: str = "parquet",
    merge_mode: str | None = None,
) -> StreamingQuery:
    """Tail a changelog directory and MERGE each microbatch into the lake
    table. ``available_now=True`` drains what exists and stops (the test/
    replay mode); ``False`` keeps tailing (the production mode).
    ``merge_mode="mor"`` appends batch-sized delta files per microbatch —
    the natural mode for a high-frequency tail (pair with periodic
    ``maintenance.compact``); default copy-on-write."""
    pipe = CdcPipeline(spark, table_path, bucket_count=bucket_count,
                       merge_mode=merge_mode)
    pipe.ensure_table(with_tool="tool" in schema.fieldNames())

    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(source_dir)

    def apply(batch_df, batch_id: int) -> None:
        pipe.apply_batch(batch_df, batch_id=batch_id)

    writer = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_windowed_counts_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    fmt: str = "parquet",
) -> StreamingQuery:
    """Watermarked tumbling-window event counts — frodo's interval QPS
    gauge (``thread/MonitorThread.java:35-95``) as a Structured Streaming
    aggregation with LATE-DATA semantics:

    * events later than ``watermark`` behind the max seen event time are
      DROPPED (they can no longer change an emitted window);
    * append mode emits each window exactly once, when the watermark
      passes its end — so downstream consumers never see a count twice.

    State is bounded by (windows inside the watermark horizon), not by
    stream length — the scale-correct shape for an endless tail.
    """
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(source_dir)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
