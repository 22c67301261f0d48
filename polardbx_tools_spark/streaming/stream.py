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
) -> StreamingQuery:
    """Tail a changelog directory and MERGE each microbatch into the lake
    table. ``available_now=True`` drains what exists and stops (the test/
    replay mode); ``False`` keeps tailing (the production mode)."""
    pipe = CdcPipeline(spark, table_path, bucket_count=bucket_count)
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
