"""SparkSession factory.

Reference analog: ``batch-tool`` wires its own thread pools / ring buffer
(``worker/MyWorkerPool.java:32-37``, ``model/config/GlobalVar.java:27-37``);
on Spark all of that pipelining is Catalyst + whole-stage codegen, so the
only tuning that remains is session-level config:

* AQE on (runtime re-plan, skew-join splitting) — the engine's answer to
  the reference's "a hot shard saturates one consumer" gap (SURVEY.md §4),
* Arrow on for every pandas UDF (input_hint: no per-row Python),
* shuffle partitions sized to cores x 2 (reference advice: consumers =
  6-8x producers, ``docs/usage-details.md:223-228`` — same idea: keep all
  lanes busy without oversplitting).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "polardbx-tools-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for the CDC engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract)
    or ``local[*]``. On a real cluster this is overridden by
    ``spark-submit --master``; nothing in the engine assumes local mode.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS")
        ncpu = int(cpus_s) if cpus_s and cpus_s.isdigit() else (os.cpu_count() or 8)
        shuffle_partitions = max(8, 2 * ncpu)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # zstd parquet: smaller files at similar read speed (guide §6);
        # on this memory-bandwidth-bound box the smaller COW rewrite
        # measurably beats snappy (10M-leg A/B: 29.4-30.6s vs
        # 31.3-31.5s). Shuffle stays lz4 — a zstd shuffle A/B was
        # slower (34.5s): the shuffle path is CPU-sensitive here.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # deterministic file layout: one writer task per output bucket is
        # decided by the engine (salted repartition), not by max-splits
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
