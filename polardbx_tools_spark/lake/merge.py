"""Copy-on-write MERGE INTO for :class:`LakeTable` — the engine's core.

Semantics (SURVEY.md §2.2 K1/K3/K4/K6 collapsed into one relational op):

* ``op='I'|'U'`` → full-row upsert keyed by ``(conv_id, turn_idx)`` —
  reference REPLACE INTO (``worker/update/ReplaceConsumer.java:28-52``) /
  INSERT IGNORE (``worker/util/ImportUtil.java:31-69``);
* ``op='D'``     → delete by key — reference DELETE-by-PK
  (``worker/delete/DeleteInConsumer.java:29-62``); persisted as a
  *tombstone* so a late insert with an older ``(ts, lsn)`` cannot
  resurrect the row across microbatches (SURVEY.md §7 "hard parts");
* within a batch, last-writer-wins per key by
  ``(ts, source_lsn, source_partition)`` descending — window
  ``row_number`` (north_star dedup rule);
* across batches, the same total order is enforced by the merge
  condition ``source_seq > target_seq``;
* re-applying an already-applied event compares equal, loses, and is a
  no-op → the merge is **idempotent**, which is what makes checkpoint
  replay exactly-once (reference couples resume to INSERT IGNORE for the
  same reason: ``cmd/FlagOption.java:47-48``).

Scale posture: the join is bucket-pruned (only buckets present in the
batch are read/rewritten), runs as a shuffle join on the fine-grained
key ``(conv_id, turn_idx)`` (hot conversations spread across their
turns), and the rewrite shuffle is **salted** on ``xxhash64(conv_id,
turn_idx)`` so one hot conversation cannot pin a single writer task
(north_rule explicit-skew-handling requirement). AQE skew-join stays on
as the backstop. No driver-side data movement: only tiny aggregates
(per-source-partition counts/max-LSN, ≤ #partitions rows) are collected.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from polardbx_tools_spark.lake.table import (
    BOOKKEEPING_COLS,
    DELETED,
    SEQ_LSN,
    SEQ_PART,
    SEQ_TS,
    LakeTable,
)

KEY_COLS = ("conv_id", "turn_idx")
OP_COL = "op"
TS_COL = "ts"
LSN_COL = "source_lsn"
PART_COL = "source_partition"
CDC_META_COLS = (OP_COL, LSN_COL, PART_COL)

WRITE_SALT_BUCKETS = 16  # sub-splits per storage bucket for the rewrite shuffle


@dataclass
class MergeStats:
    batch_events: int = 0
    rows_written: int = 0
    upserts: int = 0
    deletes: int = 0
    conflicts_resolved: int = 0  # events that lost last-writer-wins (dup/late)
    affected_buckets: list[int] = field(default_factory=list)
    wall_ms: int = 0
    committed_version: int | None = None
    # source_partition -> {"events": n, "winners": n, "conflicts": n, "max_lsn": n}
    per_partition: dict[int, dict[str, int]] = field(default_factory=dict)


def seq_newer(s_ts, s_lsn, s_part, t_ts, t_lsn, t_part) -> F.Column:
    """Strict lexicographic (ts, lsn, source_partition) comparison."""
    return (
        (s_ts > t_ts)
        | ((s_ts == t_ts) & (s_lsn > t_lsn))
        | ((s_ts == t_ts) & (s_lsn == t_lsn) & (s_part > t_part))
    )


def dedup_last_writer(
    source: DataFrame,
    key_cols: tuple[str, ...] = KEY_COLS,
    ts_col: str = TS_COL,
    lsn_col: str = LSN_COL,
    part_col: str = PART_COL,
) -> DataFrame:
    """One net change per key: last writer by (ts, lsn, partition) desc.

    north_star: "deduplicated per key by (ts, LSN) via window row_number".
    Window partitions by the *full* key (conv_id, turn_idx) — fine-grained,
    so hot conversations do not create a hot window partition.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        F.col(ts_col).desc(), F.col(lsn_col).desc(), F.col(part_col).desc()
    )
    return (
        source.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _align_source_payload(source: DataFrame, schema) -> DataFrame:
    """Add any table-schema payload columns the batch lacks (as NULL).

    Full-row REPLACE semantics (reference K3): an update event missing a
    payload column sets it to NULL. Pre-evolution batches merged into an
    evolved table therefore write NULL ``tool`` — same as the reference
    replaying old statements against an ALTERed table.
    """
    have = set(source.columns)
    out = source
    for f in schema.fields:
        if f.name not in have and f.name not in BOOKKEEPING_COLS:
            out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
    return out


def merge_into(
    spark: SparkSession,
    table: LakeTable,
    batch: DataFrame,
    batch_id: int = 0,
    key_cols: tuple[str, ...] = KEY_COLS,
    expected_version: int | None = None,
) -> MergeStats:
    """Apply one changelog microbatch to the table, committing new data
    files + advanced offsets in a single atomic snapshot.

    ``batch`` columns: op, <key cols>, <payload cols...>, ts, source_lsn,
    source_partition. Payload columns not yet in the table schema trigger
    additive evolution (committed with the same snapshot).
    """
    t0 = time.time()
    stats = MergeStats()
    snap = table.snapshot()
    if expected_version is None:
        expected_version = snap.version

    # -- 1. per-source-partition batch facts (tiny collect: ≤ #partitions)
    part_rows = (
        batch.groupBy(PART_COL)
        .agg(F.count("*").alias("events"), F.max(LSN_COL).alias("max_lsn"))
        .collect()
    )
    stats.batch_events = sum(r["events"] for r in part_rows)
    stats.per_partition = {
        int(r[PART_COL]): {"events": int(r["events"]), "max_lsn": int(r["max_lsn"]),
                           "winners": 0, "conflicts": 0}
        for r in part_rows
    }
    if stats.batch_events == 0:
        stats.wall_ms = int((time.time() - t0) * 1000)
        return stats

    # -- 2. additive schema evolution (Iceberg-style ADD COLUMN)
    payload_schema = batch.drop(*CDC_META_COLS).schema
    new_schema = table.evolved_schema(payload_schema)
    evolved = new_schema.fieldNames() != snap.schema.fieldNames()
    schema = new_schema if evolved else snap.schema
    payload_cols = [f.name for f in schema.fields if f.name not in BOOKKEEPING_COLS]

    # -- 3. within-batch last-writer-wins, then net-change rows
    src = dedup_last_writer(batch, key_cols)
    src = _align_source_payload(src, schema)
    src = src.select(
        *[F.col(c) for c in payload_cols],
        F.col(OP_COL).alias("_s_op"),
        F.col(TS_COL).alias("_s_ts"),
        F.col(LSN_COL).alias("_s_lsn"),
        F.col(PART_COL).alias("_s_part"),
    )

    # -- 4. bucket pruning: touch only buckets the batch writes to
    bucket = F.pmod(F.xxhash64(F.col(snap.bucket_key)), F.lit(snap.bucket_count)).cast("int")
    src = src.withColumn("b", bucket)
    affected = sorted(
        r["b"] for r in src.select("b").distinct().collect()
    )  # ≤ bucket_count values
    stats.affected_buckets = affected

    tgt = table.read(
        spark, buckets=affected, include_bookkeeping=True, include_deleted=True
    )
    # evolved columns missing from old schema read: add as NULL
    for f in schema.fields:
        if f.name not in tgt.columns:
            tgt = tgt.withColumn(f.name, F.lit(None).cast(f.dataType))
    tgt = tgt.select(
        *[F.col(c).alias(f"_t_{c}") for c in payload_cols],
        F.col(SEQ_TS).alias("_t_seqts"),
        F.col(SEQ_LSN).alias("_t_seqlsn"),
        F.col(SEQ_PART).alias("_t_seqpart"),
        F.col(DELETED).alias("_t_del"),
    )

    # -- 5. the merge join: full outer on the fine-grained key
    cond = None
    for k in key_cols:
        c = src[k] == tgt[f"_t_{k}"]
        cond = c if cond is None else (cond & c)
    joined = src.join(tgt, cond, "full_outer")

    matched = tgt[f"_t_{key_cols[0]}"].isNotNull() & src[key_cols[0]].isNotNull()
    src_only = tgt[f"_t_{key_cols[0]}"].isNull()
    newer = seq_newer(
        F.col("_s_ts"), F.col("_s_lsn"), F.col("_s_part"),
        F.col("_t_seqts"), F.col("_t_seqlsn"), F.col("_t_seqpart"),
    )
    take_source = src_only | (matched & newer)

    result = joined.select(
        *[
            F.when(take_source, F.col(c)).otherwise(F.col(f"_t_{c}")).alias(c)
            for c in payload_cols
        ],
        F.when(take_source, F.col("_s_ts")).otherwise(F.col("_t_seqts")).alias(SEQ_TS),
        F.when(take_source, F.col("_s_lsn")).otherwise(F.col("_t_seqlsn")).alias(SEQ_LSN),
        F.when(take_source, F.col("_s_part")).otherwise(F.col("_t_seqpart")).alias(SEQ_PART),
        F.when(take_source, F.col("_s_op") == F.lit("D"))
        .otherwise(F.coalesce(F.col("_t_del"), F.lit(False)))
        .alias(DELETED),
        F.when(take_source & (F.col("_s_op") != F.lit("D")), F.lit("u"))
        .when(take_source, F.lit("d"))
        .when(matched & ~newer, F.lit("c"))  # conflict: source event lost
        .otherwise(F.lit("k"))               # target row kept untouched
        .alias("_outcome"),
        F.when(take_source, F.col("_s_part")).otherwise(F.lit(None)).alias("_win_part"),
        F.when(matched & ~newer, F.col("_s_part")).otherwise(F.lit(None)).alias("_lose_part"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    try:
        # -- 6. salted rewrite: bucket dirs for pruning, salt for parallelism
        next_version = snap.version + 1
        staging = table.staging_dir(next_version)
        salt = F.pmod(
            F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(WRITE_SALT_BUCKETS)
        )
        out_cols = payload_cols + list(BOOKKEEPING_COLS)
        (
            result.withColumn("b", bucket)
            .repartition(F.col("b"), salt)
            .select(*out_cols, "b")
            .write.partitionBy("b")
            .mode("overwrite")
            .parquet(staging)
        )

        # -- 7. merge outcome metrics (reuses the cached join, no re-read)
        outcome_rows = result.groupBy("_outcome", "_win_part", "_lose_part").count().collect()
        for r in outcome_rows:
            n = int(r["count"])
            if r["_outcome"] == "u":
                stats.upserts += n
            elif r["_outcome"] == "d":
                stats.deletes += n
            elif r["_outcome"] == "c":
                stats.conflicts_resolved += n
            if r["_win_part"] is not None:
                stats.per_partition.setdefault(
                    int(r["_win_part"]),
                    {"events": 0, "max_lsn": 0, "winners": 0, "conflicts": 0},
                )["winners"] += n
            if r["_lose_part"] is not None:
                stats.per_partition.setdefault(
                    int(r["_lose_part"]),
                    {"events": 0, "max_lsn": 0, "winners": 0, "conflicts": 0},
                )["conflicts"] += n
        stats.rows_written = stats.upserts + stats.deletes + sum(
            n for r in outcome_rows if r["_outcome"] == "k" for n in [int(r["count"])]
        )
    finally:
        result.unpersist()

    # -- 8. collect staged file lists per bucket, commit atomically
    replaced: dict[int, list[str]] = {b: [] for b in affected}
    rel = os.path.relpath(staging, table.path)
    if os.path.isdir(staging):
        for d in os.listdir(staging):
            if not d.startswith("b="):
                continue
            bb = int(d.split("=", 1)[1])
            replaced[bb] = sorted(
                os.path.join(rel, d, fn)
                for fn in os.listdir(os.path.join(staging, d))
                if fn.endswith(".parquet")
            )
    offsets_updates = {p: v["max_lsn"] for p, v in stats.per_partition.items() if v["events"]}
    committed = table.commit(
        replaced_buckets=replaced,
        offsets_updates=offsets_updates,
        schema=schema if evolved else None,
        properties={"batch_id": str(batch_id)},
        expected_version=expected_version,
    )
    stats.committed_version = committed.version
    stats.wall_ms = int((time.time() - t0) * 1000)
    return stats
