"""Deterministic synthetic transcript-changelog generator.

Reference analog: the TPC-H refresh-stream generators — seeded,
deterministic, invertible change rounds
(``batch-tool/src/main/java/worker/tpch/generator/BaseOrderLineUpdateGenerator.java:29-92``,
``worker/tpch/pruducer/TpchImportProducer.java:47-123``). Here the
"tables" are multi-turn conversation transcripts and the stream is a
binlog-like changelog of I/U/D events keyed by ``(conv_id, turn_idx)``
(FIXTURES.md §2).

Scale-free by construction: ``spark.range(n)`` + pure column
expressions (xxhash64-derived pseudo-randomness) — no driver-side data,
no Python row loops, generates 10^10 events the same way it generates
2k. Properties exercised (FIXTURES.md §2):

* duplicates: keys recur with differing ``(ts, lsn)`` → last-writer-wins;
* out-of-order: ``ts`` carries a ± jitter against LSN order;
* skew: ``hot_event_pct``% of events land on ``hot_convs`` conversations
  (~1% of the key space) — the hot-conversation fixture;
* ordered resume: ``source_lsn`` = global event id (monotone per source
  partition since partitions partition the id space);
* schema evolution: events with ``source_lsn >= evolution_lsn`` carry the
  ``tool`` column; ``split_for_evolution`` returns the pre-evolution
  slice *without* the column at all (separate schema, FIXTURES.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ROLES = ("user", "assistant", "system", "tool")


def transcripts_schema(with_tool: bool = True) -> StructType:
    """Target-table schema per BASELINE.json input_hint."""
    fields = [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
    ]
    if with_tool:
        fields.append(StructField("tool", StringType(), True))
    fields.append(StructField("ts", TimestampType(), True))
    return StructType(fields)


def changelog_schema(with_tool: bool = True) -> StructType:
    base = transcripts_schema(with_tool).fields
    return StructType(
        [StructField("op", StringType(), False)]
        + list(base)
        + [
            StructField("source_lsn", LongType(), False),
            StructField("source_partition", IntegerType(), False),
        ]
    )


@dataclass(frozen=True)
class ChangelogSpec:
    n_events: int = 2000
    n_convs: int = 100
    max_turns: int = 16
    n_source_partitions: int = 8
    seed: int = 42
    hot_conv_pct: int = 1      # % of conversations that are "hot"
    hot_event_pct: int = 30    # % of events that land on hot conversations
    insert_phase_pct: int = 40 # first X% of the stream is insert-only
    delete_pct: int = 10       # of post-insert-phase events, % that are D
    update_pct: int = 20       # ... % that are U (rest are I)
    ts_jitter_s: int = 30      # ± seconds of event-time disorder vs LSN
    base_ts_us: int = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in µs
    evolution_lsn: int | None = None  # events >= this LSN carry `tool`

    @property
    def n_hot(self) -> int:
        return max(1, self.n_convs * self.hot_conv_pct // 100)


def _h(col, seed: int, salt: int) -> F.Column:
    return F.xxhash64(col, F.lit(seed), F.lit(salt))


def generate_changelog(spark: SparkSession, spec: ChangelogSpec) -> DataFrame:
    """Build the changelog DataFrame (columns per FIXTURES.md §2).

    ``tool`` is always present in this frame (NULL before the evolution
    point); use :func:`split_for_evolution` to get the two-schema variant.
    """
    ev = spark.range(spec.n_events).withColumnRenamed("id", "lsn")
    lsn = F.col("lsn")
    h1, h2, h3, h4, h5 = (_h(lsn, spec.seed, k) for k in range(1, 6))

    n_cold = max(1, spec.n_convs - spec.n_hot)
    is_hot = F.pmod(h1, F.lit(100)) < F.lit(spec.hot_event_pct)
    conv_num = F.when(is_hot, F.pmod(h2, F.lit(spec.n_hot))).otherwise(
        F.lit(spec.n_hot) + F.pmod(h2, F.lit(n_cold))
    )
    conv_id = F.concat(F.lit("conv-"), F.lpad(conv_num.cast("string"), 8, "0"))
    turn_idx = F.pmod(h3, F.lit(spec.max_turns)).cast("int")

    insert_phase = lsn < F.lit(spec.n_events * spec.insert_phase_pct // 100)
    r = F.pmod(h4, F.lit(100))
    op = (
        F.when(insert_phase, F.lit("I"))
        .when(r < F.lit(spec.delete_pct), F.lit("D"))
        .when(r < F.lit(spec.delete_pct + spec.update_pct), F.lit("U"))
        .otherwise(F.lit("I"))
    )

    # stable per-(conv,turn) role; payload text varies per revision (lsn)
    role_idx = F.pmod(F.xxhash64(conv_id, turn_idx, F.lit(spec.seed)), F.lit(4))
    role = F.element_at(F.array(*[F.lit(x) for x in ROLES]), (role_idx + 1).cast("int"))
    edgy = F.pmod(h5, F.lit(17)) == 0
    text = F.concat(
        F.lit("turn "), turn_idx.cast("string"),
        F.lit(" of "), conv_id,
        F.lit(" rev "), lsn.cast("string"),
        F.lit(" :: "), F.md5(F.concat(conv_id, turn_idx.cast("string"), lsn.cast("string"))),
        F.when(edgy, F.lit(' "quoted,\ncomma" é\t\\N')).otherwise(F.lit("")),
    )

    jitter_us = (F.pmod(h5, F.lit(2 * spec.ts_jitter_s)) - F.lit(spec.ts_jitter_s)) * F.lit(1_000_000)
    ts = F.timestamp_micros(
        (F.lit(spec.base_ts_us) + lsn * F.lit(1_000_000) + jitter_us).cast("long")
    )

    evo = spec.evolution_lsn if spec.evolution_lsn is not None else 0
    tool = F.when(
        (lsn >= F.lit(evo)) & (role == F.lit("tool")),
        F.concat(F.lit("tool-"), F.pmod(h4, F.lit(8)).cast("string")),
    ).otherwise(F.lit(None).cast("string"))

    is_delete = op == F.lit("D")
    null_s = F.lit(None).cast("string")
    df = ev.select(
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(is_delete, null_s).otherwise(role).alias("role"),
        F.when(is_delete, null_s).otherwise(text).alias("text"),
        F.when(is_delete, null_s).otherwise(tool).alias("tool"),
        ts.alias("ts"),
        lsn.alias("source_lsn"),
        F.pmod(F.xxhash64(conv_id, F.lit(spec.seed)), F.lit(spec.n_source_partitions))
        .cast("int")
        .alias("source_partition"),
    )
    return df


def split_for_evolution(
    df: DataFrame, evolution_lsn: int
) -> tuple[DataFrame, DataFrame]:
    """(pre, post) slices: pre lacks the ``tool`` column *entirely*
    (early-stream schema); post carries it — drives the ADD COLUMN path."""
    pre = df.filter(F.col("source_lsn") < evolution_lsn).drop("tool")
    post = df.filter(F.col("source_lsn") >= evolution_lsn)
    return pre, post
