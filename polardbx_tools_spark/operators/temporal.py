"""Temporal join operators: as-of (nearest-prior) enrichment.

Spark has no ASOF JOIN; the naive emulation — equi-join on key with a
``l.ts >= r.ts`` range filter, then a row_number to keep the latest —
materializes every (event, prior-quote) pair before pruning, which is
quadratic per key and explodes on hot keys. The scalable form is the
union + last-value window: tag both sides, union on (key, ts), and carry
the right side's payload forward with ``last(ignorenulls)`` over rows
unbounded-preceding..current. One shuffle on the key, linear state, no
pair blow-up — the same plan shape Flink uses for temporal joins.

Reference analog: the replay tooling joins each replayed statement to the
connection/session state current *at that statement's timestamp* (frodo
event-time replay, ``JSConsumerThreadV2.java:146-162`` pacing over the
capture timeline); as-of is that "state current at ts" lookup as a
relational operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Left as-of join: each left row gains the ``value_cols`` of the
    latest right row with ``right.ts <= left.ts`` (``<`` when
    ``allow_exact_matches=False``) for the same ``on`` keys; NULL when no
    prior right row exists.

    The right side must be unique per (*on*, ts) — pre-aggregate ties
    (e.g. ``groupBy(keys, ts).agg(max(...))``) or the carried value is
    order-dependent. Matches DuckDB/pandas ``ASOF JOIN`` semantics
    (direction="backward").

    Scale: one shuffle of left+right on ``on``; window state is a single
    row of carried values per partition scan position. No range-join
    pair explosion on hot keys.
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in set(on) | {right_ts}
        ]
    # _side orders right rows before (exact-match) or after (strict) left
    # rows at equal ts, so the carry window includes/excludes ties.
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ats"),
        F.lit(0 if allow_exact_matches else 2).alias("_side"),
        *[F.col(c) for c in value_cols],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in value_cols],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the payload as ONE struct: a matched right row whose values
    # are all NULL still produces a non-NULL struct, so "matched, value
    # NULL" stays distinct from "no prior right row" (pandas/DuckDB
    # return NULL from the MATCHED row, never a stale older value)
    payload = F.when(
        F.col("_side") != 1, F.struct(*[F.col(c) for c in value_cols])
    )
    carried = r.unionByName(l, allowMissingColumns=True).select(
        "*",
        F.last(payload, ignorenulls=True).over(w).alias("_carry"),
    )
    keep = [c for c in left.columns] + [
        F.col(f"_carry.{c}").alias(c) for c in value_cols
    ]
    return carried.filter(F.col("_side") == 1).select(*keep)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    bin_width: int,
) -> DataFrame:
    """Interval join: every (left row, right interval) pair with
    ``start <= ts < end`` (and equal ``on`` keys), without the
    nested-loop plan Spark falls back to for inequality conditions —
    which at scale is |left| x |right| per key.

    Binning strategy: each left row lands in the single time bin of its
    ``ts``; each right interval EXPLODES into every bin it covers
    (ceil(len/bin_width)+1 rows — intervals are assumed bounded, e.g.
    sessions or maintenance windows, so the explode factor is a small
    constant). The join is then a pure equi-join on (keys..., bin) —
    shuffle-partitionable, AQE-skew-splittable — with the exact
    inequality applied as a post-filter. Each (row, interval) pair meets
    in EXACTLY one bin (the bin of ts), so no dedup pass is needed.

    ``bin_width`` is in the (numeric) ts column's own units — use epoch
    seconds/micros longs for timestamps — and should be on the order of
    the typical interval length: too small explodes intervals into many
    bins, too large degrades to a per-key nested loop inside each bin.

    All arithmetic is INTEGER (``div`` truncation — monotonic, so a row
    inside an interval always lands within the interval's truncated bin
    range) and the boundary filter compares the native columns: exact at
    any magnitude, including epoch-nanosecond longs past 2^53 where a
    double round-trip would mis-place boundaries.
    """
    def _bin(cname: str) -> Column:
        return F.expr(f"CAST(`{cname}` AS BIGINT) div {int(bin_width)}")

    r = right.withColumn(
        "_bin", F.explode(F.sequence(_bin(right_start), _bin(right_end)))
    )
    l = left.withColumn("_bin", _bin(left_ts))
    out = l.join(r, on=on + ["_bin"]).filter(
        (F.col(left_ts) >= F.col(right_start))
        & (F.col(left_ts) < F.col(right_end))
    )
    return out.drop("_bin")
