"""Custom stateful streaming operator: gap-based conversation
sessionization with ``applyInPandasWithState``.

The reference keeps per-session affinity by hash-routing events to
threads (``frodo-core/.../core/Frodo.java:307-317``) but has no cross-
batch state; a lake-side transcript pipeline needs it (e.g. "split a
conversation into sessions when >N minutes pass between turns" while the
stream is still running). This is the engine's exemplar of the Spark
stateful-op pattern: state keyed by ``conv_id``, event-time timeout,
Arrow-batched pandas on both sides (no per-row Python).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("session_id", IntegerType(), False),
        StructField("turn_idx", IntegerType(), True),
        StructField("ts", TimestampType(), True),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType(), True),
        StructField("session_id", IntegerType(), True),
    ]
)


def make_sessionizer(gap_seconds: int = 300):
    """Build the per-group stateful function: assigns each turn a
    ``session_id`` that increments whenever the gap since the previous
    turn of the same conversation exceeds ``gap_seconds`` — across
    microbatch boundaries (state carries last_ts + counter)."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        last_ts_us, session_id = (
            state.get if state.exists else (None, 0)
        )
        # a group larger than the Arrow batch size arrives as SEVERAL
        # chunks in shuffle (arbitrary) order — the gap scan is a
        # sequential fold over the group's timeline, so the chunks must
        # be concatenated and sorted ONCE before scanning (sorting each
        # chunk independently lets last_ts_us move backwards across a
        # chunk boundary and mis-assigns session ids)
        chunks = list(pdfs)
        if not chunks:  # state-timeout invocation carries no data
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "turn_idx"], kind="mergesort"
        )
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        sids = []
        for t in ts_us:
            if last_ts_us is not None and t - last_ts_us > gap_us:
                session_id += 1
            last_ts_us = t
            sids.append(session_id)
        state.update((last_ts_us, session_id))
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "session_id": pd.array(sids, dtype="int32"),
                "turn_idx": pdf["turn_idx"].values,
                "ts": pdf["ts"].values,
            }
        )

    return fn


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 300, timeout: str = "NoTimeout"
) -> DataFrame:
    """Apply stateful sessionization to a (streaming or batch-test)
    DataFrame with columns (conv_id, turn_idx, ts)."""
    return (
        events.groupBy("conv_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=getattr(GroupStateTimeout, timeout),
        )
    )
