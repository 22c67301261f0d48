"""Transcript-corpus bridge: turn the CDC lake's final transcript state
into training documents for the corpus operators (C4 cleaning, dedup,
decontamination, packing).

The ingest half of the engine maintains conversations as one row per
turn keyed by (conv_id, turn_idx); the training half consumes one
DOCUMENT per conversation with the turns rendered in order. This module
is that join point — run it over ``CdcPipeline.read_transcripts()`` (or
any frame with the input-hint schema: conv_id, turn_idx, role, text,
optional tool) and feed the result straight into
``text.c4_clean`` / ``dedup.minhash_lsh_pairs`` /
``packing.pack_sequences``.

Scale shape: ONE shuffle (groupBy conv_id) per call; rendering and
ordering happen inside builtin aggregation (``sort_array`` over
collected turn structs, ``transform`` to lines, ``array_join``) — no
UDF, no window, no second exchange. Turn order is total and stable
(turn_idx), matching the merge's per-turn-equality invariant, so the
rendered document is deterministic for a given lake state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transcripts_to_documents(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str | None = "tool",
    sep: str = "\n",
) -> DataFrame:
    """One training document per conversation:
    ``(conv_col, text, n_turns, n_assistant_turns, n_tool_turns)``.

    Each turn renders as ``role: text`` (``role(tool): text`` when the
    turn carries a tool name); NULL turn text renders as an empty
    payload, keeping turn count faithful to the lake state. Pass
    ``tool_col=None`` for pre-evolution frames without the column.
    """
    has_tool = tool_col is not None and tool_col in df.columns
    struct_cols = [
        F.col(turn_col).alias("_t"),
        F.col(role_col).alias("_r"),
        F.col(text_col).alias("_x"),
    ]
    if has_tool:
        struct_cols.append(F.col(tool_col).alias("_o"))

    def line(s):
        head = (
            F.when(
                s["_o"].isNotNull(),
                F.concat(s["_r"], F.lit("("), s["_o"], F.lit(")")),
            ).otherwise(s["_r"])
            if has_tool
            else s["_r"]
        )
        return F.concat(
            F.coalesce(head, F.lit("unknown")),
            F.lit(": "),
            F.coalesce(s["_x"], F.lit("")),
        )

    turns = F.sort_array(F.collect_list(F.struct(*struct_cols)))
    return (
        df.groupBy(conv_col)
        .agg(
            F.array_join(F.transform(turns, line), sep).alias("text"),
            F.count("*").cast("long").alias("n_turns"),
            F.sum((F.col(role_col) == "assistant").cast("long"))
            .cast("long")
            .alias("n_assistant_turns"),
            (
                F.sum(F.col(tool_col).isNotNull().cast("long")).cast("long")
                if has_tool
                else F.lit(0).cast("long")
            ).alias("n_tool_turns"),
        )
    )


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    role_col: str = "role",
) -> DataFrame:
    """Corpus-level transcript profile in one aggregation:
    ``(n_conversations, n_turns, avg_turns_per_conv, n_tokens,
    assistant_token_share)`` — the numbers a training-mix planner asks
    for before packing. Assistant share uses whitespace tokens (the
    loss-bearing fraction under user-turn masking)."""
    from polardbx_tools_spark.operators.text import token_count

    tc = token_count(F.col(text_col)).cast("long")
    per_conv = df.groupBy(conv_col).agg(
        F.count("*").alias("_turns"),
        F.sum(tc).alias("_toks"),
        F.sum(
            F.when(F.col(role_col) == "assistant", tc).otherwise(0)
        ).alias("_atoks"),
    )
    return per_conv.agg(
        F.count("*").cast("long").alias("n_conversations"),
        F.sum("_turns").cast("long").alias("n_turns"),
        F.round(F.avg("_turns"), 4).alias("avg_turns_per_conv"),
        F.sum("_toks").cast("long").alias("n_tokens"),
        F.round(F.sum("_atoks") / F.sum("_toks"), 6)
        .alias("assistant_token_share"),
    )
