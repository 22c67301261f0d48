"""Naive pandas replay oracle for the CDC engine (SURVEY.md §5).

Applies the changelog sequentially in strict ``(ts, source_lsn,
source_partition)`` order — the reference's single-threaded
last-statement-wins REPLACE/DELETE behavior — and returns the final
transcripts state with stable turn ordering. Deliberately simple and
slow; correctness suites compare the engine against this at small SF.
"""

from __future__ import annotations

import pandas as pd


def replay_oracle(changelog: pd.DataFrame, payload_cols: list[str]) -> pd.DataFrame:
    ev = changelog.sort_values(
        ["ts", "source_lsn", "source_partition"], kind="mergesort"
    )
    state: dict[tuple, dict] = {}
    for row in ev.itertuples(index=False):
        d = row._asdict()
        key = (d["conv_id"], d["turn_idx"])
        if d["op"] == "D":
            state.pop(key, None)
            # tombstone: remember nothing — a later event with a *newer*
            # (ts,lsn) can re-insert; older ones were already processed
            # earlier in this ordered replay, so dict semantics match the
            # engine's tombstone rule exactly.
        else:
            state[key] = {c: d.get(c) for c in payload_cols}
    if not state:
        return pd.DataFrame(columns=payload_cols)
    out = pd.DataFrame([v for _, v in sorted(state.items())])
    return out[payload_cols].reset_index(drop=True)


def normalize(df: pd.DataFrame, payload_cols: list[str]) -> pd.DataFrame:
    out = df[payload_cols].sort_values(["conv_id", "turn_idx"], kind="mergesort")
    out = out.reset_index(drop=True)
    # timestamps: compare at µs precision
    if "ts" in out.columns:
        out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
    return out
