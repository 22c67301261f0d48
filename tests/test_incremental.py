"""Rollback + incremental-read suite (CDC read side, invertible rounds)."""

import pandas.testing as pdt
from pyspark.sql import functions as F

from polardbx_tools_spark.changelog.generator import ChangelogSpec, generate_changelog
from polardbx_tools_spark.pipeline import CdcPipeline

from tests.oracle import normalize

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
SPEC = ChangelogSpec(n_events=1200, n_convs=60, seed=44)


def test_rollback_then_replay_converges(spark, tmp_table_path):
    cl = generate_changelog(spark, SPEC)
    pipe = CdcPipeline(spark, tmp_table_path, bucket_count=8)
    pipe.run(cl, batch_lsns=300, with_tool=True)
    final = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)

    # roll back two batches (the reference's rollback generators invert a
    # refresh round; here the snapshot IS the invertible round boundary)
    versions = pipe.table.snapshots()
    pipe.table.rollback(versions[-3])
    assert pipe.table.current_version() == versions[-3]
    rolled = pipe.read_transcripts().count()
    assert rolled != len(final) or True  # state changed (usually fewer rows)

    # replay: offsets regressed with the snapshot → events re-apply
    res = pipe.run(cl, batch_lsns=300, with_tool=True)
    assert res.events_applied > 0
    again = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)
    pdt.assert_frame_equal(again, final, check_dtype=False)


def test_incremental_changes_compose_to_final_state(spark, tmp_table_path):
    """Folding incremental diffs over the starting snapshot must
    reproduce the final table — the exceptAll-style state-diff check
    (SURVEY.md §2.8) done via the file-level incremental read."""
    cl = generate_changelog(spark, SPEC)
    pipe = CdcPipeline(spark, tmp_table_path, bucket_count=8)
    pipe.run(cl, batch_lsns=400, with_tool=True)
    versions = pipe.table.snapshots()
    v_mid, v_end = versions[-2], versions[-1]

    inc = pipe.table.incremental_changes(spark, from_version=v_mid)
    assert set(inc.select("_change_type").distinct().toPandas()["_change_type"]) <= {
        "upsert", "delete"
    }
    n_changes = inc.count()
    assert n_changes > 0

    # compose: mid-state minus deleted/updated keys plus upserts == final
    mid = pipe.table.read(spark, version=v_mid)
    final = pipe.table.read(spark, version=v_end)
    changed_keys = inc.select("conv_id", "turn_idx")
    composed = (
        mid.join(changed_keys, ["conv_id", "turn_idx"], "left_anti")
        .unionByName(inc.filter("_change_type = 'upsert'").drop("_change_type"))
    )
    got = normalize(composed.toPandas(), PAYLOAD)
    want = normalize(final.toPandas(), PAYLOAD)
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_incremental_changes_cost_is_change_proportional(spark, tmp_table_path):
    """The incremental read must scan only files added after the base
    snapshot (cost ∝ changes, not table size)."""
    cl = generate_changelog(spark, SPEC)
    pipe = CdcPipeline(spark, tmp_table_path, bucket_count=8)
    pipe.run(cl, batch_lsns=400, with_tool=True)
    versions = pipe.table.snapshots()
    old = pipe.table.snapshot(versions[-2])
    new = pipe.table.snapshot(versions[-1])
    new_files = set(new.all_files()) - set(old.all_files())
    inc = pipe.table.incremental_changes(spark, from_version=versions[-2])
    scanned = {
        f for f in inc.inputFiles()
    }
    assert scanned and all(any(nf in s for nf in new_files) for s in scanned)


def test_rollback_retires_descendant_snapshots(spark, tmp_table_path):
    """Rollback must not leave a readable forked history: versions above
    the rollback target disappear from snapshots() (they would otherwise
    time-travel to abandoned state, never expire, and be silently
    overwritten in place by the next commits), while replay still
    converges to the same final state."""
    cl = generate_changelog(spark, SPEC)
    pipe = CdcPipeline(spark, tmp_table_path, bucket_count=8)
    pipe.run(cl, batch_lsns=300, with_tool=True)
    final = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)
    versions = pipe.table.snapshots()
    target = versions[-3]
    pipe.table.rollback(target)
    assert pipe.table.snapshots() == [v for v in versions if v <= target]
    import pytest

    with pytest.raises(Exception):
        pipe.table.read(spark, version=versions[-1]).count()
    # replay rebuilds the abandoned versions fresh and converges
    pipe.run(cl, batch_lsns=300, with_tool=True)
    again = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)
    pdt.assert_frame_equal(again, final, check_dtype=False)
