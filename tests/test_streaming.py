"""Streaming suite: readStream tail → foreachBatch merge, checkpointed
restart, arriving files."""

import pandas.testing as pdt
from pyspark.sql import functions as F

from polardbx_tools_spark.changelog.generator import (
    ChangelogSpec,
    changelog_schema,
    generate_changelog,
)
from polardbx_tools_spark.pipeline import CdcPipeline
from polardbx_tools_spark.streaming import start_cdc_stream

from tests.oracle import normalize, replay_oracle

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
SPEC = ChangelogSpec(n_events=1200, n_convs=60, seed=33)


def test_stream_drain_equals_batch_replay(spark, tmp_path):
    cl = generate_changelog(spark, SPEC)
    src = str(tmp_path / "incoming")
    # two "binlog segment" files landing in the tail directory
    cl.filter("source_lsn < 600").write.parquet(src + "/seg1")
    cl.filter("source_lsn >= 600").write.parquet(src + "/seg2")
    # file source reads a flat dir; flatten via glob dir layout
    import glob, os, shutil
    os.makedirs(src + "/flat")
    for i, f in enumerate(sorted(glob.glob(src + "/seg*/**/*.parquet", recursive=True))):
        shutil.copy(f, f"{src}/flat/part-{i:04d}.parquet")

    table = str(tmp_path / "t")
    q = start_cdc_stream(
        spark,
        src + "/flat",
        changelog_schema(with_tool=True),
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        bucket_count=8,
        available_now=True,
    )
    q.awaitTermination(120)

    pipe = CdcPipeline(spark, table, bucket_count=8)
    got = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)
    want = normalize(replay_oracle(cl.toPandas(), PAYLOAD), PAYLOAD)
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_stream_restart_with_new_files(spark, tmp_path):
    """Drain, stop, land a new segment, restart with same checkpoint —
    only the new file is processed; state converges to full replay."""
    import os

    cl = generate_changelog(spark, SPEC)
    src = str(tmp_path / "flat")
    os.makedirs(src)
    schema = changelog_schema(with_tool=True)

    def land(df, name):
        import glob
        import shutil

        seg = str(tmp_path / f"_seg_{name}")
        df.coalesce(1).write.parquet(seg)
        part = glob.glob(seg + "/*.parquet")[0]
        shutil.move(part, f"{src}/{name}.parquet")

    land(cl.filter("source_lsn < 800"), "seg1")
    table, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    q = start_cdc_stream(spark, src, schema, table, ckpt, bucket_count=8)
    q.awaitTermination(120)
    pipe = CdcPipeline(spark, table, bucket_count=8)
    rows_phase1 = pipe.read_transcripts().count()

    land(cl.filter("source_lsn >= 800"), "seg2")
    q2 = start_cdc_stream(spark, src, schema, table, ckpt, bucket_count=8)
    q2.awaitTermination(120)

    got = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)
    want = normalize(replay_oracle(cl.toPandas(), PAYLOAD), PAYLOAD)
    pdt.assert_frame_equal(got, want, check_dtype=False)
    assert rows_phase1 > 0


def test_stream_schema_evolution_on_restart(spark, tmp_path):
    """The tail starts with the early-stream schema (no `tool`); after a
    restart with the evolved schema, the table evolves additively and
    converges to the full replay (the streaming analog of DDL WITH mode)."""
    import glob
    import os
    import shutil

    from polardbx_tools_spark.changelog.generator import split_for_evolution

    spec = ChangelogSpec(n_events=1000, n_convs=50, seed=77, evolution_lsn=500)
    cl = generate_changelog(spark, spec)
    pre, post = split_for_evolution(cl, 500)

    src_pre, src_post = str(tmp_path / "pre"), str(tmp_path / "post")
    os.makedirs(src_pre), os.makedirs(src_post)

    def land(df, d, name):
        seg = str(tmp_path / f"_seg_{name}")
        df.coalesce(1).write.parquet(seg)
        shutil.move(glob.glob(seg + "/*.parquet")[0], f"{d}/{name}.parquet")

    land(pre, src_pre, "seg1")
    land(post, src_post, "seg2")

    table = str(tmp_path / "t")
    # phase 1: early-stream schema tail
    q = start_cdc_stream(
        spark, src_pre, changelog_schema(with_tool=False), table,
        checkpoint_dir=str(tmp_path / "ckpt1"), bucket_count=8,
    )
    q.awaitTermination(120)
    pipe = CdcPipeline(spark, table, bucket_count=8)
    assert "tool" not in [f.name for f in pipe.table.schema.fields]

    # phase 2: restart the tail on the evolved stream (new source dir +
    # checkpoint, same table) — schema must evolve additively
    q2 = start_cdc_stream(
        spark, src_post, changelog_schema(with_tool=True), table,
        checkpoint_dir=str(tmp_path / "ckpt2"), bucket_count=8,
    )
    q2.awaitTermination(120)
    assert "tool" in [f.name for f in pipe.table.schema.fields]

    got = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)
    want = normalize(replay_oracle(cl.toPandas(), PAYLOAD), PAYLOAD)
    pdt.assert_frame_equal(got, want, check_dtype=False)
