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
