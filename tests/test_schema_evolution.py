"""Schema-evolution suite: the ``tool`` column appears mid-stream
(FIXTURES.md §4 ``changelog_evolved``; reference analog: DDL WITH mode,
``exec/ImportExecutor.java:137-159``)."""

import pandas.testing as pdt

from polardbx_tools_spark.changelog.generator import (
    ChangelogSpec,
    generate_changelog,
    split_for_evolution,
)
from polardbx_tools_spark.pipeline import CdcPipeline

from tests.oracle import normalize, replay_oracle

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_tool_column_appears_mid_stream(spark, tmp_table_path):
    evo = 1000
    spec = ChangelogSpec(n_events=2000, n_convs=100, seed=21, evolution_lsn=evo)
    cl = generate_changelog(spark, spec)
    pre, post = split_for_evolution(cl, evo)
    assert "tool" not in pre.columns and "tool" in post.columns

    pipe = CdcPipeline(spark, tmp_table_path, bucket_count=8)
    # phase 1: early-stream schema (no tool column anywhere)
    pipe.ensure_table(with_tool=False)
    pipe.run(pre, batch_lsns=500, max_lsn=evo - 1)
    assert "tool" not in [f.name for f in pipe.table.schema.fields]

    # phase 2: evolved events — engine must ADD COLUMN additively
    pipe.run(post, batch_lsns=500, max_lsn=1999)
    names = [f.name for f in pipe.table.schema.fields]
    assert "tool" in names, "schema must evolve additively mid-stream"

    got = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)
    want = normalize(replay_oracle(cl.toPandas(), PAYLOAD), PAYLOAD)
    # oracle carries tool for pre-evolution events as generated (NULL before
    # evolution_lsn by construction), matching the engine's NULL backfill
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_pre_evolution_rows_read_as_null(spark, tmp_table_path):
    evo = 600
    spec = ChangelogSpec(
        n_events=1200, n_convs=60, seed=22, evolution_lsn=evo, insert_phase_pct=100
    )
    cl = generate_changelog(spark, spec)
    pre, post = split_for_evolution(cl, evo)
    pipe = CdcPipeline(spark, tmp_table_path, bucket_count=8)
    pipe.ensure_table(with_tool=False)
    pipe.run(pre, batch_lsns=600, max_lsn=evo - 1)
    pipe.run(post, batch_lsns=600, max_lsn=1199)

    df = pipe.read_transcripts().toPandas()
    assert "tool" in df.columns
    # at least one post-evolution tool-role row carries a tool value
    assert df["tool"].notna().any()
    # rows last touched before evolution read tool as NULL (old files
    # never rewritten, scanned with the evolved schema)
    assert df["tool"].isna().any()


def test_type_drift_is_rejected_before_commit(spark, tmp_table_path):
    """A same-name column arriving with a DIFFERENT type must fail at
    schema-evolution time — before anything commits — instead of being
    silently skipped and writing files whose physical type contradicts
    the manifest (review finding)."""
    import pytest as _pytest
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    pipe = CdcPipeline(spark, tmp_table_path, bucket_count=4)
    table = pipe.ensure_table(with_tool=False)
    drifted = StructType([StructField("turn_idx", StringType(), True)])
    with _pytest.raises(ValueError, match="additive-only"):
        table.evolved_schema(drifted)
    # same-name same-type remains a no-op, new columns still append
    ok = StructType([
        StructField("turn_idx", IntegerType(), True),
        StructField("brand_new", StringType(), True),
    ])
    evolved = table.evolved_schema(ok)
    assert "brand_new" in [f.name for f in evolved.fields]
