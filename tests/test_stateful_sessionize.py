"""Stateful streaming sessionization: state survives microbatch
boundaries; sessions split on gaps > threshold."""

import datetime as dt
import glob
import os
import shutil

from polardbx_tools_spark.streaming.sessionize import sessionize_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def turns(conv, specs):
    """specs: list of (turn_idx, offset_seconds)."""
    return [(conv, t, T0 + dt.timedelta(seconds=s)) for t, s in specs]


def test_sessionize_stream_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "conv_id string, turn_idx int, ts timestamp"

    def land(rows, name):
        seg = str(tmp_path / f"_seg_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(seg)
        shutil.move(glob.glob(seg + "/*.parquet")[0], f"{src}/{name}.parquet")

    # batch 1: conv a turns 0,1 close together; conv b turn 0
    land(turns("a", [(0, 0), (1, 10)]) + turns("b", [(0, 5)]), "seg1")

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=300)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # batch 2 (separate run, same checkpoint): conv a resumes 400s later
    # (> gap → NEW session) then continues; state must have survived
    land(turns("a", [(2, 410), (3, 420)]) + turns("b", [(1, 20)]), "seg2")
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = (
        sessionize_stream(stream2, gap_seconds=300)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    got = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[("a", 0)] == 0 and got[("a", 1)] == 0
    assert got[("a", 2)] == 1 and got[("a", 3)] == 1  # split across batches
    assert got[("b", 0)] == 0 and got[("b", 1)] == 0  # no split
