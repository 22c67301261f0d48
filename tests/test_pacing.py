"""TPS pacing, event-time rate-factor replay, monitor output
(reference: RateLimiter / JSConsumerThreadV2 offline replay /
MonitorThread)."""

import datetime as dt
import time

from polardbx_tools_spark.changelog.generator import (
    ChangelogSpec,
    changelog_schema,
    generate_changelog,
)
from polardbx_tools_spark.pipeline import CdcPipeline


def test_rate_limit_paces_run(spark, tmp_table_path, capsys):
    cl = generate_changelog(spark, ChangelogSpec(n_events=400, n_convs=30, seed=66))
    pipe = CdcPipeline(spark, tmp_table_path, bucket_count=4)
    t0 = time.time()
    res = pipe.run(cl, batch_lsns=100, with_tool=True,
                   max_events_per_sec=100.0, monitor=True)
    wall = time.time() - t0
    assert res.events_applied == 400
    assert wall >= 4.0, f"400 events at 100 ev/s must take >= 4s, took {wall:.1f}"
    out = capsys.readouterr().out
    assert "[cdc b0]" in out and "progress=100%" in out


def _span_changelog(spark, n_events=200, span_s=600):
    """Tiny changelog whose EVENT TIME spans ``span_s`` seconds."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("I", f"c{i % 20}", i % 3, "user", f"t{i}", None,
         t0 + dt.timedelta(seconds=i * span_s / n_events), i, i % 2)
        for i in range(n_events)
    ]
    from pyspark.sql.types import StructField, StructType

    schema = StructType([StructField(f.name, f.dataType, True)
                         for f in changelog_schema(True).fields])
    return spark.createDataFrame(rows, schema)


def test_rate_factor_paces_to_event_time(spark, tmp_path, capsys):
    """frodo's rate-factor replay (JSConsumerThreadV2.java:146-162):
    batch k may not finish before (max_ts_k - first_ts) * factor wall.
    600 s of event time at factor 0.01 -> ~6 s wall floor; an unpaced
    run of the same changelog is several seconds faster."""
    cl = _span_changelog(spark)

    # warm-up run (unpaced): absorbs JVM/codegen warmup so the paced
    # walls below measure pacing, not first-run compilation
    CdcPipeline(spark, str(tmp_path / "warm"), bucket_count=4).run(
        cl, batch_lsns=100, with_tool=True
    )

    t0 = time.time()
    faster = CdcPipeline(spark, str(tmp_path / "f0002"), bucket_count=4).run(
        cl, batch_lsns=100, with_tool=True, rate_factor=0.002
    )
    wall_0002 = time.time() - t0

    paced_pipe = CdcPipeline(spark, str(tmp_path / "paced"), bucket_count=4)
    t0 = time.time()
    res = paced_pipe.run(cl, batch_lsns=100, with_tool=True,
                         rate_factor=0.01, monitor=True)
    paced = time.time() - t0

    # event span is 597 s -> schedule floor 5.97 s at factor 0.01,
    # 1.19 s at factor 0.002: the floor is enforced by construction
    assert paced >= 5.5, f"paced run finished in {paced:.1f}s (< schedule)"
    assert wall_0002 >= 1.1 and faster.batches == res.batches
    # the 5x-slower property only holds while COMPUTE stays under the
    # schedule floor; under heavy parallel-suite load the factor-0.002
    # run's merges can exceed their 1.19s floor and the fixed margin
    # turns into a load flake — assert the relative slowdown only when
    # the faster run actually ran at its schedule
    if wall_0002 < 4.0:
        assert paced >= wall_0002 + 2.0, (
            f"5x the rate factor must slow the replay: "
            f"{paced:.1f} vs {wall_0002:.1f}"
        )
    # delay gauge recorded per batch and printed by the monitor
    assert len(res.replay_delays) == res.batches
    s = res.replay_delay_summary()
    assert set(s) == {"min", "max", "avg"} and s["max"] >= s["min"] >= 0.0
    assert "replay_delay=" in capsys.readouterr().out
