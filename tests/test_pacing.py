"""TPS pacing + monitor output (reference: RateLimiter / MonitorThread)."""

import time

from polardbx_tools_spark.changelog.generator import ChangelogSpec, generate_changelog
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
