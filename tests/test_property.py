"""Property-based merge testing (hypothesis): for ANY changelog —
arbitrary op mix, duplicate keys, ties, out-of-order timestamps, batch
boundaries — the engine's final state equals the sequential pandas
oracle. Complements the fixed-seed suites with adversarial inputs."""

import datetime as dt

import pandas.testing as pdt
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polardbx_tools_spark.changelog.generator import changelog_schema
from polardbx_tools_spark.pipeline import CdcPipeline

from tests.oracle import normalize, replay_oracle

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
T0 = dt.datetime(2024, 1, 1)

# events: op, conv (small key space → lots of collisions), turn, ts-offset
event_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 3),        # conv
    st.integers(0, 2),        # turn
    st.integers(0, 20),       # ts seconds (ties likely)
    st.text(alphabet="abcxyz ,\"\n", min_size=0, max_size=8),
)
changelog_st = st.lists(event_st, min_size=1, max_size=40)


def to_rows(events):
    rows = []
    for lsn, (op, conv, turn, ts_s, text) in enumerate(events):
        is_d = op == "D"
        rows.append((
            op,
            f"c{conv}",
            turn,
            None if is_d else "user",
            None if is_d else text,
            None,
            T0 + dt.timedelta(seconds=ts_s),
            lsn,
            conv % 2,  # source partition keyed by conv (per-key monotone lsn)
        ))
    return rows


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=changelog_st, batch_size=st.sampled_from([5, 16, 1000]))
def test_engine_equals_oracle_for_any_changelog(spark, tmp_path_factory, events, batch_size):
    import pandas as pd

    table_path = str(tmp_path_factory.mktemp("prop") / "t")
    rows = to_rows(events)
    df = spark.createDataFrame(rows, changelog_schema(with_tool=True))

    pipe = CdcPipeline(spark, table_path, bucket_count=4)
    pipe.run(df, batch_lsns=batch_size, with_tool=True)

    got = normalize(pipe.read_transcripts().toPandas(), PAYLOAD)
    cl_pd = pd.DataFrame(rows, columns=[
        "op", "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "source_lsn", "source_partition",
    ])
    want = normalize(replay_oracle(cl_pd, PAYLOAD), PAYLOAD)
    pdt.assert_frame_equal(got, want, check_dtype=False)
