"""Golden-file generator test — mirrors the reference's checked-in
TPC-H refresh fixtures (``src/test/java/tpch/TpchUpdateTest.java:33-120``):
the deterministic changelog must be bit-stable across rounds/machines,
because every correctness oracle comparison depends on it."""

import hashlib

import pyspark.sql.functions as F

from polardbx_tools_spark.changelog.generator import ChangelogSpec, generate_changelog

GOLDEN_SPEC = ChangelogSpec(n_events=1000, n_convs=50, seed=42, evolution_lsn=500)
GOLDEN_MD5 = "de4d672da3414c51084dd0f6731c5cf2"
GOLDEN_COUNTS = (1000, 807, 138, 55, 50)  # total, I, U, D, distinct convs


def test_generator_is_bit_stable(spark):
    df = generate_changelog(spark, GOLDEN_SPEC)
    line = F.concat_ws(
        "|", "op", "conv_id", "turn_idx", "role", "text", "tool",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        "source_lsn", "source_partition",
    ).alias("line")
    vals = sorted(r["line"] for r in df.select(line).collect())
    assert hashlib.md5("\n".join(vals).encode()).hexdigest() == GOLDEN_MD5

    agg = df.agg(
        F.count("*"),
        F.sum(F.when(F.col("op") == "I", 1).otherwise(0)),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0)),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)),
        F.countDistinct("conv_id"),
    ).collect()[0]
    assert tuple(agg) == GOLDEN_COUNTS


def test_generator_properties(spark):
    """Structural invariants (FIXTURES.md §2): lsn unique+monotone per
    partition by construction, insert-only prefix, skew present,
    duplicates present, tool only after evolution point."""
    df = generate_changelog(spark, GOLDEN_SPEC)
    n = df.count()
    assert df.select("source_lsn").distinct().count() == n  # unique lsn
    prefix = df.filter(F.col("source_lsn") < 1000 * GOLDEN_SPEC.insert_phase_pct // 100)
    assert prefix.filter(F.col("op") != "I").count() == 0
    # duplicates: some (conv, turn) keys appear many times
    dup = (
        df.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
    )
    assert dup > 0
    # skew: hottest conversation has far more events than median
    per_conv = df.groupBy("conv_id").count()
    mx = per_conv.agg(F.max("count")).collect()[0][0]
    md = per_conv.agg(F.expr("percentile_approx(count, 0.5)")).collect()[0][0]
    assert mx > 3 * md
    # tool only at/after evolution_lsn
    assert df.filter((F.col("tool").isNotNull()) & (F.col("source_lsn") < 500)).count() == 0
    assert df.filter(F.col("tool").isNotNull()).count() > 0
