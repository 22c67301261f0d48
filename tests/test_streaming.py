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


def test_stream_drain_mor_mode_equals_oracle(spark, tmp_path):
    """The streaming tail in merge-on-read mode (the natural mode for a
    high-frequency tail: batch-sized delta appends per microbatch) must
    drain to the same final state as the sequential oracle, leaving
    delta files behind for compaction."""
    cl = generate_changelog(spark, SPEC)
    src = str(tmp_path / "incoming")
    cl.write.parquet(src + "/seg")
    import glob, os, shutil
    os.makedirs(src + "/flat")
    for i, f in enumerate(sorted(glob.glob(src + "/seg/**/*.parquet", recursive=True))):
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
        max_files_per_trigger=2,  # several microbatches -> several deltas
        merge_mode="mor",
    )
    q.awaitTermination(120)

    pipe = CdcPipeline(spark, table, bucket_count=8, merge_mode="mor")
    assert pipe.table.snapshot().deltas, "MOR tail must append delta files"
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


def test_watermarked_window_agg_drops_late_data(spark, tmp_path):
    """Watermarked tumbling-window streaming aggregation (append mode):
    windows emit exactly once when the watermark passes their end, and
    an event arriving later than the watermark horizon is DROPPED — it
    must not resurrect or change an already-emitted window."""
    import datetime as dt
    import os

    from polardbx_tools_spark.streaming import start_windowed_counts_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def land(minute: int, n: int, name: str):
        rows = [(t0 + dt.timedelta(minutes=minute, seconds=i), i) for i in range(n)]
        spark.createDataFrame(rows, "ts timestamp, v long").coalesce(1) \
            .write.mode("overwrite").parquet(str(tmp_path / f"stage_{name}"))
        import glob
        import shutil
        part = glob.glob(str(tmp_path / f"stage_{name}" / "*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    # minutes 0..5, one file per minute so the watermark advances
    # per-microbatch (maxFilesPerTrigger=1)
    for m in range(6):
        land(m, 10 + m, f"m{m}")
    q = start_windowed_counts_stream(
        spark, src, "ts timestamp, v long", out, ckpt,
        window="1 minute", watermark="2 minutes", max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    got1 = {r["w_start"].minute: r["n_events"] for r in spark.read.parquet(out).collect()}
    # watermark reached (min5 - 2min) = min3 -> windows 0,1,2 are final
    assert got1 == {0: 10, 1: 11, 2: 12}, got1

    # a LATE minute-0 event (beyond the watermark) plus fresh minute-9
    # data; restart from the checkpoint
    land(0, 3, "late0")   # 3 late events for minute 0 — must be dropped
    land(9, 7, "m9")
    q2 = start_windowed_counts_stream(
        spark, src, "ts timestamp, v long", out, ckpt,
        window="1 minute", watermark="2 minutes", max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    got2 = {r["w_start"].minute: r["n_events"] for r in spark.read.parquet(out).collect()}
    # watermark -> min7: windows 3,4,5 newly final; minute-0 count UNCHANGED
    assert got2[0] == 10, f"late data resurrected an emitted window: {got2}"
    assert got2[3] == 13 and got2[4] == 14 and got2[5] == 15, got2
    assert 9 not in got2  # its window is not final yet


def test_streaming_dedup_gate(spark, tmp_path):
    """Corpus-curation tail: drained batches must leave an accepted
    corpus with NO near-dup pair (at the gate's threshold), every
    rejected doc must point at an earlier-accepted near-dup, and a
    checkpoint replay (restart with the same source) must change
    nothing — the id guard makes replays no-ops."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from polardbx_tools_spark.operators import dedup
    from polardbx_tools_spark.streaming import start_dedup_stream
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    src = str(tmp_path / "incoming")
    d.write.parquet(src + "/seg")
    _os.makedirs(src + "/flat")
    for i, f in enumerate(sorted(_glob.glob(src + "/seg/**/*.parquet",
                                            recursive=True))):
        _shutil.copy(f, f"{src}/flat/part-{i:04d}.parquet")

    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    kw = dict(
        index_path=str(tmp_path / "idx"),
        accepted_dir=str(tmp_path / "acc"),
        rejected_dir=str(tmp_path / "rej"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        verify_threshold=0.4,
        max_files_per_trigger=2,
    )
    q = start_dedup_stream(spark, src + "/flat", schema, **kw)
    q.awaitTermination(120)

    acc = spark.read.parquet(str(tmp_path / "acc"))
    rej = spark.read.parquet(str(tmp_path / "rej"))
    n_acc, n_rej = acc.count(), rej.count()
    assert n_acc + n_rej == d.count()
    assert n_rej > 0, "sf0.001 documents contain near-dups; gate found none"

    # accepted corpus is clean at the gate's threshold
    left = dedup.minhash_lsh_pairs(acc, num_hashes=32, bands=8,
                                   verify_threshold=0.4).count()
    assert left == 0, f"{left} near-dup pairs survived the gate"

    # every reject points at an ACCEPTED doc with verified similarity
    joined = rej.join(acc.select(F.col("doc_id").alias("dup_of")), on="dup_of")
    assert joined.count() == n_rej

    # replay: same source with a FRESH checkpoint re-delivers every
    # batch — the processed-ids guard must make the whole rerun a no-op
    kw2 = dict(kw, checkpoint_dir=str(tmp_path / "ckpt2"),
               max_files_per_trigger=3)  # different batch boundaries too
    q2 = start_dedup_stream(spark, src + "/flat", schema, **kw2)
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "acc")).count() == n_acc
    assert spark.read.parquet(str(tmp_path / "rej")).count() == n_rej
    idx_rows = spark.read.parquet(str(tmp_path / "idx") + "/hs").count()
    assert idx_rows == n_acc, "index must hold exactly the accepted docs"


def test_dedup_gate_compacts_index_mid_stream(spark, tmp_path):
    """Gate with ``compact_every_batches``: decisions are identical to
    the non-compacting gate (same accepted/rejected counts, index holds
    exactly the accepted docs), the index's small-file growth is folded
    (fewer parquet files than batches appended), and a compact() that
    crashed between its two renames (hs missing, _hs_old left behind)
    is repaired by the next batch's ``idx.repair()`` before the index
    is read."""
    import glob as _glob
    import os as _os

    from polardbx_tools_spark.streaming import start_dedup_stream
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    src = str(tmp_path / "in")
    _os.makedirs(src)
    seg = str(tmp_path / "_seg")
    d.repartition(6).write.parquet(seg)
    for i, f in enumerate(sorted(_glob.glob(seg + "/part-*.parquet"))):
        _os.rename(f, f"{src}/part-{i:04d}.parquet")

    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])

    def run_gate(tag, **extra):
        kw = dict(
            index_path=str(tmp_path / f"idx{tag}"),
            accepted_dir=str(tmp_path / f"acc{tag}"),
            rejected_dir=str(tmp_path / f"rej{tag}"),
            checkpoint_dir=str(tmp_path / f"ckpt{tag}"),
            verify_threshold=0.4,
            max_files_per_trigger=1,
            **extra,
        )
        q = start_dedup_stream(spark, src, schema, **kw)
        q.awaitTermination(180)
        return kw

    plain = run_gate("p")
    comp = run_gate("c", compact_every_batches=2, compact_target_files=2)

    acc_ids = {
        r["doc_id"]
        for r in spark.read.parquet(comp["accepted_dir"]).collect()
    }
    assert acc_ids == {
        r["doc_id"]
        for r in spark.read.parquet(plain["accepted_dir"]).collect()
    }
    n_rej = spark.read.parquet(comp["rejected_dir"]).count()
    assert n_rej == spark.read.parquet(plain["rejected_dir"]).count()
    assert n_rej > 0
    hs = spark.read.parquet(comp["index_path"] + "/hs")
    assert {r["id"] for r in hs.select("id").collect()} == acc_ids

    # small files folded: the final batch (6th, every-2nd) compacts to
    # target_files=2, so the compacted relation must sit at <= 2 files
    # while the append-only run holds one file per batch
    n_files = len(_glob.glob(comp["index_path"] + "/banded/*.parquet"))
    n_plain = len(_glob.glob(plain["index_path"] + "/banded/*.parquet"))
    assert n_files <= 2 < n_plain, (n_files, n_plain)

    # crash window: compact died between its two renames — hs is gone,
    # the backup remains. The next batch must repair, then decide the
    # new doc against the FULL restored corpus.
    idxp = comp["index_path"]
    _os.rename(f"{idxp}/hs", f"{idxp}/_hs_old")
    dup_src = sorted(acc_ids)[0]
    dup_text = d.filter(F.col("doc_id") == dup_src).collect()[0]["text"]
    spark.createDataFrame(
        [(10_000_001, dup_text)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    q = start_dedup_stream(
        spark, src, schema,
        index_path=idxp,
        accepted_dir=comp["accepted_dir"],
        rejected_dir=comp["rejected_dir"],
        checkpoint_dir=comp["checkpoint_dir"],
        verify_threshold=0.4,
        max_files_per_trigger=1,
        compact_every_batches=2,
    )
    q.awaitTermination(180)
    # the repaired index saw the whole corpus: the duplicate of an
    # accepted doc is REJECTED (a lost index would have accepted it)
    rej = {
        (r["doc_id"], r["dup_of"])
        for r in spark.read.parquet(comp["rejected_dir"]).collect()
    }
    assert (10_000_001, dup_src) in rej


def test_dedup_gate_chain_rejects_point_at_accepted(spark, tmp_path):
    """A near-dup chain A~B, B~C (A!~C) inside one batch must keep
    exactly the cluster canonical and point every reject at an ACCEPTED
    doc — the pairwise-greedy rule would reject C against the already-
    rejected B (review finding)."""
    from polardbx_tools_spark.streaming import start_dedup_stream
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    mid = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    a = mid + " one two three"
    c = mid + " nine ten eleven"          # shares core with mid, less with a
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, a), (2, mid), (3, c)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)

    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    q = start_dedup_stream(
        spark, src, schema,
        index_path=str(tmp_path / "idx"),
        accepted_dir=str(tmp_path / "acc"),
        rejected_dir=str(tmp_path / "rej"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        verify_threshold=0.3,
    )
    q.awaitTermination(120)

    acc = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "acc")).collect()}
    rej = {(r["doc_id"], r["dup_of"])
           for r in spark.read.parquet(str(tmp_path / "rej")).collect()}
    # exactly one doc of the connected chain survives, and every reject
    # maps to an accepted doc
    assert len(acc) + len(rej) == 3
    for _, dup_of in rej:
        assert dup_of in acc, (acc, rej)


def test_streaming_embedding_dedup_gate(spark, tmp_path):
    """Embedding-dedup gate (vector twin of the text gate): after the
    drain the accepted corpus holds NO cosine-near-dup pair at the
    threshold, every reject points at an ACCEPTED row with a verified
    near-dup, mid-stream index compaction happens, and a full replay
    from a fresh checkpoint is a no-op (id-level idempotence)."""
    import glob as _glob
    import os as _os

    import numpy as np

    from polardbx_tools_spark.operators import similarity
    from polardbx_tools_spark.streaming import start_embedding_dedup_stream
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(40, 16)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i % 2 == 0:  # plant a near-dup for every even base vector
            rows.append(
                (1000 + i, [float(x) for x in v + rng.randn(16) * 0.01])
            )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    src = str(tmp_path / "in")
    _os.makedirs(src)
    seg = str(tmp_path / "_seg")
    df.repartition(4).write.parquet(seg)
    for i, f in enumerate(sorted(_glob.glob(seg + "/part-*.parquet"))):
        _os.rename(f, f"{src}/part-{i:04d}.parquet")

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    kw = dict(
        index_path=str(tmp_path / "idx"),
        accepted_dir=str(tmp_path / "acc"),
        rejected_dir=str(tmp_path / "rej"),
        dim=16,
        threshold=0.9,
        n_planes=3,
        n_tables=8,
        max_files_per_trigger=1,
        compact_every_batches=2,
        compact_target_files=2,
    )
    q = start_embedding_dedup_stream(
        spark, src, schema, checkpoint_dir=str(tmp_path / "ckpt"), **kw
    )
    q.awaitTermination(180)

    acc = spark.read.parquet(str(tmp_path / "acc"))
    rej = spark.read.parquet(str(tmp_path / "rej"))
    n_acc, n_rej = acc.count(), rej.count()
    assert n_acc + n_rej == len(rows)
    assert n_rej > 0, "planted near-dups; gate rejected none"

    # accepted corpus is clean at the gate's threshold
    left = similarity.cosine_near_dup_pairs(
        acc, dim=16, threshold=0.9, n_planes=3, n_tables=8
    ).count()
    assert left == 0, f"{left} near-dup pairs survived the gate"

    # every reject points at an ACCEPTED row
    joined = rej.join(acc.select(F.col("vec_id").alias("dup_of")), on="dup_of")
    assert joined.count() == n_rej

    # index holds exactly the accepted rows; compaction folded files
    vecs = spark.read.parquet(str(tmp_path / "idx") + "/vecs")
    assert vecs.count() == n_acc
    assert len(_glob.glob(str(tmp_path / "idx") + "/vecs/*.parquet")) <= 2

    # replay with a fresh checkpoint: the id guard makes it a no-op
    q2 = start_embedding_dedup_stream(
        spark, src, schema, checkpoint_dir=str(tmp_path / "ckpt2"), **kw
    )
    q2.awaitTermination(180)
    assert spark.read.parquet(str(tmp_path / "acc")).count() == n_acc
    assert spark.read.parquet(str(tmp_path / "rej")).count() == n_rej


def test_streaming_gate_decontaminates_at_ingest(spark, tmp_path):
    """Curation gate with a benchmark: docs sharing a 13-gram with the
    eval corpus are routed to the contaminated sink (with their overlap
    count) BEFORE dedup — they never reach accepted, rejected, or the
    index, and never become dup_of targets. Replay re-decides nothing."""
    from polardbx_tools_spark.streaming import start_dedup_stream
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    span = " ".join(f"q{i}" for i in range(13))
    filler = lambda tag: " ".join(f"{tag}{i}" for i in range(25))
    # batch 1: clean doc 1; contaminated doc 2; doc 3 near-dup of 1
    # batch 2: contaminated doc 4 that is ALSO a near-dup of accepted
    #          doc 1 (decontam must win); clean doc 5
    b1 = [
        (1, "alpha " + filler("a")),
        (2, f"leaky {span} tail"),
        (3, "alpha " + filler("a") + " extra"),
    ]
    b2 = [
        (4, "alpha " + filler("a") + f" {span}"),
        (5, "omega " + filler("z")),
    ]
    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    src = str(tmp_path / "incoming")
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    bench = spark.createDataFrame(
        [(100, f"eval: {span} answer")], "doc_id long, text string"
    )
    kw = dict(
        index_path=str(tmp_path / "idx"),
        accepted_dir=str(tmp_path / "acc"),
        rejected_dir=str(tmp_path / "rej"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        verify_threshold=0.4,
        max_files_per_trigger=1,
        benchmark=bench,
        contaminated_dir=str(tmp_path / "con"),
    )
    q = start_dedup_stream(spark, src, schema, **kw)
    q.awaitTermination(180)

    acc = spark.read.parquet(str(tmp_path / "acc"))
    rej = spark.read.parquet(str(tmp_path / "rej"))
    con = spark.read.parquet(str(tmp_path / "con"))
    assert sorted(r["doc_id"] for r in con.collect()) == [2, 4]
    assert con.filter("n_contam_grams < 1").count() == 0
    assert sorted(r["doc_id"] for r in acc.collect()) == [1, 5]
    assert sorted(r["doc_id"] for r in rej.collect()) == [3]
    assert rej.collect()[0]["dup_of"] == 1
    # contaminated ids never entered the index
    hs_ids = {r["id"] for r in
              spark.read.parquet(str(tmp_path / "idx") + "/hs").collect()}
    assert hs_ids == {1, 5}

    # replay with a fresh checkpoint: contaminated/rejected/accepted
    # ids are all in the guard — nothing is re-decided or re-written
    kw2 = dict(kw, checkpoint_dir=str(tmp_path / "ckpt2"),
               max_files_per_trigger=2)
    q2 = start_dedup_stream(spark, src, schema, **kw2)
    q2.awaitTermination(180)
    assert spark.read.parquet(str(tmp_path / "acc")).count() == 2
    assert spark.read.parquet(str(tmp_path / "rej")).count() == 1
    assert spark.read.parquet(str(tmp_path / "con")).count() == 2


def test_streaming_gate_perplexity_screen(spark, tmp_path):
    """Curation gate with --max-log-ppl semantics: the bigram LM fits
    ONCE on the reference, each microbatch is scored, and
    above-threshold docs route to the filtered sink (with log_ppl)
    BEFORE dedup — they never reach accepted/rejected/the index.
    Replay with a fresh checkpoint re-decides nothing."""
    from polardbx_tools_spark.operators import lm
    from polardbx_tools_spark.streaming import start_dedup_stream
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    ref_text = "the quick brown fox jumps over the lazy dog again and again"
    ref = spark.createDataFrame(
        [(100 + i, ref_text) for i in range(3)], "doc_id long, text string")
    fluent = "the quick brown fox jumps over the lazy dog"
    gibberish = "zxq wvv qqj xxk zzl pqm nrr ssb ttc uud"
    b1 = [(1, fluent + " first extra words"),
          (2, gibberish),
          (3, fluent + " first extra words tail")]  # near-dup of 1
    b2 = [(6, gibberish + " more"), (7, fluent + " completely other close")]
    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    src = str(tmp_path / "incoming")
    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(src)

    # threshold = midpoint between the fluent and gibberish scores
    # under the SAME LM the gate will fit
    probe = spark.createDataFrame(b1 + b2, schema)
    sc = {r["doc_id"]: r["log_ppl"]
          for r in lm.lm_perplexity(probe, ref).collect()}
    thr = (max(sc[1], sc[3], sc[7]) + min(sc[2], sc[6])) / 2
    assert max(sc[1], sc[3], sc[7]) < thr < min(sc[2], sc[6])

    kw = dict(
        index_path=str(tmp_path / "idx"),
        accepted_dir=str(tmp_path / "acc"),
        rejected_dir=str(tmp_path / "rej"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        # 0.8: doc 3 (superset of doc 1, jaccard ~0.91) must reject,
        # doc 7 (shares only the fluent prefix, ~0.54) must pass
        verify_threshold=0.8,
        max_files_per_trigger=1,
        ppl_ref=ref,
        max_log_ppl=thr,
        filtered_dir=str(tmp_path / "fil"),
    )
    q = start_dedup_stream(spark, src, schema, **kw)
    q.awaitTermination(180)

    acc = spark.read.parquet(str(tmp_path / "acc"))
    rej = spark.read.parquet(str(tmp_path / "rej"))
    fil = spark.read.parquet(str(tmp_path / "fil"))
    assert sorted(r["doc_id"] for r in fil.collect()) == [2, 6]
    assert fil.filter(F.col("log_ppl") <= thr).count() == 0
    assert sorted(r["doc_id"] for r in acc.collect()) == [1, 7]
    assert sorted(r["doc_id"] for r in rej.collect()) == [3]
    hs_ids = {r["id"] for r in
              spark.read.parquet(str(tmp_path / "idx") + "/hs").collect()}
    assert hs_ids == {1, 7}

    # replay: filtered ids are in the guard too — nothing re-decided
    kw2 = dict(kw, checkpoint_dir=str(tmp_path / "ckpt2"),
               max_files_per_trigger=2)
    q2 = start_dedup_stream(spark, src, schema, **kw2)
    q2.awaitTermination(180)
    assert spark.read.parquet(str(tmp_path / "acc")).count() == 2
    assert spark.read.parquet(str(tmp_path / "rej")).count() == 1
    assert spark.read.parquet(str(tmp_path / "fil")).count() == 2
