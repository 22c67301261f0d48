"""DSIR importance-resampling data selection (operators/dsir.py,
arXiv:2302.03169): hand-computed weights, selection semantics, and the
determinism/degradation contracts."""

import math

import pytest
from pyspark.sql import functions as F

from polardbx_tools_spark.operators import dsir


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the game was a great match and the team won the cup"),
            (2, "stock markets fell as rates rose again today"),
            (3, "the team played a great game and won the match"),
            (4, "recipe for bread flour water salt yeast oven"),
            (5, ""),
            (6, None),
            (7, "the match and the game and the team"),
        ],
        "doc_id long, text string",
    )


def test_dsir_weights_hand_values(spark):
    """One-token corpora make every count enumerable: target = raw =
    the single doc 'aa' -> 1 unigram feature, log_w = log10((1+1)/(1+m))
    - log10((1+1)/(1+m)) = 0. A scored doc whose feature is absent from
    both corpora gets the OOV constant log10(1/(1+m)) - log10(1/(1+m))
    = 0 too — with identical corpus totals every ratio cancels."""
    one = spark.createDataFrame([(1, "aa")], "doc_id long, text string")
    ratios, consts = dsir.dsir_fit(one, one, n_buckets=16)
    assert consts["target_total"] == 1 and consts["raw_total"] == 1
    assert abs(consts["oov_log_ratio"]) < 1e-15
    w = {r["doc_id"]: r for r in dsir.dsir_weights(
        spark.createDataFrame([(9, "aa"), (10, "zz")], "doc_id long, text string"),
        ratios, consts).collect()}
    assert w[9]["n_feats"] == 1 and abs(w[9]["log_w"]) < 1e-12
    assert w[10]["n_feats"] == 1 and abs(w[10]["log_w"]) < 1e-12


def test_dsir_weights_asymmetric_hand_values(spark):
    """target={'aa'}, raw={'aa','bb'}: for the 'aa' bucket
    lr = log10(2/(1+m)) - log10(2/(2+m)); for 'bb'
    lr = log10(1/(1+m)) - log10(2/(2+m)). m=16."""
    t = spark.createDataFrame([(1, "aa")], "doc_id long, text string")
    r = spark.createDataFrame(
        [(1, "aa"), (2, "bb")], "doc_id long, text string")
    ratios, consts = dsir.dsir_fit(t, r, n_buckets=16)
    docs = spark.createDataFrame(
        [(9, "aa"), (10, "bb")], "doc_id long, text string")
    w = {x["doc_id"]: x for x in dsir.dsir_weights(docs, ratios, consts).collect()}
    exp_aa = math.log10(2 / 17) - math.log10(2 / 18)
    exp_bb = math.log10(1 / 17) - math.log10(2 / 18)
    assert abs(w[9]["log_w"] - exp_aa) < 1e-12
    assert abs(w[10]["log_w"] - exp_bb) < 1e-12
    assert w[9]["log_w"] > 0 > w[10]["log_w"]


def test_dsir_ranks_target_like_docs_higher(spark):
    """Sports-target fit must weight sports docs above finance/recipe
    docs; featureless (empty/NULL) docs report (0, NULL)."""
    d = _docs(spark)
    target = d.filter(F.col("doc_id").isin(1, 3))
    ratios, consts = dsir.dsir_fit(target, d, n_buckets=512)
    w = {r["doc_id"]: r for r in dsir.dsir_weights(d, ratios, consts).collect()}
    sporty = min(w[1]["log_w"], w[3]["log_w"], w[7]["log_w"])
    offtopic = max(w[2]["log_w"], w[4]["log_w"])
    assert sporty > offtopic
    for i in (5, 6):
        assert w[i]["n_feats"] == 0 and w[i]["log_w"] is None


def test_dsir_bigrams_distinguish_word_order(spark):
    """Same unigrams, different bigrams: word order must change the
    weight (the bag is over unigrams AND bigrams)."""
    t = spark.createDataFrame([(1, "big cat")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(9, "big cat"), (10, "cat big")], "doc_id long, text string")
    ratios, consts = dsir.dsir_fit(t, docs, n_buckets=2048)
    w = {r["doc_id"]: r for r in dsir.dsir_weights(docs, ratios, consts).collect()}
    assert w[9]["log_w"] > w[10]["log_w"]


def test_dsir_fit_subset_equals_two_pass_fit(spark):
    """dsir_fit_subset(raw, cond) must reproduce
    dsir_fit(raw.filter(cond), raw) exactly — same consts, same
    per-bucket ratios, same downstream weights."""
    d = _docs(spark)
    cond = F.col("doc_id").isin(1, 3)
    r1, c1 = dsir.dsir_fit(d.filter(cond), d, n_buckets=512)
    r2, c2 = dsir.dsir_fit_subset(d, cond, n_buckets=512)
    assert c1 == c2
    rows1 = {r["bucket"]: r["log_ratio"] for r in r1.collect()}
    rows2 = {r["bucket"]: r["log_ratio"] for r in r2.collect()}
    assert rows1 == rows2
    w1 = sorted(dsir.dsir_weights(d, r1, c1).collect())
    w2 = sorted(dsir.dsir_weights(d, r2, c2).collect())
    assert w1 == w2


def test_dsir_select_deterministic_and_excludes_featureless(spark):
    d = _docs(spark)
    target = d.filter(F.col("doc_id").isin(1, 3))
    a = dsir.dsir_select(d, target, k=3, n_buckets=512, seed=7)
    b = dsir.dsir_select(d, target, k=3, n_buckets=512, seed=7)
    ra = [(r["doc_id"], r["sel_rank"]) for r in a.orderBy("sel_rank").collect()]
    rb = [(r["doc_id"], r["sel_rank"]) for r in b.orderBy("sel_rank").collect()]
    assert ra == rb and len(ra) == 3
    assert [r[1] for r in ra] == [1, 2, 3]
    assert not {5, 6} & {r[0] for r in ra}
    # selected rows carry the original columns
    assert set(a.columns) >= {"doc_id", "text", "log_w", "sel_rank"}


def test_dsir_select_seed_changes_sample_not_support(spark):
    """Different seeds may reorder/resample, but selection is always a
    subset of the featureful docs and exactly k when k <= candidates."""
    d = _docs(spark)
    target = d.filter(F.col("doc_id").isin(1, 3))
    picked = set()
    for seed in (0, 1, 2):
        s = dsir.dsir_select(d, target, k=2, n_buckets=512, seed=seed)
        ids = {r["doc_id"] for r in s.collect()}
        assert len(ids) == 2 and ids <= {1, 2, 3, 4, 7}
        picked |= ids
    assert len(picked) >= 2


def test_dsir_select_above_matches_top_k_cut(spark):
    """The threshold scale path must agree with the ranked path: using
    the k-th selected key as the threshold returns exactly the top-k
    id set (no global sort needed)."""
    d = _docs(spark)
    target = d.filter(F.col("doc_id").isin(1, 3))
    ratios, consts = dsir.dsir_fit(target, d, n_buckets=512)
    w = dsir.dsir_weights(d, ratios, consts)
    top = dsir.select_top_k(w, k=3, seed=7).collect()
    keys = {
        r["doc_id"]: r["k"]
        for r in w.filter(F.col("log_w").isNotNull()).select(
            "doc_id", dsir.gumbel_key(F.col("log_w"), F.col("doc_id"), 7).alias("k")
        ).collect()
    }
    ids_ranked = {r["doc_id"] for r in top}
    thr = min(keys[i] for i in ids_ranked)
    got = {r["doc_id"] for r in dsir.select_above(w, thr, seed=7).collect()}
    assert got == ids_ranked


def test_dsir_argmax_selection_orders_by_weight(spark):
    """gumbel=False is pure argmax: ranks follow log_w descending."""
    d = _docs(spark)
    target = d.filter(F.col("doc_id").isin(1, 3))
    s = dsir.dsir_select(d, target, k=5, n_buckets=512, seed=0, gumbel=False)
    rows = s.orderBy("sel_rank").collect()
    ws = [r["log_w"] for r in rows]
    assert ws == sorted(ws, reverse=True)
    assert rows[0]["doc_id"] == 3  # densest target overlap wins argmax


def test_dsir_bucket_collisions_stay_deterministic(spark):
    """n_buckets=2 forces mass collisions; weights must still be
    finite, deterministic, and the fit totals exact."""
    d = _docs(spark)
    target = d.filter(F.col("doc_id").isin(1, 3))
    ratios, consts = dsir.dsir_fit(target, d, n_buckets=2)
    assert ratios.count() <= 2
    w1 = sorted(dsir.dsir_weights(d, ratios, consts).collect())
    w2 = sorted(dsir.dsir_weights(d, ratios, consts).collect())
    assert w1 == w2
    for r in w1:
        if r["log_w"] is not None:
            assert math.isfinite(r["log_w"])


def test_dsir_plan_stays_jvm_side_and_broadcasts_ratios(spark):
    """The weight scoring plan must contain no Python row UDF stage and
    must BROADCAST the bounded ratios relation (<= n_buckets rows)."""
    d = _docs(spark)
    target = d.filter(F.col("doc_id").isin(1, 3))
    ratios, consts = dsir.dsir_fit(target, d, n_buckets=512)
    plan = dsir.dsir_weights(d, ratios, consts)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
