"""Trained quality classifier (operators/classifier.py): planted-class
separation, an independent numpy replay of the whole GD, degradation
contracts, and the JVM-only scoring plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from polardbx_tools_spark.operators import classifier
from polardbx_tools_spark.operators.dsir import hashed_ngram_buckets

N_BUCKETS = 512


def _corpora(spark, n=24):
    """Deterministic fluent-vs-gibberish split with disjoint vocab: the
    linear model must drive fluent buckets positive and junk buckets
    negative."""
    fluent = [
        (i, f"the quick brown fox jumps over the lazy dog number {i % 5}")
        for i in range(n)
    ]
    junk = [
        (1000 + i, f"zqx{i % 7}v wfk{i % 3}j brr{i % 5}t qqj{i % 2}m xx{i % 4}")
        for i in range(n)
    ]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(fluent), mk(junk)


@pytest.fixture(scope="module")
def fitted(spark):
    pos, neg = _corpora(spark)
    weights, consts = classifier.quality_fit(
        pos, neg, n_buckets=N_BUCKETS, iters=20, lr=5.0, l2=1e-4
    )
    return pos, neg, weights, consts


def test_separates_planted_classes(spark, fitted):
    pos, neg, weights, consts = fitted
    sp = {
        r["doc_id"]: r["quality_score"]
        for r in classifier.quality_score(pos, weights, consts).collect()
    }
    sn = {
        r["doc_id"]: r["quality_score"]
        for r in classifier.quality_score(neg, weights, consts).collect()
    }
    assert len(sp) == 24 and len(sn) == 24
    assert min(sp.values()) > 0.5 > max(sn.values())
    assert min(sp.values()) > max(sn.values())


def test_label_swap_symmetry(spark, fitted):
    """Swapping pos/neg negates the model to ulps: per-term r' = -r at
    iters=1 (zero init makes every margin exactly 0), but the swapped
    union feeds the SAME buckets in a different row order (pos docs now
    second), so sums reassociate — and beyond iters=1,
    sigmoid(-m) + sigmoid(m) == 1 is not an IEEE identity either. The
    symmetry is a tight-tolerance property, not bit equality."""
    pos, neg, weights, consts = fitted
    p1, c1 = classifier.quality_fit(
        pos, neg, n_buckets=N_BUCKETS, iters=1, lr=5.0, l2=1e-4
    )
    n1, cn1 = classifier.quality_fit(
        neg, pos, n_buckets=N_BUCKETS, iters=1, lr=5.0, l2=1e-4
    )
    assert cn1["bias"] == pytest.approx(-c1["bias"], rel=1e-12)
    assert cn1["losses"] == pytest.approx(c1["losses"], rel=1e-12)  # log(2)
    pw = {r["bucket"]: r["w"] for r in p1.collect()}
    nw = {r["bucket"]: r["w"] for r in n1.collect()}
    assert nw == pytest.approx({b: -w for b, w in pw.items()}, rel=1e-12)

    w2, c2 = classifier.quality_fit(
        neg, pos, n_buckets=N_BUCKETS, iters=20, lr=5.0, l2=1e-4
    )
    assert c2["bias"] == pytest.approx(-consts["bias"], rel=1e-9)
    assert c2["losses"] == pytest.approx(consts["losses"], rel=1e-9)
    orig = {r["bucket"]: r["w"] for r in weights.collect()}
    swap = {r["bucket"]: r["w"] for r in w2.collect()}
    assert swap == pytest.approx({b: -w for b, w in orig.items()}, rel=1e-9)
    sp = {
        r["doc_id"]: r["quality_score"]
        for r in classifier.quality_score(pos, weights, consts).collect()
    }
    sp2 = {
        r["doc_id"]: r["quality_score"]
        for r in classifier.quality_score(pos, w2, c2).collect()
    }
    assert sp2 == pytest.approx({k: 1.0 - v for k, v in sp.items()}, rel=1e-9)


def test_loss_decreases(fitted):
    losses = fitted[3]["losses"]
    assert len(losses) == 20
    assert losses[0] == pytest.approx(np.log(2.0), rel=1e-12)  # zero init
    assert all(b < a for a, b in zip(losses, losses[1:]))


def test_matches_numpy_replay(spark, fitted):
    """Replay the EXACT training loop in pure numpy over the collected
    feature arrays (same hashing expression, same normalization, same
    step rule) — the distributed per-partition gradient partials must
    sum to the full-batch gradient up to float summation order."""
    pos, neg, weights, consts = fitted
    rows = []
    for df, y in ((pos, 1.0), (neg, 0.0)):
        for r in df.select(
            hashed_ngram_buckets(F.col("text"), N_BUCKETS).alias("b")
        ).collect():
            if r["b"]:
                rows.append((y, np.asarray(r["b"], dtype=np.int64)))
    w = np.zeros(N_BUCKETS)
    bias = 0.0
    lr, l2 = 5.0, 1e-4
    for _ in range(20):
        g = np.zeros(N_BUCKETS)
        gb = 0.0
        for y, cols in rows:
            x = 1.0 / len(cols)
            p = 1.0 / (1.0 + np.exp(-(w[cols].sum() * x + bias)))
            g += np.bincount(cols, minlength=N_BUCKETS) * ((p - y) * x)
            gb += p - y
        w -= lr * (g / len(rows) + l2 * w)
        bias -= lr * (gb / len(rows))
    got = {r["bucket"]: r["w"] for r in weights.collect()}
    assert consts["n_docs"] == len(rows)
    assert consts["bias"] == pytest.approx(bias, rel=1e-9, abs=1e-12)
    for b in np.nonzero(w)[0]:
        assert got[int(b)] == pytest.approx(w[b], rel=1e-9, abs=1e-12)


def test_featureless_docs_drop_from_fit_and_score_null(spark):
    pos = spark.createDataFrame(
        [(1, "good text here"), (2, ""), (3, None)], "doc_id long, text string"
    )
    neg = spark.createDataFrame([(4, "bad junk words")], "doc_id long, text string")
    weights, consts = classifier.quality_fit(pos, neg, n_buckets=64, iters=3)
    assert consts["n_docs"] == 2  # empty/NULL text carried no features
    out = {
        r["doc_id"]: r
        for r in classifier.quality_score(pos, weights, consts).collect()
    }
    assert out[2]["n_feats"] == 0 and out[2]["quality_score"] is None
    assert out[3]["quality_score"] is None
    assert out[1]["quality_score"] is not None


def test_all_featureless_raises(spark):
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no featureful"):
        classifier.quality_fit(empty, empty, n_buckets=16, iters=1)


def test_model_artifact_roundtrip(spark, fitted, tmp_path):
    """save_model/load_model: reloaded weights+consts score every doc
    bit-identically to the in-memory fit."""
    pos, _, weights, consts = fitted
    p = str(tmp_path / "clf.json")
    classifier.save_model(weights, consts, p)
    w2, c2 = classifier.load_model(spark, p)
    assert c2["bias"] == consts["bias"] and c2["n_docs"] == consts["n_docs"]
    assert c2["losses"] == consts["losses"]
    orig = {
        r["doc_id"]: r["quality_score"]
        for r in classifier.quality_score(pos, weights, consts).collect()
    }
    reload = {
        r["doc_id"]: r["quality_score"]
        for r in classifier.quality_score(pos, w2, c2).collect()
    }
    assert orig == reload


def test_score_plan_is_jvm_side_broadcast(spark, fitted):
    pos, _, weights, consts = fitted
    plan = classifier.quality_score(pos, weights, consts)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
