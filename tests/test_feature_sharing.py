"""Precomputed-feature sharing (features_col=) must be a pure physical
optimization: dsir fit/weights and classifier fit/score produce
IDENTICAL results whether they hash the text themselves or consume a
shared hashed_ngram_buckets column (the quality-suite gate's shape —
one persisted md5 pass feeding four consumers)."""

import pytest
from pyspark.sql import functions as F

from polardbx_tools_spark.operators import classifier, dsir

N_BUCKETS = 64


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
            (8, "rates rose and markets fell on the day"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture()
def with_feats(spark):
    d = _docs(spark)
    return d.withColumn(
        "_fb", dsir.hashed_ngram_buckets(F.col("text"), N_BUCKETS)
    )


def _rows(df):
    return sorted(
        tuple(None if v is None else round(v, 12) if isinstance(v, float) else v
              for v in r)
        for r in df.collect()
    )


def test_dsir_fit_subset_matches_with_shared_features(spark, with_feats):
    is_t = F.col("doc_id") % 2 == 0
    r_text, c_text = dsir.dsir_fit_subset(
        with_feats, is_t, n_buckets=N_BUCKETS
    )
    r_fb, c_fb = dsir.dsir_fit_subset(
        with_feats, is_t, n_buckets=N_BUCKETS, features_col="_fb"
    )
    assert c_text == c_fb
    assert _rows(r_text) == _rows(r_fb)


def test_dsir_weights_match_with_shared_features(spark, with_feats):
    is_t = F.col("doc_id") % 2 == 0
    ratios, consts = dsir.dsir_fit_subset(
        with_feats, is_t, n_buckets=N_BUCKETS
    )
    w_text = dsir.dsir_weights(with_feats, ratios, consts)
    w_fb = dsir.dsir_weights(with_feats, ratios, consts, features_col="_fb")
    assert _rows(w_text) == _rows(w_fb)


def test_classifier_fit_and_score_match_with_shared_features(
    spark, with_feats
):
    pos = with_feats.filter(F.col("doc_id") % 2 == 0)
    neg = with_feats.filter(F.col("doc_id") % 2 == 1)
    w_t, c_t = classifier.quality_fit(
        pos, neg, n_buckets=N_BUCKETS, iters=2
    )
    w_f, c_f = classifier.quality_fit(
        pos, neg, n_buckets=N_BUCKETS, iters=2, features_col="_fb"
    )
    assert c_t["bias"] == c_f["bias"] and c_t["n_docs"] == c_f["n_docs"]
    assert c_t["losses"] == c_f["losses"]
    assert _rows(w_t) == _rows(w_f)
    s_t = classifier.quality_score(with_feats, w_t, c_t)
    s_f = classifier.quality_score(with_feats, w_t, c_t, features_col="_fb")
    assert _rows(s_t) == _rows(s_f)
