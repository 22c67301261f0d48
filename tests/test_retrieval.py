"""BM25 lexical retrieval (operators/retrieval.py): scores against an
independent pure-python reference, determinism of tie-breaks, and the
broadcast-query plan shape."""

import math

from pyspark.sql import functions as F

from polardbx_tools_spark.operators import retrieval

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown dog runs fast"),
    (3, "lazy afternoon with no animals here"),
    (4, "fox fox fox fox"),
    (5, ""),
]
QUERIES = [(100, "quick fox"), (101, "lazy dog"), (102, "zebra")]


def _ref_topk(k=3, k1=1.2, b=0.75):
    n = len(DOCS)
    tokd = {i: t.lower().split() for i, t in DOCS}
    dls = {i: len(t) for i, t in tokd.items()}
    avgdl = sum(dls.values()) / n

    def dfreq(t):
        return sum(1 for v in tokd.values() if t in v)

    def score(qt, d):
        s = 0.0
        for t in set(qt.lower().split()):
            tf = tokd[d].count(t)
            if tf == 0:
                continue
            idf = math.log((n - dfreq(t) + 0.5) / (dfreq(t) + 0.5) + 1)
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dls[d] / avgdl))
        return round(s, 6)

    ref = {}
    for qid, qt in QUERIES:
        scored = sorted(((score(qt, d), d) for d, _ in DOCS
                         if score(qt, d) > 0), key=lambda x: (-x[0], x[1]))[:k]
        ref[qid] = [(d, r + 1, s) for r, (s, d) in enumerate(scored)]
    return ref


def test_bm25_matches_independent_reference(spark):
    c = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id long, text string")
    got = {}
    for r in retrieval.bm25_topk(c, q, k=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["rank"], r["score"]))
    ref = _ref_topk()
    for qid in (100, 101):
        assert sorted(got[qid], key=lambda x: x[1]) == ref[qid], qid
    # no-overlap query returns no rows (score 0 is not a match)
    assert 102 not in got
    # ties (docs 2 and 3 score identically on 'lazy dog') break on id
    r101 = sorted(got[101], key=lambda x: x[1])
    assert r101[1][0] < r101[2][0] and r101[1][2] == r101[2][2]


def test_bm25_repeated_query_terms_score_once(spark):
    """Query-term SET semantics: 'fox fox fox' == 'fox'."""
    c = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(
        [(1, "fox"), (2, "fox fox fox")], "query_id long, text string")
    rows = retrieval.bm25_topk(c, q, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(
            (r["doc_id"], r["rank"], r["score"]))
    assert by_q[1] == by_q[2]


def test_bm25_plan_broadcasts_queries_and_stays_jvm_side(spark):
    """The postings join must broadcast the query side (never shuffle
    the corpus against it) and contain no Python row UDF."""
    c = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id long, text string")
    plan = retrieval.bm25_topk(c, q, k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
