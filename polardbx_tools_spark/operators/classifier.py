"""Trained quality classifier — fasttext-style hashed-n-gram logistic
regression (the GPT-3 "Wikipedia-vs-CommonCrawl" pipeline component,
Brown et al. 2020 appendix A; also LLaMA's fasttext quality filter).

The discriminative member of the quality trio: :mod:`lm` scores fluency
generatively (bigram perplexity), :mod:`dsir` weights target-likeness
generatively (importance ratios), this module TRAINS a linear model to
separate a positive corpus from a negative one and scores documents with
it. Features are the same hashed unigram+bigram buckets as DSIR
(:func:`dsir.hashed_ngram_buckets`), count-normalized per document
(fasttext's mean-of-n-gram-vectors reduces to exactly this for a linear
model), so the model is a single length-``n_buckets`` weight vector.

Spark-first shape, and why it scales to 100 TB:

* **fit**: the feature relation ``(y, buckets)`` is built once (one
  scan, all hashing JVM-side) and persisted; every full-batch GD
  iteration is then ONE job with NO shuffle — an Arrow ``mapInPandas``
  computes each partition's EXACT gradient partial (a dense float64
  vector bounded by ``n_buckets``, not by corpus size) and the driver
  sums ``#partitions`` partials and takes the step. Driver state is one
  weight vector (~80 KB at the default 10k buckets). This is the
  classic aggregate-the-gradient distributed LR (MLlib's own shape),
  with deterministic zero init so runs replay bit-stably.
* **score**: pure JVM — explode buckets, LEFT join the BROADCAST
  weight relation (<= n_buckets rows), one per-doc sum, sigmoid. The
  only corpus-sized shuffle is the per-doc sum; no Python in the hot
  path (plan-asserted in tests/test_classifier.py).

Reference analog: none — engine addition for the LLM-data pipeline
(SURVEY.md §2.12).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import DEFAULT_BUCKETS, hashed_ngram_buckets


def _feature_relation(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str,
    n_buckets: int,
    features_col: str | None = None,
) -> DataFrame:
    """(y double, b array<long>) training relation: label 1.0 for pos,
    0.0 for neg; featureless (empty/NULL text) docs carry no evidence
    and are dropped. Hashing happens here, once, JVM-side — unless
    ``features_col`` names a precomputed ``array<bigint>`` bucket column
    (hashed_ngram_buckets at the SAME ``n_buckets``; see
    dsir.dsir_fit_subset), in which case the shared relation is reused.

    ``features_col`` inputs should arrive WIDENED and persisted (the
    ``_widen_scan`` discipline is applied only to the text path here): a
    lazy feature column over a one-split parquet would pay its md5 pass
    on one core — the single-split serialization trap. The gate's
    ``_doc_feats_shared`` relation satisfies this by construction."""
    from .similarity import _widen_scan

    def feats(df: DataFrame, y: float) -> DataFrame:
        if features_col is not None:
            return df.select(
                F.lit(y).cast("double").alias("y"),
                F.col(features_col).alias("b"),
            )
        return _widen_scan(df.select(text_col)).select(
            F.lit(y).cast("double").alias("y"),
            hashed_ngram_buckets(F.col(text_col), n_buckets).alias("b"),
        )

    both = feats(pos, 1.0).unionByName(feats(neg, 0.0))
    return both.filter(F.size("b") > 0)


def _gradient_partials(feat: DataFrame, w, bias: float, n_buckets: int):
    """One gradient job: per-partition (grad vector, bias grad, loss, n)
    partials via Arrow batches. ``w`` ships in the closure (~80 KB)."""
    import numpy as np
    import pandas as pd

    w = np.asarray(w, dtype=np.float64)

    def part(batches):
        g = np.zeros(n_buckets, dtype=np.float64)
        gb = 0.0
        loss = 0.0
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lens = pdf["b"].map(len).to_numpy(dtype=np.int64)
            y = pdf["y"].to_numpy(dtype=np.float64)
            cols = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["b"]]
            )
            rows = np.repeat(np.arange(len(pdf)), lens)
            xval = (1.0 / lens)[rows]  # count-normalized bag
            margin = np.bincount(
                rows, weights=w[cols] * xval, minlength=len(pdf)
            )
            p = 1.0 / (1.0 + np.exp(-(margin + bias)))
            pc = np.clip(p, 1e-12, 1.0 - 1e-12)
            loss += float(-(y * np.log(pc) + (1.0 - y) * np.log(1.0 - pc)).sum())
            r = p - y
            g += np.bincount(cols, weights=r[rows] * xval, minlength=n_buckets)
            gb += float(r.sum())
            n += len(pdf)
        yield pd.DataFrame(
            {"g": [g.tolist()], "gb": [gb], "loss": [loss], "n": [n]}
        )

    return feat.mapInPandas(
        part, schema="g array<double>, gb double, loss double, n long"
    ).collect()


def quality_fit(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    iters: int = 30,
    lr: float = 5.0,
    l2: float = 1e-4,
    features_col: str | None = None,
) -> tuple[DataFrame, dict]:
    """Train the classifier: full-batch logistic regression by gradient
    descent (deterministic zero init, fixed step, L2 on the weights but
    not the bias). Returns ``(weights, consts)``:

    * ``weights(bucket, w)`` — only nonzero entries, <= n_buckets rows;
      broadcast it at score time.
    * ``consts`` — ``bias``, ``n_buckets``, ``n_docs``, and ``losses``
      (per-iteration mean train log-loss, for convergence checks).

    Each iteration is one shuffle-free job over the persisted feature
    relation; see the module docstring for the 100-TB argument.
    """
    import numpy as np

    spark = pos.sparkSession
    feat = _feature_relation(
        pos, neg, text_col, n_buckets, features_col
    ).persist()
    w = np.zeros(n_buckets, dtype=np.float64)
    bias = 0.0
    losses: list[float] = []
    n_docs = 0
    for _ in range(iters):
        parts = _gradient_partials(feat, w, bias, n_buckets)
        n_docs = sum(r["n"] for r in parts)
        if n_docs == 0:
            raise ValueError("quality_fit: no featureful training documents")
        g = np.zeros(n_buckets, dtype=np.float64)
        gb = 0.0
        loss = 0.0
        for r in parts:  # collect() is partition-ordered -> deterministic
            g += np.asarray(r["g"], dtype=np.float64)
            gb += r["gb"]
            loss += r["loss"]
        losses.append(loss / n_docs)
        w -= lr * (g / n_docs + l2 * w)
        bias -= lr * (gb / n_docs)
    feat.unpersist()
    nz = np.nonzero(w)[0]
    import pandas as pd

    # Arrow path: a list-of-tuples createDataFrame serializes the <=
    # n_buckets rows through py4j one value at a time (~2 s at 4k rows);
    # the pandas route ships one Arrow batch
    weights = spark.createDataFrame(
        pd.DataFrame({"bucket": nz.astype("int64"), "w": w[nz]}),
        "bucket long, w double",
    )
    return weights, {
        "bias": float(bias),
        "n_buckets": n_buckets,
        "n_docs": int(n_docs),
        "losses": losses,
    }


def save_model(weights: DataFrame, consts: dict, path: str) -> None:
    """Persist a trained model as a JSON artifact (bucket->w map +
    consts) — the <= n_buckets weight relation is artifact-sized by
    construction, the same way the BPE merges ride bpe.save_merges.
    Loadable by any engine; losses ride along for provenance."""
    import json

    rows = weights.collect()
    with open(path, "w") as f:
        json.dump(
            {
                "version": 1,
                "bias": consts["bias"],
                "n_buckets": consts["n_buckets"],
                "n_docs": consts["n_docs"],
                "losses": consts.get("losses", []),
                "w": {str(r["bucket"]): r["w"] for r in rows},
            },
            f,
        )


def load_model(spark, path: str) -> tuple[DataFrame, dict]:
    """Inverse of :func:`save_model`: returns (weights, consts) in the
    exact shape :func:`quality_score` consumes."""
    import json

    with open(path) as f:
        art = json.load(f)
    import pandas as pd

    items = sorted((int(b), float(w)) for b, w in art["w"].items())
    pdf = pd.DataFrame(items, columns=["bucket", "w"]).astype(
        {"bucket": "int64", "w": "float64"}
    )
    weights = spark.createDataFrame(pdf, "bucket long, w double")
    return weights, {
        "bias": art["bias"],
        "n_buckets": art["n_buckets"],
        "n_docs": art["n_docs"],
        "losses": art.get("losses", []),
    }


def quality_score(
    docs: DataFrame,
    weights: DataFrame,
    consts: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    features_col: str | None = None,
) -> DataFrame:
    """Per-document (id, n_feats, quality_score): P(positive) under the
    trained model. Pure JVM: explode + broadcast weights join + one
    per-doc sum + sigmoid. Featureless docs score NULL (no evidence) —
    mirror of dsir_weights' contract. Buckets unseen in training carry
    weight 0 by the left join. ``features_col``: see
    dsir.dsir_fit_subset (same precomputed-bucket contract)."""
    from .similarity import _widen_scan

    if features_col is not None:
        feats = docs.select(
            F.col(id_col), F.explode_outer(features_col).alias("bucket")
        )
    else:
        feats = _widen_scan(docs.select(id_col, text_col)).select(
            F.col(id_col),
            F.explode_outer(
                hashed_ngram_buckets(F.col(text_col), consts["n_buckets"])
            ).alias("bucket"),
        )
    scored = feats.join(F.broadcast(weights), on="bucket", how="left").select(
        id_col, "bucket", F.coalesce("w", F.lit(0.0)).alias("w")
    )
    margin = (
        F.sum(F.when(F.col("bucket").isNotNull(), F.col("w")))
        / F.count("bucket")
        + F.lit(consts["bias"])
    )
    return scored.groupBy(id_col).agg(
        F.count("bucket").cast("int").alias("n_feats"),
        F.when(
            F.count("bucket") > 0,
            F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)),
        ).alias("quality_score"),
    )
