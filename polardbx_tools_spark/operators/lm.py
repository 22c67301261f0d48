"""CCNet-style LM quality scoring (Wenzek et al. 2020, arXiv:1911.00359).

CCNet filters a web corpus by per-token LM perplexity under a model
trained on a trusted reference corpus. This module is the same
component with the smallest faithful model that stays exactly
reproducible across engines: an add-one-smoothed BIGRAM word LM —
counts are plain distributed aggregates, scoring is two equi-joins, and
every probability is a ratio of integers, so a DuckDB oracle can replay
the whole computation to the last ulp-before-rounding.

Model (V = fit-corpus vocabulary size, V' = V + 1 for the implicit UNK,
T = total fit tokens; c(.) are fit counts, OOV counts are 0):

* first token:   p(w1)        = (c(w1) + 1) / (T + V')
* later tokens:  p(wi | wi-1) = (c(wi-1, wi) + 1) / (c(wi-1) + V')
* doc statistic: log_ppl = sum(-log10 p) / n_tokens — CCNet's filter
  column; lower = more reference-like. Threshold choice stays with the
  caller (CCNet buckets into head/middle/tail by corpus percentiles).

Physical shape at 100 TB: the fit is two hash-groupBys (unigrams,
bigrams) — pure map-side-combinable counts; scoring explodes each doc
into (prev, cur) positions and equi-joins the two count relations (AQE
broadcasts them when the vocabulary is small, plain shuffle joins when
it is not), then one groupBy(doc) — no driver-side state beyond the two
scalar constants (T, V).

Reference analog: none — engine addition for the LLM-data pipeline
(the quality-scoring sibling of text.quality_score's heuristics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _doc_tokens(col: Column) -> Column:
    """Lowercased whitespace tokens — the fit and score sides MUST share
    one tokenizer or every bigram lookup silently misses."""
    return tokens(F.lower(col))


def lm_fit(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, dict]:
    """Fit the bigram LM on a reference corpus.

    Returns (unigrams(w, n), bigrams(a, b, n), consts) where consts
    carries ``total`` (T) and ``vocab`` (V) — the only driver-side
    state, two scalars from bounded aggregates.

    ONE tokenize pass: each token position explodes to (prev, cur)
    (prev NULL at position 0), and a single groupBy(prev, cur) count —
    persisted, it is bounded by the distinct-bigram vocabulary, not the
    corpus — serves all three consumers: unigram counts are the
    per-``cur`` sums (every token occurs as ``cur`` exactly once),
    bigram counts are the prev-NOT-NULL rows, and the (T, V) scalars are
    one aggregate over it. The previous shape tokenized the reference
    three times (totals, unigram join, bigram join) and — lazily — ONCE
    PER MICROBATCH under the streaming perplexity gate; the persisted
    count relation makes per-batch scoring reuse the fit."""
    from .similarity import _widen_scan

    toks = _doc_tokens(F.col(text_col))
    pairs = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.struct(
                F.element_at(toks, i).alias("cur"),
                F.when(i > 1, F.element_at(toks, i - 1)).alias("prev"),
            ),
        ),
    ).otherwise(F.array())
    pc = (
        _widen_scan(ref.select(text_col))
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.prev").alias("a"), F.col("p.cur").alias("b"))
        .agg(F.count("*").alias("n"))
        .persist()
    )
    uni = pc.groupBy(F.col("b").alias("w")).agg(F.sum("n").alias("n"))
    bi = pc.filter(F.col("a").isNotNull()).select("a", "b", "n")
    row = pc.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("total"),
        F.countDistinct("b").alias("vocab"),
    ).first()
    return uni, bi, {"total": int(row["total"]), "vocab": int(row["vocab"])}


def lm_score(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    total: int,
    vocab: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document (id, n_tokens, log_ppl) under the fitted LM.

    ``log_ppl`` is the mean per-token -log10 probability (NULL for
    empty documents). OOV fit counts coalesce to 0 — the add-one
    smoothing keeps every probability finite."""
    v1 = float(vocab + 1)
    toks = _doc_tokens(F.col(text_col))
    # (pos, cur, prev) structs built INSIDE the array before the explode
    # — carrying the whole token array through the explode would be
    # quadratic bytes per document
    pairs = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.struct(
                (i - 1).alias("pos"),
                F.element_at(toks, i).alias("cur"),
                F.when(i > 1, F.element_at(toks, i - 1)).alias("prev"),
            ),
        ),
    ).otherwise(F.array())
    from .similarity import _widen_scan

    # widen below the explode: tokenize + position structs are the
    # compute, and a one-split parquet would serialize them on one core
    pos = (
        _widen_scan(docs.select(id_col, text_col))
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, "p.pos", "p.cur", "p.prev")
    )
    u_cur = unigrams.select(F.col("w").alias("cur"), F.col("n").alias("n_cur"))
    u_prev = unigrams.select(F.col("w").alias("prev"), F.col("n").alias("n_prev"))
    b = bigrams.select(
        F.col("a").alias("prev"), F.col("b").alias("cur"),
        F.col("n").alias("n_bi"),
    )
    scored = (
        pos.join(u_cur, on="cur", how="left")
        .join(u_prev, on="prev", how="left")
        .join(b, on=["prev", "cur"], how="left")
        .select(
            F.col(id_col),
            F.when(
                F.col("pos") == 0,
                -F.log10(
                    (F.coalesce(F.col("n_cur"), F.lit(0)) + 1)
                    / F.lit(float(total) + v1)
                ),
            ).otherwise(
                -F.log10(
                    (F.coalesce(F.col("n_bi"), F.lit(0)) + 1)
                    / (F.coalesce(F.col("n_prev"), F.lit(0)) + F.lit(v1))
                )
            ).alias("nlp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_tokens"),
        (F.sum("nlp") / F.count("*")).alias("log_ppl"),
    )
    # empty docs: no exploded rows — join back so every input id reports
    return (
        docs.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "log_ppl",
        )
    )


def lm_perplexity(
    docs: DataFrame,
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fit on ``ref``, score ``docs`` — the one-call CCNet shape."""
    uni, bi, consts = lm_fit(ref, text_col)
    return lm_score(
        docs, uni, bi, consts["total"], consts["vocab"], id_col, text_col
    )
