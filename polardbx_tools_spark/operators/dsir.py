"""DSIR-style data selection via importance resampling (Xie et al.
2023, arXiv:2302.03169).

DSIR selects pretraining documents from a raw pool in proportion to how
target-like they are: fit two bag-of-hashed-n-gram distributions — p on
a small trusted TARGET corpus, q on the RAW pool — weight every raw
document by log p(x) - log q(x) under the bag model, then Gumbel-top-k
resample. The hashed feature space is the scale trick: the weight
relation is bounded by ``n_buckets`` (default 10,000) regardless of
corpus vocabulary, so scoring is an explode + BROADCAST join + one
groupBy — the only corpus-sized shuffle is the final per-doc sum.

Deviations from the paper, chosen so a DuckDB oracle can replay every
number exactly:

* features are unigram + bigram buckets of lowercased whitespace tokens
  (the paper uses word bigrams too); the bucket hash is the first 8 hex
  chars of md5 — identical bytes-in/int-out in Spark
  (``conv(substring(md5(s),1,8),16,10)``) and DuckDB
  (``('0x'||substr(md5(s),1,8))::BIGINT``).
* add-one smoothing per bucket (paper: unsmoothed MLE over buckets both
  corpora touch) — every probability is a ratio of integers, so both
  engines compute bit-identical doubles before the final log10.
* the Gumbel noise is DETERMINISTIC: u = (md5-bucket(id:seed) + 0.5)
  / 2^32 (the half-step keeps u strictly inside (0,1) — see
  :func:`gumbel_key`), g = -log10(-ln u) (base-10-scaled Gumbel,
  matching the base-10 log weights) — reproducible across engines,
  runs, and partitionings.

Physical shape at 100 TB: fit is two map-side-combinable hash-groupBys
whose RESULT is <= n_buckets rows; ``bucket_log_ratios`` is broadcast;
scoring shuffles only (id, partial-sum); selection ranks a NARROW
(key, id) relation with TakeOrderedAndProject and semi-joins the k ids
back — k rows of 16 bytes on one node, fine to ~10^8; beyond that use
:func:`select_above` with a threshold (e.g. from approxQuantile on the
key relation) — a pure per-row filter, no global merge.

Reference analog: none — engine addition for the LLM-data pipeline
(the data-SELECTION sibling of lm.lm_perplexity's quality filter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import _doc_tokens

DEFAULT_BUCKETS = 10_000


def _bucket(col: Column, n_buckets: int) -> Column:
    """Engine-neutral string -> [0, n_buckets) hash: first 8 md5 hex
    chars as an integer (max 2^32-1, exact in int64 and double)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets


def hashed_ngram_buckets(
    text: Column, n_buckets: int = DEFAULT_BUCKETS
) -> Column:
    """Array of feature-bucket ids for a document: one per unigram plus
    one per bigram (tokens joined with a single space), duplicates kept
    (bag semantics). Empty/NULL text -> empty array."""
    toks = _doc_tokens(text)
    uni = F.transform(toks, lambda t: _bucket(t, n_buckets))
    bi = F.when(
        F.size(toks) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: _bucket(
                F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
                n_buckets,
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.when(F.size(toks) > 0, F.concat(uni, bi)).otherwise(
        F.array().cast("array<bigint>")
    )


def _bucket_counts(df: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    from .similarity import _widen_scan

    # widen below the explode: the per-feature md5 bucket hash is the
    # compute, and a one-split parquet would serialize it on one core
    # (no-op at real scale — see _widen_scan)
    return (
        _widen_scan(df.select(text_col))
        .select(
            F.explode(hashed_ngram_buckets(F.col(text_col), n_buckets)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> tuple[DataFrame, dict]:
    """Fit the importance model.

    Returns ``(ratios, consts)``: ``ratios(bucket, log_ratio)`` has at
    most ``n_buckets`` rows (broadcast it at score time); ``consts``
    carries the two feature totals and the OOV log-ratio every bucket
    absent from BOTH relations receives (add-one smoothing makes it a
    nonzero constant, not an error)."""
    # persist the <= n_buckets-row count relations so the totals
    # collect and the ratios join share ONE hashing pass per corpus
    # (without it each downstream job re-explodes and re-md5s)
    tc = _bucket_counts(target, text_col, n_buckets).persist()
    rc = _bucket_counts(raw, text_col, n_buckets).persist()
    t_total = int(
        tc.select(F.coalesce(F.sum("n"), F.lit(0))).first()[0]
    )
    r_total = int(
        rc.select(F.coalesce(F.sum("n"), F.lit(0))).first()[0]
    )
    td = float(t_total + n_buckets)
    rd = float(r_total + n_buckets)
    ratios = (
        tc.withColumnRenamed("n", "tn")
        .join(rc.withColumnRenamed("n", "rn"), on="bucket", how="full")
        .select(
            "bucket",
            (
                F.log10((F.coalesce("tn", F.lit(0)) + 1) / F.lit(td))
                - F.log10((F.coalesce("rn", F.lit(0)) + 1) / F.lit(rd))
            ).alias("log_ratio"),
        )
    )
    import math

    oov = math.log10(1.0 / td) - math.log10(1.0 / rd)
    return ratios, {
        "target_total": t_total,
        "raw_total": r_total,
        "n_buckets": n_buckets,
        "oov_log_ratio": oov,
    }


def dsir_fit_subset(
    raw: DataFrame,
    is_target,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    features_col: str | None = None,
) -> tuple[DataFrame, dict]:
    """One-pass :func:`dsir_fit` for the common shape where the target
    is a SUBSET of the raw pool (an in-corpus reference slice): both
    bucket-count relations derive from a single feature explode with a
    per-row target flag (``is_target`` is a boolean Column over
    ``raw``'s columns), halving the hashing passes and collect jobs.
    Same smoothing, same result as dsir_fit(raw.filter(is_target), raw)
    — a target-only bucket cannot exist under the subset premise.

    ``features_col`` names a PRECOMPUTED ``array<bigint>`` bucket column
    on ``raw`` (built with :func:`hashed_ngram_buckets` at the SAME
    ``n_buckets`` — the caller's contract); when several consumers hash
    the same corpus (DSIR fit + weights + the quality classifier), a
    shared persisted feature relation pays the md5 pass once."""
    import math

    from .similarity import _widen_scan

    if features_col is not None:
        base = raw.select(
            is_target.cast("int").alias("_is_t"),
            F.col(features_col).alias("_fb"),
        )
    else:
        base = _widen_scan(
            raw.select(is_target.cast("int").alias("_is_t"), F.col(text_col))
        ).select(
            "_is_t",
            hashed_ngram_buckets(F.col(text_col), n_buckets).alias("_fb"),
        )
    counts = (
        base.select("_is_t", F.explode("_fb").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("rn"), F.sum("_is_t").alias("tn"))
        # persisted (<= n_buckets rows): the totals collect below
        # materializes it, so the ratios projection never re-runs the
        # corpus explode + md5 hashing
        .persist()
    )
    row = counts.agg(
        F.coalesce(F.sum("rn"), F.lit(0)).alias("rt"),
        F.coalesce(F.sum("tn"), F.lit(0)).alias("tt"),
        # fail-fast on a features_col hashed at a DIFFERENT bucket count
        # (the contract is docstring-only otherwise and a mismatch
        # silently skews td/rd and every weight); rides the existing
        # bounded aggregate, so the guard costs no extra job
        F.max("bucket").alias("mb"),
    ).first()
    if row["mb"] is not None and int(row["mb"]) >= n_buckets:
        raise ValueError(
            f"features_col carries bucket id {int(row['mb'])} >= "
            f"n_buckets={n_buckets}: the precomputed features were hashed "
            f"at a different bucket count (hashed_ngram_buckets contract)"
        )
    r_total, t_total = int(row["rt"]), int(row["tt"])
    td = float(t_total + n_buckets)
    rd = float(r_total + n_buckets)
    ratios = counts.select(
        "bucket",
        (
            F.log10((F.coalesce("tn", F.lit(0)) + 1) / F.lit(td))
            - F.log10((F.col("rn") + 1) / F.lit(rd))
        ).alias("log_ratio"),
    )
    oov = math.log10(1.0 / td) - math.log10(1.0 / rd)
    return ratios, {
        "target_total": t_total,
        "raw_total": r_total,
        "n_buckets": n_buckets,
        "oov_log_ratio": oov,
    }


def dsir_weights(
    docs: DataFrame,
    ratios: DataFrame,
    consts: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    features_col: str | None = None,
) -> DataFrame:
    """Per-document (id, n_feats, log_w): summed bucket log-ratios.

    ``log_w`` is NULL for documents with no features (empty text) —
    they carry no evidence either way and are excluded by
    :func:`dsir_select`. The ratios join is broadcast (<= n_buckets
    rows); the only corpus-sized shuffle is the per-doc sum.
    ``features_col``: see :func:`dsir_fit_subset` (same contract)."""
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
    scored = feats.join(F.broadcast(ratios), on="bucket", how="left").select(
        id_col,
        "bucket",
        F.coalesce("log_ratio", F.lit(consts["oov_log_ratio"])).alias("lr"),
    )
    return scored.groupBy(id_col).agg(
        F.count("bucket").cast("int").alias("n_feats"),
        F.when(
            F.count("bucket") > 0, F.sum(F.when(F.col("bucket").isNotNull(), F.col("lr")))
        ).alias("log_w"),
    )


def gumbel_key(
    log_w: Column, id_col: Column, seed: int = 0
) -> Column:
    """Deterministic Gumbel-perturbed key: log_w + g where
    g = -log10(-ln u) and u = (md5-bucket(id:seed) + 0.5)/2^32.

    Ranking by this key top-k IS Gumbel-top-k resampling (sampling
    without replacement proportional to w) with a seeded, engine-neutral
    noise source; u is an exact dyadic rational so both engines start
    the log chain from the identical double. The half-step keeps u
    STRICTLY inside (0, 1): u=0 (ln undefined) and u=1 (ln u = 0, where
    Spark's log10(0) is NULL but DuckDB's is -inf — a cross-engine
    divergence) are both unreachable for any hash value."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(str(seed)))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    return log_w - F.log10(-F.log(u))


def select_top_k(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    gumbel: bool = True,
) -> DataFrame:
    """(id, log_w, sel_rank) for the k winners of a weight relation.

    ``gumbel=True`` ranks by the deterministic Gumbel-perturbed key
    (resampling ∝ w, the paper's selection rule); ``gumbel=False``
    ranks by the raw weight (argmax selection). Either way ties break
    on id so the selected SET is deterministic. The rank is computed
    on a NARROW (key, id) relation via orderBy+limit
    (TakeOrderedAndProject: each partition keeps k, one node merges k)
    — document bytes never sort globally. NULL-weight (featureless)
    rows never qualify."""
    key = (
        gumbel_key(F.col("log_w"), F.col(id_col), seed)
        if gumbel
        else F.col("log_w")
    )
    narrow = (
        weights.filter(F.col("log_w").isNotNull())
        .select(id_col, "log_w", key.alias("_key"))
        .orderBy(F.col("_key").desc(), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    return narrow.withColumn(
        "sel_rank",
        F.row_number().over(
            Window.orderBy(F.col("_key").desc(), F.col(id_col))
        ).cast("int"),
    ).drop("_key")


def select_above(
    weights: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    seed: int = 0,
    gumbel: bool = True,
) -> DataFrame:
    """(id, log_w) rows whose selection key clears ``threshold`` — the
    pure-filter scale path when k is too large to merge on one node
    (pick the threshold from e.g. approxQuantile over the key). No
    rank, no global sort: a per-row predicate the optimizer pushes
    down."""
    key = (
        gumbel_key(F.col("log_w"), F.col(id_col), seed)
        if gumbel
        else F.col("log_w")
    )
    return (
        weights.filter(F.col("log_w").isNotNull())
        .filter(key >= threshold)
        .select(id_col, "log_w")
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    seed: int = 0,
    gumbel: bool = True,
) -> DataFrame:
    """One-call DSIR: fit on (target, docs-as-raw), weight, pick k.

    Returns the selected documents (all input columns) plus ``log_w``
    and ``sel_rank`` (1-based); see :func:`select_top_k` for the
    selection contract."""
    ratios, consts = dsir_fit(target, docs, text_col, n_buckets)
    w = dsir_weights(docs, ratios, consts, id_col, text_col)
    return docs.join(select_top_k(w, k, id_col, seed, gumbel), on=id_col, how="inner")
