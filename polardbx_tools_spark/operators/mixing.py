"""Training-mix assembly: combine curated corpora into one training set
whose token mass matches prescribed source weights (the "data mixture"
step between curation and packing).

Given sources S with weights w_s (sum 1) and available token masses
T_s, the mixture size is ``target_tokens`` when given, else the
largest no-repetition mixture M = min_s T_s / w_s; source s then needs
p_s = M * w_s / T_s of its tokens. p_s <= 1 downsamples; p_s > 1
oversamples — the doc is repeated floor(p_s) times (``epoch`` column
0..k) and the fractional remainder is sampled, which is how small
high-quality sources are upweighted across training epochs.

Scale shape: per-source token masses are one bounded aggregate each;
selection is a pure per-row predicate on a salted ``xxhash64`` of the
id (deterministic under ``seed``, no shuffle, no sort); repetition is
``explode(sequence(...))``. The union is by name with a ``source``
label, so the output feeds :mod:`packing` directly — pass
``order_col`` there on a hash of (source, id, epoch) to interleave
sources instead of concatenating them block-wise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = 1 << 30


def mix_corpora(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    target_tokens: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    seed: int = 0,
    token_masses: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic weighted mixture of document corpora.

    Returns the union of the sampled sources with columns
    ``(source, epoch, id_col, text_col, n_tokens)`` — ``epoch`` > 0
    marks oversampled repeats. Weights are normalized; sources must be
    non-empty. Sampling is per-row on ``xxhash64(source, id, seed)``,
    so membership is stable across runs and cluster sizes.

    ``token_masses`` reuses per-source token totals the caller already
    aggregated (e.g. to derive temperature/UniMax weights) instead of
    re-scanning every source — they must have been counted with the
    same ``token_col``/``text_col`` convention.
    """
    if set(sources) != set(weights):
        raise ValueError("sources and weights must have the same keys")
    if not sources:
        raise ValueError("need at least one source")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum > 0")
    norm = {k: w / wsum for k, w in weights.items()}

    from polardbx_tools_spark.operators.text import token_count

    def with_tokens(df):
        if token_col is not None:
            n = F.coalesce(F.col(token_col), F.lit(0)).cast("long")
        else:
            n = F.coalesce(token_count(F.col(text_col)), F.lit(0)) \
                .cast("long")
        return df.select(id_col, text_col, n.alias("n_tokens"))

    prepped = {k: with_tokens(df) for k, df in sources.items()}
    if token_masses is not None:
        if set(token_masses) != set(sources):
            raise ValueError("token_masses keys must match sources")
        masses = {k: float(t) for k, t in token_masses.items()}
    else:
        # bounded: one single-row aggregate per source
        masses = {
            k: (df.agg(F.sum("n_tokens")).collect()[0][0] or 0)
            for k, df in prepped.items()
        }
    for k, t in masses.items():
        if t <= 0:
            raise ValueError(f"source {k!r} has no tokens")
    if target_tokens is not None:
        mixture = float(target_tokens)
    else:
        mixture = min(masses[k] / norm[k] for k in norm if norm[k] > 0)

    out = None
    for k, df in prepped.items():
        p = mixture * norm[k] / masses[k]
        # weights/targets arrive as floats: a p that is an integer by
        # construction (e.g. target = 2*T_a + 3*T_b with proportional
        # weights) can land at 1.9999999999999998, which would flip a
        # whole epoch into near-total hash sampling — snap within 1e-9
        if abs(p - round(p)) < 1e-9:
            p = float(round(p))
        whole, frac = int(p), p - int(p)
        h = F.abs(F.xxhash64(F.lit(k), F.col(id_col), F.lit(seed)))
        picked = (
            df.withColumn(
                "_copies",
                F.lit(whole)
                + ((h % _DENOM) < F.lit(int(frac * _DENOM))).cast("int"),
            )
            .filter(F.col("_copies") > 0)
            .select(
                F.lit(k).alias("source"),
                F.explode(
                    F.sequence(F.lit(0), F.col("_copies") - 1)
                ).alias("epoch"),
                F.col(id_col),
                F.col(text_col),
                F.col("n_tokens"),
            )
        )
        out = picked if out is None else out.unionByName(picked)
    return out


def temperature_weights(
    token_masses: dict[str, float], tau: float = 0.3
) -> dict[str, float]:
    """Temperature-based mixture weights (multilingual-LM standard,
    e.g. mT5, arXiv:2010.11934 §3.1): w_s ∝ T_s^tau. ``tau=1``
    reproduces natural proportions, ``tau=0`` is uniform; the usual
    range 0.2-0.7 upweights small sources without flattening entirely.
    Pure driver math over the per-source masses :func:`mix_corpora`
    already aggregates — feed the result straight back as its
    ``weights``."""
    if tau < 0:
        raise ValueError("tau must be >= 0")
    raised = {s: float(t) ** tau for s, t in token_masses.items()}
    z = sum(raised.values())
    if z <= 0:
        raise ValueError("token masses must be positive")
    return {s: v / z for s, v in raised.items()}


def unimax_weights(
    token_masses: dict[str, float],
    budget_tokens: float,
    max_epochs: float = 4.0,
) -> dict[str, float]:
    """UniMax mixture weights (Chung et al. 2023, arXiv:2304.09151):
    distribute a token budget as UNIFORMLY as possible across sources
    while capping any source's repetition at ``max_epochs`` epochs.
    Greedy water-filling over sources ascending by capacity
    ``T_s * max_epochs``: a source that cannot absorb the uniform share
    of the remaining budget is capped at its capacity and the residual
    re-spreads over the rest — the paper's exact allocation. Returns
    weights summing to 1 (budget shares); pair with
    ``mix_corpora(target_tokens=budget_tokens)``."""
    if budget_tokens <= 0 or max_epochs <= 0:
        raise ValueError("budget_tokens and max_epochs must be positive")
    caps = {s: float(t) * max_epochs for s, t in token_masses.items()}
    if sum(caps.values()) < budget_tokens:
        raise ValueError(
            f"budget {budget_tokens} exceeds total capacity "
            f"{sum(caps.values())} at max_epochs={max_epochs}"
        )
    alloc: dict[str, float] = {}
    remaining_budget = float(budget_tokens)
    todo = sorted(caps, key=lambda s: (caps[s], s))
    while todo:
        share = remaining_budget / len(todo)
        s = todo[0]
        if caps[s] <= share:
            alloc[s] = caps[s]
            remaining_budget -= caps[s]
            todo.pop(0)
        else:
            # every remaining source can absorb the uniform share
            for s in todo:
                alloc[s] = share
            todo = []
    return {s: v / budget_tokens for s, v in alloc.items()}


def interleave_key(id_col: str = "doc_id", seed: int = 0) -> Column:
    """Order key over :func:`mix_corpora` output that scatters sources
    (and epoch repeats of the same doc) uniformly through the packed
    token stream — pass as ``order_col`` to ``packing.pack_sequences``
    so a batch window sees the mixture's weights instead of one source
    block. Deterministic under ``seed``; distinct per (source, id,
    epoch) so range partitioning has no heavy ties."""
    return F.xxhash64("source", F.col(id_col), "epoch", F.lit(seed))


def mixture_stats(mixed: DataFrame) -> DataFrame:
    """Achieved mixture per source:
    ``(source, n_docs, n_tokens, token_share, max_epoch)`` — compare
    ``token_share`` against the requested weights to see sampling
    error (small, ∝ 1/sqrt(docs picked))."""
    per = mixed.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.max("epoch").cast("long").alias("max_epoch"),
    )
    return (
        per.crossJoin(
            F.broadcast(per.agg(F.sum("n_tokens").alias("_tot")))
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_tot"), 6)
            .alias("token_share"),
            "max_epoch",
        )
    )
