"""Text-analysis operators for training-data pipelines.

All JVM-side column expressions (no Python in the hot path): language-ID
heuristic, quality scoring, token counting, document fingerprinting.
These generalize the reference's per-column row transforms (masking /
string funcs, ``batch-tool model/mask/*``, ``worker/util/UpdateUtil.java:198-219``)
to corpus curation at 100 TB: every function is a narrow projection over
one string column, so Catalyst prunes the scan to exactly that column
and the whole pipeline stays in WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small, deterministic English stopword set — shared with the DuckDB
# oracle (keep sorted; both engines build the same membership test)
STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "in",
    "is", "it", "of", "on", "or", "that", "the", "to", "with",
)


def tokens(col: Column) -> Column:
    """Whitespace tokenization (empty-safe)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("int")


def bpe_token_estimate(col: Column) -> Column:
    """BPE-ish token estimate: ceil(chars / 4) — the standard serving
    approximation; cheap enough to run over 10^10 rows."""
    return F.ceil(F.length(col) / F.lit(4.0)).cast("int")


# GPT-2-style pre-tokenizer pattern, restricted to the Java-regex ∩ RE2
# subset (no lookahead, so the trailing-whitespace clauses are dropped
# and pure-whitespace runs simply don't count): contractions, a
# letter run, a digit run, or a punctuation run — each optionally
# preceded by one space. Alternation order matters and is identical on
# both engines (leftmost-first).
_BPE_SPLIT = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_regex_tokens(col: Column) -> Column:
    """GPT-2-style regex PRE-tokens (the splitter BPE merges run
    inside): contractions split off, letter/digit/punctuation runs
    separated. An upper bound on true BPE tokens that, unlike
    ``bpe_token_estimate``, responds to punctuation density and word
    boundaries; one vectorized regexp per row, no UDF."""
    return F.regexp_extract_all(col, F.lit(_BPE_SPLIT), 0)


def bpe_regex_token_count(col: Column) -> Column:
    return F.size(bpe_regex_tokens(col)).cast("int")


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    stop = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return (
        F.when(F.size(toks) > 0, F.size(stop) / F.size(toks)).otherwise(F.lit(0.0))
    ).cast("double")


def punct_ratio(col: Column) -> Column:
    no_punct = F.regexp_replace(col, r"[^\w\s]", "")
    return (
        F.when(
            F.length(col) > 0,
            (F.length(col) - F.length(no_punct)) / F.length(col),
        ).otherwise(F.lit(0.0))
    ).cast("double")


def mean_word_len(col: Column) -> Column:
    toks = tokens(col)
    return (
        F.when(
            F.size(toks) > 0,
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            / F.size(toks),
        ).otherwise(F.lit(0.0))
    ).cast("double")


def lang_id(col: Column, en_threshold: float = 0.08) -> Column:
    """N-gram-free heuristic language ID: ASCII share + English stopword
    density. Deterministic and SQL-portable (oracle runs the same rule)."""
    ascii_share = (
        F.when(
            F.length(col) > 0,
            F.length(F.regexp_replace(col, r"[^\x00-\x7F]", "")) / F.length(col),
        ).otherwise(F.lit(1.0))
    ).cast("double")
    return (
        F.when(ascii_share < 0.8, F.lit("other"))
        .when(stopword_ratio(col) >= en_threshold, F.lit("en"))
        .otherwise(F.lit("unk"))
    )


def quality_score(col: Column) -> Column:
    """[0,1] quality heuristic: length band + stopword presence + sane
    word length + low punctuation. Mirrors classic corpus filters
    (C4/Gopher-style rules) as one codegen'd expression."""
    n_tok = token_count(col)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) >= 0.03, F.lit(0.25)).otherwise(F.lit(0.0))
    wl = mean_word_len(col)
    wl_ok = F.when((wl >= 2.0) & (wl <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    return (len_ok + stop_ok + wl_ok + punct_ok).cast("double")


def _lines(col: Column) -> Column:
    """Non-empty trimmed lines (empty-safe)."""
    return F.filter(
        F.transform(F.split(col, "\n"), lambda t: F.trim(t)),
        lambda x: x != F.lit(""),
    )


def dup_line_fraction(col: Column) -> Column:
    """Intra-document repetition signal (Gopher-style repetition
    filter): fraction of non-empty lines that repeat an earlier line,
    ``1 - distinct_lines/total_lines``. Boilerplate-heavy or
    template-generated pages score high and get filtered before
    training. Pure expression — no shuffle, no UDF."""
    l = _lines(col)
    return (
        F.when(
            F.size(l) > 0,
            F.lit(1) - F.size(F.array_distinct(l)) / F.size(l),
        ).otherwise(F.lit(0.0))
    ).cast("double")


def c4_clean_lines(col: Column) -> Column:
    """C4-style line filter (Raffel et al. 2020 §2.2, public heuristics):
    keep only lines that end in terminal punctuation (``.!?"``), have at
    least 3 words, and don't mention javascript (cookie/JS-warning
    boilerplate). Returns the cleaned text (kept lines re-joined with
    newlines). Pure higher-order-function expressions — no UDF, no
    shuffle; NULL text stays NULL."""
    kept = F.filter(
        _lines(col),
        lambda l: (
            l.rlike(r'[.!?"]$')
            & (F.size(F.split(l, r"\s+")) >= 3)
            & ~F.lower(l).contains("javascript")
        ),
    )
    return F.when(col.isNotNull(), F.array_join(kept, "\n"))


def c4_document_keep(col: Column, min_sentences: int = 5) -> Column:
    """C4-style page filter over the ALREADY line-cleaned text: drop
    documents containing a curly brace (code), the phrase "lorem ipsum"
    (placeholder boilerplate), or fewer than ``min_sentences`` sentences
    (terminal-punctuation runs). 1 = keep, 0 = drop; NULL text drops."""
    lc = F.lower(col)
    # sentence = a run of terminal punctuation followed by a quote,
    # whitespace, or end of text ("..." is one sentence end, not three)
    n_sent = F.regexp_count(col, F.lit(r'[.!?]+(?=["\s]|$)'))
    return (
        col.isNotNull()
        & ~lc.contains("{")
        & ~lc.contains("lorem ipsum")
        & (n_sent >= min_sentences)
    ).cast("int")


def c4_clean(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_sentences: int = 5,
) -> "DataFrame":
    """Full C4 cleaning pass: line filter then page filter. One row per
    input doc: ``(id_col, clean_text, n_lines_in, n_lines_kept, keep)``
    — callers keep ``keep = 1`` rows' ``clean_text``. Entirely
    projections (one narrow select), so it composes with any scan."""
    cleaned = c4_clean_lines(F.col(text_col))
    return df.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        F.size(_lines(F.col(text_col))).cast("long").alias("n_lines_in"),
        F.size(_lines(cleaned)).cast("long").alias("n_lines_kept"),
        c4_document_keep(cleaned, min_sentences).alias("keep"),
    )


def word_ngrams(col: Column, n: int = 2) -> Column:
    """Word n-grams of the lowercased token stream, WITH repeats
    (repetition metrics need the multiset; dedup shingles live in
    dedup.shingles)."""
    toks = tokens(F.lower(col))
    k = F.size(toks)
    return F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(0), k - F.lit(n)),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_ngram_fraction(col: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that repeat an earlier n-gram —
    the n-gram-level repetition filter (catches looped phrases a
    line-level check misses)."""
    g = word_ngrams(col, n)
    return (
        F.when(
            F.size(g) > 0,
            F.lit(1) - F.size(F.array_distinct(g)) / F.size(g),
        ).otherwise(F.lit(0.0))
    ).cast("double")


def top_ngram_fraction(col: Column, n: int = 2) -> Column:
    """Fraction of the document's word n-grams taken by its single MOST
    FREQUENT n-gram (Gopher's top-n-gram rule): a page dominated by one
    repeated phrase scores near 1. Computed as the longest run of the
    SORTED n-gram array via one struct fold — O(g log g) per document
    (the naive per-distinct-gram count is O(g^2), unusable on long
    documents)."""
    g = F.array_sort(word_ngrams(col, n))
    run = lambda a, x: F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
    acc = F.aggregate(
        g,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("int").alias("run"),
            F.lit(0).cast("int").alias("best"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            run(a, x).alias("run"),
            F.greatest(a["best"], run(a, x)).alias("best"),
        ),
    )
    return (
        F.when(F.size(g) > 0, acc["best"] / F.size(g)).otherwise(F.lit(0.0))
    ).cast("double")


def benchmark_ngrams(
    benchmark,
    n: int = 13,
    text_col: str = "text",
):
    """Distinct word n-gram set of an evaluation corpus, as a one-column
    (``g``) DataFrame — the broadcast side of :func:`decontaminate`.
    Factored out so long-running consumers (the streaming curation gate)
    derive it ONCE and reuse it across microbatches instead of
    re-exploding the benchmark per batch."""
    return (
        benchmark.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("g")
        ).distinct()
    )


def decontaminate(
    docs,
    benchmark=None,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    benchmark_grams=None,
):
    """Benchmark decontamination: flag every training document that
    shares at least one word ``n``-gram (default 13 — the GPT-3/Pile
    convention) with an evaluation corpus, so eval answers cannot leak
    into the training set. Returns one row per ``docs`` row:
    ``(id_col, n_contam_grams, contaminated)`` where ``n_contam_grams``
    counts the DISTINCT overlapping n-grams.

    Scale posture: the benchmark side reduces to its distinct n-gram
    set — eval suites are MBs against a 100-TB corpus, so it is
    broadcast and the corpus side never shuffles its text: one widened
    projection + explode, the hit join is map-side, and the per-doc
    aggregate runs only over HIT rows (rare by construction). The
    closing left join carries only (id, count) pairs.

    Pass either ``benchmark`` (raw eval docs — the gram set is derived
    here) or ``benchmark_grams`` (a one-column ``g`` DataFrame from
    :func:`benchmark_ngrams`, pre-derived and possibly persisted by the
    caller).
    """
    from polardbx_tools_spark.operators.similarity import _widen_scan

    if benchmark_grams is not None:
        bg = benchmark_grams
    elif benchmark is not None:
        bg = benchmark_ngrams(benchmark, n, bench_text_col or text_col)
    else:
        raise ValueError("decontaminate needs benchmark or benchmark_grams")
    dg = _widen_scan(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("_did"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("g"),
    )
    hits = (
        dg.join(F.broadcast(bg), "g")
        .groupBy("_did")
        .agg(F.count_distinct("g").cast("long").alias("n_contam_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, F.col(id_col) == F.col("_did"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_contam_grams"), F.lit(0))
            .cast("long")
            .alias("n_contam_grams"),
            (F.coalesce(F.col("n_contam_grams"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, strip
    punctuation, collapse whitespace. The corpus analog of frodo's SQL
    deparameterizer (``frodo-core/.../utils/Util.java:385-462``)."""
    t = F.lower(col)
    t = F.regexp_replace(t, r"[^\w\s]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint(col: Column) -> Column:
    """128-bit content fingerprint of the normalized text (the engine's
    ``sqlId``: 16-hex MD5, ref ``Util.java:96-110`` — ours keeps 32 hex).

    When normalization erases the whole document (``\\w`` is ASCII in
    both Java and RE2, so a fully non-Latin doc normalizes to ""), the
    fingerprint falls back to the RAW text hash — otherwise every such
    document would share one fingerprint and normalized dedup would
    collapse the entire non-Latin subset into a single group."""
    norm = normalize_text(col)
    return F.when(norm != "", F.md5(norm)).otherwise(F.md5(col))


def sql_template_id(col: Column) -> Column:
    """Statement-template fingerprint: numbers and quoted strings → ``?``
    then MD5 — frodo's fallback deparameterizer semantics
    (``Util.java:385-462``), vectorized as column expressions."""
    t = F.regexp_replace(col, r"'[^']*'", "?")
    t = F.regexp_replace(t, r"\b[0-9]+(\.[0-9]+)?\b", "?")
    t = F.regexp_replace(F.trim(t), r"\s+", " ")
    return F.md5(t)


def tokenized_docs(
    df: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """(doc_id, _t) lowercased whitespace-token ARRAYS, widened below the
    tokenize — the shared lexical base :func:`tf_idf_top_terms` and
    ``retrieval.bm25_topk`` both accept (``tokenized=``), so a caller
    running several lexical rankers over one corpus persists THIS once
    instead of paying the tokenize scan per ranker (the same
    shared-relation discipline as the quality suite's hashed-feature
    pass). One array row per doc (~tokens bytes), safe to persist."""
    from polardbx_tools_spark.operators.similarity import _widen_scan

    return _widen_scan(df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("_t"),
    )


def tf_idf_top_terms(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    tokenized: "DataFrame | None" = None,
) -> "DataFrame":
    """Top-k TF-IDF terms per document (corpus keyword extraction).

    score = tf(term, doc) * ln(N / df(term)); ties broken by term so the
    ranking is deterministic. Distributed shape: one (doc, term) partial
    agg, one term-level doc-frequency agg joined back (term key), the
    corpus size as a broadcast single-row relation (never a driver
    collect), then a per-doc top-k window. Ordering compares the
    ROUNDED score so rank is reproducible across engines (raw ln()
    differs in the last ulp between libm implementations).

    ``tokenized`` reuses a (persisted) :func:`tokenized_docs` relation —
    the corpus then tokenizes zero extra times here (shared with e.g. a
    BM25 pass over the same corpus).
    """
    from pyspark.sql import DataFrame as _DF  # noqa: F401  (doc type only)
    from pyspark.sql.window import Window

    # widen below the tokenize/explode: a small parquet arrives as one
    # split and the per-doc regex tokenize then serializes on one core
    # (no-op at real scale — see _widen_scan)
    base = (
        tokenized
        if tokenized is not None
        else tokenized_docs(df, text_col, id_col)
    )
    toks = base.select("doc_id", F.explode("_t").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df_t")
    )
    n_docs = base.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df_t")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "rank", "tfidf")
    )
