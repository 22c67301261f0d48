"""BM25 lexical retrieval (Robertson/Spärck Jones; the Lucene
non-negative idf variant) — the LEXICAL complement of the ANN family
for retrieval-based curation: finding corpus documents relevant to a
query set (eval-set attribution, retrieval-augmented packing, targeted
inspection) without embeddings.

score(q, d) = sum over distinct query terms t present in d of
    idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
with idf(t) = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)  — >= 0 always,
N = corpus doc count, df_t = docs containing t, dl = doc token count,
avgdl = total tokens / N (empty docs count toward N). Query terms are
SET semantics (repeated query words score once — the classic BM25
form without qtf saturation).

Physical shape at 100 TB: postings (doc, term, tf, dl) are one
hash-groupBy over one tokenize explode (dl rides each posting row out
of the explode — no doc-length join); term document-frequency is one
more groupBy bounded by vocabulary; (N, avgdl) is a single-row
broadcast relation (never a driver collect). idf folds into the TINY
query-term relation, which is then BROADCAST into the postings join,
so the corpus shuffles only for its own aggregates and the final
(query, doc) partial-sum — candidate rows ∝ postings matching query
terms, never |corpus| x |queries|.
Ranking compares the ROUNDED score (ln() differs in the last ulp
across libms) with doc-id tie-break, then a per-query top-k window
over candidates only.

Reference analog: none — engine addition for the LLM-data pipeline
(SURVEY §2.12), sibling of similarity.cosine_topk / text.tf_idf_top_terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import tokens


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """Per-query BM25 top-k: (query_id, doc_id, rank, score).

    ``score`` is rounded to 6 decimals BEFORE ranking so the ordering
    is reproducible across engines; ties break on doc id. Queries with
    no term overlap return no rows (score 0 is not a match).

    ``tokenized`` reuses a (persisted) ``text.tokenized_docs`` relation
    of the corpus — shared with a TF-IDF pass, the corpus tokenizes
    once for both rankers (and the (N, avgdl) aggregate below reads the
    cached arrays instead of re-tokenizing)."""
    from .text import tokenized_docs

    # dl rides every posting row out of the explode — no corpus-sized
    # doc-length join later
    base = (
        tokenized
        if tokenized is not None
        else tokenized_docs(corpus, text_col, id_col)
    )
    toks = base.select(
        "doc_id", F.size("_t").alias("dl"), F.explode("_t").alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df_t"))
    # N / avgdl come from the SAME widened tokenized relation — a
    # corpus.agg over tokens(...) would re-tokenize the whole corpus in
    # a second (unwidened, single-split-serialized) pass
    stats = base.agg(
        F.count("*").alias("n_docs"),
        (F.coalesce(F.sum(F.size("_t")), F.lit(0))
         / F.count("*")).alias("avgdl"),
    )
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(tokens(F.lower(F.col(query_text_col))))
        ).alias("term"),
    )
    # fold idf into the tiny query relation so the corpus-sized postings
    # join carries everything it needs in ONE broadcast
    qm = (
        F.broadcast(qterms)
        .join(dfreq, on="term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term", "query_id", "avgdl",
            F.log(
                (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5) + 1
            ).alias("idf"),
        )
    )
    tf_sat = (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    cand = (
        tf.join(F.broadcast(qm), on="term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("idf") * tf_sat), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score")
    )
