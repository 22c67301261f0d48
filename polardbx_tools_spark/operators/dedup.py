"""Deduplication operators: exact, normalized, jaccard-pairs,
MinHash+LSH, SimHash.

The CDC engine's key-dedup is ``lake.merge.dedup_last_writer``; these are
the *content* dedup operators a training-data pipeline needs on top
(prompt requirement). Scale posture:

* exact/normalized: one hash-groupBy — map-side partial agg, no driver.
* jaccard_pairs: blocked self-join (never unblocked O(n²)); block key
  bounds candidate pairs, AQE handles block skew.
* minhash_lsh: shingle → k-min signature → band buckets → join within
  bucket only. All signature math is JVM array exprs (no Python).
* simhash: 64-bit sign aggregate over token hashes via explode +
  bit-position groupBy; hamming ≤ r candidate filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polardbx_tools_spark.operators.text import normalize_text, tokens


# ------------------------------------------------------------------ exact

def exact_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups by content hash: canonical id = min id,
    group size. Hash-groupBy: partial aggregation map-side, one shuffle."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact content hash."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def normalized_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-exact dedup groups on normalized text (case/punct/ws-insensitive)."""
    return (
        df.select(F.md5(normalize_text(F.col(text_col))).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )


# --------------------------------------------------------------- jaccard

def word_set(col: Column) -> Column:
    return F.array_distinct(tokens(F.lower(col)))


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: Column | None = None,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-set Jaccard over *blocked* candidate pairs.

    ``block_col`` bounds the quadratic term (default: token-count band —
    near-dups have near-equal lengths). Returns (id_a, id_b, jaccard)
    with id_a < id_b and jaccard >= threshold.
    """
    if block_col is None:
        block_col = F.floor(F.size(word_set(F.col(text_col))) / F.lit(10))
    base = df.select(
        F.col(id_col).alias("id"),
        word_set(F.col(text_col)).alias("ws"),
        block_col.alias("blk"),
    )
    # cost is O(candidate pairs) — exact verification is the point of this
    # operator; use minhash_lsh_pairs as the sub-quadratic scale path
    a = base.select(
        F.col("id").alias("id_a"), F.col("ws").alias("ws_a"), F.col("blk")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("ws").alias("ws_b"), F.col("blk")
    )
    inter = F.size(F.array_intersect(F.col("ws_a"), F.col("ws_b")))
    union = F.size(F.array_union(F.col("ws_a"), F.col("ws_b")))
    jac = (inter / union).cast("double")
    return (
        a.join(b, on="blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ----------------------------------------------------------- minhash+lsh

def shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles as an array (empty-safe, distinct)."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    return F.when(n >= k, F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - F.lit(k)),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
    )).otherwise(F.array(F.array_join(toks, " ")))


def minhash_signature(col: Column, num_hashes: int = 32, seed: int = 42, k: int = 3) -> Column:
    """Array of ``num_hashes`` min-hashes over word k-shingles.

    Each hash_j = min over shingles of xxhash64(shingle, seed+j) — pure
    JVM array expressions, vectorizable, no UDF.
    """
    sh = shingles(col, k)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s, j=j: F.xxhash64(s, F.lit(seed + j))))
            for j in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    k_shingle: int = 3,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs: signature → band buckets →
    within-bucket join → exact shingle-Jaccard verification.

    Two docs collide if any band of ``rows = num_hashes/bands`` hash
    values matches exactly. Candidates are then verified with true
    Jaccard over shingle sets, so the output has no LSH false positives
    (recall, not precision, is probabilistic — standard LSH contract).
    """
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), k_shingle).alias("sh"),
        minhash_signature(F.col(text_col), num_hashes, seed, k_shingle).alias("sig"),
    )
    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[
                                F.element_at("sig", b * rows + r + 1).cast("string")
                                for r in range(rows)
                            ])
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "band", "bucket")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (inter / union).cast("double").alias("jaccard"))
        .distinct()
        .filter(F.col("jaccard") >= verify_threshold)
    )


# ----------------------------------------------------------------- simhash

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document.

    token → xxhash64 → per-bit ±1 votes → sign → bit assembly. Explode +
    groupBy keeps it fully distributed; one shuffle on id.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.col("h").isNull(), F.lit(0))
            .when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("id").agg(*votes)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long") if i < 63 else F.when(
            F.col("v63") > 0, F.lit(-(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select("id", sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on the top-16
    bits (near-dups share the prefix with high probability)."""
    sh = simhash64(df, text_col, id_col)
    blk = F.shiftrightunsigned("simhash", 48)
    a = sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("h_a"), blk.alias("blk"))
    b = sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("h_b"), blk.alias("blk"))
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, on="blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
