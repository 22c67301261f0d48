"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, plus a random-hyperplane
LSH-bucketed variant as the scale path (candidates ∝ bucket size, not
corpus size). Dot products are JVM ``zip_with``/``aggregate`` exprs —
no Python in the inner loop.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Max float64 elements in one bucket-scoring slab (block x n); bounds
# worker memory at ~32 MB per chunk regardless of bucket skew.
_PAIR_BLOCK_ELEMS = 1 << 22


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (l2_norm(a) * l2_norm(b))).cast("double")


def cosine_with_norms(
    v_a: Column, v_b: Column, n_a: Column, n_b: Column
) -> Column:
    """Cosine for a verify join where per-VECTOR norms were computed
    once on the (small) vector relation instead of twice per PAIR:
    same value bit-for-bit as :func:`cosine` (identical fold order,
    identical ``dot / (norm_a * norm_b)`` arithmetic), 3x fewer array
    folds per pair. (An unrolled element_at dot was tried and is ~2x
    SLOWER: 128 leaf expressions overflow the codegen method budget and
    fall back to per-node interpreted eval, while one zip_with fold is
    a tight loop.)"""
    return (dot(v_a, v_b) / (n_a * n_b)).cast("double")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries are broadcast (the small side); corpus streams through one
    codegen'd projection — the right plan at 10^10 corpus rows. Returns
    (query_id, neighbor_id, cosine, rank), excluding self-matches.
    """
    from pyspark.sql.window import Window

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    # widen below the broadcast join: the per-(corpus row, query) cosine
    # folds are the compute; a one-split corpus parquet would serialize
    # them on one core (no-op at real scale — see _widen_scan)
    c = _widen_scan(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _widen_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition to core count IFF the scan has fewer
    splits: a small parquet arrives as one split and a compute-heavy
    per-row stage (sign masks, numpy batches) then serializes on one
    core. At real scale splits >> cores and this adds NO exchange."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df


def _pair_score_schema(df: DataFrame, id_col: str, score_name: str):
    """(query_id, neighbor_id, <score>) StructType with the id columns
    typed from the INPUT id field — a string/decimal id survives the
    Arrow boundary instead of failing a hard-coded long cast."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    id_type = {f.name: f for f in df.schema.fields}[id_col].dataType
    return StructType([
        StructField("query_id", id_type, True),
        StructField("neighbor_id", id_type, True),
        StructField(score_name, DoubleType(), True),
    ])


def brute_force_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Numpy fast path for exact top-k cosine: the query matrix is
    broadcast to every partition; each Arrow batch of corpus vectors is
    scored with ONE `corpus_batch @ Q.T` matmul and reduced to per-batch
    top-k inside the worker, so only ``k`` candidates per (query, batch)
    reach the final shuffle. Same results as :func:`brute_force_topk`
    (modulo fp summation order — both are exact cosine), ~10-100x faster
    per row at high dim. This is the scale path for 10^10-row corpora;
    the expression version stays as the all-JVM baseline.
    """
    import numpy as np
    from pyspark.sql.window import Window

    # small, by contract; NULL query vectors degrade to no rows (the
    # corpus side already drops them per-row) instead of a ragged
    # np.array crash, and an empty query set returns an empty result
    # instead of an AxisError from norm(axis=1) on shape (0,)
    q_rows = (
        queries.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .collect()
    )
    if not q_rows:
        return queries.sparkSession.createDataFrame(
            [], _pair_score_schema(corpus, id_col, "cosine")
        )
    q_ids = np.asarray([r[id_col] for r in q_rows])  # keep the input id dtype
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0] = 1.0
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat, q_norm))

    out_schema = _pair_score_schema(corpus, id_col, "cosine")

    def score(batches):
        import pandas as pd

        ids_b, mat_b, norm_b = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy()  # keep the input id dtype
            c_mat = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            c_norm[c_norm == 0] = 1.0
            sims = (c_mat @ mat_b.T) / np.outer(c_norm, norm_b)  # [batch, q]
            frames = []
            for j, qid in enumerate(ids_b):
                col = sims[:, j]
                mask = c_ids != qid
                cand_idx = np.nonzero(mask)[0]
                if not len(cand_idx):
                    continue
                # per-batch prune must break cosine TIES by neighbor_id
                # (the global window's tie-break), not by batch row
                # position — otherwise a tied candidate with a smaller
                # id can be dropped here and the final top-k diverges
                # from the exact baseline/oracle. lexsort: last key is
                # primary (descending cosine), ids ascending within ties.
                order = np.lexsort((c_ids[cand_idx], -col[cand_idx]))[:k]
                top = cand_idx[order]
                frames.append(pd.DataFrame({
                    "query_id": qid,
                    "neighbor_id": c_ids[top],
                    "cosine": col[top],
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    # NULL vectors would crash np.stack with a ragged batch; the expr
    # twin scores them NULL (excluded from top-k) — drop them up front
    partial = _widen_scan(
        corpus.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    ).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.4,
    n_planes: int = 3,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-side twin of
    :func:`lsh_topk`): multi-table hyperplane LSH self-join — candidates
    are pairs sharing a bucket in ANY table, verified with exact cosine
    >= threshold. Same shuffle discipline as minhash: the bucket
    self-join carries IDS ONLY; vectors are joined back once for the
    surviving distinct candidates.

    Physical shape (round-4): BUCKET-LOCAL PAIRWISE scoring — one
    shuffle of (id, vec) keyed by (table, bucket), then each bucket
    group scores its own pairs in a vectorized Arrow pass and emits
    only the survivors; a pair colliding in several tables scores
    identically each time, so ``max()`` dedups without a join-back
    (the :func:`lsh_topk` discipline). This shuffles
    ``rows x n_tables`` vector rows — at near-dup workloads the
    CANDIDATE PAIR count dwarfs that, so the former ids-only self-join
    + per-pair verify join moved strictly more data AND paid an
    interpreted fold per pair (round-4 profile: the verify dominated at
    ~3 s). Quadratic work inside a skewed bucket is inherent to any
    LSH self-join; widen ``n_planes`` to cap bucket sizes.

    Cosine values replay the former expression form bit-for-bit
    (f32 products widened then summed in index order, f32-squared
    norms), so the SQL-literal oracle keeps matching. Zero-norm
    vectors never pair: their cosine is undefined (0/0 -> NaN) and the
    numpy keep-mask drops NaN — matching the SQL oracle's comparison
    semantics (the former Spark `>=` filter followed Spark's
    NaN-is-largest ordering and emitted such pairs with a NaN score)."""
    import numpy as np

    from pyspark.sql.types import DoubleType, StructField, StructType

    id_field = {f.name: f for f in df.schema.fields}[id_col]
    out_schema = StructType([
        StructField("id_a", id_field.dataType, True),
        StructField("id_b", id_field.dataType, True),
        StructField("cosine", DoubleType(), True),
    ])
    block_elems = _PAIR_BLOCK_ELEMS  # captured by value into the closure

    def score_bucket(pdf):
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({k: [] for k in ("id_a", "id_b", "cosine")})
        order = np.argsort(pdf["id"].to_numpy())
        ids = pdf["id"].to_numpy()[order]
        v32 = np.stack(pdf["v"].map(np.asarray).values)[order]
        d = v32.shape[1]
        sq64 = (v32 * v32).astype(np.float64)
        nacc = np.zeros(n, dtype=np.float64)
        for e in range(d):
            nacc += sq64[:, e]
        nrm = np.sqrt(nacc)
        # Row-chunked upper triangle: a hot/skewed bucket of B rows
        # would otherwise allocate a dense BxB float64 matrix (~20 GB
        # at B=50k) in one Python worker. Each chunk is block x n
        # (block sized so the slab stays ~32 MB); per-element
        # accumulation order inside a chunk is unchanged, so cosine
        # values stay bit-identical to the one-shot matrix.
        block = max(1, block_elems // n)
        outs = []
        for i0 in range(0, n - 1, block):
            i1 = min(i0 + block, n)
            acc = np.zeros((i1 - i0, n), dtype=np.float64)
            for e in range(d):  # f32 product widened, summed in index order
                acc += (v32[i0:i1, e, None] * v32[None, :, e]).astype(np.float64)
            cos = acc / np.outer(nrm[i0:i1], nrm)
            upper = np.arange(n)[None, :] > np.arange(i0, i1)[:, None]
            # NaN >= threshold is False, so zero-norm rows drop here
            ia, ib = np.nonzero(upper & (cos >= threshold))
            if len(ia):
                outs.append(pd.DataFrame({
                    "id_a": ids[i0 + ia],
                    "id_b": ids[ib],
                    "cosine": cos[ia, ib],
                }))
        if not outs:
            return pd.DataFrame({k: [] for k in ("id_a", "id_b", "cosine")})
        return pd.concat(outs, ignore_index=True)

    banded = _banded_by_mask(
        df, dim, n_planes, n_tables, seed, id_col, vec_col, "id", "v",
        widen=True,
    )
    return (
        banded.groupBy("t", "bucket")
        .applyInPandas(score_bucket, out_schema)
        .groupBy("id_a", "id_b")
        .agg(F.max("cosine").alias("cosine"))
    )


def _fold_norm(vals: list[float]) -> float:
    """Sequential-fold L2 norm — same summation order as the SQL/Spark
    fold, so literal norms agree bit-for-bit across engines."""
    import math

    acc = 0.0
    for v in vals:
        acc += float(v) * float(v)
    return math.sqrt(acc)


def fit_spherical_kmeans(mat, k: int, seed: int = 42, iters: int = 10):
    """Deterministic seeded spherical k-means (Lloyd, FIXED iteration
    count, no convergence-dependent control flow): normalize rows, init
    from a seeded sample, assign by max dot (ties → lowest centroid
    index, matching the operators' ORDER BY s DESC, cid ASC), recenter
    to the normalized member mean; an emptied cell keeps its previous
    centroid. Same inputs → bit-identical centroids on any engine that
    runs this fit, which is what lets the SQL oracle embed the fitted
    centroids as literals."""
    import numpy as np

    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = mat / norms
    rng = np.random.RandomState(seed)
    idx = np.sort(rng.choice(len(x), size=min(k, len(x)), replace=False))
    cents = x[idx].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def _fit_kmeans_cents(
    corpus: DataFrame,
    n_centroids: int,
    sample_rows: int,
    seed: int,
    n_iters: int,
    id_col: str,
    vec_col: str,
) -> list:
    """Fit spherical k-means over the deterministic bounded sample (the
    ``sample_rows`` lowest ids — a top-k at any scale) and return
    [(centroid, fold_norm)] — the shared coarse quantizer behind
    :func:`ivf_topk` and :func:`semantic_dedup`."""
    rows = (
        corpus.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .orderBy(id_col)
        .limit(sample_rows)
        .collect()
    )
    fitted = fit_spherical_kmeans(
        [list(r[vec_col]) for r in rows], n_centroids, seed, n_iters
    )
    return [
        ([float(x) for x in c], _fold_norm([float(x) for x in c]))
        for c in fitted
    ]


def _cent_literals(cents) -> tuple[Column, Column]:
    """Centroid matrix + norms as parsed SQL literals: single Literal
    nodes, no per-element py4j round-trips (see _planes_expr_sql)."""
    cmat = F.expr(
        "array(" + ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in cv) + ")"
            for cv, _ in cents
        ) + ")"
    )
    cnorms = F.expr(
        "array(" + ",".join(repr(float(cn)) + "D" for _, cn in cents) + ")"
    )
    return cmat, cnorms


def _cent_scores_fn(cents):
    """Per-centroid score projection ``dot(vec, centroid)/|centroid|``
    — |vec| is common to every cell so it cannot change the argmax.
    First index on exact ties == lowest centroid id, mirroring the
    oracle's ORDER BY score DESC, cid ASC."""
    cmat, cnorms = _cent_literals(cents)

    def cent_scores(vec: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.lit(len(cents))),
            lambda i: (
                dot(vec, F.element_at(cmat, i)) / F.element_at(cnorms, i)
            ).cast("double"),
        )

    return cent_scores


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: str = "kmeans",
    sample_rows: int = 1024,
    n_iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer assigns every corpus
    vector to its nearest centroid CELL; a query scores only the vectors
    in its ``n_probe`` nearest cells — candidates ∝ probed-cell sizes,
    never the corpus.

    ``quantizer="kmeans"`` (default) fits centroids with
    :func:`fit_spherical_kmeans` over a deterministic bounded sample
    (the ``sample_rows`` lowest ids — a top-k at any scale); the seeded
    fixed-iteration fit is exactly reproducible, so the SQL oracle
    embeds the SAME fitted centroids as literals. ``quantizer="first"``
    keeps the degenerate first-``n_centroids``-by-id quantizer (cheap,
    no fit pass). Centroids are tiny by contract: they ride the plan as
    literal arrays, so cell assignment is one codegen'd projection over
    the streamed corpus — the same broadcast-small/stream-big shape as
    the other ANN paths.
    """
    from pyspark.sql.window import Window

    if quantizer == "kmeans":
        cents = _fit_kmeans_cents(
            corpus, n_centroids, sample_rows, seed, n_iters, id_col, vec_col
        )
    elif quantizer == "first":
        cent_rows = sorted(
            corpus.filter(F.col(id_col) < n_centroids)
            .select(id_col, vec_col)
            .collect(),
            key=lambda r: r[id_col],
        )
        cents = [(list(r[vec_col]), _fold_norm(r[vec_col])) for r in cent_rows]
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    cent_scores = _cent_scores_fn(cents)

    # corpus side: cell = 1-based index of the best-scoring centroid
    scores = cent_scores(F.col(vec_col))
    # widen below the cell assignment: n_centroids x dim dots per row
    # is the compute-heavy step; a one-split corpus parquet would
    # serialize it on one core (no-op at real scale — see _widen_scan)
    cells = _widen_scan(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.array_position(scores, F.array_max(scores)).cast("int").alias("cell"),
    )

    # query side (small by contract): probe the n_probe best cells
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("pos").asc()
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.posexplode(cent_scores(F.col(vec_col))).alias("pos", "s"),
        )
        .withColumn("prank", F.row_number().over(w_probe))
        .filter(F.col("prank") <= n_probe)
        .select("query_id", "q_vec", (F.col("pos") + 1).cast("int").alias("cell"))
    )
    scored = (
        cells.join(F.broadcast(probes), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    df: DataFrame,
    dim: int,
    tau: float = 0.4,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 1024,
    n_iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the seeded
    spherical k-means coarse quantizer, then WITHIN each cluster drop
    every document whose cosine to a LOWER-ID cluster member is
    >= ``tau``. Keep-lowest-id is this engine's deterministic stand-in
    for the paper's keep-farthest-from-centroid rule — same recall, but
    replayable decision-for-decision by the literal-centroid SQL oracle
    (and by an incremental run: a new batch can never evict an already
    kept document).

    Output: one row per input row — (id, cell, dup_of, kept) where
    ``dup_of`` is the LOWEST same-cell id that semantically covers this
    row (NULL when kept=1). Cross-cluster near-dups are out of scope by
    design (the paper's trade: candidates ∝ cluster size, never corpus
    — that is what makes the pass linear-ish at 100 TB).

    Physical shape: centroid literals ride the plan (broadcast-small),
    cell assignment is one codegen'd projection over the streamed
    corpus, then ONE shuffle keyed by cell and a vectorized Arrow pass
    per cell group — the exact discipline of
    :func:`cosine_near_dup_pairs` (row-chunked slabs bound worker
    memory under cluster skew; f32 products widened and summed in index
    order keep cosine bit-parity with the SQL fold). NULL embeddings
    degrade per-row (kept, cell NULL) instead of aborting the pass;
    zero-norm vectors produce NaN cosines which never clear ``tau``,
    matching the oracle's NULL-comparison semantics.

    Reference analog: none — engine addition for the LLM-data pipeline
    (the embedding-space sibling of minhash/simhash text dedup)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import IntegerType, StructField, StructType

    id_field = {f.name: f for f in df.schema.fields}[id_col]
    out_schema = StructType([
        StructField(id_col, id_field.dataType, True),
        StructField("cell", IntegerType(), True),
        StructField("dup_of", id_field.dataType, True),
        StructField("kept", IntegerType(), True),
    ])
    cents = _fit_kmeans_cents(
        df, n_clusters, sample_rows, seed, n_iters, id_col, vec_col
    )
    scores = _cent_scores_fn(cents)(F.col("_v"))
    src = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    # compute-heavy projection below a possibly one-split scan
    cells = _widen_scan(src.filter(F.col("_v").isNotNull())).select(
        "_id", "_v",
        F.array_position(scores, F.array_max(scores)).cast("int").alias("cell"),
    )
    block_elems = _PAIR_BLOCK_ELEMS
    cols = [id_col, "cell", "dup_of", "kept"]

    def dedup_cell(pdf):
        n = len(pdf)
        order = np.argsort(pdf["_id"].to_numpy())
        ids = pdf["_id"].to_numpy()[order]
        cell = int(pdf["cell"].iloc[0])
        if n == 1:
            return pd.DataFrame({
                id_col: ids, "cell": [cell], "dup_of": [None], "kept": [1],
            })
        v32 = np.stack(pdf["_v"].map(np.asarray).values)[order]
        d = v32.shape[1]
        sq64 = (v32 * v32).astype(np.float64)
        nacc = np.zeros(n, dtype=np.float64)
        for e in range(d):
            nacc += sq64[:, e]
        nrm = np.sqrt(nacc)
        dup_of: list = [None] * n
        kept = np.ones(n, dtype=np.int32)
        # row-chunked slabs (see cosine_near_dup_pairs): block x n
        block = max(1, block_elems // n)
        for i0 in range(1, n, block):
            i1 = min(i0 + block, n)
            acc = np.zeros((i1 - i0, n), dtype=np.float64)
            for e in range(d):  # f32 product widened, summed in index order
                acc += (v32[i0:i1, e, None] * v32[None, :, e]).astype(np.float64)
            cos = acc / np.outer(nrm[i0:i1], nrm)
            # only LOWER-id columns can cover a row; NaN >= tau is False
            earlier = np.arange(n)[None, :] < np.arange(i0, i1)[:, None]
            hit = earlier & (cos >= tau)
            rows_any = hit.any(axis=1)
            for r in np.nonzero(rows_any)[0]:
                j = int(np.argmax(hit[r]))  # first True == lowest id
                dup_of[i0 + r] = ids[j]
                kept[i0 + r] = 0
        return pd.DataFrame({
            id_col: ids,
            "cell": np.full(n, cell, dtype=np.int32),
            "dup_of": dup_of,
            "kept": kept,
        })

    deduped = cells.groupBy("cell").applyInPandas(dedup_cell, out_schema)
    nulls = src.filter(F.col("_v").isNull()).select(
        F.col("_id").alias(id_col),
        F.lit(None).cast("int").alias("cell"),
        F.lit(None).cast(id_field.dataType).alias("dup_of"),
        F.lit(1).alias("kept"),
    )
    return deduped.unionByName(nulls).select(*cols)


def _hyperplane(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component via splitmix-style
    integer mixing (no RNG state, reproducible across engines)."""
    out = []
    for j in range(dim):
        x = (plane * 1_000_003 + j * 7_919 + seed) & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x = x ^ (x >> 31)
        out.append((x % 2001) / 1000.0 - 1.0)
    return out


def lsh_bucket(
    vec: Column, dim: int, n_planes: int = 12, seed: int = 42, plane_offset: int = 0
) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane → integer.
    ``plane_offset`` selects a disjoint plane family per hash table."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = _hyperplane(dim, plane_offset + p, seed)
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, w: (x * w).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_table_buckets(
    vec: Column, dim: int, n_planes: int, n_tables: int, seed: int = 42
) -> Column:
    """Array of ``n_tables`` bucket ids (table t = planes
    [t*n_planes, (t+1)*n_planes)). The planes ride as ONE 2-D literal
    array and the loops are data-driven transforms, so the expression
    tree stays O(1): plan analysis/codegen is milliseconds instead of
    seconds for the (tables x planes) unrolled form — same values
    (parity with :func:`lsh_bucket` asserted in tests)."""
    # planes is a single parsed Literal (see _planes_expr_sql), so
    # element_at() below is an O(1) lookup. (Do NOT hang an element_at
    # off a non-foldable intermediate like a per-row signs array —
    # higher-order lambdas re-evaluate the captured expression on EVERY
    # access, turning 48 dots/row into 48^2.)
    planes = _planes_expr(dim, n_planes, n_tables, seed)

    def plane_dot(p_idx: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                vec, F.element_at(planes, p_idx), lambda x, w: (x * w).cast("double")
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda t: F.aggregate(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            F.lit(0).cast("long"),
            lambda acc, p: acc
            + F.when(
                plane_dot(t * F.lit(n_planes) + p + 1) > 0,
                F.pow(F.lit(2.0), p).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


@functools.lru_cache(maxsize=32)
def _planes_expr(dim: int, n_planes: int, n_tables: int, seed: int) -> Column:
    """Parsed plane-matrix literal Column, cached: the SQL string is
    ~60 KB at 48x64 doubles and re-parsing it on every query build cost
    ~0.5 s per call site — the expression tree is session-independent,
    so one parse serves every query in the process."""
    return F.expr(_planes_expr_sql(dim, n_planes, n_tables, seed))


@functools.lru_cache(maxsize=32)
def _planes_expr_sql(dim: int, n_planes: int, n_tables: int, seed: int) -> str:
    """SQL array-of-arrays literal of all hyperplanes (cached — repr()
    round-trips each double exactly)."""
    return "array(" + ",".join(
        "array(" + ",".join(
            repr(float(v)) + "D" for v in _hyperplane(dim, t * n_planes + p, seed)
        ) + ")"
        for t in range(n_tables)
        for p in range(n_planes)
    ) + ")"


def lsh_sign_mask(vec: Column, dim: int, n_bits: int, seed: int = 42) -> Column:
    """ALL hyperplane sign bits as ONE int64: bit ``i`` is set iff
    ``dot(vec, plane_i) > 0`` (plane family shared with
    :func:`lsh_bucket` / :func:`lsh_bucket_for_table`, flat index
    ``i = t * n_planes + p``).

    This is the compute-once primitive behind the multi-table LSH
    operators: the ``n_bits`` full-dimension dot products run exactly
    once per row, BELOW any per-table explode; each table's bucket is
    then ``(mask >> t*n_planes) & (2^n_planes - 1)`` — a bit op that is
    re-evaluation-cheap wherever Generate/codegen touches it (the
    round-2 regression came from hanging the dot products themselves
    off the exploded table index).

    ``n_bits`` is capped at 62: bit 63 of a set sign would overflow
    the signed long under ANSI — wider configs use per-table buckets
    (see :func:`_banded_by_mask`)."""
    if n_bits > 62:
        raise ValueError("lsh_sign_mask supports at most 62 bits")
    planes = _planes_expr(dim, n_bits, 1, seed)

    def plane_dot(i: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                vec, F.element_at(planes, i), lambda x, w: (x * w).cast("double")
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(n_bits)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            plane_dot(i) > 0, F.pow(F.lit(2.0), i - 1).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )


def _mask_np_scan(
    df: DataFrame,
    dim: int,
    n_bits: int,
    seed: int,
    id_col: str,
    vec_col: str,
    with_norm: bool,
) -> DataFrame:
    """(id, vec[, _norm], _m) via ONE numpy pass over Arrow batches —
    the vectorized twin of ``select(id, vec, l2_norm, lsh_sign_mask)``.

    The expression form pays twice per call: ~0.4 s of analyzer time on
    the ~60 KB plane literal per select (round-4 profile) plus
    interpreted higher-order folds (n_bits x dim multiply-adds per row).
    Here the planes ride a closure and the dots are one vectorized pass.

    BIT-PARITY with the expression form (and therefore with the SQL
    oracles that replay it) is preserved by replaying its float
    semantics exactly: plane dots widen each float32 component to
    float64 then multiply-add in index order (zip_with fold); the norm
    squares in FLOAT32 first (l2_norm's ``(x*x).cast(double)``) and
    accumulates the widened squares in index order. Sign/bucket
    equality is exact, asserted in tests/test_golden_oracles.py."""
    import numpy as np
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if n_bits > 62:
        raise ValueError("np sign-mask path supports at most 62 bits")
    in_fields = {f.name: f for f in df.schema.fields}
    fields = [in_fields[id_col], in_fields[vec_col]]
    if with_norm:
        fields.append(StructField("_norm", DoubleType(), True))
    fields.append(StructField("_m", LongType(), True))
    out_schema = StructType(fields)
    planes64 = np.array(
        [_hyperplane(dim, p, seed) for p in range(n_bits)], dtype=np.float64
    )  # [n_bits, dim]
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            v32 = np.stack(pdf[vec_col].map(np.asarray).values)
            v64 = v32.astype(np.float64)
            acc = np.zeros((len(pdf), planes64.shape[0]), dtype=np.float64)
            for e in range(dim):  # sequential fold == zip_with sum order
                acc += v64[:, e, None] * planes64[None, :, e]
            mask = ((acc > 0).astype(np.int64) * weights[None, :]).sum(axis=1)
            out = {id_col: pdf[id_col], vec_col: pdf[vec_col]}
            if with_norm:
                sq64 = (v32 * v32).astype(np.float64)  # square in f32 first
                nacc = np.zeros(len(pdf), dtype=np.float64)
                for e in range(dim):
                    nacc += sq64[:, e]
                out["_norm"] = np.sqrt(nacc)
            out["_m"] = mask
            yield pd.DataFrame(out)

    # NULL vectors: the expression form yielded a NULL mask and the row
    # fell out of every bucket join; the numpy stack would instead
    # crash the whole job on a ragged batch — drop them up front (same
    # observable result, per-row not per-job)
    return (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(compute, out_schema)
    )


def _banded_by_mask(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    id_col: str,
    vec_col: str,
    id_alias: str,
    vec_alias: str | None,
    widen: bool = False,
    norm_alias: str | None = None,
) -> DataFrame:
    """(id[, vec][, norm], t, bucket) — one row per (input row, hash
    table), with the bucket derived from a sign mask computed ONCE per
    input row (below the Generate), not per exploded output row.
    ``norm_alias`` likewise computes the row's L2 norm once below the
    explode, so downstream cosine scoring pays one fold per PAIR
    (the dot) instead of three.

    ``widen``: round-robin repartition the input to the session's core
    count before the mask projection IFF its scan has fewer splits —
    the mask is the compute-heavy step (n_bits dots/row) and a small
    parquet arrives as one split, serializing it. At real scale the
    scan has splits >> cores and this is a no-op (no exchange added),
    so the corpus never pays a shuffle for it.

    The mask+norm projection runs through :func:`_mask_np_scan` (one
    vectorized Arrow pass, bit-parity asserted in tests) when the bit
    width allows; wider configurations fall back to per-table bucket
    expressions over the exploded table index (a single int64 mask
    would overflow past 62 bits)."""
    if widen:
        df = _widen_scan(df)
    n_bits = n_planes * n_tables
    if n_bits <= 62:
        masked = _mask_np_scan(
            df, dim, n_bits, seed, id_col, vec_col, with_norm=bool(norm_alias)
        ).select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias("_v"),
            *([F.col("_norm").alias(norm_alias)] if norm_alias else []),
            "_m",
        )
        keep = (
            [id_alias]
            + ([vec_alias] if vec_alias else [])
            + ([norm_alias] if norm_alias else [])
            + ["t"]
        )
        return masked.select(
            id_alias,
            *([F.col("_v").alias(vec_alias)] if vec_alias else []),
            *([norm_alias] if norm_alias else []),
            F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias("t"),
            "_m",
        ).select(
            *keep,
            F.expr(
                f"shiftrightunsigned(_m, t * {n_planes}) & {(1 << n_planes) - 1}"
            ).alias("bucket"),
        )
    # Wide masks (> 62 bits) can NOT ride one int64 — bit 63 overflows
    # the signed long under ANSI (round-5 fix: the former single-mask
    # fallback crashed at 64 bits on ~half the rows). Compute each
    # table's bucket over the EXPLODED table index instead: every
    # exploded row evaluates exactly its own table's n_planes dots, so
    # the total per input row is the same n_planes*n_tables dots the
    # mask path pays. NULL vectors are dropped up front — same per-row
    # degradation as _mask_np_scan (the former NULL mask/bucket rows
    # crashed downstream groupBy(t, bucket) np.stack scorers).
    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias("_v"),
        *([l2_norm(F.col(vec_col)).alias(norm_alias)] if norm_alias else []),
    )
    return base.select(
        id_alias,
        "_v",
        *([norm_alias] if norm_alias else []),
        F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias("t"),
    ).select(
        id_alias,
        *([F.col("_v").alias(vec_alias)] if vec_alias else []),
        *([norm_alias] if norm_alias else []),
        "t",
        lsh_bucket_for_table(
            F.col("_v"), F.col("t"), dim, n_planes, n_tables, seed
        ).alias("bucket"),
    )


def lsh_bucket_for_table(
    vec: Column, t: Column, dim: int, n_planes: int, n_tables: int, seed: int = 42
) -> Column:
    """Bucket id of hash table ``t`` only (t is a COLUMN — pair this
    with ``explode(sequence(0, n_tables-1))`` so each exploded row
    computes exactly its own table's n_planes dots; exploding a
    precomputed bucket ARRAY instead makes Generate re-evaluate all
    n_tables buckets per output row, an n_tables-times blowup).

    The plane matrix is ONE parsed SQL literal (a single Literal node):
    per-element Column construction round-trips every value through the
    py4j bridge (~seconds at tables x planes x dim elements), while one
    expr string parses in milliseconds and analysis stays flat."""
    planes = _planes_expr(dim, n_planes, n_tables, seed)

    def plane_dot(p_idx: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                vec, F.element_at(planes, p_idx), lambda x, w: (x * w).cast("double")
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(
            plane_dot(t * F.lit(n_planes) + p + 1) > 0,
            F.pow(F.lit(2.0), p).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    ``n_tables`` independent hash tables of ``n_planes`` sign bits each;
    a corpus vector is a candidate for a query if they share a bucket in
    ANY table (standard OR-amplification: recall 1-(1-p^k)^L). The
    queries ride a broadcast, so the exploded corpus (×n_tables) streams
    through a broadcast join with NO shuffle; cosine is computed in
    place and the only shuffle is the (query_id, neighbor_id, cosine)
    triple dedup + top-k — candidates ∝ bucket sizes, never the corpus
    cross product.

    The n_tables buckets of a row derive from ONE
    :func:`lsh_sign_mask` evaluated below the explode (all
    ``n_planes * n_tables`` dots exactly once per row); only shift/AND
    bit ops ride above the Generate. The corpus streams through in a
    single pass, so no persist is needed (unlike the self-join
    diamonds in :func:`cosine_near_dup_pairs` / minhash).
    """
    from pyspark.sql.window import Window

    cb = _banded_by_mask(
        corpus, dim, n_planes, n_tables, seed, id_col, vec_col,
        "neighbor_id", "c_vec", widen=True, norm_alias="c_norm",
    )
    qb = F.broadcast(_banded_by_mask(
        queries, dim, n_planes, n_tables, seed, id_col, vec_col,
        "query_id", "q_vec", norm_alias="q_norm",
    ))
    scored = (
        cb.join(qb, on=["t", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_with_norms(
                F.col("q_vec"), F.col("c_vec"),
                F.col("q_norm"), F.col("c_norm"),
            ).alias("cosine"),
        )
        # a pair colliding in several tables scores identically each time:
        # max() dedups without a join-back
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _verify_cosine_pairs(
    cands: DataFrame,
    a_col: str,
    b_col: str,
    vecs_a: DataFrame,
    vecs_b: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact norm-hoisted cosine verification of IDS-ONLY candidate
    pairs: ``vecs_*`` are (id, v, nv) relations (vector + hoisted L2
    norm); returns (a_col, b_col, cosine) with cosine >= threshold.
    ONE implementation serves the index's pairs_against AND the
    streaming embedding gate (round-5 review: two inline copies could
    drift)."""
    return (
        cands
        .join(
            vecs_a.select(F.col("id").alias(a_col),
                          F.col("v").alias("v_a"), F.col("nv").alias("n_a")),
            on=a_col,
        )
        .join(
            vecs_b.select(F.col("id").alias(b_col),
                          F.col("v").alias("v_b"), F.col("nv").alias("n_b")),
            on=b_col,
        )
        .select(
            a_col, b_col,
            cosine_with_norms(
                F.col("v_a"), F.col("v_b"), F.col("n_a"), F.col("n_b")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


class EmbeddingLshIndex:
    """Persistent multi-table-LSH EMBEDDING index — the vector-side twin
    of :class:`~polardbx_tools_spark.operators.dedup.MinHashLshIndex`:
    "does this incoming batch of embeddings near-duplicate the corpus?"
    without re-bucketing the corpus per batch.

    Two parquet relations under ``path``:

    * ``banded/`` — (id, t, bucket)   sign-mask buckets (candidate side)
    * ``vecs/``   — (id, v, nv)       vectors + hoisted norms (verify side)

    ``append(batch)`` derives + appends (cost ∝ batch);
    ``pairs_against(new)`` returns (new_id, corpus_id, cosine >=
    threshold) with candidates from bucket collisions and a norm-hoisted
    exact-cosine verify — corpus cost is a columnar scan of two narrow
    relations, never a re-mask. Crash contract mirrors the minhash
    index: ``banded`` is written BEFORE ``vecs`` and consumers treat
    presence in ``vecs`` as "indexed", so a crash between the writes
    re-derives the batch instead of leaving ids invisible to candidate
    generation. ``compact()`` is the same offline small-file fold
    (banded repartitioned by bucket + deduplicated, vecs by id)."""

    def __init__(self, spark, path: str, dim: int, n_planes: int = 3,
                 n_tables: int = 8, seed: int = 42):
        self.spark = spark
        self.path = path.rstrip("/")
        self.dim = dim
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.seed = seed

    def _derive(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        return _banded_by_mask(
            df, self.dim, self.n_planes, self.n_tables, self.seed,
            id_col, vec_col, "id", "v", widen=True, norm_alias="nv",
        )

    def append(self, df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> None:
        from pyspark.storagelevel import StorageLevel

        banded = self._derive(df, id_col, vec_col).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        banded.select("id", "t", "bucket").write.mode("append").parquet(
            f"{self.path}/banded"
        )
        banded.filter(F.col("t") == 0).select("id", "v", "nv").write.mode(
            "append"
        ).parquet(f"{self.path}/vecs")
        banded.unpersist()

    def repair(self) -> None:
        """Repair any crashed :meth:`compact` BEFORE reading the index
        (mirrors MinHashLshIndex.repair — directory checks only)."""
        from polardbx_tools_spark.operators.dedup import _compact_preclean

        for rel in ("banded", "vecs"):
            _compact_preclean(
                f"{self.path}/{rel}",
                f"{self.path}/_{rel}_compact",
                f"{self.path}/_{rel}_old",
            )

    def compact(self, target_files: int = 8) -> None:
        """Offline small-file fold (same contract as
        MinHashLshIndex.compact): re-runnable after any crash via the
        shared preclean/swap helpers."""
        from polardbx_tools_spark.operators.dedup import (
            _compact_preclean,
            _compact_swap,
        )

        for rel, key in (("banded", "bucket"), ("vecs", "id")):
            cur = f"{self.path}/{rel}"
            tmp = f"{self.path}/_{rel}_compact"
            old = f"{self.path}/_{rel}_old"
            _compact_preclean(cur, tmp, old)
            df = self.spark.read.parquet(cur)
            df = df.distinct() if rel == "banded" else df.dropDuplicates(["id"])
            df.repartition(target_files, key).write.mode("overwrite").parquet(tmp)
            _compact_swap(cur, tmp, old)

    def pairs_against(
        self,
        new_df: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        threshold: float = 0.4,
    ) -> DataFrame:
        """(new_id, corpus_id, cosine) near-dups of ``new_df`` vs the
        indexed corpus. Cache lifecycle: the derived batch relation
        stays persisted (the lazy result still reads it — same contract
        as ``dedup.minhash_lsh_pairs``); loop callers should unpersist
        via ``spark.catalog.clearCache()`` after consuming each batch
        (the streaming gate inlines this logic with a
        finally-unpersist for exactly that reason)."""
        from pyspark.storagelevel import StorageLevel

        banded_new = self._derive(new_df, id_col, vec_col).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        banded_old = self.spark.read.parquet(f"{self.path}/banded")
        vecs_old = self.spark.read.parquet(f"{self.path}/vecs")
        candidates = (
            banded_new.select(F.col("id").alias("new_id"), "t", "bucket")
            .join(
                banded_old.select(F.col("id").alias("corpus_id"), "t", "bucket"),
                on=["t", "bucket"],
            )
            .select("new_id", "corpus_id")
            .distinct()
        )
        vecs_new = banded_new.filter(F.col("t") == 0).select("id", "v", "nv")
        return _verify_cosine_pairs(
            candidates, "new_id", "corpus_id", vecs_new, vecs_old, threshold
        )


# -------------------------------------------------------------------- PQ

def fit_pq_codebooks(mat, m: int = 8, ks: int = 16, seed: int = 42,
                     iters: int = 10):
    """Deterministic product-quantization codebooks: the vector space is
    split into ``m`` equal subspaces; each gets a plain-L2 Lloyd k-means
    with seeded init, FIXED iteration count, first-occurrence argmin
    tie-break, and emptied cells keeping their previous centroid. Same
    sample -> bit-identical (m, ks, dsub) codebooks — which is what lets
    the SQL oracle embed the fitted codebooks as literals (same replay
    discipline as :func:`fit_spherical_kmeans`)."""
    import numpy as np

    x = np.asarray(mat, dtype=np.float64)
    n, d = x.shape
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        idx = np.sort(rng.choice(n, size=min(ks, n), replace=False))
        cents = sub[idx].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                mem = sub[assign == c]
                if len(mem):
                    cents[c] = mem.mean(axis=0)
        books.append(cents)
    return np.stack(books)


def _pq_literals(books) -> tuple[Column, Column]:
    """(codebooks, per-centroid squared norms) as parsed SQL literals —
    single Literal nodes, no per-element py4j round-trips."""
    cb = F.expr(
        "array(" + ",".join(
            "array(" + ",".join(
                "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
                for c in book
            ) + ")"
            for book in books
        ) + ")"
    )
    cn2 = F.expr(
        "array(" + ",".join(
            "array(" + ",".join(
                repr(float(sum(x * x for x in c))) + "D" for c in book
            ) + ")"
            for book in books
        ) + ")"
    )
    return cb, cn2


def pq_codes(vec: Column, cb: Column, m: int, ks: int, dsub: int) -> Column:
    """Per-subspace nearest-centroid codes (1-based, array<int> of m).

    d2 is the index-ordered fold sum of (x - c)^2 over the subvector —
    the SAME expression the SQL oracle evaluates, so codes agree across
    engines; ties pick the lowest code (array_position finds the first
    minimum, matching numpy argmin)."""
    def code_for(j: int) -> Column:
        sub = F.slice(vec, j * dsub + 1, dsub)
        d2s = F.transform(
            F.sequence(F.lit(1), F.lit(ks)),
            lambda c: F.aggregate(
                F.zip_with(
                    sub,
                    F.element_at(F.element_at(cb, j + 1), c),
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        return F.array_position(d2s, F.array_min(d2s)).cast("int")

    return F.array(*[code_for(j) for j in range(m)])


def _pq_query_tables(q_rows, books, m: int, ks: int, dsub: int, vec_col: str,
                     id_col: str):
    """Driver-side per-query scoring tables: (q_ids, LUTs, per-centroid
    squared norms, query norms). All fold orders replay the SQL
    oracle's exactly (see pq_topk's bit-parity note): lut[q][j][c]
    accumulates q_sub*centroid in zip_with order, cn2 uses the cn2
    literal's arithmetic, q_norm the sequential _fold_norm."""
    import numpy as np

    q_ids = np.asarray([r[id_col] for r in q_rows])  # keep the input id dtype
    nq = len(q_rows)
    luts = np.zeros((nq, m, ks), dtype=np.float64)
    for qi, r in enumerate(q_rows):
        qv = [float(x) for x in r[vec_col]]
        for j in range(m):
            acc = np.zeros(ks, dtype=np.float64)
            for e in range(dsub):  # sequential fold == SQL zip_with sum
                acc += qv[j * dsub + e] * books[j][:, e]
            luts[qi, j] = acc
    cn2_arr = np.array(
        [[sum(float(x) * float(x) for x in c) for c in book] for book in books],
        dtype=np.float64,
    )  # identical arithmetic to the cn2 literal
    q_norms = np.array(
        [_fold_norm([float(x) for x in r[vec_col]]) for r in q_rows],
        dtype=np.float64,
    )
    return q_ids, luts, cn2_arr, q_norms


def _pq_encode_np(v, bk, m: int, ks: int, dsub: int):
    """0-based PQ codes for a batch of vectors: per subspace, the
    sequential-fold d2 to every centroid with first-min tie-break —
    np.argmin == the SQL oracle's array_position-of-min (1-based there,
    0-based here)."""
    import numpy as np

    n = len(v)
    cmat = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        d2 = np.zeros((n, ks), dtype=np.float64)
        for e in range(dsub):
            diff = v[:, j * dsub + e, None] - bk[j, None, :, e]
            d2 += diff * diff
        cmat[:, j] = np.argmin(d2, axis=1)
    return cmat


def _pq_prune_frames(c_ids, cmat, ids_b, lut_b, cn2_b, qn_b, m: int,
                     refine: int, cand_masks=None):
    """ADC scores from codes + per-batch top-``refine`` prune, one frame
    per query. Ties break by neighbor_id ASC — the global shortlist
    window's tie-break — so pruning can never change final shortlist
    membership. Self-matches (c_id == query id) are excluded.
    ``cand_masks`` (optional, one bool array per query over the batch)
    restricts each query's candidates — the IVF cell-probe hook."""
    import numpy as np
    import pandas as pd

    n = len(c_ids)
    frames = []
    for qi, qid in enumerate(ids_b):
        acc = np.zeros(n, dtype=np.float64)
        an2 = np.zeros(n, dtype=np.float64)
        for j in range(m):  # sequential over subspaces == SQL fold
            cj = cmat[:, j]
            acc += lut_b[qi, j, cj]
            an2 += cn2_b[j, cj]
        adc = acc / (qn_b[qi] * np.sqrt(an2))
        keep = c_ids != qid
        if cand_masks is not None:
            keep &= cand_masks[qi]
        cand = np.nonzero(keep)[0]
        if not len(cand):
            continue
        order = np.lexsort((c_ids[cand], -adc[cand]))[:refine]
        top = cand[order]
        frames.append(pd.DataFrame({
            "query_id": qid,
            "neighbor_id": c_ids[top],
            "adc": adc[top],
        }))
    return frames


def _empty_topk(spark, id_type) -> DataFrame:
    """Empty (query_id, neighbor_id, cosine, rank) result — the
    graceful degenerate for a no-queries serving wave."""
    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
    )

    return spark.createDataFrame([], StructType([
        StructField("query_id", id_type, True),
        StructField("neighbor_id", id_type, True),
        StructField("cosine", DoubleType(), True),
        StructField("rank", IntegerType(), False),
    ]))


def _pq_rerank(
    partial: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    refine: int,
    k: int,
) -> DataFrame:
    """Global shortlist window over the pruned ADC partials + exact
    cosine re-rank: only ``queries x refine`` rows ever touch the full
    vectors."""
    from pyspark.sql.window import Window

    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    shortlist = (
        partial.withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= refine)
        .select("query_id", "neighbor_id")
    )
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    rescored = (
        shortlist.join(vecs, on="neighbor_id")
        .join(q, on="query_id")
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return rescored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    refine: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 1024,
    seed: int = 42,
    n_iters: int = 10,
) -> DataFrame:
    """Product-quantization ANN: encode the corpus once into m small
    codes (m bytes of information per vector instead of 4*dim), score
    queries against CODES via the asymmetric distance computation (ADC:
    dot(q, x~) where x~ is the concatenation of the chosen centroids),
    shortlist the top ``refine`` (default 8*k) per query, then re-rank
    the shortlist with EXACT cosine over the real vectors.

    This is the memory-bandwidth play of the ANN family: at 10^10
    vectors the scan that dominates brute force is the 4*dim bytes/row
    vector read; the ADC pass reads m ints/row (32x smaller at dim=64,
    m=8) plus a literal codebook, and only ``queries x refine`` rows
    ever touch the full vectors again. Candidates are still the whole
    corpus (PQ compresses the scan; IVF prunes it — composable).

    The fit is a deterministic seeded k-means per subspace over a
    bounded sample (lowest ids), so the SQL oracle replays the IDENTICAL
    codebooks as literals. Output = exact cosines on the shortlist.
    """
    if refine is None:
        refine = 8 * k
    dsub = dim // m
    rows = (  # NULL vectors carry no fit evidence and would crash list()
        corpus.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
        .orderBy(id_col).limit(sample_rows).collect()
    )
    books = fit_pq_codebooks(
        [list(r[vec_col]) for r in rows], m, ks, seed, n_iters
    )

    # ENCODE + ADC in ONE numpy pass over Arrow batches of the corpus,
    # with a per-batch top-``refine`` prune — only ``queries x refine``
    # candidates per batch reach the shuffle (the brute_force_topk_np
    # discipline; round-3 finding: the former JVM ADC fed ALL
    # |corpus| x |queries| scores through the global shortlist window,
    # so at 10^10 rows the SHUFFLE — not the compressed scan — became
    # the bottleneck; the JVM higher-order-function encode was also the
    # dominant per-row cost at ~m*ks*dsub interpreted ops). Scoring is
    # per-query LOOKUP TABLES (the classic PQ trick).
    #
    # Bit-parity with the SQL oracle is preserved by replaying its fold
    # orders exactly in float64: the encode d2 accumulates (x-c)^2
    # element-by-element in index order with first-min tie-break
    # (np.argmin == array_position-of-min), lut[q][j][c] accumulates
    # q_sub*centroid in the zip_with order, the ADC and approx-norm
    # sums accumulate over j in order, and q_norm uses the same
    # sequential fold (_fold_norm). Ties in the per-batch prune break
    # by neighbor_id ASC — the global window's tie-break — so pruning
    # can never change the final shortlist membership.
    #
    # NOTE on persisted codes: a production corpus would materialize
    # ``pq_codes`` once (the m-byte column IS the 32x-compressed scan)
    # and feed the codes relation here; this operator encodes inline
    # because the gate tables carry raw vectors only.
    import numpy as np

    q_rows = sorted(  # NULL query vectors degrade to no rows
        queries.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull()).collect(),
        key=lambda r: r[id_col],
    )
    if not q_rows:  # no-queries wave: empty result, zero jobs
        id_type = {f.name: f for f in queries.schema.fields}[id_col].dataType
        return _empty_topk(queries.sparkSession, id_type)
    q_ids, luts, cn2_arr, q_norms = _pq_query_tables(
        q_rows, books, m, ks, dsub, vec_col, id_col
    )
    books64 = np.asarray(books, dtype=np.float64)  # [m, ks, dsub]
    sc = corpus.sparkSession.sparkContext
    b_lut = sc.broadcast((q_ids, luts, cn2_arr, q_norms, books64))

    def encode_and_score(batches):
        import pandas as pd

        ids_b, lut_b, cn2_b, qn_b, bk = b_lut.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy()  # keep the input id dtype
            v = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            cmat = _pq_encode_np(v, bk, m, ks, dsub)
            frames = _pq_prune_frames(
                c_ids, cmat, ids_b, lut_b, cn2_b, qn_b, m, refine
            )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    partial = _widen_scan(
        corpus.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    ).mapInPandas(
        encode_and_score, _pair_score_schema(corpus, id_col, "adc")
    )
    # exact re-rank: only queries x refine rows touch the full vectors
    return _pq_rerank(partial, corpus, queries, id_col, vec_col, refine, k)


class PqIndex:
    """Persistent product-quantization CODES index — the materialized
    form of :func:`pq_topk`'s "persisted codes" note, and the PQ member
    of the index family (MinHashLshIndex / EmbeddingLshIndex / this):

    * ``meta.json`` — dim/m/ks/seed + the FITTED codebooks, frozen at
      :meth:`fit` time (atomic write). New batches encode against the
      frozen books, so codes stay comparable across appends.
    * ``codes/``  — (id, codes array<int>, 0-based) parquet: the
      m-ints-per-vector compressed scan (32x smaller than raw f32
      vectors at dim=64/m=8).

    ``append(batch)`` encodes only the batch (cost ∝ batch);
    ``topk(queries, corpus)`` ADC-scores queries against the CODES
    relation with the per-batch top-refine prune, then exact-re-ranks
    the ``queries x refine`` shortlist against the caller's raw-vector
    relation — the raw vectors are never scanned for scoring. This is
    the steady-state ANN shape of an ingest pipeline: the corpus codes
    are written once and re-read per query wave, instead of re-encoding
    the corpus per call the way the one-shot operator must.

    Bit-parity: encode/LUT/ADC/prune/re-rank are the SAME helpers
    pq_topk runs (fold orders documented there), so index-served top-k
    over the full corpus is IDENTICAL to one-shot ``pq_topk`` fitted on
    the same sample — asserted in tests, including build-half +
    append-half ≡ one-shot.

    Crash contract: appends are plain parquet appends — a replayed
    append may duplicate ids; scoring dedups the shortlist so results
    are unaffected, and :meth:`compact` (the shared crash-repairable
    preclean/swap fold) drops duplicate ids and re-buckets by id."""

    META = "meta.json"

    def __init__(self, spark, path: str):
        import json
        import os

        self.spark = spark
        self.path = path.rstrip("/")
        with open(os.path.join(self.path, self.META)) as f:
            meta = json.load(f)
        self.dim = int(meta["dim"])
        self.m = int(meta["m"])
        self.ks = int(meta["ks"])
        self.seed = int(meta["seed"])
        import numpy as np

        self.books = np.asarray(meta["books"], dtype=np.float64)

    @classmethod
    def fit(
        cls,
        spark,
        path: str,
        corpus: DataFrame,
        dim: int,
        m: int = 8,
        ks: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        sample_rows: int = 1024,
        seed: int = 42,
        n_iters: int = 10,
        sample_df: DataFrame | None = None,
    ) -> "PqIndex":
        """Fit codebooks over the bounded deterministic sample (lowest
        ids — a top-k at any scale, same basis as pq_topk), freeze them
        to meta.json (atomic tmp+rename), and index ``corpus``.
        ``sample_df`` optionally supplies a different fit basis (e.g.
        the full historical corpus while only a slice is indexed
        here)."""
        import json
        import os

        rows = (  # NULLs carry no fit evidence; don't crash the sample
            (sample_df if sample_df is not None else corpus)
            .select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
            .orderBy(id_col).limit(sample_rows).collect()
        )
        books = fit_pq_codebooks(
            [list(r[vec_col]) for r in rows], m, ks, seed, n_iters
        )
        os.makedirs(path, exist_ok=True)
        meta = {"dim": dim, "m": m, "ks": ks, "seed": seed,
                "books": books.tolist()}
        tmp = os.path.join(path, cls.META + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, cls.META))
        idx = cls(spark, path)
        idx.append(corpus, id_col=id_col, vec_col=vec_col)
        return idx

    def append(self, df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> None:
        """Encode a batch against the frozen codebooks and append its
        (id, codes) rows — one widened Arrow pass, cost ∝ batch. NULL
        vectors drop per-row (they are unscorable, matching every
        operator's degradation)."""
        import numpy as np

        from pyspark.sql.types import (
            ArrayType, IntegerType, StructField, StructType,
        )

        m, ks, dsub = self.m, self.ks, self.dim // self.m
        id_field = {f.name: f for f in df.schema.fields}[id_col]
        out_schema = StructType([
            StructField("id", id_field.dataType, True),
            StructField("codes", ArrayType(IntegerType()), True),
        ])
        bk_b = df.sparkSession.sparkContext.broadcast(self.books)

        def encode(batches):
            import pandas as pd

            bk = bk_b.value
            for pdf in batches:
                if pdf.empty:
                    continue
                v = np.stack(
                    pdf[vec_col].map(np.asarray).values
                ).astype(np.float64)
                cmat = _pq_encode_np(v, bk, m, ks, dsub)
                yield pd.DataFrame({
                    "id": pdf[id_col],
                    "codes": cmat.astype(np.int32).tolist(),
                })

        (
            _widen_scan(
                df.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
            )
            .mapInPandas(encode, out_schema)
            .write.mode("append").parquet(f"{self.path}/codes")
        )

    def repair(self) -> None:
        """Repair a compact() that crashed between its renames BEFORE
        reading codes/ (directory checks only; mirrors the LSH indexes'
        repair — without it a crashed swap leaves codes/ missing and
        every topk() fails until another compact() runs)."""
        from polardbx_tools_spark.operators.dedup import _compact_preclean

        _compact_preclean(
            f"{self.path}/codes",
            f"{self.path}/_codes_compact",
            f"{self.path}/_codes_old",
        )

    def compact(self, target_files: int = 8) -> None:
        """Offline small-file fold (same crash-repairable contract as
        the LSH indexes): duplicate ids from replayed appends drop, the
        relation re-buckets by id."""
        from polardbx_tools_spark.operators.dedup import (
            _compact_preclean,
            _compact_swap,
        )

        cur = f"{self.path}/codes"
        tmp = f"{self.path}/_codes_compact"
        old = f"{self.path}/_codes_old"
        _compact_preclean(cur, tmp, old)
        df = self.spark.read.parquet(cur).dropDuplicates(["id"])
        df.repartition(target_files, "id").write.mode("overwrite").parquet(tmp)
        _compact_swap(cur, tmp, old)

    def topk(
        self,
        queries: DataFrame,
        corpus: DataFrame,
        k: int = 5,
        refine: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """ADC top-k served from the codes relation: per-query LUTs from
        the frozen books, numpy gather over each Arrow batch of codes,
        per-batch top-refine prune, global shortlist, exact cosine
        re-rank against ``corpus`` (the raw-vector relation — only
        ``queries x refine`` rows of it are ever read)."""
        import numpy as np

        self.repair()  # heal a crashed compact before reading codes/
        if refine is None:
            refine = 8 * k
        m, ks, dsub = self.m, self.ks, self.dim // self.m
        q_rows = sorted(  # NULL query vectors degrade to no rows
            queries.select(id_col, vec_col)
            .filter(F.col(vec_col).isNotNull()).collect(),
            key=lambda r: r[id_col],
        )
        if not q_rows:  # no-queries wave: empty result, zero jobs
            id_type = {f.name: f for f in queries.schema.fields}[id_col].dataType
            return _empty_topk(self.spark, id_type)
        q_ids, luts, cn2_arr, q_norms = _pq_query_tables(
            q_rows, self.books, m, ks, dsub, vec_col, id_col
        )
        sc = self.spark.sparkContext
        b_lut = sc.broadcast((q_ids, luts, cn2_arr, q_norms))

        def score(batches):
            import pandas as pd

            ids_b, lut_b, cn2_b, qn_b = b_lut.value
            for pdf in batches:
                if pdf.empty:
                    continue
                c_ids = pdf["id"].to_numpy()
                cmat = np.stack(pdf["codes"].map(np.asarray).values).astype(
                    np.int64
                )
                # duplicate ids (replayed appends) would consume prune
                # slots and push real candidates out of the per-batch
                # top-refine — keep one row per id inside the batch
                uniq, first_idx = np.unique(c_ids, return_index=True)
                if len(uniq) < len(c_ids):
                    c_ids = c_ids[first_idx]
                    cmat = cmat[first_idx]
                frames = _pq_prune_frames(
                    c_ids, cmat, ids_b, lut_b, cn2_b, qn_b, m, refine
                )
                if frames:
                    yield pd.concat(frames, ignore_index=True)

        codes = self.spark.read.parquet(f"{self.path}/codes")
        partial = _widen_scan(codes).mapInPandas(
            score, _pair_score_schema(codes, "id", "adc")
        )
        # cross-batch duplicates (a replayed append split over files)
        # fold here, BEFORE the shortlist window — identical codes give
        # identical adc, so max() is a pure dedup
        partial = partial.groupBy("query_id", "neighbor_id").agg(
            F.max("adc").alias("adc")
        )
        return _pq_rerank(partial, corpus, queries, id_col, vec_col, refine, k)


class IvfPqIndex:
    """IVF + PQ persistent index — the composition the ANN family's
    docstrings promise ("PQ compresses the scan; IVF prunes it"), and
    the canonical 10^10-vector serving shape (FAISS-IVFPQ's layout,
    rebuilt Spark-first):

    * ``meta.json`` — dim / nlist / m / ks / seed, the fitted COARSE
      centroids (seeded spherical k-means, :func:`fit_spherical_kmeans`)
      and the fitted PQ codebooks (:func:`fit_pq_codebooks`), both
      frozen at :meth:`fit` time.
    * ``codes/cell=<c>/`` — (id, codes) parquet HIVE-PARTITIONED BY
      CELL: a query wave probing ``n_probe`` of ``nlist`` cells reads
      only those directories (partition pruning — the scan is
      ``n_probe/nlist`` of the corpus BEFORE the 32x code compression
      multiplies in).

    ``topk(queries, corpus)``: each query's ``n_probe`` best cells are
    chosen driver-side by the same centroid-score rule as
    :func:`ivf_topk` (dot/|centroid|, first index on ties); the codes
    scan is filtered to the UNION of probed cells (pruned read), each
    query ADC-scores only rows inside its own probed cells
    (per-query candidate masks), and the global shortlist re-ranks with
    exact cosine against the caller's raw vectors. With
    ``n_probe = nlist`` results are IDENTICAL to :class:`PqIndex` /
    :func:`pq_topk` (asserted in tests); smaller ``n_probe`` trades
    recall for a proportionally pruned scan — the IVF contract.

    ``append(batch)`` assigns cells + encodes against the frozen fits
    (cost ∝ batch). Duplicate-append and crash contracts mirror
    :class:`PqIndex` (per-batch id dedup + pre-shortlist fold;
    compact() via the shared preclean/swap helpers, per relation)."""

    META = "meta.json"

    def __init__(self, spark, path: str):
        import json
        import os

        import numpy as np

        self.spark = spark
        self.path = path.rstrip("/")
        with open(os.path.join(self.path, self.META)) as f:
            meta = json.load(f)
        self.dim = int(meta["dim"])
        self.nlist = int(meta["nlist"])
        self.m = int(meta["m"])
        self.ks = int(meta["ks"])
        self.seed = int(meta["seed"])
        self.cents = np.asarray(meta["cents"], dtype=np.float64)
        self.cnorms = np.asarray(
            [_fold_norm(list(c)) for c in meta["cents"]], dtype=np.float64
        )
        self.books = np.asarray(meta["books"], dtype=np.float64)

    @classmethod
    def fit(
        cls,
        spark,
        path: str,
        corpus: DataFrame,
        dim: int,
        nlist: int = 16,
        m: int = 8,
        ks: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        sample_rows: int = 1024,
        seed: int = 42,
        n_iters: int = 10,
        sample_df: DataFrame | None = None,
    ) -> "IvfPqIndex":
        import json
        import os

        rows = (  # NULLs carry no fit evidence; don't crash the sample
            (sample_df if sample_df is not None else corpus)
            .select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
            .orderBy(id_col).limit(sample_rows).collect()
        )
        sample = [list(r[vec_col]) for r in rows]
        cents = fit_spherical_kmeans(sample, nlist, seed, n_iters)
        books = fit_pq_codebooks(sample, m, ks, seed, n_iters)
        os.makedirs(path, exist_ok=True)
        meta = {"dim": dim, "nlist": nlist, "m": m, "ks": ks, "seed": seed,
                "cents": cents.tolist(), "books": books.tolist()}
        tmp = os.path.join(path, cls.META + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, cls.META))
        idx = cls(spark, path)
        idx.append(corpus, id_col=id_col, vec_col=vec_col)
        return idx

    def _cell_scores(self, v):
        """dot(v, centroid)/|centroid| per centroid — the same score
        :func:`ivf_topk`'s cent_scores expression computes (|v| is
        common per row, cannot change an argmax or a per-query rank)."""
        return (v @ self.cents.T) / self.cnorms[None, :]

    def append(self, df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> None:
        import numpy as np

        from pyspark.sql.types import (
            ArrayType, IntegerType, StructField, StructType,
        )

        m, ks, dsub = self.m, self.ks, self.dim // self.m
        id_field = {f.name: f for f in df.schema.fields}[id_col]
        out_schema = StructType([
            StructField("id", id_field.dataType, True),
            StructField("cell", IntegerType(), True),
            StructField("codes", ArrayType(IntegerType()), True),
        ])
        b = df.sparkSession.sparkContext.broadcast(
            (self.cents, self.cnorms, self.books)
        )

        def encode(batches):
            import pandas as pd

            cents, cnorms, bk = b.value
            for pdf in batches:
                if pdf.empty:
                    continue
                v = np.stack(
                    pdf[vec_col].map(np.asarray).values
                ).astype(np.float64)
                scores = (v @ cents.T) / cnorms[None, :]
                cell = np.argmax(scores, axis=1)  # first max == first tie
                cmat = _pq_encode_np(v, bk, m, ks, dsub)
                yield pd.DataFrame({
                    "id": pdf[id_col],
                    "cell": cell.astype(np.int32),
                    "codes": cmat.astype(np.int32).tolist(),
                })

        (
            _widen_scan(
                df.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
            )
            .mapInPandas(encode, out_schema)
            .write.mode("append").partitionBy("cell")
            .parquet(f"{self.path}/codes")
        )

    def repair(self) -> None:
        """Heal a compact() crashed between its renames (directory
        checks only — see PqIndex.repair)."""
        from polardbx_tools_spark.operators.dedup import _compact_preclean

        _compact_preclean(
            f"{self.path}/codes",
            f"{self.path}/_codes_compact",
            f"{self.path}/_codes_old",
        )

    def compact(self, target_files_per_cell: int = 1) -> None:
        """Offline per-cell small-file fold, crash-repairable via the
        shared preclean/swap helpers; duplicate ids drop."""
        from polardbx_tools_spark.operators.dedup import (
            _compact_preclean,
            _compact_swap,
        )

        cur = f"{self.path}/codes"
        tmp = f"{self.path}/_codes_compact"
        old = f"{self.path}/_codes_old"
        _compact_preclean(cur, tmp, old)
        df = self.spark.read.parquet(cur).dropDuplicates(["id"])
        (
            df.repartition(target_files_per_cell * self.nlist, "cell", "id")
            .write.mode("overwrite").partitionBy("cell").parquet(tmp)
        )
        _compact_swap(cur, tmp, old)

    def topk(
        self,
        queries: DataFrame,
        corpus: DataFrame,
        k: int = 5,
        n_probe: int = 4,
        refine: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        import numpy as np

        self.repair()  # heal a crashed compact before reading codes/
        if refine is None:
            refine = 8 * k
        m, ks, dsub = self.m, self.ks, self.dim // self.m
        q_rows = sorted(  # NULL query vectors degrade to no rows
            queries.select(id_col, vec_col)
            .filter(F.col(vec_col).isNotNull()).collect(),
            key=lambda r: r[id_col],
        )
        if not q_rows:  # no-queries wave: empty result, zero jobs
            id_type = {f.name: f for f in queries.schema.fields}[id_col].dataType
            return _empty_topk(self.spark, id_type)
        q_ids, luts, cn2_arr, q_norms = _pq_query_tables(
            q_rows, self.books, m, ks, dsub, vec_col, id_col
        )
        qv = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
        scores = self._cell_scores(qv)  # [nq, nlist]
        # n_probe best cells per query: score DESC, cell index ASC on
        # ties — ivf_topk's (s desc, pos asc) window order
        order = np.lexsort(
            (np.broadcast_to(np.arange(self.nlist), scores.shape), -scores),
            axis=1,
        )
        probed = order[:, :n_probe]  # [nq, n_probe]
        probe_sets = [frozenset(int(c) for c in row) for row in probed]
        all_cells = sorted({c for s in probe_sets for c in s})
        sc = self.spark.sparkContext
        b = sc.broadcast((q_ids, luts, cn2_arr, q_norms, probe_sets))

        def score(batches):
            import pandas as pd

            ids_b, lut_b, cn2_b, qn_b, probes = b.value
            for pdf in batches:
                if pdf.empty:
                    continue
                c_ids = pdf["id"].to_numpy()
                c_cells = pdf["cell"].to_numpy()
                cmat = np.stack(pdf["codes"].map(np.asarray).values).astype(
                    np.int64
                )
                uniq, first_idx = np.unique(c_ids, return_index=True)
                if len(uniq) < len(c_ids):
                    c_ids, c_cells = c_ids[first_idx], c_cells[first_idx]
                    cmat = cmat[first_idx]
                masks = [
                    np.isin(c_cells, list(probes[qi]))
                    for qi in range(len(ids_b))
                ]
                frames = _pq_prune_frames(
                    c_ids, cmat, ids_b, lut_b, cn2_b, qn_b, m, refine,
                    cand_masks=masks,
                )
                if frames:
                    yield pd.concat(frames, ignore_index=True)

        codes = self.spark.read.parquet(f"{self.path}/codes")
        # the isin filter prunes hive partitions: the scan reads ONLY
        # the probed cells' directories (plan-asserted in tests)
        pruned = codes.filter(F.col("cell").isin([int(c) for c in all_cells]))
        partial = _widen_scan(pruned).mapInPandas(
            score, _pair_score_schema(codes, "id", "adc")
        )
        partial = partial.groupBy("query_id", "neighbor_id").agg(
            F.max("adc").alias("adc")
        )
        return _pq_rerank(partial, corpus, queries, id_col, vec_col, refine, k)
