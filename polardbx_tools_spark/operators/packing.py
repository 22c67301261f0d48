"""Training-sequence packing: concatenate a document corpus in a stable
global order and chop it into fixed token-budget sequences (the
GPT-style "concat and chop" batch layout — every training sequence is
exactly ``budget`` tokens, documents may straddle sequence boundaries).

The engine-side output is the PLACEMENT, not the payload: one row per
document with its global token offset, first sequence index, offset
inside that sequence, and how many sequences it spans. A writer job can
then materialize the physical sequences partition-locally (all docs of
one ``seq_idx`` land in one group), and a data-loader can seek straight
to a document.

Scale posture — the whole operator is a distributed prefix sum over a
narrow (id, order, count) relation; the text column is dropped before
anything shuffles:

1. token counts are a pure projection (no shuffle);
2. ONE range shuffle on the order key gives contiguous, ordered
   partitions — the only time corpus rows move;
3. the running total is an Arrow-native ``mapInArrow`` cumsum
   (``pyarrow.compute``, no pandas round-trip) over the range-sorted
   cached partitions (a window keyed by ``spark_partition_id`` would be
   equivalent but forces a second corpus exchange — Catalyst cannot see
   that rows are already grouped by their own partition id);
4. the cross-partition carry is a per-partition totals aggregate —
   #shuffle-partitions rows, thousands at most on a 100-TB corpus —
   collected (bounded), prefix-summed on the driver, and broadcast
   back.

(The reference engine has no corpus analog — this is part of the
training-data surface layered on the same engine, like dedup/ANN.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    order_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Returns one row per input doc:
    ``(id_col, n_tokens, global_offset, seq_idx, seq_offset, n_seqs)``
    where ``global_offset`` is the number of tokens before this doc in
    the concatenation order, ``seq_idx = global_offset // budget``,
    ``seq_offset = global_offset % budget``, and ``n_seqs`` is how many
    ``budget``-token sequences the doc's span touches (0 for empty
    docs). Deterministic given the order key (default: the id column —
    pass ``order_col`` to pack in curriculum/shard order instead; ties
    are broken by id, which range partitioning keeps co-located).

    ``token_col`` uses a precomputed token-count column; otherwise
    whitespace token counts are derived from ``text_col``.

    The narrow (id, order, count) relation is persisted for the
    operator's two passes (carry totals + placement) — 24 bytes/doc,
    spilled to disk if it outgrows memory. It is NOT unpersisted here
    (the returned DataFrame is lazy and still reads it — same cache
    lifecycle as ``dedup.minhash_lsh_pairs``): long-lived sessions
    calling this repeatedly should ``spark.catalog.clearCache()`` after
    consuming the result.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    order = order_col or id_col
    if token_col is not None:
        base = docs.select(id_col, order, F.col(token_col).alias("_n"))
    else:
        from polardbx_tools_spark.operators.text import token_count

        base = docs.select(
            id_col, order, token_count(F.col(text_col)).alias("_n")
        )
    base = base.select(
        F.col(id_col),
        F.col(order).alias("_ord"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("_n"),
    )
    if num_partitions:
        base = base.repartitionByRange(num_partitions, "_ord")
    else:
        base = base.repartitionByRange("_ord")
    base = (
        base.sortWithinPartitions("_ord", id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )

    # cross-partition carry: bounded driver collect (one row per
    # partition) prefix-summed in python, shipped back as a broadcast
    tots = {
        r["_pid"]: r["_tot"]
        for r in base.groupBy("_pid").agg(F.sum("_n").alias("_tot")).collect()
    }
    carry, run = {}, 0
    for pid in sorted(tots):
        carry[pid] = run
        run += tots[pid] or 0
    spark = docs.sparkSession
    carries = spark.createDataFrame(
        [(int(p), int(c)) for p, c in carry.items()] or [(0, 0)],
        "_pid int, _carry long",
    )

    # partition-local running total: Arrow batches arrive in the cached
    # partition's sort order; the accumulator carries across batches.
    # mapInArrow + pyarrow.compute (not mapInPandas): the cumsum is a
    # pure int64 column op, so skipping the Arrow→pandas→Arrow
    # round-trip keeps the pass allocation-free — and the worker never
    # imports pandas (guide §4.2: hand whole batches to vectorized
    # native code; pyarrow is already loaded by the Arrow serializer)
    def cum(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        run = 0
        for b in batches:
            c = pc.cumulative_sum(b.column("_n"))
            if run:
                c = pc.add(c, pa.scalar(run, pa.int64()))
            if len(c):
                run = c[-1].as_py()
            yield pa.RecordBatch.from_arrays(
                list(b.columns) + [c],
                names=list(b.schema.names) + ["_cum"],
            )

    # schema derived from the input: string/timestamp ids and order
    # keys pass through untouched
    from pyspark.sql.types import LongType, StructField, StructType

    local = base.mapInArrow(
        cum,
        schema=StructType(
            base.schema.fields + [StructField("_cum", LongType())]
        ),
    )

    gb = F.col("_carry") + F.col("_cum") - F.col("_n")  # tokens before doc
    end = gb + F.col("_n") - 1  # last token index (n > 0 only)
    return (
        local.join(F.broadcast(carries), on="_pid")
        .select(
            F.col(id_col),
            F.col("_n").alias("n_tokens"),
            gb.cast("long").alias("global_offset"),
            F.floor(gb / budget).cast("long").alias("seq_idx"),
            (gb % budget).cast("long").alias("seq_offset"),
            F.when(
                F.col("_n") > 0,
                F.floor(end / budget) - F.floor(gb / budget) + 1,
            )
            .otherwise(0)
            .cast("long")
            .alias("n_seqs"),
        )
    )


def _sequence_pieces(
    docs: DataFrame,
    budget: int,
    text_col: str,
    id_col: str,
    order_col: str | None,
    num_partitions: int | None,
    placement: DataFrame | None = None,
    toks: Column | None = None,
    token_col: str | None = None,
) -> DataFrame:
    """One row per (doc × spanned sequence): the token slice of the doc
    that falls inside that sequence, with its absolute position. Shared
    by :func:`materialize_sequences` (groups pieces into texts),
    :func:`materialize_id_sequences` (groups token-id pieces), and
    :func:`sequence_manifest` (ships them to the data loader).

    ``placement`` reuses an existing (ideally persisted)
    :func:`pack_sequences` output instead of recomputing the prefix
    sum — the composition a production job uses when it needs the
    placement AND the derived relations. ``toks`` overrides the token
    ARRAY expression (default: whitespace tokens of ``text_col``) —
    the slice/fan-out logic is element-type-agnostic, which is what
    lets token-id arrays reuse it."""
    if placement is None:
        placement = pack_sequences(
            docs, budget, text_col=text_col, id_col=id_col,
            token_col=token_col, order_col=order_col,
            num_partitions=num_partitions,
        )
    if toks is None:
        from polardbx_tools_spark.operators.text import tokens

        toks = tokens(F.col(text_col))

    joined = docs.select(id_col, text_col).join(placement, on=id_col)
    g = F.col("global_offset")
    return (
        joined.filter(F.col("n_seqs") > 0)
        .select(
            F.col(id_col),
            toks.alias("_toks"),
            g,
            F.col("n_tokens"),
            F.explode(
                F.sequence(
                    F.col("seq_idx"),
                    F.col("seq_idx") + F.col("n_seqs") - 1,
                )
            ).alias("seq_idx"),
        )
        .select(
            "seq_idx",
            F.col(id_col),
            # absolute token position of this piece (piece position
            # inside its sequence = _pos % budget)
            F.greatest(g, F.col("seq_idx") * budget)
            .cast("long").alias("_pos"),
            # where the piece starts inside its own doc's tokens
            (F.greatest(g, F.col("seq_idx") * budget) - g)
            .cast("long").alias("_doc_off"),
            F.slice(
                F.col("_toks"),
                # 1-based start inside the doc's token array
                (
                    F.greatest(g, F.col("seq_idx") * budget) - g + 1
                ).cast("int"),
                (
                    F.least(
                        g + F.col("n_tokens"),
                        (F.col("seq_idx") + 1) * budget,
                    )
                    - F.greatest(g, F.col("seq_idx") * budget)
                ).cast("int"),
            ).alias("_piece"),
        )
    )


def sequence_manifest(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_col: str | None = None,
    num_partitions: int | None = None,
    pieces: DataFrame | None = None,
    placement: DataFrame | None = None,
) -> DataFrame:
    """Loader-side sidecar for the packed sequences: one row per
    (sequence, document piece) —
    ``(seq_idx, id_col, seq_offset, doc_offset, n_tokens)`` — saying
    which doc's tokens occupy positions
    ``[seq_offset, seq_offset + n_tokens)`` of sequence ``seq_idx``
    (taken from the doc's own tokens starting at ``doc_offset``).
    This is what attention-mask resets and per-doc loss masks are built
    from; no text is shipped, so the manifest stays narrow.

    ``pieces`` reuses a persisted :func:`_sequence_pieces` relation
    (built with the same budget) shared with
    :func:`materialize_sequences`; ``placement`` reuses an existing
    :func:`pack_sequences` output (e.g. read back from its parquet) —
    either skips re-running the prefix sum."""
    if pieces is None:
        pieces = _sequence_pieces(
            docs, budget, text_col, id_col, order_col, num_partitions,
            placement=placement,
        )
    return pieces.select(
        "seq_idx",
        F.col(id_col),
        (F.col("_pos") % budget).cast("long").alias("seq_offset"),
        F.col("_doc_off").alias("doc_offset"),
        F.size("_piece").cast("long").alias("n_tokens"),
    )


def materialize_sequences(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_col: str | None = None,
    num_partitions: int | None = None,
    keep_ragged_tail: bool = False,
    pieces: DataFrame | None = None,
    placement: DataFrame | None = None,
) -> DataFrame:
    """Physically build the packed training sequences from
    :func:`pack_sequences` placement: returns
    ``(seq_idx, seq_text, n_docs, n_tokens)`` with every sequence
    exactly ``budget`` whitespace tokens (the ragged last sequence is
    dropped unless ``keep_ragged_tail``).

    A doc spanning sequences contributes the token slice that falls in
    each one: per (doc × spanned sequence) — overlap factor ~1, since
    boundary docs are rare relative to the corpus — one row is emitted
    with its in-sequence position, then ONE shuffle on ``seq_idx``
    groups and orders each sequence's pieces. Assembly is
    ``concat_ws(sort_array(...))`` — builtin aggregation, no UDF.
    ``pieces`` reuses a persisted :func:`_sequence_pieces` relation
    (same budget) shared with :func:`sequence_manifest`; ``placement``
    reuses an existing :func:`pack_sequences` output.
    """
    if pieces is None:
        pieces = _sequence_pieces(
            docs, budget, text_col, id_col, order_col, num_partitions,
            placement=placement,
        )
    out = (
        pieces.groupBy("seq_idx")
        .agg(
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("_pos", "_piece"))
                        ),
                        lambda s: s["_piece"],
                    )
                ),
            ).alias("seq_text"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size("_piece")).cast("long").alias("n_tokens"),
        )
    )
    if not keep_ragged_tail:
        out = out.filter(F.col("n_tokens") == budget)
    return out


def materialize_id_sequences(
    docs: DataFrame,
    budget: int,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    order_col: str | None = None,
    num_partitions: int | None = None,
    keep_ragged_tail: bool = False,
    placement: DataFrame | None = None,
    pieces: DataFrame | None = None,
) -> DataFrame:
    """Loader-grade packed sequences of TOKEN IDS — the exact-BPE twin
    of :func:`materialize_sequences`, consuming the tokenize job's
    ``(id, token_ids array<int>)`` output (tools/run_tokenize.py)
    instead of whitespace-token text. Returns
    ``(seq_idx, input_ids, n_docs, n_tokens)`` with every ``input_ids``
    exactly ``budget`` ids (ragged tail dropped unless kept) — what a
    training data loader memory-maps.

    Same physical shape as the text materializer: the prefix-sum
    placement runs once (pass ``placement`` to reuse a persisted one;
    pass ``pieces`` to reuse a shared :func:`_sequence_pieces` relation
    — e.g. one also feeding :func:`sequence_manifest`), boundary docs
    are sliced per spanned sequence, ONE shuffle on ``seq_idx`` groups
    the pieces, and assembly is ``flatten(sort_array(...))`` — builtin
    aggregation, no UDF."""
    if pieces is None:
        cnt = docs.withColumn("_cnt", F.size(F.col(ids_col)))
        if placement is None:
            placement = pack_sequences(
                cnt, budget, id_col=id_col, token_col="_cnt",
                order_col=order_col, num_partitions=num_partitions,
            )
        pieces = _sequence_pieces(
            cnt, budget, ids_col, id_col, order_col, num_partitions,
            placement=placement, toks=F.col(ids_col), token_col="_cnt",
        )
    out = (
        pieces.groupBy("seq_idx")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_pos", "_piece"))),
                    lambda s: s["_piece"],
                )
            ).alias("input_ids"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size("_piece")).cast("long").alias("n_tokens"),
        )
    )
    if not keep_ragged_tail:
        out = out.filter(F.col("n_tokens") == budget)
    return out


def chunk_documents(
    docs: DataFrame,
    window: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into (optionally overlapping) token windows
    — the retrieval/eval-prep twin of :func:`pack_sequences` (which
    never splits inside the budget; this one re-windows WITHIN a doc).

    Chunk ``i`` covers tokens ``[i*stride, i*stride + window)``; the
    last chunk is the ragged tail (never empty, never duplicated: a doc
    with ``n <= window`` tokens yields exactly one chunk). Returns
    ``(id_col, chunk_idx, chunk_text, n_chunk_tokens)``. Empty/NULL
    docs yield no rows.

    Pure expression shape: tokenize once, ``sequence``+``transform``
    build the per-doc chunk array, one ``explode`` fans out — cost and
    output ∝ input tokens × overlap factor, no shuffle, no UDF.
    """
    if window <= 0:
        raise ValueError("window must be positive")
    stride = window if stride is None else stride
    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    from polardbx_tools_spark.operators.text import tokens

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # number of stride starts before the last window fully covers the
    # tail: ceil((n - window)/stride) + 1 for n > window, else 1
    n_chunks = F.when(
        n <= window, F.lit(1)
    ).otherwise(F.ceil((n - window) / F.lit(stride)) + 1)
    return (
        docs.filter(F.col(text_col).isNotNull() & (n > 0))
        .select(F.col(id_col), F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks.cast("int") - 1),
                lambda i: F.slice(toks, i * stride + 1, window),
            )
        ).alias("chunk_idx", "_toks"))
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.array_join("_toks", " ").alias("chunk_text"),
            F.size("_toks").cast("long").alias("n_chunk_tokens"),
        )
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Corpus-level packing summary from :func:`pack_sequences` output:
    ``(n_docs, total_tokens, n_sequences, fill_rate, boundary_docs)``.
    ``n_sequences`` counts full ``budget``-token sequences (the ragged
    tail is dropped, matching the training convention); ``fill_rate`` is
    the kept fraction of the token stream, and ``boundary_docs`` counts
    docs straddling a sequence boundary (attention-mask reset sites)."""
    return packed.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.floor(F.sum("n_tokens") / budget).cast("long").alias("n_sequences"),
        F.round(
            F.floor(F.sum("n_tokens") / budget) * budget / F.sum("n_tokens"),
            6,
        ).alias("fill_rate"),
        F.sum((F.col("n_seqs") > 1).cast("long")).cast("long")
        .alias("boundary_docs"),
    )
