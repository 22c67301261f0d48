"""Production job entry point for the corpus-curation gate
(`spark-submit --py-files`).

Tails (or batch-drains) a document directory and content-dedups every
microbatch against the growing accepted corpus via the persistent LSH
band index:

    spark-submit --master <cluster> \
        --py-files dist/polardbx_tools_spark.zip tools/run_curation.py \
        --source <docs-dir> --index <dir> --accepted <dir> \
        --rejected <dir> --checkpoint <dir> \
        [--threshold 0.5] [--hashes 32] [--bands 8] \
        [--max-files-per-trigger N] [--follow] \
        [--benchmark <eval-parquet> --contaminated <dir> [--decontam-n 13]] \
        [--ppl-ref <ref-parquet> --max-log-ppl 4.0 --filtered <dir>]

`--follow` keeps tailing (production); without it the job drains what
exists and exits (backfill). Both modes share the same gate, index, and
id-level replay idempotence, so a backfill followed by a tail is
seamless — exactly like the CDC ingest entry.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--accepted", required=True)
    ap.add_argument("--rejected", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=None,
                    help="rejection threshold: verified jaccard (text "
                         "mode, default 0.5) or exact cosine (embedding "
                         "mode, default 0.9 — jaccard-scale values like "
                         "0.5 would reject merely-related embeddings)")
    ap.add_argument("--hashes", type=int, default=32)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--compact-every-batches", type=int, default=None,
                    help="fold the index's appended files every N "
                         "microbatches (long-tail small-file bound)")
    ap.add_argument("--mode", choices=("text", "embedding"), default="text",
                    help="text: minhash-jaccard gate over --text-col; "
                         "embedding: cosine near-dup gate over --vec-col")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--dim", type=int, default=64,
                    help="embedding dimension (embedding mode)")
    ap.add_argument("--planes", type=int, default=3)
    ap.add_argument("--tables", type=int, default=8)
    ap.add_argument("--benchmark", default=None,
                    help="parquet dir/file of evaluation documents: turns "
                         "on ingest-time decontamination (text mode) — "
                         "docs sharing a word n-gram with the benchmark "
                         "are routed to --contaminated, never accepted")
    ap.add_argument("--contaminated", default=None,
                    help="sink dir for contaminated docs (required with "
                         "--benchmark)")
    ap.add_argument("--decontam-n", type=int, default=13,
                    help="n-gram size for the benchmark overlap screen "
                         "(13 = GPT-3/Pile convention)")
    ap.add_argument("--bench-text-col", default=None,
                    help="text column in the benchmark table (defaults "
                         "to --text-col)")
    ap.add_argument("--ppl-ref", default=None,
                    help="trusted reference parquet for the ingest-time "
                         "CCNet perplexity screen (text mode)")
    ap.add_argument("--max-log-ppl", type=float, default=None,
                    help="route docs with mean per-token -log10 prob "
                         "above this to --filtered before dedup")
    ap.add_argument("--filtered", default=None,
                    help="sink dir for perplexity-filtered docs "
                         "(required with --max-log-ppl)")
    ap.add_argument("--follow", action="store_true",
                    help="keep tailing instead of drain-and-exit")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StringType, StructField, StructType,
    )

    from polardbx_tools_spark.streaming import (
        start_dedup_stream,
        start_embedding_dedup_stream,
    )

    spark = SparkSession.builder.getOrCreate()  # master/conf from spark-submit
    if args.threshold is None:
        # mode-appropriate defaults: the scales are NOT interchangeable
        args.threshold = 0.9 if args.mode == "embedding" else 0.5
    if args.mode == "embedding":
        # the text screens don't exist on the embedding gate — reject
        # loudly instead of starting a stream the operator believes is
        # decontaminating/perplexity-filtering
        if args.benchmark or args.contaminated:
            ap.error("--benchmark/--contaminated are text-mode only")
        if args.max_log_ppl is not None or args.ppl_ref or args.filtered:
            ap.error("--max-log-ppl/--ppl-ref/--filtered are "
                     "text-mode only")
        schema = StructType([
            StructField(args.id_col, LongType()),
            StructField(args.vec_col, ArrayType(FloatType())),
        ])
        q = start_embedding_dedup_stream(
            spark,
            args.source,
            schema,
            index_path=args.index,
            accepted_dir=args.accepted,
            rejected_dir=args.rejected,
            checkpoint_dir=args.checkpoint,
            dim=args.dim,
            id_col=args.id_col,
            vec_col=args.vec_col,
            threshold=args.threshold,
            n_planes=args.planes,
            n_tables=args.tables,
            available_now=not args.follow,
            max_files_per_trigger=args.max_files_per_trigger,
            compact_every_batches=args.compact_every_batches,
        )
        q.awaitTermination()
        if not args.follow:
            from polardbx_tools_spark.streaming.stream import _fs_exists

            acc = spark.read.parquet(args.accepted).count() \
                if _fs_exists(spark, args.accepted) else 0
            rej = spark.read.parquet(args.rejected).count() \
                if _fs_exists(spark, args.rejected) else 0
            print(f"done: {acc} accepted, {rej} rejected")
        return
    if args.benchmark and not args.contaminated:
        ap.error("--benchmark requires --contaminated")
    if args.max_log_ppl is not None and not (args.ppl_ref and args.filtered):
        ap.error("--max-log-ppl requires --ppl-ref and --filtered")
    benchmark = (
        spark.read.parquet(args.benchmark) if args.benchmark else None
    )
    ppl_ref = spark.read.parquet(args.ppl_ref) if args.ppl_ref else None
    schema = StructType([
        StructField(args.id_col, LongType()),
        StructField(args.text_col, StringType()),
    ])
    q = start_dedup_stream(
        spark,
        args.source,
        schema,
        index_path=args.index,
        accepted_dir=args.accepted,
        rejected_dir=args.rejected,
        checkpoint_dir=args.checkpoint,
        text_col=args.text_col,
        id_col=args.id_col,
        verify_threshold=args.threshold,
        num_hashes=args.hashes,
        bands=args.bands,
        available_now=not args.follow,
        max_files_per_trigger=args.max_files_per_trigger,
        compact_every_batches=args.compact_every_batches,
        benchmark=benchmark,
        decontam_n=args.decontam_n,
        contaminated_dir=args.contaminated,
        bench_text_col=args.bench_text_col,
        ppl_ref=ppl_ref,
        max_log_ppl=args.max_log_ppl,
        filtered_dir=args.filtered,
    )
    q.awaitTermination()
    if not args.follow:
        from polardbx_tools_spark.streaming.stream import _fs_exists

        acc = spark.read.parquet(args.accepted).count() \
            if _fs_exists(spark, args.accepted) else 0
        rej = spark.read.parquet(args.rejected).count() \
            if _fs_exists(spark, args.rejected) else 0
        con = spark.read.parquet(args.contaminated).count() \
            if args.contaminated and _fs_exists(spark, args.contaminated) \
            else 0
        fil = spark.read.parquet(args.filtered).count() \
            if args.filtered and _fs_exists(spark, args.filtered) else 0
        msg = f"done: {acc} accepted, {rej} rejected"
        if args.benchmark:
            msg += f", {con} contaminated"
        if args.max_log_ppl is not None:
            msg += f", {fil} filtered"
        print(msg)


if __name__ == "__main__":
    main()
