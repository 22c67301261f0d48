"""Production job entry for training-sequence packing
(`spark-submit --py-files`).

Reads a curated document corpus (e.g. the curation gate's accepted
dir, or transcripts rendered through
``transcripts.transcripts_to_documents``), computes the concat-and-chop
placement, and writes it — optionally also materializing the physical
fixed-budget sequences:

    spark-submit --master <cluster> \
        --py-files dist/polardbx_tools_spark.zip tools/run_packing.py \
        --input <docs-parquet> --placement <out-dir> --budget 4096 \
        [--sequences <out-dir>] [--keep-ragged-tail] \
        [--from-transcripts] [--order-col <col>] [--partitions N]

`--from-transcripts` treats the input as lake turn state
(conv_id/turn_idx/role/text[/tool]) and renders it to documents first.
`--from-token-ids` treats the input as the tokenize job's output
(tools/run_tokenize.py: id + token_ids) and packs EXACT BPE ids — the
sequences parquet then carries `input_ids array<int>` instead of text.
The placement parquet is partitioned by nothing (narrow relation); the
sequences parquet is what a data loader consumes. A one-line JSON
summary (docs, tokens, sequences, fill rate, boundary docs) prints on
completion.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--placement", required=True)
    ap.add_argument("--budget", type=int, required=True)
    ap.add_argument("--sequences", default=None,
                    help="also materialize the physical sequence texts")
    ap.add_argument("--manifest", default=None,
                    help="also write the loader sidecar: one row per "
                         "(sequence, doc piece) for attention/loss masks")
    ap.add_argument("--keep-ragged-tail", action="store_true")
    ap.add_argument("--from-transcripts", action="store_true",
                    help="input is turn-level lake state; render one "
                         "document per conversation first")
    ap.add_argument("--from-token-ids", action="store_true",
                    help="input is the tokenize job's output "
                         "(id, token_ids); pack exact BPE ids instead "
                         "of whitespace tokens")
    ap.add_argument("--ids-col", default="token_ids")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--order-col", default=None,
                    help="pack in this order instead of id order")
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from polardbx_tools_spark.operators.packing import (
        _sequence_pieces, materialize_sequences, pack_sequences,
        packing_stats, sequence_manifest,
    )

    spark = SparkSession.builder.getOrCreate()  # master/conf: spark-submit
    docs = spark.read.parquet(args.input)
    if args.from_transcripts:
        from polardbx_tools_spark.operators.transcripts import (
            transcripts_to_documents,
        )

        docs = transcripts_to_documents(docs).withColumnRenamed(
            "conv_id", args.id_col
        )
    if args.from_token_ids:
        from pyspark.sql import functions as F

        from polardbx_tools_spark.operators.packing import (
            materialize_id_sequences,
        )

        cnt = docs.withColumn("_cnt", F.size(F.col(args.ids_col)))
        placed = pack_sequences(
            cnt, args.budget, id_col=args.id_col, token_col="_cnt",
            order_col=args.order_col, num_partitions=args.partitions,
        )
    else:
        placed = pack_sequences(
            docs, args.budget, text_col=args.text_col, id_col=args.id_col,
            order_col=args.order_col, num_partitions=args.partitions,
        )
    placed.write.mode("overwrite").parquet(args.placement)
    # the derived relations reuse the placement parquet just written —
    # the prefix sum runs ONCE however many outputs are requested; when
    # BOTH sequences and manifest are asked for, the (doc x sequence)
    # piece relation is also derived once and persisted for the pair
    on_disk = spark.read.parquet(args.placement)
    pieces = None
    if args.sequences and args.manifest:
        if args.from_token_ids:
            pieces = _sequence_pieces(
                cnt, args.budget, args.ids_col, args.id_col,
                args.order_col, args.partitions, placement=on_disk,
                toks=F.col(args.ids_col), token_col="_cnt",
            ).persist()
        else:
            pieces = _sequence_pieces(
                docs, args.budget, args.text_col, args.id_col,
                args.order_col, args.partitions, placement=on_disk,
            ).persist()
    if args.sequences:
        if args.from_token_ids:
            seqs = materialize_id_sequences(
                docs, args.budget, ids_col=args.ids_col, id_col=args.id_col,
                order_col=args.order_col, num_partitions=args.partitions,
                keep_ragged_tail=args.keep_ragged_tail, placement=on_disk,
                pieces=pieces,
            )
        else:
            seqs = materialize_sequences(
                docs, args.budget, text_col=args.text_col, id_col=args.id_col,
                order_col=args.order_col, num_partitions=args.partitions,
                keep_ragged_tail=args.keep_ragged_tail, placement=on_disk,
                pieces=pieces,
            )
        seqs.write.mode("overwrite").parquet(args.sequences)
    if args.manifest:
        if pieces is not None:
            man = sequence_manifest(
                docs, args.budget, id_col=args.id_col, pieces=pieces,
            )
        elif args.from_token_ids:
            man = sequence_manifest(
                docs, args.budget, id_col=args.id_col,
                pieces=_sequence_pieces(
                    cnt, args.budget, args.ids_col, args.id_col,
                    args.order_col, args.partitions, placement=on_disk,
                    toks=F.col(args.ids_col), token_col="_cnt",
                ),
            )
        else:
            man = sequence_manifest(
                docs, args.budget, text_col=args.text_col, id_col=args.id_col,
                order_col=args.order_col, num_partitions=args.partitions,
                placement=on_disk,
            )
        man.write.mode("overwrite").parquet(args.manifest)
    if pieces is not None:
        pieces.unpersist()
    stats = packing_stats(
        spark.read.parquet(args.placement), args.budget
    ).collect()[0].asDict()
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
