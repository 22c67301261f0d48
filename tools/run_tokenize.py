"""Production job entry for exact BPE tokenization
(`spark-submit --py-files`).

Fits (or loads) a byte-level BPE tokenizer and encodes a document
corpus to token-id arrays — the step between curation/mixing and
sequence packing in the training-data pipeline:

    spark-submit --master <cluster> \
        --py-files dist/polardbx_tools_spark.zip tools/run_tokenize.py \
        --input <docs-parquet> --output <tokens-dir> \
        --merges /path/tokenizer.json [--fit --vocab-size 32768] \
        [--id-col doc_id] [--text-col text]

With ``--fit`` the tokenizer is trained on the input corpus
(distributed word count; merge loop over the bounded word table) and
saved to ``--merges``; without it, ``--merges`` must already exist —
the production shape, where one fitted artifact tokenizes every corpus
(training a new tokenizer per corpus would silently fork id spaces).
Output parquet: (id, n_tokens, token_ids array<int>). One JSON stats
line (docs, tokens, chars/token compression) prints on completion.
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
    ap.add_argument("--output", required=True)
    ap.add_argument("--merges", required=True,
                    help="tokenizer artifact JSON (read, or written with --fit)")
    ap.add_argument("--fit", action="store_true",
                    help="train on the input corpus and save to --merges")
    ap.add_argument("--vocab-size", type=int, default=32768)
    ap.add_argument("--max-words", type=int, default=65536)
    ap.add_argument("--min-pair-count", type=int, default=2)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql import SparkSession

    from polardbx_tools_spark.operators import bpe

    spark = SparkSession.builder.getOrCreate()  # master/conf: spark-submit
    docs = spark.read.parquet(args.input)
    if args.fit:
        merges = bpe.bpe_train(
            docs, text_col=args.text_col, vocab_size=args.vocab_size,
            max_words=args.max_words, min_pair_count=args.min_pair_count,
        )
        bpe.save_merges(args.merges, merges)
    else:
        merges = bpe.load_merges(args.merges)

    enc = bpe.bpe_encode(docs, merges, text_col=args.text_col).select(
        args.id_col,
        F.size("token_ids").cast("int").alias("n_tokens"),
        "token_ids",
    )
    enc.write.mode("overwrite").parquet(args.output)

    on_disk = spark.read.parquet(args.output)
    chars = docs.select(
        F.sum(F.length(args.text_col)).alias("c")
    ).first()["c"] or 0
    agg = on_disk.select(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens")
    ).first()
    toks = int(agg["tokens"] or 0)
    print(json.dumps({
        "docs": int(agg["docs"]),
        "tokens": toks,
        "vocab_size": 256 + len(merges),
        "n_merges": len(merges),
        "chars_per_token": round(chars / toks, 4) if toks else None,
        "fitted": bool(args.fit),
    }))


if __name__ == "__main__":
    main()
