"""Production job entry for training-mix assembly
(`spark-submit --py-files`).

Reads N curated corpora (e.g. curation-gate accepted dirs), samples
each to its prescribed token share — oversampling small high-weight
sources across epochs — and writes one mixed corpus ready for
``tools/run_packing.py``:

    spark-submit --master <cluster> \
        --py-files dist/polardbx_tools_spark.zip tools/run_mixing.py \
        --source web=/data/web --source books=/data/books \
        --weight web=0.7 --weight books=0.3 \
        --output <out-dir> [--target-tokens N] [--seed S] \
        [--interleave] [--token-col n_tokens]

The output adds ``mix_id`` (``source#id#epoch``) — unique even when
oversampling repeats a document — so downstream packing keys on it
(``--id-col mix_id``). ``--interleave`` adds an ``ord`` column
(deterministic hash of source/id/epoch) so packing scatters sources
through the token stream instead of concatenating them block-wise
(pass ``--order-col ord`` to run_packing). A one-line JSON summary of
the achieved mixture (per source: docs, tokens, share, max epoch)
prints on completion.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _kv(pairs: list[str], what: str, cast=str) -> dict:
    out = {}
    for p in pairs:
        name, sep, val = p.partition("=")
        if not sep or not name:
            raise SystemExit(f"--{what} expects NAME=VALUE, got {p!r}")
        out[name] = cast(val)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", action="append", required=True,
                    metavar="NAME=PARQUET_DIR",
                    help="repeat per corpus")
    ap.add_argument("--weight", action="append", required=True,
                    metavar="NAME=W",
                    help="target token share per corpus (normalized)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--target-tokens", type=int, default=None,
                    help="mixture size; omitted = largest mixture "
                         "needing no repetition")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--token-col", default=None,
                    help="precomputed token counts (skips tokenizing)")
    ap.add_argument("--interleave", action="store_true",
                    help="add an 'ord' column for interleaved packing")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from polardbx_tools_spark.operators.mixing import (
        interleave_key, mix_corpora, mixture_stats,
    )

    paths = _kv(args.source, "source")
    weights = _kv(args.weight, "weight", float)
    if set(paths) != set(weights):
        raise SystemExit("--source and --weight names must match")

    spark = SparkSession.builder.getOrCreate()  # master/conf: spark-submit
    mixed = mix_corpora(
        {k: spark.read.parquet(p) for k, p in paths.items()},
        weights,
        target_tokens=args.target_tokens,
        text_col=args.text_col,
        id_col=args.id_col,
        token_col=args.token_col,
        seed=args.seed,
    )
    from pyspark.sql import functions as F

    mixed = mixed.withColumn(
        "mix_id",
        F.concat_ws(
            "#", "source", F.col(args.id_col).cast("string"),
            F.col("epoch").cast("string"),
        ),
    )
    if args.interleave:
        mixed = mixed.withColumn(
            "ord", interleave_key(args.id_col, seed=args.seed)
        )
    mixed.write.mode("overwrite").parquet(args.output)
    stats = {
        r["source"]: {k: v for k, v in r.asDict().items() if k != "source"}
        for r in mixture_stats(spark.read.parquet(args.output)).collect()
    }
    print(json.dumps(stats, sort_keys=True))


if __name__ == "__main__":
    main()
