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
    ap.add_argument("--weight", action="append", default=None,
                    metavar="NAME=W",
                    help="target token share per corpus (normalized); "
                         "or derive shares with --temperature/--unimax")
    ap.add_argument("--temperature", type=float, default=None,
                    help="derive weights from per-source token masses: "
                         "w_s ∝ T_s^tau (mT5-style; 1=natural, 0=uniform)")
    ap.add_argument("--unimax", type=float, default=None, metavar="BUDGET",
                    help="derive weights by UniMax water-filling of "
                         "BUDGET tokens under --max-epochs")
    ap.add_argument("--max-epochs", type=float, default=4.0)
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
        interleave_key, mix_corpora, mixture_stats, temperature_weights,
        unimax_weights,
    )

    paths = _kv(args.source, "source")
    policies = sum(
        x is not None for x in (args.weight, args.temperature, args.unimax)
    )
    if policies != 1:
        raise SystemExit(
            "give exactly one of --weight / --temperature / --unimax"
        )

    spark = SparkSession.builder.getOrCreate()  # master/conf: spark-submit
    srcs = {k: spark.read.parquet(p) for k, p in paths.items()}
    target_tokens = args.target_tokens
    masses = None
    if args.weight is not None:
        weights = _kv(args.weight, "weight", float)
        if set(paths) != set(weights):
            raise SystemExit("--source and --weight names must match")
    else:
        from pyspark.sql import functions as F

        from polardbx_tools_spark.operators.text import token_count

        cnt = (
            (lambda df: F.col(args.token_col))
            if args.token_col
            else (lambda df: token_count(F.col(args.text_col)))
        )
        masses = {
            k: float(
                df.select(F.sum(cnt(df)).alias("t")).first()["t"] or 0
            )
            for k, df in srcs.items()
        }
        if args.temperature is not None:
            weights = temperature_weights(masses, args.temperature)
        else:
            weights = unimax_weights(
                masses, args.unimax, max_epochs=args.max_epochs
            )
            # UniMax weights are shares OF the budget — fix the size too
            target_tokens = target_tokens or int(args.unimax)

    mixed = mix_corpora(
        srcs,
        weights,
        target_tokens=target_tokens,
        text_col=args.text_col,
        id_col=args.id_col,
        token_col=args.token_col,
        seed=args.seed,
        # already aggregated above when weights were derived — don't
        # re-scan every source for the identical totals
        token_masses=masses,
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
    stats["_weights"] = {k: round(v, 6) for k, v in weights.items()}
    print(json.dumps(stats, sort_keys=True))


if __name__ == "__main__":
    main()
