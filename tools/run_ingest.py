"""Production job entry point for `spark-submit --py-files`.

Tails (or batch-replays) a changelog and merges it into the lake table:

    spark-submit --master <cluster> \
        --py-files dist/polardbx_tools_spark.zip tools/run_ingest.py \
        --changelog <path> --table <path> [--stream --checkpoint <dir>] \
        [--batch-lsns N] [--buckets N] [--max-events-per-sec R]

In batch mode the LSN-windowed apply loop runs to the end of the
changelog; in --stream mode a Structured Streaming file tail keeps
following the directory. Both paths share the same merge/offset logic,
so a batch backfill followed by a streaming tail is seamless.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changelog", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--batch-lsns", type=int, default=10_000_000)
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--max-events-per-sec", type=float, default=None)
    ap.add_argument("--max-errors", type=int, default=0)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--with-tool", action="store_true", default=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from polardbx_tools_spark.pipeline import CdcPipeline

    spark = SparkSession.builder.getOrCreate()  # master/conf from spark-submit
    if args.stream:
        from polardbx_tools_spark.changelog.generator import changelog_schema
        from polardbx_tools_spark.streaming import start_cdc_stream

        if not args.checkpoint:
            raise SystemExit("--stream requires --checkpoint")
        q = start_cdc_stream(
            spark,
            args.changelog,
            changelog_schema(with_tool=args.with_tool),
            args.table,
            checkpoint_dir=args.checkpoint,
            bucket_count=args.buckets,
            available_now=False,
        )
        q.awaitTermination()
    else:
        cl = spark.read.parquet(args.changelog)
        pipe = CdcPipeline(
            spark, args.table, bucket_count=args.buckets, max_errors=args.max_errors
        )
        res = pipe.run(
            cl,
            batch_lsns=args.batch_lsns,
            with_tool=args.with_tool,
            max_events_per_sec=args.max_events_per_sec,
            monitor=True,
        )
        print(
            f"done: {res.batches} batches, {res.events_applied} events applied, "
            f"{res.events_quarantined} quarantined"
        )


if __name__ == "__main__":
    main()
