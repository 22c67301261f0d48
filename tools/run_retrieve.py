"""Production job entry for corpus retrieval
(`spark-submit --py-files`) — rank corpus items for a query set, the
inspection/attribution complement of the curation jobs:

    spark-submit --master <cluster> \
        --py-files dist/polardbx_tools_spark.zip tools/run_retrieve.py \
        --corpus <parquet> --queries <parquet> --output <dir> \
        --mode bm25|cosine|lsh [--k 10] \
        [--id-col doc_id] [--text-col text]            (bm25) \
        [--vec-id-col vec_id] [--vec-col embedding]    (cosine/lsh) \
        [--dim D (inferred)] [--planes 3] [--tables 8] (lsh) \
        [--k1 1.2] [--b 0.75]                          (bm25)

Modes:
* ``bm25``   — lexical BM25 top-k (operators/retrieval.py): postings +
  broadcast query terms; queries table needs (query_id, text).
* ``cosine`` — exact brute-force cosine top-k on the numpy matmul path
  (broadcast query matrix, per-batch top-k prune — the scale plan while
  queries stay broadcast-small); queries table needs (vec_id,
  embedding).
* ``lsh``    — multi-table hyperplane-LSH approximate top-k for larger
  query sets (bucket collisions, never corpus x queries).

Output parquet: (query_id, doc/neighbor id, rank, score) and a one-line
JSON summary on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=("bm25", "cosine", "lsh"),
                    default="bm25")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--query-id-col", default="query_id")
    ap.add_argument("--vec-id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--dim", type=int, default=None,
                    help="embedding dim for lsh (inferred when omitted; "
                         "a wrong value silently corrupts cosines)")
    ap.add_argument("--planes", type=int, default=3)
    ap.add_argument("--tables", type=int, default=8)
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()  # master/conf: spark-submit
    corpus = spark.read.parquet(args.corpus)
    queries = spark.read.parquet(args.queries)

    if args.mode == "bm25":
        from polardbx_tools_spark.operators.retrieval import bm25_topk

        out = bm25_topk(
            corpus, queries, k=args.k, k1=args.k1, b=args.b,
            id_col=args.id_col, text_col=args.text_col,
            query_id_col=args.query_id_col, query_text_col=args.text_col,
        )
    elif args.mode == "cosine":
        # the numpy matmul path: exact cosine, same results as the
        # expression baseline, ~10-100x faster per row — the right
        # default for a production entry
        from polardbx_tools_spark.operators.similarity import (
            brute_force_topk_np,
        )

        out = brute_force_topk_np(
            corpus, queries, k=args.k,
            id_col=args.vec_id_col, vec_col=args.vec_col,
        )
    else:
        from pyspark.sql import functions as F

        from polardbx_tools_spark.operators.similarity import lsh_topk

        # the LSH sign masks index plane coefficients by position, so a
        # wrong --dim inflates cosines (too small) or crashes executors
        # (too large) — infer from the data and reject a mismatch
        first = (
            corpus.filter(F.col(args.vec_col).isNotNull())
            .select(F.size(args.vec_col)).first()
        )
        if first is None:
            raise SystemExit("lsh: corpus has no non-NULL embeddings")
        real_dim = first[0]
        if args.dim is None:
            args.dim = real_dim
        elif args.dim != real_dim:
            raise SystemExit(
                f"--dim {args.dim} does not match the corpus embedding "
                f"length {real_dim}"
            )
        out = lsh_topk(
            corpus, queries, k=args.k, dim=args.dim,
            id_col=args.vec_id_col, vec_col=args.vec_col,
            n_planes=args.planes, n_tables=args.tables,
        )
    out.write.mode("overwrite").parquet(args.output)
    res = spark.read.parquet(args.output)
    n_q = res.select(res.columns[0]).distinct().count()
    print(json.dumps({"mode": args.mode, "rows": res.count(),
                      "queries_with_results": n_q, "k": args.k},
                     sort_keys=True))


if __name__ == "__main__":
    main()
