"""Production job entry for BATCH corpus deduplication
(`spark-submit --py-files`) — the offline complement of the streaming
dedup gate (tools/run_curation.py): one pass over a finished corpus
that detects duplicates, keeps one canonical document per duplicate
cluster, and (optionally) assigns a leakage-safe train/val/test split
in the same job:

    spark-submit --master <cluster> \
        --py-files dist/polardbx_tools_spark.zip tools/run_dedup.py \
        --input <docs-parquet> --kept <dir> [--removed <dir>] \
        [--method minhash|exact|normalized|semantic] \
        [minhash: --num-hashes 32 --bands 8 --threshold 0.5 \
                  --k-shingle 3] \
        [semantic: --tau 0.4 --cells 16 [--dim D] [--vec-col embedding]] \
        [--split 80,10] \
        [--id-col doc_id] [--text-col text]

Methods (all operators from polardbx_tools_spark.operators.dedup /
similarity — the CLI only composes them):

* ``exact`` / ``normalized`` — content-hash groups (md5 of the raw or
  case/punct/whitespace-normalized text), keep min id per group. ONE
  hash-groupBy + one join; the 100-TB default when byte-duplicates
  dominate.
* ``minhash`` (default) — MinHash-LSH candidate pairs verified with
  exact shingle-Jaccard (``minhash_lsh_pairs``), connected components
  over the verified pairs (``duplicate_clusters``), keep min id per
  cluster. Shuffles are banded ids-only joins; the pair graph is
  proportional to DUPLICATES, not corpus.
* ``semantic`` — SemDeDup (arXiv:2303.09540) over an embedding column:
  seeded spherical-k-means cells, drop rows covered at cosine >=
  ``--tau`` by a lower same-cell id. ``--dim`` is inferred from the
  first row when omitted.

``--split T,V`` appends ``leakage_safe_split`` over the detected
duplicate clusters (T% train / V% val / rest test, decided per CLUSTER
so near-duplicates can never straddle an eval boundary); kept rows gain
a ``split`` column (integral id columns only — the split hash is
integer arithmetic). For ``semantic`` the cover edges (dup_of -> id)
are first closed into components with ``duplicate_clusters`` so chained
covers land in one cluster and every removed row's ``dup_of`` names the
KEPT canonical (the component min id), never a removed intermediate.

Outputs: ``--kept`` gets every surviving document (all input columns
[+ ``split``]); ``--removed`` (optional) gets every dropped document
plus ``dup_of`` = the canonical id that covers it. A one-line JSON
summary (input/kept/removed counts, per-split sizes) prints on
completion.

Reference analog: none — engine addition for the LLM-data pipeline
(SURVEY.md §2.12); the streaming twin is the curation gate.
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
    ap.add_argument("--kept", required=True)
    ap.add_argument("--removed", default=None)
    ap.add_argument("--method", default="minhash",
                    choices=["minhash", "exact", "normalized", "semantic"])
    ap.add_argument("--num-hashes", type=int, default=32)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="verify-Jaccard floor for minhash pairs")
    ap.add_argument("--k-shingle", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tau", type=float, default=0.4,
                    help="semantic: cosine cover threshold")
    ap.add_argument("--cells", type=int, default=16,
                    help="semantic: k-means cell count")
    ap.add_argument("--dim", type=int, default=None,
                    help="semantic: embedding dim (inferred when omitted)")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--split", default=None, metavar="TRAIN,VAL",
                    help="leakage-safe split percents, e.g. 80,10 "
                         "(rest = test); kept rows gain a split column")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from polardbx_tools_spark.operators import dedup, similarity

    spark = SparkSession.builder.appName("corpus-dedup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    idc, txc = args.id_col, args.text_col
    docs = spark.read.parquet(args.input)
    if args.split:
        # leakage_safe_split's engine-neutral hash is integer arithmetic
        # on the cluster id; a string id would cast to NULL (every row
        # 'test') or throw under ANSI — fail loud instead
        id_type = docs.schema[idc].dataType.simpleString()
        if id_type not in ("bigint", "int", "smallint", "tinyint"):
            raise SystemExit(
                f"--split requires an integral --id-col "
                f"({idc} is {id_type}); hash string ids to int64 first"
            )

    # ---- detect: produce (id, dup_of) + a (doc_id, cluster_id) relation
    if args.method in ("exact", "normalized"):
        if args.method == "exact":
            groups = dedup.exact_groups(docs, txc, idc)
            hcol = F.md5(F.col(txc))
        else:
            from polardbx_tools_spark.operators import text as text_ops

            groups = dedup.normalized_groups(docs, txc, idc)
            hcol = text_ops.fingerprint(F.col(txc))
        verdict = (
            docs.select(F.col(idc), hcol.alias("content_hash"))
            .join(groups.select("content_hash", "canonical_id"),
                  on="content_hash")
            .select(
                idc,
                F.when(F.col(idc) != F.col("canonical_id"),
                       F.col("canonical_id")).alias("dup_of"),
            )
        )
        clusters = verdict.select(
            F.col(idc).alias("doc_id"),
            F.coalesce("dup_of", F.col(idc)).alias("cluster_id"),
        )
    elif args.method == "minhash":
        pairs = dedup.minhash_lsh_pairs(
            docs, txc, idc, num_hashes=args.num_hashes, bands=args.bands,
            seed=args.seed, k_shingle=args.k_shingle,
            verify_threshold=args.threshold,
        )
        clusters = dedup.duplicate_clusters(pairs).persist()
        verdict = (
            docs.select(idc)
            .join(clusters.withColumnRenamed("doc_id", idc), on=idc,
                  how="left")
            .select(
                idc,
                F.when(
                    F.col("cluster_id").isNotNull()
                    & (F.col("cluster_id") != F.col(idc)),
                    F.col("cluster_id"),
                ).alias("dup_of"),
            )
        )
        clusters = verdict.select(
            F.col(idc).alias("doc_id"),
            F.coalesce("dup_of", F.col(idc)).alias("cluster_id"),
        )
    else:  # semantic
        dim = args.dim
        if dim is None:
            first = (
                docs.filter(F.col(args.vec_col).isNotNull())
                .select(F.size(args.vec_col)).first()
            )
            if first is None:
                raise SystemExit("semantic: no non-NULL embeddings")
            dim = first[0]
        sd = similarity.semantic_dedup(
            docs, dim=dim, tau=args.tau, n_clusters=args.cells,
            id_col=idc, vec_col=args.vec_col, seed=args.seed,
        ).persist()
        # cover edges chain (dup_of can itself be covered: A covers B,
        # B covers C, A doesn't cover C); close them into components so
        # dup_of always names the KEPT canonical — the component min,
        # which nothing lower covers — and the split never straddles a
        # chain
        edges = sd.filter(F.col("dup_of").isNotNull()).select(
            F.col("dup_of").alias("id_a"), F.col(idc).alias("id_b")
        )
        comp = dedup.duplicate_clusters(edges)
        verdict = (
            sd.select(idc, "dup_of")
            .join(comp.withColumnRenamed("doc_id", idc), on=idc, how="left")
            .select(
                idc,
                F.when(F.col("dup_of").isNotNull(),
                       F.col("cluster_id")).alias("dup_of"),
            )
        )
        clusters = (
            sd.select(F.col(idc).alias("doc_id"))
            .join(comp, on="doc_id", how="left")
            .select(
                "doc_id",
                F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
            )
        )

    # ---- act: route kept/removed, optionally assign the split
    tagged = docs.join(verdict, on=idc, how="left").persist()
    kept = tagged.filter(F.col("dup_of").isNull()).drop("dup_of")
    if args.split:
        t, v = (int(x) for x in args.split.split(","))
        assign = dedup.leakage_safe_split(
            docs, clusters, id_col=idc, train_pct=t, val_pct=v
        ).select(idc, "split")
        kept = kept.join(assign, on=idc, how="left")
    kept.write.mode("overwrite").parquet(args.kept)
    removed = tagged.filter(F.col("dup_of").isNotNull())
    if args.removed:
        removed.write.mode("overwrite").parquet(args.removed)

    n_kept = spark.read.parquet(args.kept).count()
    n_removed = removed.count()
    summary = {
        "method": args.method,
        "input": n_kept + n_removed,
        "kept": n_kept,
        "removed": n_removed,
    }
    if args.split:
        summary["splits"] = {
            r["split"]: r["n"]
            for r in spark.read.parquet(args.kept)
            .groupBy("split").agg(F.count("*").alias("n")).collect()
        }
    tagged.unpersist()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
