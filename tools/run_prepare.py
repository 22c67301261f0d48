"""Production job entry for batch document preparation
(`spark-submit --py-files`) — the BATCH complement of the streaming
curation gate: structural C4 cleaning, Gopher-style repetition filters,
language/quality gates, PII redaction, and optional benchmark
decontamination in ONE pass over the corpus, before dedup/mixing/
packing:

    spark-submit --master <cluster> \
        --py-files dist/polardbx_tools_spark.zip tools/run_prepare.py \
        --input <docs-parquet> --accepted <dir> --rejected <dir> \
        [--remove-dup-spans 50] \
        [--c4] [--min-sentences 5] \
        [--max-dup-line-frac 0.3] [--max-top-2gram-frac 0.18] \
        [--lang en] [--min-quality 0.5] \
        [--max-log-ppl 4.0 [--ppl-ref <ref-parquet>]] \
        [--min-clf 0.5 [--clf-model <json>] | \
         [--clf-pos <parquet> --clf-neg <parquet> \
          [--clf-buckets 10000] [--clf-iters 30] [--clf-save <json>]]] \
        [--redact-pii email,phone,ssn,ipv4] \
        [--benchmark <eval-parquet>] [--ngram 13] \
        [--select-target <parquet> --select-k N [--select-seed 0] \
         [--dsir-buckets 10000] [--selected <dir>]] \
        [--id-col doc_id] [--text-col text]

Every gate is a pure projection (C4 / repetition / quality / lang /
PII), so the corpus is scanned once; decontamination adds only the
broadcast eval-gram join (the corpus side never shuffles its text).
``--remove-dup-spans W`` prepends ExactSubstr removal (one corpus
inventory shuffle; non-canonical duplicated W-token window covers are
cut before any gate sees the text; removed-token total rides the
summary). Docs that lost nothing keep their ORIGINAL text — line
structure intact for the c4/duplicate-line rules; docs that DID lose a
span ship the single-space token rebuild (the removal is
token-granular, so their newline structure is gone — the line-based
gates see them as one line). ``--select-target``/``--select-k`` appends DSIR importance
resampling (arXiv:2302.03169) over the ACCEPTED pool — the Gumbel-top-k
most target-like docs land in ``--selected`` (default
``<accepted>_selected``) with log_w/sel_rank columns.
Rejected rows carry the FIRST failing gate in ``reason``
(``c4`` → ``repetition`` → ``lang`` → ``quality`` → ``perplexity`` →
``classifier`` → ``contaminated``); the classifier gate TRAINS the
fasttext-style hashed-n-gram logistic model (operators/classifier.py,
the GPT-3 Wikipedia-vs-CC component) on ``--clf-pos``/``--clf-neg`` and
rejects docs scoring below ``--min-clf`` — training is shuffle-free
gradient-partial jobs, scoring one broadcast join on the same single
pass; ``--clf-save`` persists the fitted weights as a JSON artifact
(works standalone — pos/neg + ``--clf-save`` with no ``--min-clf``
trains and saves without gating) and ``--clf-model`` loads one instead
of refitting (train once, score many corpora — the tokenizer-artifact
pattern); the perplexity, classifier, and decontamination gates all
judge the SAME post-cleaning text the job ships, never the raw input
column; the perplexity gate is CCNet-style (bigram LM fitted
on ``--ppl-ref``, or on the input itself when omitted) and, like
decontamination, adds only per-doc score joins to the single pass;
accepted rows carry the (optionally cleaned + PII-redacted) text with
token count, quality, and lang columns, ready for run_mixing /
run_packing. A one-line JSON summary (accepted + per-reason rejects)
prints on completion.
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
    ap.add_argument("--accepted", required=True)
    ap.add_argument("--rejected", required=True)
    ap.add_argument("--c4", action="store_true",
                    help="apply C4 line cleaning + page keep rules")
    ap.add_argument("--min-sentences", type=int, default=5)
    ap.add_argument("--max-dup-line-frac", type=float, default=0.3,
                    help="Gopher-style duplicate-line fraction cap")
    ap.add_argument("--max-top-2gram-frac", type=float, default=0.18,
                    help="Gopher-style top-2-gram fraction cap")
    ap.add_argument("--lang", default=None,
                    help="keep only this lang_id prediction (e.g. en)")
    ap.add_argument("--min-quality", type=float, default=None)
    ap.add_argument("--redact-pii", default=None,
                    metavar="KINDS", help="comma list: email,phone,ssn,ipv4")
    ap.add_argument("--ppl-ref", default=None,
                    help="reference corpus parquet for the CCNet-style "
                         "perplexity gate (default: fit on the input)")
    ap.add_argument("--max-log-ppl", type=float, default=None,
                    help="reject docs with mean per-token -log10 prob "
                         "above this under the bigram LM")
    ap.add_argument("--clf-pos", default=None,
                    help="positive (high-quality) corpus parquet for the "
                         "trained-classifier gate")
    ap.add_argument("--clf-neg", default=None,
                    help="negative (low-quality) corpus parquet")
    ap.add_argument("--min-clf", type=float, default=None,
                    help="reject docs whose trained-classifier P(positive) "
                         "is below this")
    ap.add_argument("--clf-buckets", type=int, default=10000)
    ap.add_argument("--clf-iters", type=int, default=30)
    ap.add_argument("--clf-model", default=None,
                    help="load a saved classifier artifact instead of "
                         "fitting (see --clf-save)")
    ap.add_argument("--clf-save", default=None,
                    help="save the fitted classifier artifact here")
    ap.add_argument("--benchmark", default=None,
                    help="eval-set parquet; overlapping docs are rejected")
    ap.add_argument("--ngram", type=int, default=13)
    ap.add_argument("--remove-dup-spans", type=int, default=None,
                    metavar="W",
                    help="ExactSubstr removal: cut non-canonical "
                         "duplicated W-token window covers before gating")
    ap.add_argument("--select-target", default=None,
                    help="target-corpus parquet for DSIR importance "
                         "selection over the accepted pool")
    ap.add_argument("--select-k", type=int, default=None)
    ap.add_argument("--select-seed", type=int, default=0)
    ap.add_argument("--dsir-buckets", type=int, default=10000)
    ap.add_argument("--selected", default=None,
                    help="output dir for the DSIR-selected subset "
                         "(default <accepted>_selected)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    if bool(args.select_target) != bool(args.select_k):
        ap.error("--select-target and --select-k must be given together")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from polardbx_tools_spark.operators import masking, text

    spark = SparkSession.builder.getOrCreate()  # master/conf: spark-submit
    docs = spark.read.parquet(args.input)
    idc, txc = args.id_col, args.text_col

    span_removed_col = F.lit(0)
    if args.remove_dup_spans:
        from polardbx_tools_spark.operators import dedup

        cleaned = dedup.remove_duplicate_spans(
            docs, window=args.remove_dup_spans, id_col=idc, text_col=txc
        ).select(
            F.col(idc),
            F.col("text").alias("_spantext"),
            F.col("n_removed").alias("_span_removed"),
        )
        # the rebuild is single-space joined — keep the ORIGINAL text
        # (line structure intact for the c4/dup-line gates) for the
        # overwhelming majority of docs that lost nothing
        docs = docs.join(cleaned, on=idc, how="inner").withColumn(
            txc,
            F.when(F.col("_span_removed") > 0, F.col("_spantext"))
            .otherwise(F.col(txc)),
        ).drop("_spantext")
        # the span pipeline (corpus inventory shuffle + per-doc rebuild)
        # is the job's dominant stage; later gates (lm fit, classifier,
        # decontamination) each materialize docs — compute it once
        docs = docs.persist()
        span_removed_col = F.col("_span_removed")

    cur = F.col(txc)
    fails: list[tuple[str, "F.Column"]] = []
    if args.c4:
        cur = text.c4_clean_lines(cur)
        fails.append(
            ("c4", text.c4_document_keep(cur, args.min_sentences) == 0)
        )
    fails.append((
        "repetition",
        (text.dup_line_fraction(cur) > args.max_dup_line_frac)
        | (text.top_ngram_fraction(cur, 2) > args.max_top_2gram_frac),
    ))
    if args.lang:
        fails.append(("lang", text.lang_id(cur) != args.lang))
    if args.min_quality is not None:
        fails.append(
            ("quality", text.quality_score(cur) < args.min_quality)
        )

    scored = docs.select(
        F.col(idc),
        cur.alias("_text"),
        span_removed_col.alias("_span_removed"),
        text.lang_id(cur).alias("lang"),
        F.round(text.quality_score(cur), 2).alias("quality"),
        *[cond.alias(f"_f_{name}") for name, cond in fails],
    )
    # every relational gate below judges the SAME text the job ships
    # (post-span-removal, post-c4) — scoring the raw column would let a
    # c4-removed boilerplate line reject a doc whose shipped text is fine
    gate_docs = docs.select(F.col(idc), cur.alias(txc))
    if args.max_log_ppl is not None:
        from polardbx_tools_spark.operators import lm

        ref = (spark.read.parquet(args.ppl_ref) if args.ppl_ref
               else gate_docs)
        ppl = lm.lm_perplexity(
            gate_docs, ref, id_col=idc, text_col=txc
        ).select(idc, "log_ppl")
        scored = scored.join(ppl, on=idc, how="left").withColumn(
            "_f_perplexity",
            F.coalesce(F.col("log_ppl") > args.max_log_ppl, F.lit(False)),
        )
        fails.append(("perplexity", F.col("_f_perplexity")))
    if args.min_clf is not None or args.clf_save:
        from polardbx_tools_spark.operators import classifier

        cw = cconsts = None
        if args.min_clf is not None and args.clf_model:
            cw, cconsts = classifier.load_model(spark, args.clf_model)
        elif args.clf_pos and args.clf_neg:
            cw, cconsts = classifier.quality_fit(
                spark.read.parquet(args.clf_pos),
                spark.read.parquet(args.clf_neg),
                text_col=txc, n_buckets=args.clf_buckets,
                iters=args.clf_iters,
            )
            if args.clf_save:  # train-once artifact; gating optional
                classifier.save_model(cw, cconsts, args.clf_save)
        elif args.min_clf is not None:
            ap.error("--min-clf requires --clf-model, or "
                     "--clf-pos and --clf-neg")
        else:
            ap.error("--clf-save requires --clf-pos and --clf-neg")
    if args.min_clf is not None:
        cs = classifier.quality_score(
            gate_docs, cw, cconsts, id_col=idc, text_col=txc
        ).select(idc, "quality_score")
        scored = scored.join(cs, on=idc, how="left").withColumn(
            "_f_classifier",
            F.coalesce(F.col("quality_score") < args.min_clf, F.lit(False)),
        )
        fails.append(("classifier", F.col("_f_classifier")))
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        flags = text.decontaminate(
            gate_docs, bench, n=args.ngram, text_col=txc, id_col=idc
        ).select(idc, "contaminated")
        scored = scored.join(flags, on=idc, how="left")
        fails.append(
            ("contaminated", F.coalesce(F.col("contaminated"), F.lit(0)) == 1)
        )

    reason = F.lit(None).cast("string")
    for name, _ in reversed(fails):
        col = F.col("contaminated") == 1 if name == "contaminated" \
            else F.col(f"_f_{name}")
        reason = F.when(F.coalesce(col.cast("int"), F.lit(0)) == 1,
                        F.lit(name)).otherwise(reason)
    scored = scored.withColumn("reason", reason).persist()

    out_text = F.col("_text")
    if args.redact_pii:
        kinds = tuple(k for k in args.redact_pii.split(",") if k)
        out_text = masking.pii_redact(out_text, kinds)
    scored.filter(F.col("reason").isNull()).select(
        F.col(idc),
        out_text.alias(txc),
        text.token_count(out_text).cast("long").alias("n_tokens"),
        "quality",
        "lang",
    ).write.mode("overwrite").parquet(args.accepted)
    scored.filter(F.col("reason").isNotNull()).select(
        F.col(idc), F.col("reason")
    ).write.mode("overwrite").parquet(args.rejected)

    agg = scored.groupBy("reason").agg(
        F.count("*").alias("n"),
        F.sum("_span_removed").alias("sr"),
    ).collect()
    stats = {r["reason"] or "accepted": r["n"] for r in agg}
    summary = {"accepted": stats.pop("accepted", 0), "rejected": stats}
    if args.remove_dup_spans:
        summary["span_tokens_removed"] = int(sum(r["sr"] or 0 for r in agg))
        docs.unpersist()
    scored.unpersist()

    if args.select_k and args.select_target:
        from polardbx_tools_spark.operators import dsir

        target = spark.read.parquet(args.select_target)
        pool = spark.read.parquet(args.accepted)
        sel_dir = args.selected or args.accepted.rstrip("/") + "_selected"
        dsir.dsir_select(
            pool, target, k=args.select_k, id_col=idc, text_col=txc,
            n_buckets=args.dsir_buckets, seed=args.select_seed,
        ).write.mode("overwrite").parquet(sel_dir)
        summary["selected"] = spark.read.parquet(sel_dir).count()
    print(json.dumps(summary, sort_keys=True))


if __name__ == "__main__":
    main()
