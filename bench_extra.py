"""Extra measurement harness for the optimization rounds — bench.py is
FROZEN for driver measurement, so per-query isolation, per-leg walls for
the consolidated (labelled-union) gate entries, and plan capture live
here instead.

Modes (env):
  BENCHX_QUERIES    comma list of query names (default: all)
  BENCHX_ROUNDS     timing rounds per query (default 2; min is reported)
  BENCHX_SINK       "count" (default — the frozen bench.py methodology)
                    or "noop" (guide §1.4: forces every column)
  BENCHX_LEGS       "1" to also time each leg of union entries separately
  BENCHX_PLANS_DIR  capture .explain("formatted") per query into this dir
                    (file name: <query><BENCHX_PLANS_SUFFIX>.txt)
  BENCHX_PLANS_SUFFIX  default "_before"
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS — same as bench.py

Output: one JSON line (walls in seconds, 3dp) + pretty sidecar
BENCHX.json. Leg timing filters the union entry on its label column, so
leg walls include the shared upstream work (persisted relations are
attributed to whichever leg runs first).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from polardbx_tools_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("BENCHX_ROUNDS", "2"))
SINK = os.environ.get("BENCHX_SINK", "count")
RUN_LEGS = os.environ.get("BENCHX_LEGS", "0") == "1"
PLANS_DIR = os.environ.get("BENCHX_PLANS_DIR", "")
PLANS_SUFFIX = os.environ.get("BENCHX_PLANS_SUFFIX", "_before")

# the label column of every labelled-union entry (per-leg timing)
UNION_LEG_COL = {
    "window_suite": "leg",
    "report_suite": "leg",
    "agg_suite": "leg",
    "join_suite": "join_kind",
    "dedup_exact": "kind",
    "dedup_jaccard": "leg",
    "dedup_spans": "leg",
    "text_rank_suite": "leg",
    "pack_sequences": "leg",
    "quality_suite": "leg",
    "ann_cosine_topk": "path",
    "ann_pq_topk": "path",
}


def _consume(df):
    if SINK == "noop":
        df.write.format("noop").mode("overwrite").save()
    else:
        df.count()


def main() -> None:
    import __spark_entry__ as entrymod

    only = [q for q in os.environ.get("BENCHX_QUERIES", "").split(",") if q]
    qs = entrymod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    spark = get_spark(
        app_name="query-bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # identical warm-up to the frozen bench.py query suite
    for t in ("events", "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    from polardbx_tools_spark.operators import dedup as _dd
    from polardbx_tools_spark.operators import packing as _pk

    _warm = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(64)
    _dd.minhash_lsh_pairs(_warm).count()
    _dd.jaccard_pairs(_warm).count()
    _pk.pack_sequences(_warm, 64).count()
    spark.catalog.clearCache()

    out: dict = {"sf": SF_DIR, "sink": SINK, "rounds": ROUNDS,
                 "queries": {}, "legs": {}, "samples": {}}
    if PLANS_DIR:
        os.makedirs(PLANS_DIR, exist_ok=True)
    try:
        for name, fn in qs.items():
            samples = []
            for r in range(ROUNDS):
                spark.sparkContext.setJobDescription(f"{name} r{r}")
                t0 = time.time()
                _consume(fn(spark, SF_DIR))
                samples.append(round(time.time() - t0, 3))
            # FIRST sample is the bench.py-comparable number (the frozen
            # suite runs each query once; session-keyed shared persists
            # build during that first run). min() rides the sidecar.
            out["queries"][name] = samples[0]
            out["samples"][name] = samples
            if PLANS_DIR:
                df = fn(spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(
                        PLANS_DIR, f"{name}{PLANS_SUFFIX}.txt"), "w") as f:
                    f.write(plan)
            if RUN_LEGS and name in UNION_LEG_COL:
                col = UNION_LEG_COL[name]
                df = fn(spark, SF_DIR)
                legs = [r[0] for r in df.select(col).distinct().collect()]
                leg_w = {}
                for leg in sorted(legs):
                    spark.sparkContext.setJobDescription(f"{name}:{leg}")
                    t0 = time.time()
                    _consume(fn(spark, SF_DIR).filter(f"{col} = '{leg}'"))
                    leg_w[leg] = round(time.time() - t0, 3)
                out["legs"][name] = leg_w
            spark.sparkContext.setJobDescription(None)
    finally:
        spark.stop()
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCHX.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"queries": out["queries"], "legs": out["legs"]},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
