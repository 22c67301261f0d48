"""Substrate control for the scaling bench (invoked by bench.py).

Measures what RAW Spark (a trivial scan-agg + a trivial shuffle-agg over
the same changelog bytes, zero engine code) scales to between two
parallelism levels on this machine. Any wall-clock scaling ceiling this
shows is a property of the box (single-VM memory bandwidth), not of the
engine — on a real multi-executor cluster each executor brings its own
memory channels, so the substrate ceiling does not apply there.

Prints one JSON line: {"cpus": N, "scan_agg_s": x, "shuffle_agg_s": y}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polardbx_tools_spark.session import get_spark


def main():
    cpus = int(sys.argv[1])
    cl_path = sys.argv[2]
    # optional 3rd arg: explicit master (executor-model control, e.g.
    # local-cluster[8,1,6144]) — same contract as bench_leg.py
    master = sys.argv[3] if len(sys.argv) > 3 else f"local[{cpus}]"
    extra = {}
    if master.startswith("local-cluster"):
        mem_mb = master.rsplit(",", 1)[-1].rstrip("]")
        extra = {
            "spark.executor.memory": f"{mem_mb}m",
            "spark.executor.cores": master.split(",")[1],
        }
    spark = get_spark(
        app_name=f"substrate-{cpus}",
        master=master,
        shuffle_partitions=max(2, 2 * cpus),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    cl = spark.read.parquet(cl_path)
    cl.count()  # warm page cache + JIT
    t0 = time.time()
    cl.groupBy("source_partition").agg(F.count("*"), F.max("source_lsn")).collect()
    t1 = time.time()
    cl.groupBy("conv_id").agg(F.count("*")).count()
    t2 = time.time()
    print(json.dumps({
        "cpus": cpus,
        "scan_agg_s": round(t1 - t0, 2),
        "shuffle_agg_s": round(t2 - t1, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
