"""One CDC bench leg in an isolated JVM: apply a pre-generated changelog
at a given parallelism; prints one JSON line. Invoked by bench.py via
subprocess (the sandbox stand-in for `spark-submit --py-files` at two
cluster sizes)."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polardbx_tools_spark.pipeline import CdcPipeline
from polardbx_tools_spark.session import get_spark


def main():
    cpus = int(sys.argv[1])
    cl_path = sys.argv[2]
    table_path = sys.argv[3]
    n_events = int(sys.argv[4])
    n_batches = int(sys.argv[5])
    # optional 6th arg: explicit master (e.g. local-cluster[8,1,6144] for
    # the executor-model scaling legs — separate executor JVMs, each with
    # its own memory arena, the closest sandbox analog of N executors)
    master = sys.argv[6] if len(sys.argv) > 6 else f"local[{cpus}]"
    bucket_count = int(os.environ.get("BENCH_BUCKETS", "32"))

    extra = {}
    if master.startswith("local-cluster"):
        mem_mb = master.rsplit(",", 1)[-1].rstrip("]")
        extra = {
            "spark.executor.memory": f"{mem_mb}m",
            # executor JVMs are children of this process: they inherit the
            # parent's taskset pinning, so the leg stays CPU-bounded
            "spark.executor.cores": master.split(",")[1],
        }
    spark = get_spark(
        app_name=f"cdc-bench-{cpus}",
        master=master,
        shuffle_partitions=2 * cpus,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    cl = spark.read.parquet(cl_path)

    shutil.rmtree(table_path, ignore_errors=True)
    pipe = CdcPipeline(spark, table_path, bucket_count=bucket_count)
    t0 = time.time()
    res = pipe.run(
        cl,
        batch_lsns=(n_events + n_batches - 1) // n_batches,
        max_lsn=n_events - 1,
        with_tool=True,
    )
    wall = time.time() - t0
    rows = pipe.table.read(spark).count()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "events": res.events_applied,
                "batches": res.batches,
                "wall_s": round(wall, 2),
                "events_per_sec": round(res.events_applied / wall, 1),
                "final_rows": rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
