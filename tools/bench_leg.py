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
    bucket_count = int(os.environ.get("BENCH_BUCKETS", "32"))

    spark = get_spark(
        app_name=f"cdc-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
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
