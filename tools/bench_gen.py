"""Generate the bench changelog in an isolated JVM (invoked by bench.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polardbx_tools_spark.changelog.generator import generate_changelog
from polardbx_tools_spark.session import get_spark


def main():
    cl_path = sys.argv[1]
    n_events = int(sys.argv[2])
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from bench import bench_spec  # single source of truth for the fixture

    spark = get_spark(app_name="cdc-bench-gen", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # argv is authoritative — bench_spec defaults to the BENCH_CDC_EVENTS
    # env, and a standalone caller passing a different count previously
    # got the env-sized fixture while the print reported the argv number
    generate_changelog(spark, bench_spec(n_events)).repartition(64).write.mode(
        "overwrite"
    ).parquet(cl_path)
    print("generated", n_events, "events at", cl_path)
    spark.stop()


if __name__ == "__main__":
    main()
