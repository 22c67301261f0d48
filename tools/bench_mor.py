"""Hot-bucket write-amplification leg: COW vs MOR bytes-written per
microbatch, one isolated JVM. Prints one JSON line.

Fixture: a changelog whose every batch UPDATES the same small set of
conversations — the workload where copy-on-write pays
touched-bucket-sized writes per batch while merge-on-read pays
batch-sized writes (the round-2 VERDICT's last 100x scale risk). The
measurement is the sum of file sizes NEWLY referenced by each data
commit, straight from the snapshot manifests.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polardbx_tools_spark.changelog.generator import ChangelogSpec, generate_changelog
from polardbx_tools_spark.pipeline import CdcPipeline
from polardbx_tools_spark.session import get_spark


def bytes_per_data_commit(table) -> list[int]:
    out = []
    versions = table.snapshots()
    for prev_v, v in zip(versions, versions[1:]):
        snap = table.snapshot(v)
        if snap.properties.get("batch_id") is None:
            continue
        new = set(snap.all_files()) - set(table.snapshot(prev_v).all_files())
        out.append(sum(
            os.path.getsize(os.path.join(table.path, f)) for f in new
        ))
    return out


def main():
    cpus = int(sys.argv[1])
    workdir = sys.argv[2]
    n_events = int(sys.argv[3])
    n_batches = int(sys.argv[4])

    spark = get_spark(
        app_name="cdc-bench-mor",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # growing-table fixture: keys are hash-spread over the LSN range, so
    # every batch touches every bucket while the table keeps growing —
    # COW's per-batch write grows with the accumulated bucket contents,
    # MOR's stays at ~batch size (the round-2 scale-risk scenario)
    cl = generate_changelog(spark, ChangelogSpec(
        n_events=n_events,
        n_convs=max(64, n_events // 20),
        max_turns=16,
        n_source_partitions=8,
        seed=42,
        hot_conv_pct=1,
        hot_event_pct=30,
    )).cache()
    cl.count()

    result = {"events": n_events, "batches": n_batches, "cpus": cpus}
    for mode in ("cow", "mor"):
        path = os.path.join(workdir, f"mor_leg_{mode}")
        shutil.rmtree(path, ignore_errors=True)
        pipe = CdcPipeline(spark, path, bucket_count=8, merge_mode=mode)
        t0 = time.time()
        res = pipe.run(
            cl,
            batch_lsns=(n_events + n_batches - 1) // n_batches,
            max_lsn=n_events - 1,
            with_tool=True,
        )
        wall = time.time() - t0
        sizes = bytes_per_data_commit(pipe.table)
        t0 = time.time()
        final_rows = pipe.read_transcripts().count()
        read_s = time.time() - t0  # MOR pays its merge here — report it
        result[mode] = {
            "wall_s": round(wall, 2),
            "events_per_sec": round(res.events_applied / wall, 1),
            "bytes_per_batch": sizes,
            "bytes_first_batch": sizes[0],
            "bytes_last_batch": sizes[-1],
            "write_growth": round(sizes[-1] / max(1, sizes[0]), 2),
            "read_s": round(read_s, 2),
            "final_rows": final_rows,
        }
        shutil.rmtree(path, ignore_errors=True)
    assert result["cow"]["final_rows"] == result["mor"]["final_rows"]
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
