"""Build dist/polardbx_tools_spark.zip for `spark-submit --py-files`.

Deployment (north rule): the engine ships as one zip of the package plus
a job script, e.g.::

    python tools/build_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/polardbx_tools_spark.zip \
        tools/run_ingest.py --changelog s3a://bucket/changelog \
        --table s3a://bucket/lake/transcripts --batch-lsns 50000000
"""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "polardbx_tools_spark.zip")
    pkg = os.path.join(ROOT, "polardbx_tools_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
