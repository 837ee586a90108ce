#!/usr/bin/env python
"""Build a spark-submit deployment package into ``dist/``.

Deployment-parity counterpart of the reference's runnable infra
(reference ``lib/glue-parquet-splitter-stack.ts:66-91``: a Glue job
wired to the script + pinned deps).  Here the deployable unit is the
standard Spark one:

    dist/
      glue_parquet_splitter_spark.zip   # --py-files code artifact
      submit_job.py                     # driver entry (thin: calls the CLI main)
      conf/local.properties             # engine tuning, safe everywhere
      conf/s3a-cluster.properties       # + S3A profile + zero-rename committer
      submit.sh                         # the spark-submit invocation

Usage: python scripts/build_submit_package.py [dist_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBMIT_JOB = '''\
"""spark-submit driver entry for the incremental split pipeline.

The code arrives via --py-files (glue_parquet_splitter_spark.zip);
arguments are the reference's Glue-style --NAME value pairs:

    spark-submit --py-files glue_parquet_splitter_spark.zip submit_job.py \\
        --KIND daily --IN_DIR s3a://bucket/input \\
        --OUT_DIR s3a://bucket/output --MARKER_DIR s3a://bucket/markers \\
        [--KEY item_id] [--EXACT_LAYOUT 1] [--MANIFEST outputs|counts] \\
        [--REPROCESS_CHANGED 0|1]
"""

from glue_parquet_splitter_spark.__main__ import main

if __name__ == "__main__":
    main()
'''

SUBMIT_SH = '''\
#!/usr/bin/env bash
# Submit the incremental split pipeline.
#
#   ./submit.sh <IN_DIR> <OUT_DIR> <MARKER_DIR> [extra spark-submit args...]
#
# Env:
#   SPARK_SUBMIT   spark-submit binary            (default: spark-submit)
#   MASTER         --master value                 (default: cluster default)
#   PROFILE        conf/<PROFILE>.properties      (default: s3a-cluster; use
#                  "local" on pip-installed pyspark — see DEPLOY.md on why
#                  the committer binding must not be configured there)
set -euo pipefail
DIST="$(cd "$(dirname "$0")" && pwd)"
IN_DIR="${1:?usage: submit.sh IN_DIR OUT_DIR MARKER_DIR}"; shift
OUT_DIR="${1:?usage: submit.sh IN_DIR OUT_DIR MARKER_DIR}"; shift
MARKER_DIR="${1:?usage: submit.sh IN_DIR OUT_DIR MARKER_DIR}"; shift
: "${SPARK_SUBMIT:=spark-submit}"
: "${PROFILE:=s3a-cluster}"
MASTER_ARGS=()
if [[ -n "${MASTER:-}" ]]; then MASTER_ARGS=(--master "$MASTER"); fi
exec "$SPARK_SUBMIT" \\
  "${MASTER_ARGS[@]}" \\
  --properties-file "$DIST/conf/$PROFILE.properties" \\
  --py-files "$DIST/glue_parquet_splitter_spark.zip" \\
  "$@" \\
  "$DIST/submit_job.py" \\
  --IN_DIR "$IN_DIR" --OUT_DIR "$OUT_DIR" --MARKER_DIR "$MARKER_DIR"
'''


def _properties(confs: dict[str, str]) -> str:
    lines = [f"{k} {v}" for k, v in sorted(confs.items())]
    return "\n".join(lines) + "\n"


def build(dist: str) -> dict[str, str]:
    from glue_parquet_splitter_spark.cloud import s3a_profile
    from glue_parquet_splitter_spark.session import _RUNTIME_CONFS

    pkg_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "glue_parquet_splitter_spark")
    os.makedirs(os.path.join(dist, "conf"), exist_ok=True)

    zpath = os.path.join(dist, "glue_parquet_splitter_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)

    # engine tuning that is safe on every distribution; the cluster
    # profile layers the S3A tuning and the zero-rename committer
    # binding on top (requires spark-hadoop-cloud: EMR/Dataproc/
    # Databricks/-Phadoop-cloud builds — NOT pip pyspark, where the
    # binding wedges session init; cloud.py docstring has the details)
    base = dict(_RUNTIME_CONFS)
    base.pop("spark.sql.files.maxPartitionBytes", None)  # local-fixture knob
    cluster = {**base, **s3a_profile(committer_binding=True),
               "spark.sql.files.maxPartitionBytes": "134217728"}
    local = {**base,
             **{k: v for k, v in s3a_profile(committer_binding=False).items()}}

    paths = {
        "zip": zpath,
        "submit_job": os.path.join(dist, "submit_job.py"),
        "submit_sh": os.path.join(dist, "submit.sh"),
        "local_conf": os.path.join(dist, "conf", "local.properties"),
        "cluster_conf": os.path.join(dist, "conf", "s3a-cluster.properties"),
    }
    with open(paths["submit_job"], "w") as f:
        f.write(SUBMIT_JOB)
    with open(paths["submit_sh"], "w") as f:
        f.write(SUBMIT_SH)
    os.chmod(paths["submit_sh"], 0o755)
    with open(paths["local_conf"], "w") as f:
        f.write(_properties(local))
    with open(paths["cluster_conf"], "w") as f:
        f.write(_properties(cluster))
    return paths


if __name__ == "__main__":
    dist = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "dist")
    paths = build(dist)
    for name, p in paths.items():
        print(f"{name:12s} {p}")
