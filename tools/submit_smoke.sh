#!/usr/bin/env bash
# North-rule launch-shape evidence: package pprl_spark as a --py-files zip
# and run a shipped job via spark-submit, with the job file copied OUT of
# the repo so the package can only resolve from the zip (the mechanism a
# multi-executor cluster uses to ship code to executors).
#
#   bash tools/submit_smoke.sh [docs_parquet] [master]
set -euo pipefail
cd "$(dirname "$0")/.."
DOCS="${1:-/root/testdata/sf0.001/documents.parquet}"
MASTER="${2:-local[8]}"
WORK="$(mktemp -d /tmp/pprl_submit.XXXXXX)"

python - "$WORK" <<'EOF'
import os, sys, zipfile
work = sys.argv[1]
with zipfile.ZipFile(os.path.join(work, "pprl_spark.zip"), "w") as z:
    for root, dirs, files in os.walk("pprl_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f), os.path.join(root, f))
EOF
cp jobs/dedup_job.py "$WORK/"

cd "$WORK"
spark-submit --master "$MASTER" --py-files pprl_spark.zip \
    dedup_job.py --docs "$DOCS" --workdir "$WORK/wd"
echo "submit smoke OK (workdir: $WORK)"
