#!/usr/bin/env bash
# Package the engine and run the resolve job via spark-submit --py-files
# (north rule). Local-mode demonstration; on a cluster swap --master.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/t_res_spark.zip
rm -f "$ZIP"
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('t_res_spark'):
        if '__pycache__' in root: continue
        for f in files:
            if f.endswith('.py'):
                z.write(os.path.join(root, f))
"

TRANSCRIPTS=${1:-data/tiny/transcripts.parquet}
ALIASES=${2:-data/tiny/aliases.parquet}
OUT=${3:-/tmp/tres_out}

exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  t_res_spark/jobs/resolve_job.py \
  --transcripts "$TRANSCRIPTS" \
  --aliases "$ALIASES" \
  --checkpoint-dir /tmp/tres_ckpt \
  --output "$OUT"
