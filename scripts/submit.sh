#!/usr/bin/env bash
# Package the engine and launch the validation job via spark-submit
# --py-files (north_star launch mode). Usage:
#   scripts/submit.sh <input-table-path> <checkpoint-dir> [extra args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="${1:?input table path}"; CKPT="${2:?checkpoint dir}"; shift 2 || true
ZIP="/tmp/medea_ps_spark.zip"
( cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" medea_ps_spark -x '*__pycache__*' )
exec spark-submit \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-12g}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.parquet.columnarReaderBatchSize=1024 \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE_PARTITIONS:-32}" \
  --py-files "$ZIP" \
  "$REPO/medea_ps_spark/jobs/validate_job.py" \
  --input "$INPUT" --checkpoint "$CKPT" "$@"
