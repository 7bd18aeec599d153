#!/bin/sh
# Package the library for spark-submit --py-files (north_rule deployment).
# Usage: jobs/package.sh [outfile]
set -e
OUT="${1:-ocr_auto_label_spark.zip}"
cd "$(dirname "$0")/.."
rm -f "$OUT"
zip -qr "$OUT" ocr_auto_label_spark -x '*__pycache__*'
echo "wrote $OUT"
echo "submit with: spark-submit --py-files $OUT jobs/run_extraction.py ..."
