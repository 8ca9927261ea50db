#!/usr/bin/env bash
# Package the pipeline modules for spark-submit --py-files
# (BASELINE.json north_star run mode).
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-/tmp/pipeline.zip}"
rm -f "$out"
zip -qr "$out" rosette_elasticsearch_plugin_spark -x '*__pycache__*'
echo "$out"
