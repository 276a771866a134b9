#!/bin/sh
# Package kgspark for spark-submit --py-files (pure-Python, no deps to
# vendor: pyspark/pandas/numpy/pyarrow come from the cluster runtime).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kgspark.zip
zip -qr dist/kgspark.zip kgspark -x "kgspark/__pycache__/*" -x "*/__pycache__/*"
echo "dist/kgspark.zip:"
unzip -l dist/kgspark.zip | tail -3
