#!/usr/bin/env bash
# Production-style submission (north_star: "submitted via spark-submit
# --py-files"): package the engine as a zip, ship it to the executors,
# run the benchmark job. On a real cluster, replace --master with
# yarn/k8s and add the Iceberg catalog confs.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${SPARK_GRAFT_CPUS:-8}"
ZIP="/tmp/osm2streets_spark.zip"

cd "$REPO"
rm -f "$ZIP"
python - <<PY
import zipfile, os
with zipfile.ZipFile("$ZIP", "w") as z:
    for root, _, files in os.walk("osm2streets_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged", "$ZIP")
PY

exec spark-submit \
  --master "local[$CPUS]" \
  --conf spark.sql.shuffle.partitions=$((CPUS * 2)) \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  "$REPO/bench.py"
