#!/bin/sh
# Package nabu_spark for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/nabu_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/nabu_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("nabu_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/nabu_spark.zip")
EOF
