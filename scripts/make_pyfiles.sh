#!/bin/sh
# Package searchlite_spark for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/searchlite_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/searchlite_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("searchlite_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/searchlite_spark.zip written")
EOF
