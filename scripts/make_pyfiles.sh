#!/usr/bin/env bash
# Package the engine for cluster deploy:
#   spark-submit --py-files dist/mario_spark.zip your_job.py
# or the CLI itself:
#   spark-submit --py-files dist/mario_spark.zip -m mario_spark.cli ingest ...
# Pure-Python package, no JVM extensions — the whole deploy artifact is
# this one zip (BASELINE.json: "deploys via spark-submit --py-files").
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/mario_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/mario_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("mario_spark/**/*.py")):
        z.write(p, p.as_posix())
print("dist/mario_spark.zip:", len(z.namelist()), "files")
EOF
