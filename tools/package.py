"""Build the spark-submit distribution: dist/ocr_platform_spark.zip
(--py-files payload) + dist/run_extract.py (the job script).

Usage: python tools/package.py [dist_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_EXTRACT = """\
# spark-submit job script; all logic lives in the --py-files zip.
from ocr_platform_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
"""


def build(dist_dir: str) -> tuple[str, str]:
    os.makedirs(dist_dir, exist_ok=True)
    zpath = os.path.join(dist_dir, "ocr_platform_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "ocr_platform_spark")
        for root, _dirs, files in sorted(os.walk(pkg)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    script = os.path.join(dist_dir, "run_extract.py")
    with open(script, "w") as f:
        f.write(RUN_EXTRACT)
    return zpath, script


if __name__ == "__main__":
    dist = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    z, s = build(dist)
    print(z)
    print(s)
