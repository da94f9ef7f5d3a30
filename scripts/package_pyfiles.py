"""Build dist/gliner_spark.zip for ``spark-submit --py-files``.

Usage: python scripts/package_pyfiles.py [outdir]
Prints the zip path. Pure-stdlib so it runs anywhere the repo does.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(outdir: str | None = None) -> str:
    outdir = outdir or os.path.join(REPO, "dist")
    os.makedirs(outdir, exist_ok=True)
    zip_path = os.path.join(outdir, "gliner_spark.zip")
    pkg = os.path.join(REPO, "gliner_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return zip_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
