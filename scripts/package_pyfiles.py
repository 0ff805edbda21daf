"""Build engine.zip for `spark-submit --py-files engine.zip
jobs/run_pipeline.py ...` (the north_rule launch shape): the package
tree, minus caches, importable from the zip root on every executor.

    python scripts/package_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "entity_resolution_engine_spark"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "engine.zip")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, REPO))
                    n += 1
    print(f"{out}: {n} files")


if __name__ == "__main__":
    main()
