#!/usr/bin/env python
"""Build dist/datacube_core_spark.zip for spark-submit --py-files, plus a
thin run_job.py launcher next to it."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "datacube_core_spark")
DIST = os.path.join(REPO, "dist")

RUN_JOB = '''#!/usr/bin/env python
"""Launcher shipped beside the --py-files zip."""
from datacube_core_spark.__main__ import main

if __name__ == "__main__":
    raise SystemExit(main())
'''


def main() -> None:
    os.makedirs(DIST, exist_ok=True)
    zpath = os.path.join(DIST, "datacube_core_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    with open(os.path.join(DIST, "run_job.py"), "w") as f:
        f.write(RUN_JOB)
    print(zpath)


if __name__ == "__main__":
    main()
