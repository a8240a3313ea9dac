"""Build dist/mapshaper_spark.zip for spark-submit --py-files.

Usage: python tools/package_pyfiles.py
Then:  spark-submit --master <cluster> \
           --py-files dist/mapshaper_spark.zip \
           jobs/flagship_job.py --images 1000000000 --checkpoint /tmp/ckpt
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "mapshaper_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "mapshaper_spark")
        for base, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(base, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
