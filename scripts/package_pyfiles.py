#!/usr/bin/env python
"""Build webcrawler_spark.zip for spark-submit --py-files.

The north-rule deployment shape ships the package to executors as a zip:

    python scripts/package_pyfiles.py /tmp/webcrawler_spark.zip
    spark-submit --py-files /tmp/webcrawler_spark.zip scripts/run_crawl.py ...

Only .py sources are included (no tests, no caches); the zip root contains
the ``webcrawler_spark/`` package directory so executors can import it
directly off the PYTHONPATH entry Spark adds for --py-files archives.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_path: str) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "webcrawler_spark")
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, repo)
                z.write(full, rel)
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "webcrawler_spark.zip"
    n = build(out)
    print(f"{out}: {n} files")
