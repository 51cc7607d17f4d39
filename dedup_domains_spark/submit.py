"""spark-submit packaging — the north-rule deployment surface
("run via spark-submit --py-files on multi-executor clusters").

``make_pyfiles_zip`` builds the archive executors import the package from:

    python -m dedup_domains_spark.submit /tmp/dedup_domains_spark.zip
    spark-submit --py-files /tmp/dedup_domains_spark.zip \\
        --master <cluster> your_job.py

In-sandbox, ``session.get_spark`` reaches executors via
spark.executorEnv.PYTHONPATH instead (same effect, no archive); this module
is the real-cluster path and is exercised by tests/test_submit_zip.py, which
imports the package from the built zip alone.
"""

from __future__ import annotations

import os
import sys
import zipfile


def make_pyfiles_zip(out_path: str) -> str:
    """Zip the dedup_domains_spark package for spark-submit --py-files.
    Deterministic member order; returns out_path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    members = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                members.append((full, os.path.relpath(full, root)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, rel in members:
            z.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dedup_domains_spark.zip"
    print(make_pyfiles_zip(out))
