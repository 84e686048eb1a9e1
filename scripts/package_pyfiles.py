"""Build the ``--py-files`` artifact for spark-submit cluster runs.

The north rule requires the engine to run via ``spark-submit --py-files``
on a multi-executor cluster.  This packages ``uncharted_ta1_pipeline_spark``
into a deterministic zip (sorted entries, zeroed timestamps) so executors'
Python workers can import the package without a shared filesystem install.

Usage:
    python scripts/package_pyfiles.py            # writes dist/uncharted_ta1_pipeline_spark.zip
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "uncharted_ta1_pipeline_spark"
DIST = os.path.join(REPO, "dist")


def build_zip(out_path: str | None = None) -> str:
    """Zip the package's ``.py`` files; returns the artifact path.

    Deterministic: fixed entry order and timestamps, so repeated builds are
    byte-identical (stable cache key for ``spark.submit.pyFiles``).
    """
    out_path = out_path or os.path.join(DIST, f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, full in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    os.replace(tmp, out_path)
    return out_path


if __name__ == "__main__":
    print(build_zip())
