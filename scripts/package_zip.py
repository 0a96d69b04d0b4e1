"""Build the spark-submit deployment artifact: dist/linkgraph.zip.

The north rule's deployment shape is
``spark-submit --py-files linkgraph.zip job.py``; this script produces
that zip. Entries are added in sorted order with zeroed timestamps so
the artifact is byte-deterministic for a given tree (same input →
same zip → same cluster-wide file hash, which keeps executor-side
py-files caches coherent across resubmissions).

Usage: python scripts/package_zip.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> str:
    pkg_root = os.path.join(REPO, "linkgraph")
    members = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                members.append((full, arc))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "linkgraph.zip")
    print(build_zip(out))
