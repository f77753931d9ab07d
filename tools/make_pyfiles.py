"""Build the --py-files artifact: dist/ocr_spark.zip.

The north rule's launch form is ``spark-submit --py-files ocr_spark.zip
jobs/<job>.py ...`` — the zip is the ONLY way executors (and, in client
mode, the driver) see the package on a real cluster, so it must contain
exactly the importable package and nothing else (no tests, no fixtures,
no caches). Deterministic: entries are sorted and timestamps zeroed, so
the artifact hash is stable for a given tree (a cluster redeploy can
skip shipping an unchanged zip).

Usage: python tools/make_pyfiles.py [--out dist/ocr_spark.zip]
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    """Zip ocr_spark/ into ``out_path`` (default dist/ocr_spark.zip);
    returns the absolute path."""
    out_path = out_path or os.path.join(REPO, "dist", "ocr_spark.zip")
    out_path = os.path.abspath(out_path)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "ocr_spark")
    entries = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            full = os.path.join(root, f)
            arc = os.path.relpath(full, REPO)
            entries.append((arc, full))
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in sorted(entries):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    os.replace(tmp, out_path)  # atomic: a concurrent launch never sees a torn zip
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    path = build_zip(args.out)
    print(path, os.path.getsize(path), "bytes")


if __name__ == "__main__":
    main()
