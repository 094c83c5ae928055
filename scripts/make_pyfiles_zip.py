#!/usr/bin/env python
"""Package gotrackmaster_spark into a --py-files zip for spark-submit."""

from __future__ import annotations

import os
import sys
import zipfile


def make_zip(out_path: str) -> str:
    pkg_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "gotrackmaster_spark")
    with zipfile.ZipFile(out_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gotrackmaster_spark.zip"
    print(make_zip(out))
