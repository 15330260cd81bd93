#!/usr/bin/env python
"""Build dist/engine.zip for spark-submit --py-files.

Zips the ``bioanalyzer_backend_spark`` package (source only, no caches)
so executors can import it; model artifacts ship separately via
``--files artifacts/langid.npz,artifacts/lm.npz``.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "bioanalyzer_backend_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build())
