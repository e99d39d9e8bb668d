"""Build dist/linkgraph.zip for spark-submit --py-files.

The reference ships binaries to the cluster via sbatch
(/root/reference/pr_submit.sh); our deployment unit is a zip of the pure-
Python package, passed as --py-files so every executor's Python worker can
import linkgraph.* without a shared filesystem install.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "linkgraph.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "linkgraph")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build_zip())
