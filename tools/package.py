"""Build the --py-files artifact: zip of the ocr_agent_spark package.

North-rule deployment shape: ``spark-submit --py-files
_build/ocr_agent_spark.zip <job.py>`` on a multi-executor cluster.
``tools/submit_job.py`` is a smoke job runnable exactly that way.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "_build", "ocr_agent_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "ocr_agent_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build_zip())
