"""Deployment-shape smoke: spark-submit --py-files actually works.

The north rule's cluster invocation — package the engine as a zip,
ship it via --py-files, run the job with no repo checkout available —
executed for real against a local master. Slowest test in the suite
(fresh JVM + session), but it is the only proof that the package has
no hidden repo-relative imports.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_smoke(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from package import build_zip
    finally:
        sys.path.remove(os.path.join(REPO, "tools"))
    zip_path = build_zip(str(tmp_path / "ocr_agent_spark.zip"))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
        ],
        capture_output=True, text=True, timeout=280,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    assert result["ok"] is True
    assert result["status_counts"]["completed"] > 0
