"""north_rule deployment path: package the library and run the flagship
job via ``spark-submit --py-files`` as a real subprocess."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files_roundtrip(tmp_path):
    zip_path = str(tmp_path / "lib.zip")
    subprocess.run(
        ["sh", "jobs/package.sh", zip_path], cwd=REPO, check=True,
        capture_output=True,
    )
    assert os.path.getsize(zip_path) > 10_000
    out = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
            "jobs/run_extraction.py",
            "--gen-turns", "1500",
            "--output", str(tmp_path / "out"),
            "--lineage", str(tmp_path / "lin"),
            "--run-id", "submit-test", "--n-buckets", "4", "--wave-size", "4",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=240,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["rows_out"] == 1500
    assert summary["buckets_processed"] == 4
