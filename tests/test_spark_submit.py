"""The north-rule production contract, tested literally: the flagship
pipeline under `spark-submit --py-files <zip>`, with the package shipped
ONLY through the zip (job script copied to a foreign cwd so repo-root
imports cannot leak in), then resumed across separate OS processes."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(dst: str) -> None:
    pkg = os.path.join(REPO, "tree_sitter_codeviews_spark")
    with zipfile.ZipFile(dst, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))


def _submit(script: str, zip_path: str, ckpt: str, cwd: str) -> str:
    out = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[8]",
            "--conf", "spark.sql.shuffle.partitions=16",
            "--py-files", zip_path, script,
            "--sf-dir", "/root/testdata/sf0.001",
            "--checkpoint-root", ckpt, "--job-id", "submit_e2e",
        ],
        cwd=cwd, capture_output=True, text=True, timeout=420,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_pipeline_under_spark_submit_with_pyfiles_and_resume(tmp_path):
    zip_path = str(tmp_path / "tscv_spark.zip")
    _zip_package(zip_path)
    script = str(tmp_path / "rp.py")
    shutil.copy(os.path.join(REPO, "jobs", "run_pipeline.py"), script)
    ckpt = str(tmp_path / "ckpt")

    out1 = _submit(script, zip_path, ckpt, cwd=str(tmp_path))
    assert "pages=500" in out1 and "dedup_groups=500" in out1
    assert "'pages'" in out1  # stages actually computed

    out2 = _submit(script, zip_path, ckpt, cwd=str(tmp_path))
    assert "<none — full resume>" in out2, out2[-500:]
