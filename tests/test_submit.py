"""Deployment-contract test: the engine runs via spark-submit --py-files on
a multi-executor cluster (local-cluster — separate executor JVMs under a
real cluster manager), with the package shipped ONLY as a zip.  The job runs
from a scratch cwd, so the import genuinely resolves from --py-files."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_spark_submit_py_files_multi_executor(tmp_path):
    zip_path = tmp_path / "wikipath_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in sorted((ROOT / "wikipath_spark").rglob("*.py")):
            z.write(p, p.relative_to(ROOT))

    submit = shutil.which("spark-submit")
    assert submit, "spark-submit not on PATH"
    out = subprocess.run(
        [
            submit,
            "--master", "local-cluster[2,2,1024]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zip_path),
            str(ROOT / "scripts" / "pagerank_job.py"),
            "20000", "200000",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # engine NOT importable from here except via the zip
        env={**os.environ, "PYTHONPATH": ""},
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("JOB_RESULT ")]
    assert lines, f"no JOB_RESULT\nstdout: {out.stdout[-1500:]}\nstderr: {out.stderr[-1500:]}"
    res = json.loads(lines[0][len("JOB_RESULT "):])
    assert res["master"] == "local-cluster[2,2,1024]"
    assert res["converged"] and res["iterations"] > 1
    assert abs(res["rank_sum"] - 1.0) < 1e-9
