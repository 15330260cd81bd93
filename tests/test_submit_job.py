"""North-rule packaging test: the engine runs via spark-submit --py-files
with model artifacts shipped through --files/SparkFiles, and resumes
exactly from its checkpoint table on re-run."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _run_job(warehouse: str) -> dict:
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--py-files", os.path.join(REPO, "dist", "engine.zip"),
           "--files", os.path.join(REPO, "artifacts", "langid.npz") + ","
           + os.path.join(REPO, "artifacts", "lm.npz"),
           os.path.join(REPO, "jobs", "quality_filter.py"),
           "--synth", "500", "--warehouse", warehouse, "--n-groups", "2"]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_and_resume(tmp_path):
    sys.path.insert(0, REPO)
    from scripts.build_dist import build
    zip_path = build()
    assert os.path.exists(zip_path)

    wh = str(tmp_path / "wh")
    first = _run_job(wh)
    assert first["groups_done"] == 2
    assert first["newly_committed"] == 2
    assert first["rows_total"] > 0
    assert 0 < first["rows_kept"] <= first["rows_total"]

    second = _run_job(wh)
    assert second["newly_committed"] == 0          # exact resume
    assert second["rows_total"] == first["rows_total"]
