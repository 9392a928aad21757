"""The north rule's launch mode — `spark-submit --py-files` — exercised
through the real spark-submit binary via tools/submit.sh (the scaling
harness ships the package with addPyFile; this covers the actual CLI
path a cluster deployment uses)."""

import os
import shutil
import subprocess

import pytest


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit binary")
def test_submit_sh_runs_flagship():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        ["bash", os.path.join(repo, "tools", "submit.sh"), "__spark_entry__.py"],
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "entry rows: 500" in r.stdout
