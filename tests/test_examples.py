"""Smoke-run every example script, mirroring the reference CI's
examples job (reference .github/workflows/ci.yml:62-79 runs each
``examples/*.py`` and fails on a non-zero exit)."""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, "examples", "*.py")))
# beir_eval needs a downloaded BEIR dataset dir argument; skip in smoke.
SKIP = {"beir_eval.py"}


@pytest.mark.parametrize(
    "path", [p for p in EXAMPLES if os.path.basename(p) not in SKIP],
    ids=lambda p: os.path.basename(p),
)
def test_example_runs(path):
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, path],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{os.path.basename(path)} failed\n--- stdout ---\n{proc.stdout[-3000:]}"
        f"\n--- stderr ---\n{proc.stderr[-3000:]}"
    )
    assert proc.stdout.strip(), "example produced no output"
