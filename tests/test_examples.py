"""Smoke-run every example script (the reference's examples-as-integration-
tests strategy, SURVEY §4.3): each must exit 0 on the CPU backend from any
working directory and print its metrics without crashing."""

import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
SCRIPTS = sorted(
    f for f in os.listdir(EXAMPLES_DIR) if f.endswith(".py") and not f.startswith("_")
)


@pytest.mark.parametrize("script", SCRIPTS)
def test_example_runs(script, tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # examples don't need the 8-device mesh
    res = subprocess.run(
        [sys.executable, script, "--cpu"],
        cwd=EXAMPLES_DIR,  # deliberately NOT the repo root: scripts must
        capture_output=True,  # locate the package from their own path
        text=True,
        timeout=280,
        env=env,
    )
    assert res.returncode == 0, f"{script} failed:\n{res.stderr[-2000:]}"
