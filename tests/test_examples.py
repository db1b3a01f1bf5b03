"""Example scripts stay runnable (CI-light mode).

Every example self-limits to tiny shapes/cycles when run directly. The
default gate executes the fastest one end-to-end; set
``AOI_RUN_ALL_EXAMPLES=1`` to sweep the full set (minutes on CPU —
training examples compile real models)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(ROOT, "examples")

FAST = ["graph_analysis_notebook.py"]
ALL = sorted(f for f in os.listdir(EXAMPLES) if f.endswith(".py"))


def _run(name):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=ROOT + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    r = subprocess.run([sys.executable, os.path.join(EXAMPLES, name)],
                       capture_output=True, text=True, timeout=900,
                       env=env, cwd="/tmp")
    assert r.returncode == 0, \
        f"{name} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"


@pytest.mark.parametrize("name", FAST)
def test_fast_example_runs(name):
    _run(name)


@pytest.mark.skipif(not os.environ.get("AOI_RUN_ALL_EXAMPLES"),
                    reason="set AOI_RUN_ALL_EXAMPLES=1 for the full sweep")
@pytest.mark.parametrize("name", [n for n in ALL if n not in FAST])
def test_example_runs(name):
    _run(name)
