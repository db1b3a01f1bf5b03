"""API-reference coverage gate (VERDICT r2 item #8): docs/API.md must
exist, regenerate cleanly, and cover every public class of the user-facing
packages."""

import importlib
import inspect
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PUBLIC_PACKAGES = ["atomai_tpu.models", "atomai_tpu.trainers",
                   "atomai_tpu.predictors", "atomai_tpu.nets",
                   "atomai_tpu.stat", "atomai_tpu.transforms"]


def test_api_reference_generates(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "docs",
                                      "gen_api_reference.py")],
        capture_output=True, text=True, cwd=ROOT,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]


def test_api_reference_covers_public_classes():
    api = open(os.path.join(ROOT, "docs", "API.md")).read()
    missing = []
    for pkg in PUBLIC_PACKAGES:
        mod = importlib.import_module(pkg)
        names = getattr(mod, "__all__", None) or [
            n for n in vars(mod) if not n.startswith("_")]
        for n in names:
            obj = getattr(mod, n, None)
            if inspect.isclass(obj) and f"`{n}(" not in api \
                    and f"`{n}`" not in api:
                missing.append(f"{pkg}.{n}")
    assert not missing, f"public classes absent from docs/API.md: {missing}"
