#!/usr/bin/env python
"""rVAE quality-gap experiment (round 5).

The first round-5 parity measurement showed ours at elbo -8.70 /
angle_corr 0.86 vs reference torch-CPU -7.99 / 0.96 on the
`measure_rvae_parity` protocol. Two candidate factors, measured
head-to-head here (each config in its OWN subprocess so the precision
policy env is resolved fresh):

- model-seed variance (ours single-seeded vs the reference's fully
  pinned RNG): seeds 0/1/2 under the default policy;
- the bf16 hidden-layer policy (round-3 +17% throughput win): seed 0
  with ATOMAI_TPU_PRECISION=float32.

Usage: python scripts/rvae_quality_experiment.py
Writes scripts/rvae_quality_experiment.json.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

SNIPPET = """
import json, sys, time
sys.path.insert(0, {root!r})
sys.path.insert(0, {here!r})
from measure_rvae_parity import make_data, _quality, SIZE, BATCH, \\
    ROT_PRIOR, EPOCHS
import atomai_tpu as aoi
from atomai_tpu.core.dtypes import enable_compilation_cache
enable_compilation_cache("/tmp/atomai_tpu_xla_cache")
Xtr, Xts, _, th_ts = make_data()
m = aoi.models.rVAE((SIZE, SIZE), latent_dim=2, seed={seed})
t0 = time.time()
m.fit(Xtr, None, Xts, training_cycles=EPOCHS, batch_size=BATCH,
      rotation_prior=ROT_PRIOR, verbose=False,
      filename="/tmp/rvae_qexp_{tag}")
q = _quality(m, Xts, th_ts, m.loss_history["test_loss"])
q["fit_s"] = round(time.time() - t0, 1)
print("RESULT " + json.dumps(q))
"""


def run_config(tag: str, seed: int, precision: str = "") -> dict:
    env = dict(os.environ)
    if precision:
        env["ATOMAI_TPU_PRECISION"] = precision
    else:
        env.pop("ATOMAI_TPU_PRECISION", None)
    code = SNIPPET.format(root=ROOT, here=HERE, seed=seed, tag=tag)
    r = subprocess.run([sys.executable, "-u", "-c", code], env=env,
                       capture_output=True, text=True, timeout=1800)
    out = {"tag": tag, "seed": seed, "precision": precision or "default"}
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            out.update(json.loads(line[len("RESULT "):]))
            break
    else:
        out["error"] = (r.stdout[-500:] + r.stderr[-800:])
    print(json.dumps(out))
    return out


def main():
    results = [
        run_config("s0", 0),
        run_config("s1", 1),
        run_config("s2", 2),
        run_config("s3", 3),
        run_config("s4", 4),
        run_config("s0f32", 0, precision="float32"),
    ]
    out = os.path.join(HERE, "rvae_quality_experiment.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
