#!/usr/bin/env python
"""Does weight-init distribution explain the ImSpec converged-MSE gap?

Context (round 4): scripts/measure_imspec_parity.py found our 3-seed
median held-out MSE 0.0356 vs the reference's 0.0123. The reference's
trained result is effectively seed-pinned — `BaseTrainer.__init__` calls
`set_train_rng(1)` before the net is built (`trainer.py:68-69`), so its
init weights are one fixed draw from torch's DEFAULT module init
(kaiming_uniform(a=sqrt(5)) kernels + uniform biases); our Flax nets
draw genuinely per-seed from lecun_normal + zero biases.

This experiment sweeps 8 seeds under both init families
(AOI_TORCH_INIT gate in nets/blocks.py) and reports the per-family
median/min/max held-out MSE. If the torch-init family's distribution
matches the reference draw, the "gap" is init distribution, not
training dynamics.

Run:  python scripts/imspec_init_experiment.py
"""

import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(root)r)
import numpy as np
sys.path.insert(0, os.path.join(%(root)r, "scripts"))
from measure_imspec_parity import split, score, CYCLES, BATCH

import atomai_tpu as aoi
from atomai_tpu.core.dtypes import enable_compilation_cache
enable_compilation_cache("/tmp/atomai_tpu_xla_cache")

Xtr, ytr, Xts, yts = split()
seed = int(sys.argv[1])
m = aoi.models.ImSpec((16, 16), (32,), latent_dim=10, seed=seed)
m.fit(Xtr, ytr, Xts, yts, training_cycles=CYCLES, batch_size=BATCH,
      print_loss=CYCLES, filename="/tmp/imspec_init_exp")
mse, corr = score(m.predict(Xts, verbose=False), yts)
tl = float(np.asarray(m.loss_acc["train_loss"])[-1])
vl = float(np.asarray(m.loss_acc["test_loss"])[-1])
print("RESULT", mse, corr, tl, vl)
"""


def run_one(seed, torch_init):
    env = dict(os.environ)
    # torch init is the DEFAULT since this experiment decided it;
    # the flax arm must opt out explicitly
    env["AOI_TORCH_INIT"] = "1" if torch_init else "0"
    r = subprocess.run([sys.executable, "-c", CHILD % {"root": ROOT},
                        str(seed)], capture_output=True, text=True,
                       timeout=1200, env=env)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            vals = [float(v) for v in line.split()[1:]]
            return dict(zip(("mse", "corr", "train_loss", "test_loss"),
                            vals))
    raise RuntimeError(f"seed {seed} torch_init={torch_init} failed:\n"
                       f"{r.stdout[-1500:]}\n{r.stderr[-1500:]}")


def main():
    seeds = list(range(1, 9))
    out = {}
    for fam, torch_init in (("flax_default", False), ("torch_default",
                                                      True)):
        rows = []
        for s in seeds:
            r = run_one(s, torch_init)
            print(f"{fam} seed {s}: MSE {r['mse']:.5f} corr "
                  f"{r['corr']:.4f} train {r['train_loss']:.4f} "
                  f"test {r['test_loss']:.4f}", flush=True)
            rows.append(r)
        mses = [r["mse"] for r in rows]
        out[fam] = {"per_seed": rows, "seeds": seeds,
                    "median_mse": float(np.median(mses)),
                    "min_mse": float(np.min(mses)),
                    "max_mse": float(np.max(mses))}
        print(f"{fam}: median {out[fam]['median_mse']:.5f} "
              f"range [{out[fam]['min_mse']:.5f}, "
              f"{out[fam]['max_mse']:.5f}]", flush=True)
    path = os.path.join(ROOT, "scripts", "imspec_init_experiment.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
