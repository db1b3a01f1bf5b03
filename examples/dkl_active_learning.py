"""Deep-kernel-learning GP for autonomous experiments (reference README
'Deep kernel learning' example): fit -> thompson -> measure -> refit loop.

Run:  python examples/dkl_active_learning.py
      AOI_SMOKE=1 python examples/dkl_active_learning.py   (CI gate)
"""

import os

import numpy as np

import atomai_tpu as aoi

# CI smoke tier: fewer active-learning rounds/cycles, runnability only
SMOKE = bool(int(os.environ.get("AOI_SMOKE", "0")))
ROUNDS, CYCLES = (2, 10) if SMOKE else (5, 50)


def measure(X_row):
    """Stand-in for a real measurement (e.g. a spectroscopy acquisition)."""
    w = np.sin(np.arange(X_row.shape[-1]))
    return float(X_row @ w)


def main():
    rng = np.random.RandomState(0)
    X_all = rng.randn(500, 16).astype(np.float32)  # candidate pool
    # initial random measurements
    idx_seen = list(rng.choice(500, 20, replace=False))
    y_seen = [measure(X_all[i]) for i in idx_seen]

    for step in range(ROUNDS):
        dklgp = aoi.models.dklGPR(16, embedim=2)
        dklgp.fit(np.asarray(X_all[idx_seen]),
                  np.asarray(y_seen, np.float32),
                  training_cycles=CYCLES, print_loss=CYCLES)
        # Thompson sampling over the unmeasured candidates
        cand = [i for i in range(500) if i not in idx_seen]
        _, next_i = dklgp.thompson(X_all[cand])
        pick = cand[int(next_i[0])]
        idx_seen.append(pick)
        y_seen.append(measure(X_all[pick]))
        print(f"step {step}: measured candidate {pick}, "
              f"value {y_seen[-1]:.3f}")

    mean, var = dklgp.predict(X_all[:50])
    print("posterior mean/var:", mean.shape, var.shape)


if __name__ == "__main__":
    main()
