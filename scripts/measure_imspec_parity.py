#!/usr/bin/env python
"""Trained-quality parity for ImSpec: reference (torch CPU) vs atomai_tpu.

Complements the segmentation IoU parity measurement
(scripts/measure_iou_parity.py) with a second model family: both
frameworks train an im2spec model on the same deterministic paired data
and are scored with one neutral numpy metric — held-out spectrum MSE and
peak-position correlation.

Protocol (round 4, 2026-08-18):
- data: seeded synthetic (image with a Gaussian blob at position x/width
  w) -> (spectrum with a peak at center ~ x, width ~ w) pairs — the same
  generator as examples/imspec_notebook.py. 512 pairs, 16x16 images,
  32-point spectra, 448 train / 64 held-out.
- both frameworks: ImSpec(latent_dim=10, default encoder/decoder
  widths), 1000 training cycles (default 1-random-minibatch mode),
  batch 32, no augmentation.
- reference runs on torch CPU via the tests/_refshim import stubs (the
  same approach as every other reference baseline in this container).

Run:  python scripts/measure_imspec_parity.py [ref|ours|both]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N, IN_DIM, OUT_DIM = 512, (16, 16), (32,)
N_TEST = 64
CYCLES = 1000
BATCH = 32


def make_paired_data(n=N, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[:IN_DIM[0], :IN_DIM[1]]
    e = np.linspace(0, 1, OUT_DIM[0])
    pos = rng.uniform(4, 12, size=(n, 2))
    width = rng.uniform(1.2, 3.0, size=n)
    imgs = np.exp(-((yy - pos[:, 0, None, None]) ** 2 +
                    (xx - pos[:, 1, None, None]) ** 2) /
                  (2 * width[:, None, None] ** 2))
    imgs += 0.05 * rng.randn(*imgs.shape)
    centers = pos[:, 1] / IN_DIM[1]
    widths = width / 20.0
    spectra = np.exp(-0.5 * ((e[None] - centers[:, None]) /
                             widths[:, None]) ** 2)
    spectra += 0.02 * rng.randn(*spectra.shape)
    return imgs.astype(np.float32), spectra.astype(np.float32)


def split():
    X, y = make_paired_data()
    return X[:-N_TEST], y[:-N_TEST], X[-N_TEST:], y[-N_TEST:]


def score(pred, true):
    mse = float(np.mean((np.asarray(pred) - true) ** 2))
    corr = float(np.corrcoef(np.asarray(pred).argmax(-1),
                             true.argmax(-1))[0, 1])
    return mse, corr


SEEDS = (1, 2, 5)  # converged MSE varies ~5x across seeds on this tiny
# config (measured), so parity is judged on per-seed medians, not a
# single draw


def measure_ours():
    import atomai_tpu as aoi
    from atomai_tpu.core.dtypes import enable_compilation_cache
    enable_compilation_cache("/tmp/atomai_tpu_xla_cache")
    Xtr, ytr, Xts, yts = split()
    mses, corrs = [], []
    for seed in SEEDS:
        m = aoi.models.ImSpec(IN_DIM, OUT_DIM, latent_dim=10, seed=seed)
        t0 = time.time()
        m.fit(Xtr, ytr, Xts, yts, training_cycles=CYCLES,
              batch_size=BATCH, print_loss=CYCLES,
              filename="/tmp/imspec_parity_ours")
        t_fit = time.time() - t0
        mse, corr = score(m.predict(Xts, verbose=False), yts)
        print(f"OURS  (TPU) seed {seed}: held-out MSE {mse:.5f}, "
              f"peak-pos corr {corr:.4f}  (fit {t_fit:.1f}s)")
        mses.append(mse)
        corrs.append(corr)
    med = float(np.median(mses))
    print(f"OURS  (TPU) median over {len(SEEDS)} seeds: MSE {med:.5f}, "
          f"corr {float(np.median(corrs)):.4f}")
    import json
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "imspec_parity_ours.json")
    with open(out, "w") as f:
        json.dump({"mse_ours_median": round(med, 5),
                   "corr_ours_median": round(float(np.median(corrs)), 4),
                   "per_seed_mse": [round(m, 5) for m in mses],
                   "seeds": list(SEEDS)}, f, indent=1)
    print("wrote", out)
    return med


def measure_ref():
    shim = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "_refshim")
    sys.path.insert(0, shim)
    sys.path.insert(1, "/root/reference")
    import torch
    torch.set_num_threads(max(os.cpu_count() - 1, 1))
    from atomai.models import ImSpec  # noqa: reference package
    Xtr, ytr, Xts, yts = split()
    mses, corrs = [], []
    t_fit = 0.0
    for seed in SEEDS:
        # the reference's ImSpec is seed-invariant unless batch_seed is
        # passed: BaseTrainer.__init__ unconditionally reseeds to 1
        # (`trainer.py:69`) BEFORE the net is built, so the init draw is
        # always the seed-1 draw, and minibatch order comes from the
        # `batch_seed` kwarg (default 1, `trainer.py:553-555`). To get a
        # genuine per-seed spread we vary batch_seed (the only RNG the
        # reference exposes on this path).
        m = ImSpec(IN_DIM, OUT_DIM, latent_dim=10)
        t0 = time.time()
        m.fit(Xtr, ytr, Xts, yts, training_cycles=CYCLES,
              batch_size=BATCH, print_loss=CYCLES, batch_seed=seed,
              filename="/tmp/imspec_parity_ref")
        t_fit = time.time() - t0
        pred = np.asarray(m.predict(Xts))
        pred = pred.reshape(len(Xts), -1)
        mse_i, corr_i = score(pred, yts)
        print(f"REF (torch-CPU) seed {seed}: held-out MSE {mse_i:.5f}, "
              f"peak-pos corr {corr_i:.4f}  (fit {t_fit:.1f}s)")
        mses.append(mse_i)
        corrs.append(corr_i)
    mse = float(np.median(mses))
    corr = float(np.median(corrs))
    print(f"REF (torch-CPU) median over {len(SEEDS)} seeds: "
          f"MSE {mse:.5f}, corr {corr:.4f}")
    import json
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "imspec_parity_ref.json")
    with open(out, "w") as f:
        json.dump({"mse_ref_median": round(mse, 5),
                   "corr_ref_median": round(corr, 4),
                   "per_seed_mse": [round(m, 5) for m in mses],
                   "seeds": list(SEEDS), "fit_s": round(t_fit, 1),
                   "protocol": (f"{N} synthetic im2spec pairs seed 0, "
                                f"{N - N_TEST} train / {N_TEST} held-out, "
                                f"ImSpec latent_dim=10, {CYCLES} cycles, "
                                f"batch {BATCH}, default normalized predict; torch CPU via "
                                "tests/_refshim")}, f, indent=1)
    print("wrote", out)
    return mse, corr


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("ours", "both"):
        measure_ours()
    if which in ("ref", "both"):
        measure_ref()
