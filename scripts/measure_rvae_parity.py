#!/usr/bin/env python
"""rVAE trained-quality parity: reference (torch CPU) vs atomai_tpu (TPU).

The rVAE is a PRIMARY bench metric and BASELINE.json's north star
demands "numerically matched outputs (... latent embeddings)"; this
measures the two qualities the spatial-decoder rVAE exists for
(`/root/reference/atomai/models/dgm/rvae.py:110-147`):

1. ``elbo_heldout`` — the held-out ELBO each framework reports for its
   own trained model (both record per-epoch mean test ELBO with
   identical semantics — reference
   `/root/reference/atomai/trainers/vitrainer.py:292-345`, ours
   ``models/dgm/vae.py::_fit_loop``; higher is better). The reported
   number is the mean of the last 3 epochs to damp minibatch noise.
2. ``angle_corr`` — |Pearson r| between the learned angle latent
   (``encode()`` column 0) and the TRUE rotation applied to each
   held-out patch. The spatial decoder's whole point is disentangling
   rotation into that latent; a working rVAE scores >~0.8, a broken
   one ~0.

Protocol (round 5, 2026-08-19):
- data: :func:`make_rotated_patches` — asymmetric Gaussian dumbbells
  (two atoms, amplitudes 1.0 / 0.6, so there is no 180-degree ambiguity)
  at angles theta ~ U(-pi/3, pi/3), +-1.5 px translation jitter, 5%
  noise; 1280 train / 320 held-out, 32x32, pure numpy (one generator
  feeds both frameworks).
- both frameworks: rVAE((32, 32), latent_dim=2), default translation
  mode, fit(train, None, test, training_cycles=40, batch_size=128,
  rotation_prior=pi/3).
- the reference runs on torch CPU via the tests/_refshim import stubs
  (same approach as the IoU / config-A / config-E baselines).

Run:  python scripts/measure_rvae_parity.py [ref|ours|both]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_TRAIN, N_TEST, SIZE = 1280, 320, 32
EPOCHS, BATCH = 40, 128
ROT_PRIOR = np.pi / 3
DATA_SEED = 11


def make_rotated_patches(n: int, seed: int):
    """Asymmetric dumbbell patches at known angles — pure numpy so the
    reference and ours consume byte-identical data."""
    rng = np.random.RandomState(seed)
    thetas = rng.uniform(-np.pi / 3, np.pi / 3, n).astype(np.float32)
    half = (SIZE - 1) / 2.0
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    yy = yy - half
    xx = xx - half
    imgs = np.empty((n, SIZE, SIZE), np.float32)
    for i, th in enumerate(thetas):
        jx, jy = rng.uniform(-1.5, 1.5, 2)
        cx, cy = 6.0 * np.cos(th), 6.0 * np.sin(th)
        d2a = (xx - cx - jx) ** 2 + (yy - cy - jy) ** 2
        d2b = (xx + cx - jx) ** 2 + (yy + cy - jy) ** 2
        img = (np.exp(-d2a / (2 * 2.5 ** 2))
               + 0.6 * np.exp(-d2b / (2 * 2.5 ** 2)))
        img += rng.normal(0, 0.05, img.shape)
        img -= img.min()
        imgs[i] = img / img.max()
    return imgs, thetas


def make_data():
    X, th = make_rotated_patches(N_TRAIN + N_TEST, DATA_SEED)
    return (X[:N_TRAIN], X[N_TRAIN:], th[:N_TRAIN], th[N_TRAIN:])


def _quality(model, Xts, th_ts, elbo_hist):
    z_mean = model.encode(Xts)
    if isinstance(z_mean, tuple):
        z_mean = z_mean[0]
    phi = np.asarray(z_mean)[:, 0]
    corr = abs(float(np.corrcoef(phi, th_ts)[0, 1]))
    elbo = float(np.mean(np.asarray(elbo_hist[-3:], dtype=np.float64)))
    return {"elbo_heldout": round(elbo, 4), "angle_corr": round(corr, 4)}


SEEDS = (1, 2, 3)


def _median_stats(per_seed):
    """{n, median elbo/corr, per-seed lists} from per-seed quality dicts
    — the same multi-seed discipline as the IoU v2 protocol."""
    elbos = [q["elbo_heldout"] for q in per_seed]
    corrs = [q["angle_corr"] for q in per_seed]
    return {
        "elbo_heldout": round(float(np.median(elbos)), 4),
        "angle_corr": round(float(np.median(corrs)), 4),
        "n": len(per_seed),
        "seeds": list(SEEDS),
        "elbos": elbos,
        "corrs": corrs,
        "fit_s": [q["fit_s"] for q in per_seed],
    }


def measure_ours(epochs: int = EPOCHS):
    import atomai_tpu as aoi
    from atomai_tpu.core.dtypes import enable_compilation_cache
    enable_compilation_cache("/tmp/atomai_tpu_xla_cache")
    Xtr, Xts, _, th_ts = make_data()
    per_seed = []
    for seed in SEEDS:
        m = aoi.models.rVAE((SIZE, SIZE), latent_dim=2, seed=seed)
        t0 = time.time()
        m.fit(Xtr, None, Xts, training_cycles=epochs, batch_size=BATCH,
              rotation_prior=ROT_PRIOR, verbose=False,
              filename="/tmp/rvae_parity_ours")
        q = _quality(m, Xts, th_ts, m.loss_history["test_loss"])
        q["fit_s"] = round(time.time() - t0, 1)
        per_seed.append(q)
    stats = _median_stats(per_seed)
    print(f"OURS  (TPU): {json.dumps(stats)}")
    return stats


def measure_ref(epochs: int = EPOCHS):
    shim = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "_refshim")
    sys.path.insert(0, shim)
    sys.path.insert(1, "/root/reference")
    import torch
    torch.set_num_threads(max(os.cpu_count() - 1, 1))
    from atomai.models import rVAE  # noqa: reference package
    Xtr, Xts, _, th_ts = make_data()
    per_seed = []
    for seed in SEEDS:
        m = rVAE((SIZE, SIZE), latent_dim=2, seed=seed)
        t0 = time.time()
        m.fit(Xtr, None, Xts, training_cycles=epochs, batch_size=BATCH,
              rotation_prior=ROT_PRIOR, filename="/tmp/rvae_parity_ref")
        q = _quality(m, Xts, th_ts, m.loss_history["test_loss"])
        q["fit_s"] = round(time.time() - t0, 1)
        per_seed.append(q)
        print(f"REF seed {seed}: {json.dumps(q)}")
    rec = _median_stats(per_seed)
    print(f"REF (torch-CPU): {json.dumps(rec)}")
    rec["protocol"] = (
        f"v2 (round 5): {N_TRAIN}+{N_TEST} asymmetric-dumbbell 32^2 "
        f"patches (data seed {DATA_SEED}), rVAE latent_dim=2, {epochs} "
        f"epochs, batch {BATCH}, rotation_prior=pi/3, median over model "
        f"seeds {list(SEEDS)}; elbo_heldout = mean test ELBO of last 3 "
        "epochs (framework-reported); angle_corr = "
        "|Pearson r|(encode()[:, 0], true theta) on held-out; torch CPU "
        "via tests/_refshim")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "rvae_parity_ref.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", out)
    return rec


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("ours", "both"):
        measure_ours()
    if which in ("ref", "both"):
        measure_ref()
