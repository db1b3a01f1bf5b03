#!/usr/bin/env python
"""Trained-mask IoU parity: reference (torch CPU) vs atomai_tpu (TPU).

BASELINE.json's north star requires ">=10x ... with mask IoU parity".
This measures the ACHIEVED held-out IoU of both frameworks trained on
the same data with the same config — the reference's quality bar is its
IoU metric (`/root/reference/atomai/losses_metrics/metrics.py:16-95`)
wired as SegTrainer accuracy
(`/root/reference/atomai/trainers/trainer.py:731-737`).

Protocol v2 (round 5, 2026-08-19; v1 was single-seed round 4):
- data: atomai_tpu.utils.make_lattice_stack(16, 128, spacing=16, seed=7)
  -> first 12 frames train, last 4 held out. Fully deterministic.
- both frameworks: Segmentor("Unet", nb_classes=1) default width
  (nb_filters=16), 100 training cycles (1 cycle = 1 random minibatch,
  both frameworks' default epoch mode), batch 4, no augmentation, SWA
  off, default Adam lr, trained once per seed in SEEDS — the reported
  number is the MEDIAN over seeds, the per-seed list is recorded (same
  {n, median} discipline as the perf sections).
- seed semantics differ BY THE FRAMEWORKS' OWN CONSTRUCTION and the
  protocol records both arms honestly rather than pretending symmetry:
  ours varies the model-init seed (Segmentor(seed=) + fit(seed=)); the
  reference's public API cannot vary its init — BaseTrainer.__init__
  unconditionally calls set_train_rng(1) before the net is built
  (`trainer.py:69`) and its default epoch mode draws each cycle's batch
  with seed=c, the cycle index (`trainer.py:267`) — so its three runs
  are bit-identical (the pinned [0.9381 x 3]): one deterministic
  reference trajectory compared against ours' median over init seeds.
- init mode is pinned and RECORDED: ours uses the torch-default weight
  init (AOI_TORCH_INIT, default on — the measured trained-quality fix,
  commit ef4f289); the artifact carries the resolved value so the
  protocol's init dependence is explicit.
- metric: ONE neutral numpy implementation of the reference's IoU
  semantics applied to both frameworks' predicted probability maps:
  sigmoid -> threshold 0.5 -> 2-class (bg/fg) confusion histogram ->
  mean Jaccard over classes, averaged over the 4 held-out frames.
  Using one implementation for both removes metric-implementation skew.
- the reference runs on torch CPU via the tests/_refshim import stubs
  (same approach as the config-A/E speed baselines; gpytorch et al are
  not installed in this container).

Run:  python scripts/measure_iou_parity.py [ref|ours|both]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_IMG, SIZE, SPACING, SEED = 16, 128, 16, 7
N_TRAIN = 12
CYCLES = 100
# batch 4: the held-out split is 4 frames and the reference's array2list
# requires test_size >= batch_size (preproc.py:181 crashes otherwise)
BATCH = 4
# v2 seeds: 3 independent init-seed trainings on OUR arm; on the ref
# arm the three runs are bit-identical by the reference's construction
# (init pinned to set_train_rng(1) at trainer.py:69, per-cycle batches
# seeded by the cycle index at trainer.py:267 — see module docstring)
SEEDS = (1, 2, 3)


def torch_init_mode() -> str:
    """The resolved AOI_TORCH_INIT knob (nets/blocks.py) — recorded in
    the artifact because the protocol's result depends on it."""
    return os.environ.get("AOI_TORCH_INIT", "1")


def mean_jaccard(prob_fg: np.ndarray, true: np.ndarray) -> float:
    """Reference IoU semantics (metrics.py:16-95) in plain numpy:
    threshold the foreground probability at 0.5, build the 2-class
    confusion histogram over all frames, mean Jaccard over classes."""
    pred = (np.asarray(prob_fg) >= 0.5).astype(np.int64).ravel()
    true = (np.asarray(true) > 0.5).astype(np.int64).ravel()
    hist = np.bincount(2 * true + pred, minlength=4).reshape(2, 2)
    inter = np.diag(hist).astype(np.float64)
    a = hist.sum(1)
    b = hist.sum(0)
    jcd = inter / (a + b - inter + 1e-10)
    return float(np.mean(jcd[~np.isnan(jcd)]))


def make_data():
    from atomai_tpu.utils import make_lattice_stack
    imgs, masks, _ = make_lattice_stack(
        n_images=N_IMG, size=SIZE, spacing=SPACING, seed=SEED)
    return (imgs[:N_TRAIN], masks[:N_TRAIN],
            imgs[N_TRAIN:], masks[N_TRAIN:])


def measure_ours(seeds=SEEDS):
    """Trains ours once per seed on TPU; returns the v2 stats dict
    {n, median, ious, seeds, torch_init}."""
    import atomai_tpu as aoi
    from atomai_tpu.core.dtypes import enable_compilation_cache
    enable_compilation_cache("/tmp/atomai_tpu_xla_cache")
    Xtr, ytr, Xts, yts = make_data()
    ious = []
    for seed in seeds:
        m = aoi.models.Segmentor("Unet", nb_classes=1, seed=seed)
        t0 = time.time()
        m.fit(Xtr, ytr, Xts, yts, training_cycles=CYCLES,
              batch_size=BATCH, print_loss=CYCLES, seed=seed,
              filename="/tmp/iou_parity_ours")
        t_fit = time.time() - t0
        prob = m.predict(Xts, compute_coords=False, verbose=False)
        iou = mean_jaccard(prob[..., 0], yts)
        print(f"OURS  (TPU) seed {seed}: held-out IoU = {iou:.4f}  "
              f"(fit {t_fit:.1f}s)")
        ious.append(round(iou, 4))
    return {"n": len(ious), "median": round(float(np.median(ious)), 4),
            "ious": ious, "seeds": list(seeds),
            "torch_init": torch_init_mode()}


def measure_ref(seeds=SEEDS):
    shim = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "_refshim")
    sys.path.insert(0, shim)
    sys.path.insert(1, "/root/reference")
    import torch
    torch.set_num_threads(max(os.cpu_count() - 1, 1))
    from atomai.models import Segmentor  # noqa: reference package
    Xtr, ytr, Xts, yts = make_data()
    ious, fit_ss = [], []
    for seed in seeds:
        m = Segmentor("Unet", nb_classes=1)
        t0 = time.time()
        m.fit(Xtr, ytr, Xts, yts, training_cycles=CYCLES,
              batch_size=BATCH, print_loss=CYCLES, seed=seed,
              filename="/tmp/iou_parity_ref")
        t_fit = time.time() - t0
        out = m.predict(Xts, compute_coords=False)
        prob = np.asarray(out[0] if isinstance(out, tuple) else out)
        if prob.ndim == 4:
            prob = prob[..., 0] if prob.shape[-1] == 1 else prob[:, 0]
        iou = mean_jaccard(prob, yts)
        print(f"REF (torch-CPU) seed {seed}: held-out IoU = {iou:.4f}  "
              f"(fit {t_fit:.1f}s)")
        ious.append(round(iou, 4))
        fit_ss.append(round(t_fit, 1))
    import json
    rec = {"iou_ref": round(float(np.median(ious)), 4),
           "n": len(ious), "ious": ious, "seeds": list(seeds),
           "fit_s": fit_ss,
           "protocol": (f"v2 (round 5): {N_IMG}x{SIZE}^2 stack seed "
                        f"{SEED}, {N_TRAIN} train / {N_IMG - N_TRAIN} "
                        f"held-out, Unet nb_classes=1, {CYCLES} cycles, "
                        f"batch {BATCH}, no augmentation, fit(seed) over "
                        f"{list(seeds)} — NOTE: the reference pins init "
                        "to set_train_rng(1) at construction and seeds "
                        "each cycle's batch by cycle index, so these "
                        "runs are bit-identical by its construction; "
                        "torch CPU via tests/_refshim")}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "iou_parity_ref.json")
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
