#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line.

Primary metric (BASELINE.json): Segmentor 512^2-equivalent images/sec for
train+predict on config A — Segmentor UNet nb_classes=1, 300-cycle fit +
predict on a 64 x 256 x 256 synthetic graphene lattice stack.

Method:
- synthetic stack via atomai_tpu.utils.make_lattice_stack (same generator
  used to measure the reference).
- fit runs twice: the first run pays one-time XLA compilation, the second
  identical run is timed (steady-state; the reference has no compile
  phase).
- predict timed on the full 64-image stack (probability maps only).
- images/sec normalizes work to 512^2-pixel image equivalents:
  one 256^2 image = 1/4 of a 512^2 image.
- vs_baseline compares against the reference (pycroscopy/atomai v0.8.1,
  PyTorch CPU) measured in this container on the identical config/data
  (per-cycle train cost extrapolated from 12 cycles; per-image predict
  cost from 16 images) — see REF_* constants below.
"""

import json
import time

import numpy as np

CYCLES = 300
BATCH = 32
N_IMG = 64
SIZE = 256
EQ = (SIZE / 512.0) ** 2  # 512^2-image equivalents per 256^2 image

# Reference PyTorch-CPU measurements (this container, 2026-08-16):
# 12 training cycles (batch 32, 256^2, Unet nb_filters=16) took 582.4 s
# (48.536 s/cycle); predicting 16 x 256^2 images took 2.463 s
# (0.1539 s/img). Measured against /root/reference with minimal import
# shims (skimage/gpytorch/torchvision stubs). See BASELINE.md.
REF_SEC_PER_CYCLE = 48.536
REF_SEC_PER_PRED_IMG = 0.1539
REF_RVAE_STEPS_PER_SEC = 0.502  # measured: 24 steps in 47.8 s (CPU)
# Config B: reference ImSpec (64x64 -> 16), batch 32 (measured, 20 cycles)
REF_IMSPEC_SEC_PER_CYCLE = 1.742
# Config D: reference Segmentor 512^2 + full augmentation, batch 8
# (measured, 2 cycles; SWA epilogue crashes upstream at <30 cycles so it
# was off — it only copies weights per epoch, negligible per-cycle). The
# reference trains ensemble members sequentially so per-member cost is
# the unit.
REF_SEG512_AUG_SEC_PER_CYCLE = 25.48
# Config E: the reference's gpytorch DKL-GP cannot run in this container
# (gpytorch is not installed; only an import shim exists). Baseline is a
# DOCUMENTED torch-CPU equivalent of the reference training cycle
# (`/root/reference/atomai/trainers/gptrainer.py:126-137`): MLP feature
# extractor (64-1000-500-50-2) -> ScaleToBounds -> exact RBF-ARD kernel ->
# Cholesky MLL -> backward -> Adam, N=10000 float32. Measured by
# scripts/measure_ref_gp_cpu.py (2026-08-17, mean of 3 cycles after one
# warmup cycle, single torch CPU thread; see BASELINE.md).
REF_DKLGP_SEC_PER_CYCLE = 122.65

# TPU v5e (v5 lite) peaks: 197 TFLOP/s bf16, 819 GB/s HBM per chip.
PEAK_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def _require_device(timeout_s: float = 300.0):
    """Bounded device discovery: the remote-TPU tunnel can hang
    indefinitely when its pool is unreachable — emit a diagnosable JSON
    line instead of wedging the bench harness forever."""
    import threading

    found = []

    def probe():
        import jax
        found.append(jax.devices())

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not found:
        print(json.dumps({
            "metric": "seg_train_predict_512eq_imgs_per_sec",
            "value": None, "unit": "img/s", "vs_baseline": None,
            "error": f"accelerator unreachable: jax.devices() did not "
                     f"return within {timeout_s:.0f}s (TPU tunnel down?)"
        }))
        raise SystemExit(1)
    return found[0]


def main():
    _require_device()
    import atomai_tpu as aoi
    from atomai_tpu.core.dtypes import enable_compilation_cache
    # persistent cache: repeat bench invocations skip the one-time XLA
    # compiles (timed sections already measure steady state)
    enable_compilation_cache("/tmp/atomai_tpu_xla_cache")

    imgs, masks, _ = aoi.utils.make_lattice_stack(
        n_images=N_IMG, size=SIZE, spacing=16, seed=0)

    def build():
        return aoi.models.Segmentor("Unet", nb_classes=1)

    # --- warmup run (pays compilation) -------------------------------
    m = build()
    m.fit(imgs, masks, training_cycles=CYCLES, batch_size=BATCH,
          print_loss=CYCLES, filename="/tmp/bench_model_warm")

    # --- timed run (steady state): rerun the SAME trainer so the
    # already-compiled scan executable is reused --------------------------
    m._reset_training_history()
    t0 = time.time()
    m.run()
    t_train = time.time() - t0

    # predict warmup with the same per-batch shape, then timed
    _ = m.predict(imgs[:N_IMG // 2], compute_coords=False, verbose=False,
                  num_batches=1)
    t0 = time.time()
    out = m.predict(imgs, compute_coords=False, verbose=False,
                    num_batches=2)
    t_pred = time.time() - t0
    assert out.shape == (N_IMG, SIZE, SIZE, 1)

    # --- secondary metric: rVAE ELBO steps/sec (BASELINE.json config C:
    # rotation-invariant VAE on 32x32 atomic patches) ------------------
    patches, _, _ = aoi.utils.make_lattice_stack(
        n_images=2, size=256, spacing=16, seed=3)
    from atomai_tpu.utils import extract_patches_2d
    P = np.concatenate([extract_patches_2d(p, (32, 32), 512, i)
                        for i, p in enumerate(patches)])
    rvae = aoi.models.rVAE((32, 32), latent_dim=2)
    rvae.fit(P, training_cycles=2, batch_size=128, verbose=False,
             filename="/tmp/bench_rvae")  # compile + warm
    n_steps_per_epoch = len(P) // 128
    rvae.train_epoch()  # extra warm epoch outside the timed window
    t0 = time.time()
    n_epochs = 20  # enough epochs to amortize tunnel-latency variance
    for _ in range(n_epochs):
        rvae.train_epoch()
    t_rvae = time.time() - t0
    rvae_steps_per_sec = n_epochs * n_steps_per_epoch / t_rvae
    rvae_epoch_bytes = rvae.epoch_bytes_accessed()
    rvae_hbm_gbps = (rvae_epoch_bytes * n_epochs / t_rvae / 1e9
                     if rvae_epoch_bytes else None)

    # --- MFU + bandwidth roofline on config A's training loop ---------
    flops_per_cycle = m.train_flops_per_cycle()
    mfu = None
    if flops_per_cycle:
        mfu = flops_per_cycle * CYCLES / t_train / PEAK_FLOPS
    bytes_per_cycle = m.train_bytes_per_cycle()
    hbm_gbps_a = hbm_util_a = None
    if bytes_per_cycle:
        hbm_gbps_a = bytes_per_cycle * CYCLES / t_train / 1e9
        hbm_util_a = hbm_gbps_a * 1e9 / PEAK_HBM_BPS

    # --- config B: ImSpec im2spec 64x64 -> 16-point spectra -----------
    rng = np.random.RandomState(0)
    Xb = rng.rand(512, 64, 64).astype(np.float32)
    yb = rng.rand(512, 16).astype(np.float32)
    CYC_B = 300
    mb = aoi.models.ImSpec((64, 64), (16,), latent_dim=2)
    mb.fit(Xb, yb, Xb[:64], yb[:64], training_cycles=CYC_B,
           batch_size=32, print_loss=CYC_B, filename="/tmp/bench_imspec")
    mb._reset_training_history()
    t0 = time.time()
    mb.run()
    t_imspec = time.time() - t0
    imspec_cps = CYC_B / t_imspec
    imspec_vs = imspec_cps * REF_IMSPEC_SEC_PER_CYCLE

    # --- config D: SWA Segmentor ensemble + full augmentation, 512^2 --
    # ours trains all members simultaneously (vmapped, mesh-sharded when
    # multi-chip); the reference loops members sequentially, so its cost
    # is n_models x per-member s/cycle.
    imgs512, masks512, _ = aoi.utils.make_lattice_stack(
        n_images=32, size=512, spacing=16, seed=0)
    from atomai_tpu.trainers import EnsembleTrainer
    from atomai_tpu.transforms import seg_augmentor
    CYC_D, NMOD_D, BATCH_D = 30, 4, 8
    aug = seg_augmentor(1, rotation=True, zoom=True, gauss_noise=[10, 30],
                        poisson_noise=[30, 45], salt_and_pepper=True,
                        blur=True, contrast=True, background=True)
    et = EnsembleTrainer("Unet", nb_classes=1)
    et.compile_ensemble_trainer(training_cycles=CYC_D, batch_size=BATCH_D,
                                filename="/tmp/bench_ens", swa=True)
    # first call pays XLA compile; second reuses the cached engine
    et.train_ensemble_from_scratch(imgs512, masks512, n_models=NMOD_D,
                                   augment_fn=aug)
    t0 = time.time()
    et.train_ensemble_from_scratch(imgs512, masks512, n_models=NMOD_D,
                                   augment_fn=aug)
    t_ens = time.time() - t0  # steady state
    ens_img_per_s = CYC_D * BATCH_D * NMOD_D / t_ens
    ref_ens_img_per_s = BATCH_D / REF_SEG512_AUG_SEC_PER_CYCLE
    ens_vs = ens_img_per_s / ref_ens_img_per_s
    ens_hbm_gbps = None
    probe = getattr(et, "_engine_probe", None)
    if probe is not None:
        from atomai_tpu.core.profiling import compiled_bytes_accessed
        # XLA counts the scan body (one all-members cycle) once — scale
        # by the cycle count (see compiled_bytes_accessed caveat)
        ens_bytes = compiled_bytes_accessed(probe[0], *probe[1])
        if ens_bytes:
            # under the sequential member layout XLA counts the member-
            # loop body once — scale by members as well as cycles
            ens_bytes *= getattr(et, "_engine_bytes_scale", 1)
            ens_hbm_gbps = ens_bytes * CYC_D / t_ens / 1e9

    # --- many-frame Locator: 64 x 512^2 stack, one tiled device program
    from atomai_tpu.predictors import Locator
    prob64 = np.concatenate([masks512, masks512])[..., None].astype(
        np.float32) * 0.98 + 0.01
    loc = Locator(threshold=0.5, dist_edge=5)
    n_atoms_64 = sum(len(v) for v in loc.run(prob64).values())  # warm
    t0 = time.time()
    out64 = loc.run(prob64)
    t_loc64 = time.time() - t0
    assert sum(len(v) for v in out64.values()) == n_atoms_64

    # --- config E: dklGPR, exact covariance + Cholesky on 10k x 64 ----
    Xg = rng.randn(10000, 64).astype(np.float32)
    yg = (Xg[:, 0] + 0.1 * rng.randn(10000)).astype(np.float32)
    import jax
    gp = aoi.models.dklGPR(64, embedim=2)
    gp.fit(Xg, yg, training_cycles=5, print_loss=5)  # pays compile
    t0 = time.time()
    CYC_E = 20
    params_g = gp._train_params
    import jax.numpy as jnp
    for _ in range(CYC_E // 5):
        params_g, gp.opt_state, losses_g = gp._fit_chunk(
            params_g, gp.opt_state, jnp.arange(5))
    # force a value fetch: through the remote-TPU tunnel
    # block_until_ready is a no-op, only fetches truly synchronize
    np.asarray(losses_g)
    t_gp_cycle = (time.time() - t0) / CYC_E

    train_imgs_eq = CYCLES * BATCH * EQ
    pred_imgs_eq = N_IMG * EQ
    ours = (train_imgs_eq + pred_imgs_eq) / (t_train + t_pred)

    ref_train = CYCLES * REF_SEC_PER_CYCLE
    ref_pred = N_IMG * REF_SEC_PER_PRED_IMG
    ref = (train_imgs_eq + pred_imgs_eq) / (ref_train + ref_pred)

    print(json.dumps({
        "metric": "segmentor_512eq_images_per_sec_train_predict",
        "value": round(ours, 3),
        "unit": "images/s",
        "vs_baseline": round(ours / ref, 2),
        "detail": {
            "train_s": round(t_train, 3),
            "predict_s": round(t_pred, 3),
            "config": f"Unet nb_classes=1, {CYCLES} cycles, batch "
                      f"{BATCH}, {N_IMG}x{SIZE}x{SIZE} stack",
            "reference_images_per_sec": round(ref, 3),
            "rvae_elbo_steps_per_sec": round(rvae_steps_per_sec, 2),
            "rvae_vs_baseline": round(
                rvae_steps_per_sec / REF_RVAE_STEPS_PER_SEC, 1),
            "rvae_hbm_gbps": round(rvae_hbm_gbps, 1)
            if rvae_hbm_gbps else None,
            "rvae_dispatch": (
                "single-chip (1 visible device; on a multi-chip host the "
                "viBaseTrainer epoch auto-shards batches over the mesh "
                "data axis — parity-tested on the virtual 8-CPU mesh)"
                if rvae.mesh is None else f"mesh {rvae.mesh.shape}"),
            "mfu_config_a": round(mfu, 4) if mfu else None,
            "flops_per_cycle": flops_per_cycle,
            "bytes_per_cycle": bytes_per_cycle,
            "hbm_gbps_config_a": round(hbm_gbps_a, 1)
            if hbm_gbps_a else None,
            "hbm_util_config_a": round(hbm_util_a, 3)
            if hbm_util_a else None,
            "mfu_note": (
                "MFU = analytic conv+dot FLOPs (fwd+bwd, jaxpr walk) / "
                "wall / 197 TF bf16 peak. Bandwidth roofline: bytes = "
                "XLA post-fusion cost_analysis 'bytes accessed' of the "
                "compiled train chunk; hbm_util = achieved GB/s / 819 "
                "GB/s v5e HBM peak"),
            "imspec_cycles_per_sec": round(imspec_cps, 2),
            "imspec_vs_baseline": round(imspec_vs, 1),
            "ensemble_aug_512_images_per_sec": round(ens_img_per_s, 2),
            "ensemble_aug_512_vs_baseline": round(ens_vs, 1),
            "ensemble_aug_512_note": (
                f"{NMOD_D} members x {CYC_D} cycles x batch {BATCH_D}, "
                "simultaneous vmapped training, steady state (compile "
                "paid by the preceding warm call); reference = sequential "
                f"members at {REF_SEG512_AUG_SEC_PER_CYCLE} s/cycle/member "
                "(measured)"),
            "ensemble_aug_512_hbm_gbps": round(ens_hbm_gbps, 1)
            if ens_hbm_gbps else None,
            "locator_64x512_s": round(t_loc64, 3),
            "locator_64x512_note": (
                f"{len(out64)} frames, {n_atoms_64} atoms total, single "
                "tiled device program (blob_centers_tiled), steady "
                "state"),
            "dklgpr_10k_sec_per_cycle": round(t_gp_cycle, 3),
            "dklgpr_10k_vs_baseline": round(
                REF_DKLGP_SEC_PER_CYCLE / t_gp_cycle, 1)
            if REF_DKLGP_SEC_PER_CYCLE else None,
            "dklgpr_10k_note": (
                "exact 10k Cholesky + MLL grad, steady state, "
                "fetch-forced; reference = torch-CPU equivalent of "
                "gpytorch exact-MLL cycle "
                f"({REF_DKLGP_SEC_PER_CYCLE} s/cycle, "
                "scripts/measure_ref_gp_cpu.py — gpytorch itself "
                "unavailable in container)"),
        },
    }))


if __name__ == "__main__":
    main()
