#!/usr/bin/env python
"""Benchmark driver — prints TWO JSON lines: a full detail line first,
then a compact HEADLINE line LAST (the artifact keeps the tail of
stdout, so the line that must survive truncation goes last; round-4's
detail growth pushed the primary metric out of BENCH_r04.json).

Primary metric (BASELINE.json): Segmentor 512^2-equivalent images/sec for
train+predict on config A — Segmentor UNet nb_classes=1, 300-cycle fit +
predict on a 64 x 256 x 256 synthetic graphene lattice stack.

Measurement discipline (rounds 4-5):
- every timed section is repeated REPEATS times (REPEATS_FAST for the
  sub-second sections, whose medians are fragile at n=3); the reported
  number is the MEDIAN and the artifact records {n, median, spread} per
  config (spread = (max - min) / median), so regressions and run-to-run
  noise are distinguishable.
- every warmup is the EXACT timed call (same shapes, same code path), so
  no compile can land inside a timed region.
- tunnel weather is PROBED and recorded (dispatch RTT + d2h/h2d
  bandwidth at bench start and end): driver-vs-judge reruns of identical
  round-4 code differed up to 2.4x on transfer-bound small-model
  entries; the probe makes that separable from real regressions.
- the resolved compute dtype and backend are recorded, so the precision
  policy's activation is visible in the artifact.
- timings end with a value fetch (np.asarray / jax.device_get): through
  the remote-TPU tunnel, block_until_ready returns before device work
  completes (BASELINE.md round-2 notes).

vs_baseline compares against the reference (pycroscopy/atomai v0.8.1,
PyTorch CPU) measured in this container on identical configs/data — see
the REF_* constants and scripts/measure_* provenance notes.
"""

import json
import statistics
import time

import numpy as np

REPEATS = 3
REPEATS_FAST = 5  # sub-second sections: n=3 medians are one outlier
# away from wrong (round-4 in-run spreads up to 0.23); each extra rep
# costs ~1 s

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
# (`/root/reference/atomai/trainers/gptrainer.py:126-137`), measured by
# scripts/measure_ref_gp_cpu.py (2026-08-17, mean of 3 cycles after one
# warmup, single torch CPU thread; see BASELINE.md).
REF_DKLGP_SEC_PER_CYCLE = 122.65
# Trained-quality parity (north star: ">=10x ... with mask IoU parity").
# Held-out mask IoU achieved by the REFERENCE trained on torch CPU with
# the scripts/measure_iou_parity.py protocol (16x128^2 lattice stack
# seed 7, 12 train / 4 held-out frames, Unet nb_classes=1, 100 cycles,
# batch 4, no augmentation). iou_ours is measured LIVE each bench run on
# the identical protocol; both use one neutral numpy implementation of
# the reference IoU semantics (metrics.py:16-95).
REF_IOU_HELDOUT = None  # filled from scripts/measure_iou_parity.py
try:
    import os
    _iou_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "scripts", "iou_parity_ref.json")
    with open(_iou_path) as _f:
        REF_IOU_HELDOUT = json.load(_f)["iou_ref"]
except Exception:
    pass

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


def repeat_timed(fn, n: int = REPEATS):
    """Times fn() n times (fn must synchronize internally via a value
    fetch); returns {n, median, spread, times}."""
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    med = statistics.median(times)
    return {"n": n, "median": round(med, 4),
            "spread": round((max(times) - min(times)) / med, 4)
            if med > 0 else None,
            "times": [round(t, 4) for t in times]}


HEADLINE_BUDGET = 1900
# The driver's artifact keeps only the LAST 2000 chars of stdout
# (BENCH_r04.json lost the primary metric to that window). The headline
# is printed last, so it survives iff it fits inside the window with
# margin for the trailing newline. If a pathological payload (e.g. long
# error strings from a failed quality gate) overflows the budget, keys
# are dropped in this order — each is recoverable from the full detail
# line printed above — and the drop is recorded under "trimmed".
_HEADLINE_DROP_ORDER = ("tunnel_probe_end", "rvae_quality_ref",
                        "rvae_quality_ours", "dtype", "tunnel_probe",
                        "locator_64x512_s", "denoiser_cps", "jrvae_sps",
                        "jvae_sps", "dklgpr_vs", "ensemble_vs",
                        "imspec_vs")


def render_headline(payload: dict, budget: int = HEADLINE_BUDGET) -> str:
    """Serializes the headline payload, trimming droppable keys until it
    fits the driver's stdout-tail budget. Never raises: the primary
    metric must reach the artifact even on a degenerate payload."""
    s = json.dumps(payload)
    if len(s) <= budget:
        return s
    payload = dict(payload)
    trimmed = []
    for key in _HEADLINE_DROP_ORDER:
        if key in payload:
            del payload[key]
            trimmed.append(key)
            payload["trimmed"] = trimmed
            s = json.dumps(payload)
            if len(s) <= budget:
                return s
    # last resort: primary contract keys only
    core = {k: payload.get(k) for k in ("metric", "value", "unit",
                                        "vs_baseline", "train_s",
                                        "predict_s")}
    core["trimmed"] = "all_optional"
    return json.dumps(core)


def main():
    _require_device()
    import jax
    import jax.numpy as jnp
    import atomai_tpu as aoi
    from atomai_tpu.core.dtypes import (default_precision,
                                        enable_compilation_cache)
    # persistent cache: repeat bench invocations skip the one-time XLA
    # compiles (timed sections already measure steady state)
    enable_compilation_cache("/tmp/atomai_tpu_xla_cache")

    policy = default_precision()
    dtype_info = {
        "backend": jax.default_backend(),
        "compute_dtype": jnp.dtype(policy.compute_dtype).name,
        "param_dtype": jnp.dtype(policy.param_dtype).name,
    }

    from atomai_tpu.core.profiling import tunnel_probe
    probe_start = tunnel_probe()

    imgs, masks, _ = aoi.utils.make_lattice_stack(
        n_images=N_IMG, size=SIZE, spacing=16, seed=0)

    # --- config A: train ----------------------------------------------
    m = aoi.models.Segmentor("Unet", nb_classes=1)
    # warmup fit pays one-time XLA compilation; timed reruns reuse the
    # compiled scan executable (steady state; the reference has no
    # compile phase)
    m.fit(imgs, masks, training_cycles=CYCLES, batch_size=BATCH,
          print_loss=CYCLES, filename="/tmp/bench_model_warm")

    def train_once():
        m._reset_training_history()
        m.run()

    train_stat = repeat_timed(train_once)
    t_train = train_stat["median"]

    # --- config A: predict --------------------------------------------
    # warmup = the EXACT timed call (shapes AND code path), so the
    # full-stack preprocess/normalize kernel can't compile inside the
    # timed region (round-3 driver capture regression: predict 0.557 ->
    # 3.113 s with a cold XLA cache; scripts/diag_predict_r4.py)
    def predict_once():
        out = m.predict(imgs, compute_coords=False, verbose=False,
                        num_batches=2)
        assert out.shape == (N_IMG, SIZE, SIZE, 1)

    predict_once()
    pred_stat = repeat_timed(predict_once, n=REPEATS_FAST)
    t_pred = pred_stat["median"]

    # informational: the opt-in uint8 output wire (production knob for
    # tunneled deployments — quarters the 16.8 MB probability-map fetch;
    # quantization 1/255, far below the locator's 0.5 threshold). The
    # PRIMARY metric stays the exact-f32 path above.
    def predict_once_u8():
        out = m.predict(imgs, compute_coords=False, verbose=False,
                        num_batches=2, fetch_dtype="uint8")
        assert out.shape == (N_IMG, SIZE, SIZE, 1)

    predict_once_u8()
    pred_u8_stat = repeat_timed(predict_once_u8, n=REPEATS_FAST)

    # per-phase split, measured the same way as the timed call (warmed,
    # repeated, fetch-forced — round-4's single-shot cold split summed to
    # more than the total it was meant to explain). Phases 1-2 fetch one
    # element (production keeps the stack on device between them); phase
    # 3 is the full 16.8 MB output wire alone.
    from atomai_tpu.predictors import SegPredictor
    pp = SegPredictor(m.net, m.params, m.batch_stats, nb_classes=1,
                      verbose=False)

    def phase_pre():
        x = pp.preprocess(imgs)
        np.asarray(x[:1, :1, :1, 0])

    phase_pre()
    pre_stat = repeat_timed(phase_pre, n=REPEATS_FAST)
    xdev = pp.preprocess(imgs)
    half = N_IMG // 2

    def phase_fwd():
        # forward + 1-element fetch: dispatch + compute, no output wire
        f1 = pp.forward_(xdev[:half])
        f2 = pp.forward_(xdev[half:])
        np.asarray(f1[:1, :1, :1, 0])
        np.asarray(f2[:1, :1, :1, 0])

    phase_fwd()
    fwd_stat = repeat_timed(phase_fwd, n=REPEATS_FAST)

    def phase_full():
        # forward + FULL output fetch — what production predict pays.
        # Fresh result buffers every repeat: jax.Array caches the host
        # value after the first fetch, so re-fetching one buffer would
        # time a dict lookup (16 MB in ~9 us), not the wire.
        got = jax.device_get([pp.forward_(xdev[:half]),
                              pp.forward_(xdev[half:])])
        assert got[0].shape[0] == half

    phase_full()
    full_stat = repeat_timed(phase_full, n=REPEATS_FAST)
    # incremental cost of the 16.8 MB output wire alone
    fetch_stat = {"median": round(
        max(full_stat["median"] - fwd_stat["median"], 0.0), 4)}
    # wire-speed accounting: what the probe says the transfers alone cost
    mb_in = imgs.nbytes / 2**20
    mb_out = N_IMG * SIZE * SIZE * 4 / 2**20
    wire_s = (mb_in / probe_start["h2d_mbps"]
              + mb_out / probe_start["d2h_mbps"]
              + 4 * probe_start["rtt_ms"] / 1e3)

    # --- config C: rVAE ELBO steps/sec (32x32 patches) -----------------
    # Times the PRODUCTION fit-loop body at steady state: lazy epoch
    # dispatch + per-epoch async checkpoint + final flush (exactly what
    # BaseVAE._fit_loop executes with verbose off). Round-4 change: the
    # loop no longer forces a host round trip per epoch — that fetch
    # latency, not compute, bound config C at ~232 steps/s
    # (scripts/rvae_binding_experiment.py: 205 with per-epoch fetches ->
    # 911 pipelined; one-dispatch scan 1346).
    patches, _, _ = aoi.utils.make_lattice_stack(
        n_images=2, size=256, spacing=16, seed=3)
    from atomai_tpu.utils import extract_patches_2d
    P = np.concatenate([extract_patches_2d(p, (32, 32), 512, i)
                        for i, p in enumerate(patches)])
    from atomai_tpu.core.checkpoint import flush_async_checkpoints
    rvae = aoi.models.rVAE((32, 32), latent_dim=2)
    rvae.fit(P, training_cycles=2, batch_size=128, verbose=False,
             filename="/tmp/bench_rvae")  # compile + warm
    n_steps_per_epoch = len(P) // 128
    N_EPOCHS = 20

    def vae_loop(model):
        def run():
            for _ in range(N_EPOCHS):
                model.train_epoch_lazy()
                model.update_metadict()
                model.save_model("/tmp/bench_rvae", async_write=True)
            model._finalize_loss_history()  # one overlapped fetch
            flush_async_checkpoints()
        return run

    rvae_loop = vae_loop(rvae)
    rvae_loop()  # warm (exact timed call)
    rvae_stat = repeat_timed(rvae_loop, n=REPEATS_FAST)
    rvae_steps_per_sec = N_EPOCHS * n_steps_per_epoch / rvae_stat["median"]
    rvae_epoch_bytes = rvae.epoch_bytes_accessed()
    rvae_hbm_gbps = (rvae_epoch_bytes * N_EPOCHS / rvae_stat["median"]
                     / 1e9 if rvae_epoch_bytes else None)

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

    def imspec_once():
        mb._reset_training_history()
        mb.run()

    imspec_stat = repeat_timed(imspec_once, n=REPEATS_FAST)
    imspec_cps = CYC_B / imspec_stat["median"]
    imspec_vs = imspec_cps * REF_IMSPEC_SEC_PER_CYCLE

    # --- config D: SWA Segmentor ensemble + full augmentation, 512^2 --
    # ours trains all members simultaneously (one jitted program, mesh-
    # sharded when multi-chip); the reference loops members sequentially,
    # so its cost is n_models x per-member s/cycle.
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

    def ens_once():
        et.train_ensemble_from_scratch(imgs512, masks512, n_models=NMOD_D,
                                       augment_fn=aug)

    ens_once()  # pays XLA compile; timed calls reuse the cached engine
    ens_stat = repeat_timed(ens_once)
    t_ens = ens_stat["median"]
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

    def loc_once():
        out64 = loc.run(prob64)
        assert sum(len(v) for v in out64.values()) == n_atoms_64

    loc_stat = repeat_timed(loc_once, n=REPEATS_FAST)

    # --- config E: dklGPR, exact covariance + Cholesky on 10k x 64 ----
    Xg = rng.randn(10000, 64).astype(np.float32)
    yg = (Xg[:, 0] + 0.1 * rng.randn(10000)).astype(np.float32)
    gp = aoi.models.dklGPR(64, embedim=2)
    gp.fit(Xg, yg, training_cycles=5, print_loss=5)  # pays compile
    CYC_E = 20

    def gp_once():
        params_g = gp._train_params
        opt_state = gp.opt_state
        for _ in range(CYC_E // 5):
            params_g, opt_state, losses_g = gp._fit_chunk(
                params_g, opt_state, jnp.arange(5))
        # force a value fetch: through the remote-TPU tunnel
        # block_until_ready is a no-op, only fetches truly synchronize
        np.asarray(losses_g)

    gp_once()
    gp_stat = repeat_timed(gp_once)
    t_gp_cycle = gp_stat["median"] / CYC_E

    # --- model-zoo pins: jVAE / jrVAE / denoiser -----------------------
    # cheap steady-state entries so future rounds can't silently regress
    # the joint-latent VAEs (`/root/reference/atomai/models/dgm/
    # {jvae.py:23-200,jrvae.py:23-233}`) or the denoiser
    # (`models/denoiser.py:20-270`).
    jv = aoi.models.jVAE((32, 32), latent_dim=2, discrete_dim=[4])
    jv.fit(P, training_cycles=2, batch_size=128, verbose=False,
           filename="/tmp/bench_jvae")
    jv_loop = vae_loop(jv)
    jv_loop()
    jv_stat = repeat_timed(jv_loop, n=REPEATS_FAST)
    jvae_sps = N_EPOCHS * n_steps_per_epoch / jv_stat["median"]

    jrv = aoi.models.jrVAE((32, 32), latent_dim=2, discrete_dim=[4])
    jrv.fit(P, training_cycles=2, batch_size=128, verbose=False,
            filename="/tmp/bench_jrvae")
    jrv_loop = vae_loop(jrv)
    jrv_loop()
    jrv_stat = repeat_timed(jrv_loop, n=REPEATS_FAST)
    jrvae_sps = N_EPOCHS * n_steps_per_epoch / jrv_stat["median"]

    Xd = rng.rand(256, 64, 64).astype(np.float32)
    Xd_noisy = Xd + 0.3 * rng.randn(*Xd.shape).astype(np.float32)
    CYC_DEN = 200
    den = aoi.models.DenoisingAutoencoder()
    den.fit(Xd_noisy, Xd, training_cycles=CYC_DEN, batch_size=32,
            print_loss=CYC_DEN, filename="/tmp/bench_denoiser")

    def den_once():
        den._reset_training_history()
        den.run()

    den_stat = repeat_timed(den_once, n=REPEATS_FAST)
    den_cps = CYC_DEN / den_stat["median"]

    # --- trained-quality parity: held-out mask IoU (v2: multi-seed) ----
    import importlib.util

    def _load_script(name):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "scripts", f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    try:  # quality gate must not kill the perf bench (nor the artifact)
        iou_mod = _load_script("measure_iou_parity")
        iou_stats = iou_mod.measure_ours()  # {n, median, ious, torch_init}
        iou_ours = iou_stats["median"]
    except Exception as e:
        iou_stats = {"error": repr(e)[:200]}
        iou_ours = None  # not NaN: json.dumps(nan) is invalid JSON

    # --- trained-quality parity: rVAE held-out ELBO + angle latent -----
    # the second primary metric's quality gate (round-5): ours trained
    # live on TPU; reference pinned offline (torch CPU, same data).
    rvae_q_ours = rvae_q_ref = None
    try:  # quality gate must not kill the perf bench
        rvae_mod = _load_script("measure_rvae_parity")
        rvae_q_ours = rvae_mod.measure_ours()
    except Exception as e:
        rvae_q_ours = {"error": repr(e)[:200]}
    try:  # a missing/broken ref pin must not discard the ours number
        with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts",
                "rvae_parity_ref.json")) as f:
            rvae_q_ref = {k: v for k, v in json.load(f).items()
                          if k != "protocol"}
    except Exception as e:
        rvae_q_ref = {"error": repr(e)[:200]}

    train_imgs_eq = CYCLES * BATCH * EQ
    pred_imgs_eq = N_IMG * EQ
    ours = (train_imgs_eq + pred_imgs_eq) / (t_train + t_pred)

    ref_train = CYCLES * REF_SEC_PER_CYCLE
    ref_pred = N_IMG * REF_SEC_PER_PRED_IMG
    ref = (train_imgs_eq + pred_imgs_eq) / (ref_train + ref_pred)

    probe_end = tunnel_probe()

    print(json.dumps({
        "metric": "segmentor_512eq_images_per_sec_train_predict",
        "value": round(ours, 3),
        "unit": "images/s",
        "vs_baseline": round(ours / ref, 2),
        "detail": {
            "dtype": dtype_info,
            "tunnel_probe_start": probe_start,
            "tunnel_probe_end": probe_end,
            "tunnel_note": (
                "dispatch RTT + device<->host bandwidth, medians "
                "(core/profiling.tunnel_probe). Transfer-bound entries "
                "(predict, rVAE/jVAE/jrVAE loops, denoiser, imspec) "
                "scale with this weather — compare rounds at comparable "
                "probes (BASELINE.md interpretation rule)"),
            "repeat_protocol": (
                f"every timed section: median of {REPEATS} runs "
                f"({REPEATS_FAST} for sub-second sections) after an "
                "exact-call warmup; spread = (max-min)/median; stats key "
                "per config = {n, median, spread, times}"),
            "train_s": t_train,
            "train_stats": train_stat,
            "predict_s": t_pred,
            "predict_stats": pred_stat,
            "predict_s_uint8_wire": pred_u8_stat["median"],
            "predict_uint8_stats": pred_u8_stat,
            "predict_phase_split_s": {
                "preprocess_upload_norm": pre_stat["median"],
                "preprocess_stats": pre_stat,
                "forward_1elem_fetch": fwd_stat["median"],
                "forward_stats": fwd_stat,
                "forward_full_fetch": full_stat["median"],
                "forward_full_fetch_stats": full_stat,
                "output_wire_16p8mb": fetch_stat["median"],
                "wire_accounting_s": round(wire_s, 3),
                "note": (
                    "phases measured like the timed call (warmed, "
                    f"median of {REPEATS_FAST}, fetch-forced, fresh "
                    "result buffers per repeat); output_wire = "
                    "forward_full_fetch - forward_1elem_fetch; "
                    "wire_accounting = probe-implied transfer floor "
                    f"({mb_in:.1f} MB up + {mb_out:.1f} MB down + 4 "
                    "RTTs). fetch_dtype='uint8' quarters the down "
                    "wire (opt-in, tests/predictors/test_fetch_dtype)")},
            "config": f"Unet nb_classes=1, {CYCLES} cycles, batch "
                      f"{BATCH}, {N_IMG}x{SIZE}x{SIZE} stack",
            "reference_images_per_sec": round(ref, 3),
            "rvae_elbo_steps_per_sec": round(rvae_steps_per_sec, 2),
            "rvae_stats": rvae_stat,
            "rvae_vs_baseline": round(
                rvae_steps_per_sec / REF_RVAE_STEPS_PER_SEC, 1),
            "rvae_note": (
                f"production fit-loop body at steady state: {N_EPOCHS} "
                "lazy epoch dispatches + per-epoch async checkpoint + "
                "history finalize + flush (round-4: per-epoch host "
                "round trips lifted off the hot loop — they, not "
                "compute, bound config C at ~232 steps/s)"),
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
            "imspec_stats": imspec_stat,
            "imspec_vs_baseline": round(imspec_vs, 1),
            "ensemble_aug_512_images_per_sec": round(ens_img_per_s, 2),
            "ensemble_aug_512_stats": ens_stat,
            "ensemble_aug_512_vs_baseline": round(ens_vs, 1),
            "ensemble_aug_512_note": (
                f"{NMOD_D} members x {CYC_D} cycles x batch {BATCH_D}, "
                "simultaneous training in one jitted program, steady "
                "state; reference = sequential members at "
                f"{REF_SEG512_AUG_SEC_PER_CYCLE} s/cycle/member "
                "(measured)"),
            "ensemble_aug_512_hbm_gbps": round(ens_hbm_gbps, 1)
            if ens_hbm_gbps else None,
            "locator_64x512_s": loc_stat["median"],
            "locator_64x512_stats": loc_stat,
            "locator_64x512_note": (
                f"64 frames, {n_atoms_64} atoms total, single tiled "
                "device program (blob_centers_tiled), steady state"),
            "dklgpr_10k_sec_per_cycle": round(t_gp_cycle, 3),
            "dklgpr_10k_stats": gp_stat,
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
            "jvae_elbo_steps_per_sec": round(jvae_sps, 2),
            "jvae_stats": jv_stat,
            "jrvae_elbo_steps_per_sec": round(jrvae_sps, 2),
            "jrvae_stats": jrv_stat,
            "denoiser_cycles_per_sec": round(den_cps, 2),
            "denoiser_stats": den_stat,
            "zoo_note": (
                "jVAE/jrVAE: same production fit-loop harness as rVAE "
                "(32^2 patches, batch 128, 4-way discrete latent); "
                "denoiser: 200-cycle scan rerun, 64^2 x batch 32"),
            "iou_ours": None if iou_ours is None else round(iou_ours, 4),
            "iou_ours_stats": iou_stats,
            "iou_ref": REF_IOU_HELDOUT,
            "iou_note": (
                "held-out mask IoU, scripts/measure_iou_parity.py "
                "protocol v2 (16x128^2 stack seed 7, 12 train / 4 test, "
                "Unet, 100 cycles, batch 4, no augmentation, median "
                "over 3 model seeds, AOI_TORCH_INIT recorded; one "
                "neutral numpy IoU for both frameworks). iou_ours "
                "trained live on TPU this run; iou_ref measured on "
                "torch CPU via the reference package + import shims"),
            "rvae_quality_ours": rvae_q_ours,
            "rvae_quality_ref": rvae_q_ref,
            "rvae_quality_note": (
                "scripts/measure_rvae_parity.py: held-out ELBO "
                "(framework-reported, mean of last 3 epochs) + |Pearson "
                "r| of the learned angle latent vs true rotation on "
                "held-out asymmetric-dumbbell patches; median over 3 "
                "model seeds on BOTH arms; ours trained live on TPU "
                "this run, ref pinned on torch CPU "
                "(scripts/rvae_parity_ref.json)"),
        },
    }))

    # compact HEADLINE line LAST: the driver's artifact keeps the TAIL
    # of stdout, so this line is the one that must carry the primary
    # metric + the keys a reader needs to interpret it (VERDICT r4 #1)
    print(render_headline({
        "metric": "segmentor_512eq_images_per_sec_train_predict",
        "value": round(ours, 3),
        "unit": "images/s",
        "vs_baseline": round(ours / ref, 2),
        "train_s": t_train,
        "predict_s": t_pred,
        "predict_s_u8": pred_u8_stat["median"],
        "rvae_steps_per_sec": round(rvae_steps_per_sec, 2),
        "rvae_vs_baseline": round(
            rvae_steps_per_sec / REF_RVAE_STEPS_PER_SEC, 1),
        "iou_ours": None if iou_ours is None else round(iou_ours, 4),
        "iou_ref": REF_IOU_HELDOUT,
        # medians only — the per-seed lists live in the detail line and
        # would bloat the tail-surviving headline
        "rvae_quality_ours": {
            k: rvae_q_ours.get(k) for k in
            ("elbo_heldout", "angle_corr", "error")
            if rvae_q_ours.get(k) is not None},
        "rvae_quality_ref": {
            k: rvae_q_ref.get(k) for k in
            ("elbo_heldout", "angle_corr", "error")
            if rvae_q_ref.get(k) is not None},
        "imspec_vs": round(imspec_vs, 1),
        "ensemble_vs": round(ens_vs, 1),
        "dklgpr_vs": round(REF_DKLGP_SEC_PER_CYCLE / t_gp_cycle, 1),
        "jvae_sps": round(jvae_sps, 2),
        "jrvae_sps": round(jrvae_sps, 2),
        "denoiser_cps": round(den_cps, 2),
        "locator_64x512_s": loc_stat["median"],
        "dtype": dtype_info,
        "tunnel_probe": probe_start,
        "tunnel_probe_end": probe_end,
    }))


if __name__ == "__main__":
    main()
