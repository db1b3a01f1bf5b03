"""Round-4 experiment: what binds the config-C rVAE step?

Round 3 measured the step at ~22% HBM and ~3% MXU post-bf16, i.e. neither
roofline binds. Candidates: per-epoch dispatch+fetch latency through the
remote-TPU tunnel (train_epoch ends in a synchronous float()), per-step
work too small at batch 128 / 32^2, or inter-op gaps inside the step.

Measures, fetch-forced (BASELINE.md tunnel-honesty protocol):
  1. current bench loop: train_epoch() x20 with per-epoch float() fetch
  2. pipelined: dispatch 20 epochs without fetching, one fetch at the end
  3. chunked: one jitted lax.scan over K epochs (single dispatch)
  4. batch-size scaling at fixed sample count (work/step grows)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import atomai_tpu as aoi
from atomai_tpu.core.dtypes import enable_compilation_cache
from atomai_tpu.utils import extract_patches_2d

enable_compilation_cache("/tmp/atomai_tpu_xla_cache")

patches, _, _ = aoi.utils.make_lattice_stack(
    n_images=2, size=256, spacing=16, seed=3)
P = np.concatenate([extract_patches_2d(p, (32, 32), 512, i)
                    for i, p in enumerate(patches)])
print(f"patches: {P.shape}")

N_EPOCHS = 20


def build(batch=128):
    rvae = aoi.models.rVAE((32, 32), latent_dim=2)
    rvae.fit(P, training_cycles=2, batch_size=batch, verbose=False,
             filename="/tmp/diag_rvae")
    rvae.train_epoch()  # warm
    return rvae


# --- 1. current per-epoch-fetch loop --------------------------------
rvae = build()
nsteps = len(P) // 128
t0 = time.time()
for _ in range(N_EPOCHS):
    rvae.train_epoch()
t1 = time.time() - t0
print(f"1. per-epoch fetch loop: {t1:.3f}s = "
      f"{N_EPOCHS * nsteps / t1:.1f} steps/s "
      f"({t1 / N_EPOCHS * 1e3:.1f} ms/epoch)")

# --- 2. pipelined dispatch, one fetch -------------------------------
rvae = build()
fn = rvae._train_epoch_fn
params, opt_state = rvae.params, rvae.opt_state
num_iter = rvae.num_iter
t0 = time.time()
elbos = []
for e in range(N_EPOCHS):
    params, opt_state, elbo = fn(params, opt_state, rvae.keys.next(),
                                 jnp.int32(num_iter))
    num_iter += nsteps
    elbos.append(elbo)
np.asarray(elbos[-1])  # single synchronizing fetch
t2 = time.time() - t0
print(f"2. pipelined dispatch:   {t2:.3f}s = "
      f"{N_EPOCHS * nsteps / t2:.1f} steps/s "
      f"({t2 / N_EPOCHS * 1e3:.1f} ms/epoch)")

# --- 3. single-dispatch multi-epoch scan ----------------------------
rvae = build()
epoch_fn = rvae._train_epoch_fn


@jax.jit
def run_epochs(params, opt_state, key, num_iter0):
    def body(carry, e):
        params, opt_state = carry
        k = jax.random.fold_in(key, e)
        params, opt_state, elbo = epoch_fn._fun(
            params, opt_state, k, num_iter0 + e * nsteps) \
            if hasattr(epoch_fn, "_fun") else epoch_fn(
            params, opt_state, k, num_iter0 + e * nsteps)
        return (params, opt_state), elbo

    (params, opt_state), elbos = jax.lax.scan(
        body, (params, opt_state), jnp.arange(N_EPOCHS))
    return params, opt_state, elbos


params, opt_state = rvae.params, rvae.opt_state
out = run_epochs(params, opt_state, rvae.keys.next(),
                 jnp.int32(rvae.num_iter))
np.asarray(out[2])  # pays compile
t0 = time.time()
out = run_epochs(params, opt_state, rvae.keys.next(),
                 jnp.int32(rvae.num_iter))
np.asarray(out[2])
t3 = time.time() - t0
print(f"3. one-dispatch scan:    {t3:.3f}s = "
      f"{N_EPOCHS * nsteps / t3:.1f} steps/s "
      f"({t3 / N_EPOCHS * 1e3:.1f} ms/epoch)")

# --- 4. batch scaling (fixed total samples per epoch) ----------------
for batch in (128, 256, 512):
    rvae = build(batch)
    ns = len(P) // batch
    fn = rvae._train_epoch_fn
    params, opt_state = rvae.params, rvae.opt_state
    t0 = time.time()
    for e in range(N_EPOCHS):
        params, opt_state, elbo = fn(params, opt_state, rvae.keys.next(),
                                     jnp.int32(0))
    np.asarray(elbo)
    tb = time.time() - t0
    print(f"4. batch {batch}: {tb:.3f}s  "
          f"{N_EPOCHS * ns / tb:.1f} steps/s  "
          f"{N_EPOCHS * len(P) / tb:.0f} samples/s")
