#!/usr/bin/env python
"""rVAE hot-op roofline experiment (VERDICT r2 item #2b).

Config C's training step (rVAE, 32x32 patches, batch 128) is the target.
Questions answered with measurements, on the real TPU:

1. Where is the step on the roofline? (analytic MXU FLOPs, XLA post-fusion
   bytes accessed, achieved steps/s => TFLOP/s and GB/s vs the v5e peaks
   197 TF bf16 / 819 GB/s.)
2. Does the SURVEY §2.9 fusion candidate — the coord_latent spatial
   decoder input path (`/root/reference/atomai/nets/ed.py:672-687`) — pay?
   The candidate restructure folds the per-sample rotation+translation
   INTO the coord_latent weights: instead of materializing the rotated
   grid (B, n, 2) and running Dense(2->h) on it,
       h_x[b] = grid @ (R(phi_b) @ W) + (dx_b @ W + bias)
   i.e. a per-sample (2, h) effective weight from a tiny batched matmul,
   then one shared-grid batched matmul — the (B, n, 2) intermediate and
   its gradient never exist.

Run on the TPU host:  python scripts/rvae_roofline_experiment.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, HW, H_DIM, LAYERS, ZDIM = 128, 32, 128, 2, 2
N = HW * HW


def fetch(x):
    np.asarray(x)  # tunnel-honest sync (block_until_ready is a no-op)


def timeit(fn, params, phi, dx, z, reps=30):
    """The tunnel MEMOIZES identical dispatches — vary phi every rep so
    each call is genuinely executed, and end with a value fetch
    (block_until_ready is a wall-clock no-op on this backend)."""
    fetch(jax.tree.leaves(fn(params, phi, dx, z))[0])  # warm/compile
    # start at i=1: i=0 would equal the warmup value and be MEMOIZED
    phis = [phi + 1e-6 * i for i in range(1, reps + 1)]
    t0 = time.time()
    for p in phis:
        out = fn(params, p, dx, z)
    # programs execute in dispatch order on the single chip, so one value
    # fetch of the final output waits for the whole chain
    fetch(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps


def main():
    from atomai_tpu.core.dtypes import (enable_compilation_cache,
                                        enable_fast_matmul)
    enable_fast_matmul()
    enable_compilation_cache()
    from atomai_tpu.core.profiling import (compiled_bytes_accessed,
                                           jaxpr_matmul_flops)
    from atomai_tpu.utils.coords import imcoordgrid, transform_coordinates

    rng = np.random.RandomState(0)
    key = jax.random.key(0)
    grid = jnp.asarray(imcoordgrid((HW, HW)))            # (n, 2)
    phi = jnp.asarray(rng.uniform(-1, 1, B), jnp.float32)
    dx = jnp.asarray(rng.uniform(-.1, .1, (B, 2)), jnp.float32)
    z = jnp.asarray(rng.randn(B, ZDIM), jnp.float32)
    target = jnp.asarray(rng.rand(B, N), jnp.float32)

    def mlp_params(k, sizes):
        ps = []
        for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
            k, k1 = jax.random.split(k)
            ps.append((jax.random.normal(k1, (a, b)) / np.sqrt(a),
                       jnp.zeros(b)))
        return ps

    k1, k2, k3 = jax.random.split(key, 3)
    W_coord = jax.random.normal(k1, (2, H_DIM)) / np.sqrt(2)
    b_coord = jnp.zeros(H_DIM)
    W_z = jax.random.normal(k2, (ZDIM, H_DIM)) / np.sqrt(ZDIM)
    mlp = mlp_params(k3, [H_DIM] * (LAYERS + 1) + [1])

    def tail(h, z, params):
        W_z_, mlp_ = params["Wz"], params["mlp"]
        h = h + (z @ W_z_)[:, None, :]
        h = jnp.tanh(h)
        for (W, b) in mlp_[:-1]:
            h = jnp.tanh(h @ W + b)
        W, b = mlp_[-1]
        out = (h @ W + b)[..., 0]
        return jnp.mean((out - target) ** 2)

    # --- variant A: materialized rotated grid (current formulation) ---
    def loss_materialized(params, phi, dx, z):
        xg = jnp.broadcast_to(grid, (B,) + grid.shape)
        xg = transform_coordinates(xg, phi, dx[:, None, :])
        h = xg @ params["Wc"] + params["bc"]             # (B, n, h)
        return tail(h, z, params)

    # --- variant B: rotation folded into the coord weights ------------
    def loss_folded(params, phi, dx, z):
        c, s = jnp.cos(phi), jnp.sin(phi)
        R = jnp.stack([jnp.stack([c, s], -1),
                       jnp.stack([-s, c], -1)], -2)      # (B, 2, 2)
        W_eff = R @ params["Wc"]                         # (B, 2, h)
        bias = dx @ params["Wc"] + params["bc"]          # (B, h)
        h = jnp.einsum("nc,bch->bnh", grid, W_eff) + bias[:, None, :]
        return tail(h, z, params)

    params = {"Wc": W_coord, "bc": b_coord, "Wz": W_z, "mlp": mlp}
    gA = jax.jit(jax.grad(loss_materialized))
    gB = jax.jit(jax.grad(loss_folded))

    # numerical parity of the two formulations
    la = jax.jit(loss_materialized)(params, phi, dx, z)
    lb = jax.jit(loss_folded)(params, phi, dx, z)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-2)  # bf16 matmul routing

    tA = timeit(gA, params, phi, dx, z)
    tB = timeit(gB, params, phi, dx, z)
    bytesA = compiled_bytes_accessed(gA, params, phi, dx, z)
    bytesB = compiled_bytes_accessed(gB, params, phi, dx, z)
    flopsA = jaxpr_matmul_flops(gA, params, phi, dx, z)
    flopsB = jaxpr_matmul_flops(gB, params, phi, dx, z)

    # --- whole config C training step through the library -------------
    import atomai_tpu as aoi
    patches = rng.rand(1024, HW, HW).astype(np.float32)
    rvae = aoi.models.rVAE((HW, HW), latent_dim=ZDIM)
    rvae.fit(patches, training_cycles=2, batch_size=B,
             filename="/tmp/roofline_rvae")
    steps = len(patches) // B
    t0 = time.time()
    for _ in range(5):
        rvae.train_epoch()
    t_epoch = (time.time() - t0) / 5
    ep_bytes = rvae.epoch_bytes_accessed()
    ep_flops = None
    try:
        ep_flops = jaxpr_matmul_flops(
            rvae._train_epoch_fn, rvae.params, rvae.opt_state,
            jax.random.key(1), jnp.int32(0))
    except Exception:
        pass

    print(json.dumps({
        "decoder_grad_materialized_ms": round(tA * 1e3, 3),
        "decoder_grad_folded_ms": round(tB * 1e3, 3),
        "speedup_folded": round(tA / tB, 3),
        "bytes_materialized": bytesA, "bytes_folded": bytesB,
        "flops_materialized": flopsA, "flops_folded": flopsB,
        "epoch_s": round(t_epoch, 4),
        "steps_per_sec": round(steps / t_epoch, 1),
        "epoch_bytes": ep_bytes,
        "epoch_flops": ep_flops,
        "step_gbps": round(ep_bytes / t_epoch / 1e9, 1)
        if ep_bytes else None,
        "step_tflops": round(ep_flops / t_epoch / 1e12, 2)
        if ep_flops else None,
    }, indent=1))


if __name__ == "__main__":
    main()
