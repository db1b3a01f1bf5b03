#!/usr/bin/env python
"""Ensemble member-axis layout experiment (config D hot path).

`EnsembleTrainer` vmaps the member train step over the stacked parameter
pytree; under XLA, vmapping convolutions over the *parameter* axis lowers
them to feature-group convolutions (groups = members). TPU convs with few
channels are already lane-padded to 128; splitting those channels into
member groups may pad even worse. The alternative inside one jitted
program is `lax.map` over members — each member runs ordinary convs,
serialized (the chip is serial anyway, and at ~66%% HBM utilization the
step is bandwidth-bound, so equal-bytes serialization can win).

This measures both layouts on the config-D shape (4-member UNet-16,
batch 8, 512^2, BN+dropout step with SWA accumulation off) on the real
TPU, tunnel-honest (varied inputs, final-value fetch).

Run: python scripts/ensemble_layout_experiment.py [--size 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def fetch(tree):
    np.asarray(jax.tree.leaves(tree)[0])


def timeit(fn, args, vary, reps=20):
    """Dispatch `reps` calls with a varied input (the tunnel memoizes
    identical dispatches), fetch only the last output."""
    fetch(fn(*args))  # warm / compile
    t0 = time.time()
    out = None
    # start at i=1: vary(args, 0) equals the warmup value -> memoized
    for i in range(1, reps + 1):
        out = fn(*vary(args, i))
    fetch(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--members", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from atomai_tpu.core.dtypes import (enable_compilation_cache,
                                        enable_fast_matmul)
    enable_fast_matmul()
    enable_compilation_cache()
    from atomai_tpu.core.profiling import compiled_bytes_accessed
    from atomai_tpu.losses_metrics import select_loss
    from atomai_tpu.nets import init_fcnn_model

    M, B, H = args.members, args.batch, args.size
    net, _ = init_fcnn_model("Unet", 1)
    criterion = select_loss("ce", 1)
    tx = optax.adam(1e-3)

    keys = jax.random.split(jax.random.key(0), M)
    x0 = jnp.ones((1, H, H, 1), jnp.float32)
    vinit = jax.jit(jax.vmap(
        lambda k: dict(net.init({"params": k, "dropout": k}, x0, False))))
    stacked = vinit(keys)
    params, bstats = stacked["params"], stacked["batch_stats"]
    opt = jax.vmap(tx.init)(params)

    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(B, H, H, 1), jnp.float32)
    y = jnp.asarray((rng.rand(B, H, H) > .5), jnp.float32)
    mkeys = jax.random.split(jax.random.key(1), M)

    def member_step(p, bs, o, key, X, y):
        def loss_fn(p):
            out, mut = net.apply(
                {"params": p, "batch_stats": bs}, X, True,
                mutable=["batch_stats"], rngs={"dropout": key})
            return criterion(out, y), mut["batch_stats"]
        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), new_bs, o, loss

    @jax.jit
    def step_vmap(params, bstats, opt, mkeys, X, y):
        return jax.vmap(member_step,
                        in_axes=(0, 0, 0, 0, None, None))(
            params, bstats, opt, mkeys, X, y)

    @jax.jit
    def step_map(params, bstats, opt, mkeys, X, y):
        return jax.lax.map(
            lambda s: member_step(*s, X, y), (params, bstats, opt, mkeys))

    def vary(a, i):
        return a[:4] + (a[4] + 1e-6 * i, a[5])

    call = (params, bstats, opt, mkeys, X, y)
    la = step_vmap(*call)[3]
    lb = step_map(*call)[3]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=2e-2)

    t_vmap = timeit(step_vmap, call, vary)
    t_map = timeit(step_map, call, vary)
    by_vmap = compiled_bytes_accessed(step_vmap, *call)
    # lax.map lowers to a scan whose body XLA counts ONCE — scale by M
    by_map_body = compiled_bytes_accessed(step_map, *call)
    print(json.dumps({
        "size": H, "members": M, "batch": B,
        "vmap_grouped_ms": round(t_vmap * 1e3, 2),
        "laxmap_sequential_ms": round(t_map * 1e3, 2),
        "speedup_laxmap": round(t_vmap / t_map, 3),
        "bytes_vmap": by_vmap,
        "bytes_laxmap_body_x_members": (
            by_map_body * M if by_map_body else None),
        "vmap_gbps": round(by_vmap / t_vmap / 1e9, 1) if by_vmap else None,
    }, indent=1))


if __name__ == "__main__":
    main()
