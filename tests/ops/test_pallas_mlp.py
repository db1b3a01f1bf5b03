"""Fused spatial-decoder MLP kernel: forward + custom-VJP parity vs the
XLA reference (interpret mode on CPU; the real-TPU path is exercised by
the verify drives and bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from atomai_tpu.ops.pallas_mlp import (ROW_ALIGN, _layout, spatial_mlp,
                                       spatial_mlp_reference)

B, H, L, Z = 4, 128, 2, 2
N = ROW_ALIGN  # one merged block keeps the interpreter fast


def test_layout_merges_samples():
    S, tile, grid = _layout(128, 1024)
    assert (S, tile, grid) == (8, 1024, (16, 1))
    S, tile, grid = _layout(128, 4096)
    assert (S, tile, grid) == (1, 2048, (128, 2))
    S, tile, grid = _layout(6, 512)
    assert S * grid[0] == 6 and tile * grid[1] == 512
    # tile must DIVIDE n: n = 2560 > MAX_TILE is not a 2048 multiple;
    # floor division would leave rows 2048..2559 unwritten
    S, tile, grid = _layout(8, 2560)
    assert tile * grid[1] == 2560
    for n in (2560, 3072, 3584, 4608):
        S, tile, grid = _layout(4, n)
        assert tile * grid[1] == n, n
    # n > MAX_TILE with NO aligned divisor must raise a clear error,
    # not an empty-max() crash
    with pytest.raises(ValueError, match="spatial_mlp"):
        _layout(4, 2816)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    xT = jnp.asarray(rng.uniform(-1, 1, (B, 2, N)), jnp.float32)
    zb = jnp.asarray(rng.randn(B, H) * 0.3, jnp.float32)
    Wc = jnp.asarray(rng.randn(2, H) / 2, jnp.float32)
    bc = jnp.asarray(rng.randn(1, H) * 0.1, jnp.float32)
    Ws = jnp.asarray(rng.randn(L, H, H) / np.sqrt(H), jnp.float32)
    bs = jnp.asarray(rng.randn(L, H) * 0.1, jnp.float32)
    Wo = jnp.asarray(rng.randn(H, 1) / np.sqrt(H), jnp.float32)
    bo = jnp.asarray(rng.randn(1, 1) * 0.1, jnp.float32)
    return (xT, zb, Wc, bc, Ws, bs, Wo, bo)


def test_forward_matches_reference():
    args = _inputs()
    with pltpu.force_tpu_interpret_mode():
        y = spatial_mlp(*args)
    y_ref = spatial_mlp_reference(*args)
    assert y.shape == (B, 1, N)
    # kernel matmuls run bf16-operand/f32-accum; reference is f32 on CPU
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=5e-2, rtol=5e-2)


def test_forward_nondivisible_tail():
    """n > MAX_TILE and not a MAX_TILE multiple: every row must be
    written (regression for the floor-divided grid)."""
    n = 2560
    rng = np.random.RandomState(3)
    args = list(_inputs())
    args[0] = jnp.asarray(rng.uniform(-1, 1, (B, 2, n)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = spatial_mlp(*args)
    y_ref = spatial_mlp_reference(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=5e-2, rtol=5e-2)


def test_grads_match_reference():
    args = _inputs(1)
    gy = jnp.asarray(np.random.RandomState(2).randn(B, 1, N) * 0.1,
                     jnp.float32)

    def loss_k(*a):
        return jnp.sum(spatial_mlp(*a) * gy)

    def loss_r(*a):
        return jnp.sum(spatial_mlp_reference(*a) * gy)

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_k, argnums=tuple(range(8)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(8)))(*args)
    names = ["dx", "dzb", "dWc", "dbc", "dWs", "dbs", "dWo", "dbo"]
    for name, a, b in zip(names, gk, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-2,
                                   err_msg=name)


def test_rdecoder_fused_branch_param_and_output_parity(monkeypatch):
    """The fused branch of rDecoderNet must create the IDENTICAL flax
    param tree (checkpoints interchangeable between paths) and matching
    outputs/gradients."""
    import atomai_tpu.nets.ed as ed

    net = ed.rDecoderNet((32, 32), 2, num_layers=L, hidden_dim=H)
    key = jax.random.key(0)
    xc = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (2, 1024, 2)), jnp.float32)
    z = jnp.asarray(np.random.RandomState(1).randn(2, 2), jnp.float32)

    v_xla = net.init(key, xc, z, False)
    out_xla = net.apply(v_xla, xc, z, False)

    monkeypatch.setattr(ed, "mlp_shapes_supported", lambda n, h: True,
                        raising=False)
    import atomai_tpu.ops.pallas_mlp as pm
    monkeypatch.setattr(pm, "mlp_shapes_supported", lambda n, h: True)
    with pltpu.force_tpu_interpret_mode():
        v_fused = net.init(key, xc, z, False)
        assert jax.tree.structure(v_fused) == jax.tree.structure(v_xla)
        for a, b in zip(jax.tree.leaves(v_fused), jax.tree.leaves(v_xla)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out_fused = net.apply(v_xla, xc, z, False)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               atol=5e-2)
