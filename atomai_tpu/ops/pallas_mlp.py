"""Fused spatial-decoder MLP (rVAE hot op) as a Pallas TPU kernel.

The rDecoderNet per-pixel MLP (`atomai_tpu/nets/ed.py` rDecoderNet,
reference `atomai/nets/ed.py:583-687`) evaluates, for M = batch * n_pix
rows::

    h0 = tanh(x @ Wc + bc + (z @ Wz)[sample])      # coord_latent
    hl = tanh(h_{l-1} @ Wl + bl)                   # l = 1..L
    y  = hL @ Wo + bo                              # (M, 1)

Under XLA every layer round-trips its (M, H) activation through HBM.
This kernel keeps the whole chain in VMEM: the grid walks blocks of S
samples x n_pix rows in TRANSPOSED orientation (H on sublanes, rows on
lanes), the forward writes only y, and the custom-VJP backward RECOMPUTES
the per-block activations in VMEM instead of reading stored ones — HBM
traffic drops from O(L * M * H) to O(M * (2 + 1)) plus parameters.

Weight gradients accumulate across the grid in revisited output blocks
(constant index maps keep them VMEM-resident; the TPU grid is
sequential). Matmuls run with bf16 operands and f32 accumulation, the
same precision as the XLA path under ``enable_fast_matmul``.

MEASURED (1x v5e, B=128, n=1024, H=128, L=2, rVAE train steps/s):
XLA 271.4 vs Pallas 211.4 (256-step grid, 512-row blocks), 236.3
(32-step, 4 samples x 1024 rows), 266.0 (16-step, 8 samples x 1024
rows). Every layout is at or below XLA: post-bf16 the op is not
bandwidth-bound enough for the HBM savings to pay, and XLA's single
large fused GEMMs beat the per-block pipeline. The kernel therefore
stays OPT-IN (``ATOMAI_TPU_PALLAS_MLP=1``) — kept as the measured answer
to SURVEY §2.9's coord_latent fusion question and as the scaffold for
larger spatial decoders where the activation footprint exceeds VMEM-
friendly XLA fusions.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_ALIGN = 512        # pixel rows pad to this multiple (lanes)
MAX_TILE = 2048        # max pixel rows per sample-slice in one grid step
TARGET_ROWS = 8192     # rows (samples x pixels) aimed at per grid step


def _bf16_dot(a, b):
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _layout(B, n):
    """(samples_per_block S, rows_per_slice tile, grid) for (B, n).

    ``tile`` must DIVIDE n (a ROW_ALIGN multiple) — a floor-divided grid
    would silently leave the row tail unwritten when n > MAX_TILE is not
    a tile multiple (e.g. n = 2560)."""
    if n <= MAX_TILE:
        tile = n
    else:
        tiles = [t for t in range(ROW_ALIGN, MAX_TILE + 1, ROW_ALIGN)
                 if n % t == 0]
        if not tiles:
            raise ValueError(
                f"spatial_mlp: {n} pixel rows > {MAX_TILE} must be "
                f"divisible by a multiple of {ROW_ALIGN} (<= {MAX_TILE}) "
                "to tile the grid; pad the pixel grid or use "
                "spatial_mlp_reference")
        tile = max(tiles)
    S = 1
    if tile == n:
        S = max(1, TARGET_ROWS // n)
        while B % S:
            S -= 1
    return S, tile, (B // S, n // tile)


# ------------------------------------------------------------------ fwd
def _fwd_kernel(xT_ref, zb_ref, Wc_ref, bc_ref, Ws_ref, bs_ref, Wo_ref,
                bo_ref, y_ref, *, L, S):
    for s in range(S):
        xT = xT_ref[s]                               # (2, tile)
        h = _bf16_dot(Wc_ref[:].T, xT)               # (H, tile)
        h = h + bc_ref[:].T + zb_ref[s].T            # zb_ref[s]: (1, H)
        h = jnp.tanh(h)
        for l in range(L):
            h = _bf16_dot(Ws_ref[l].T, h) + bs_ref[l][:, None]
            h = jnp.tanh(h)
        y_ref[s] = _bf16_dot(Wo_ref[:].T, h) + bo_ref[0, 0]


# ------------------------------------------------------------------ bwd
def _bwd_kernel(xT_ref, zb_ref, Wc_ref, bc_ref, Ws_ref, bs_ref, Wo_ref,
                bo_ref, gy_ref,
                dx_ref, dzb_ref, dWc_ref, dbc_ref, dWs_ref, dbs_ref,
                dWo_ref, dbo_ref, *, L, S):
    j = pl.program_id(1)
    first = jnp.logical_and(pl.program_id(0) == 0, j == 0)

    @pl.when(first)
    def _():
        dWc_ref[:] = jnp.zeros_like(dWc_ref)
        dbc_ref[:] = jnp.zeros_like(dbc_ref)
        dWs_ref[:] = jnp.zeros_like(dWs_ref)
        dbs_ref[:] = jnp.zeros_like(dbs_ref)
        dWo_ref[:] = jnp.zeros_like(dWo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    @pl.when(j == 0)
    def _():
        dzb_ref[:] = jnp.zeros_like(dzb_ref)

    for s in range(S):
        # recompute the forward chain for this slice (VMEM-resident)
        xT = xT_ref[s]
        hs = []
        h = jnp.tanh(_bf16_dot(Wc_ref[:].T, xT) + bc_ref[:].T +
                     zb_ref[s].T)
        hs.append(h)
        for l in range(L):
            h = jnp.tanh(_bf16_dot(Ws_ref[l].T, h) + bs_ref[l][:, None])
            hs.append(h)

        gy = gy_ref[s]                               # (1, tile)

        # output layer
        dWo_ref[:] += _bf16_dot(hs[L], gy.T)         # (H, 1)
        dbo_ref[:] = dbo_ref[:] + jnp.sum(gy)        # (1, 1) store
        dh = _bf16_dot(Wo_ref[:], gy)                # (H, tile)

        # hidden layers, last to first
        for l in range(L - 1, -1, -1):
            G = dh * (1.0 - hs[l + 1] * hs[l + 1])
            dWs_ref[l] += _bf16_dot(hs[l], G.T)      # (H, H)
            dbs_ref[l] += jnp.sum(G, axis=1)
            dh = _bf16_dot(Ws_ref[l], G)

        # coord_latent layer
        G0 = dh * (1.0 - hs[0] * hs[0])              # (H, tile)
        dWc_ref[:] += _bf16_dot(xT, G0.T)            # (2, H)
        dbc_ref[:] += jnp.sum(G0, axis=1)[None]
        dx_ref[s] = _bf16_dot(Wc_ref[:], G0)         # (2, tile)
        dzb_ref[s] += jnp.sum(G0, axis=1)[None]      # (1, H)


# ------------------------------------------------------------- wrappers
def _specs(H, L, S, tile):
    xT_spec = pl.BlockSpec((S, 2, tile), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    zb_spec = pl.BlockSpec((S, 1, H), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    return (xT_spec, zb_spec, const((2, H)), const((1, H)),
            const((L, H, H)), const((L, H)), const((H, 1)),
            const((1, 1)))


@jax.custom_vjp
def spatial_mlp(xT, zb, Wc, bc, Ws, bs, Wo, bo):
    """Fused tanh-MLP over pixel rows.

    Args:
        xT: (B, 2, n) transposed coordinates, n a multiple of ROW_ALIGN.
        zb: (B, H) per-sample latent embedding (z @ Wz).
        Wc: (2, H), bc: (1, H) coord embedding.
        Ws: (L, H, H), bs: (L, H) hidden layers.
        Wo: (H, 1), bo: (1, 1) output head.
    Returns:
        (B, 1, n) float32.
    """
    return _fwd(xT, zb, Wc, bc, Ws, bs, Wo, bo)


def _fwd(xT, zb, Wc, bc, Ws, bs, Wo, bo):
    B, _, n = xT.shape
    H = Wc.shape[1]
    L = Ws.shape[0]
    S, tile, grid = _layout(B, n)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, L=L, S=S),
        grid=grid,
        in_specs=list(_specs(H, L, S, tile)),
        out_specs=pl.BlockSpec((S, 1, tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, n), jnp.float32),
    )(xT, zb[:, None, :], Wc, bc, Ws, bs, Wo, bo)
    return y


def _fwd_rule(xT, zb, Wc, bc, Ws, bs, Wo, bo):
    y = _fwd(xT, zb, Wc, bc, Ws, bs, Wo, bo)
    return y, (xT, zb, Wc, bc, Ws, bs, Wo, bo)


def _bwd_rule(res, gy):
    xT, zb, Wc, bc, Ws, bs, Wo, bo = res
    B, _, n = xT.shape
    H = Wc.shape[1]
    L = Ws.shape[0]
    S, tile, grid = _layout(B, n)
    const_out = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, L=L, S=S),
        grid=grid,
        in_specs=list(_specs(H, L, S, tile)) + [
            pl.BlockSpec((S, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((S, 2, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),          # dx
            pl.BlockSpec((S, 1, H), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # dzb
            const_out((2, H)), const_out((1, H)),           # dWc, dbc
            const_out((L, H, H)), const_out((L, H)),        # dWs, dbs
            const_out((H, 1)), const_out((1, 1)),           # dWo, dbo
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 2, n), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((2, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((L, H, H), jnp.float32),
            jax.ShapeDtypeStruct((L, H), jnp.float32),
            jax.ShapeDtypeStruct((H, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
    )(xT, zb[:, None, :], Wc, bc, Ws, bs, Wo, bo,
      gy.astype(jnp.float32))
    dx, dzb, dWc, dbc, dWs, dbs, dWo, dbo = outs
    return dx, dzb[:, 0, :], dWc, dbc, dWs, dbs, dWo, dbo


spatial_mlp.defvjp(_fwd_rule, _bwd_rule)


def spatial_mlp_reference(xT, zb, Wc, bc, Ws, bs, Wo, bo):
    """Pure-XLA reference of :func:`spatial_mlp` (same bf16 matmul
    routing), used for fallback shapes and parity tests."""
    x = xT.swapaxes(1, 2)                            # (B, n, 2)
    h = jnp.tanh(x @ Wc + bc + zb[:, None, :])
    for l in range(Ws.shape[0]):
        h = jnp.tanh(h @ Ws[l] + bs[l])
    y = h @ Wo + bo[0]
    return y.swapaxes(1, 2)                          # (B, 1, n)


def mlp_shapes_supported(n_pix: int, hidden: int) -> bool:
    """Pallas path preconditions. OPT-IN: XLA measured faster at the
    production shapes (see module docstring), so the kernel only engages
    with ``ATOMAI_TPU_PALLAS_MLP=1``."""
    if not os.environ.get("ATOMAI_TPU_PALLAS_MLP"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return hidden % 128 == 0 and hidden <= 512


def pad_rows(n_pix: int) -> int:
    """Rows padded to the alignment the kernel requires."""
    return ((n_pix + ROW_ALIGN - 1) // ROW_ALIGN) * ROW_ALIGN
