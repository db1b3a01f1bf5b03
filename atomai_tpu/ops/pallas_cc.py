"""Pallas kernel: in-VMEM connected-component label propagation.

The XLA path (`atomai_tpu/ops/cc_label.py`) runs one 4-neighbor
min-propagation sweep per `lax.while_loop` iteration — each sweep reads and
writes the full label image in HBM. This kernel keeps the label image
resident in VMEM and runs the whole fixpoint iteration on-chip: for a 512^2
float32 image (1 MB) that removes ~2 x diameter HBM round trips.

Shapes are static; the iteration count is bounded by ``max_iters`` with an
early-exit ``lax.while_loop`` on a change flag. Images up to ~1024^2 f32
fit comfortably in VMEM (4 MB label + 4 MB mask); larger images should use
the XLA path.

Labels are float32 inside the kernel (VPU-friendly minimums); flat indices
up to 2^24 are exactly representable, which covers images to 4096^2.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cc_kernel(mask_ref, lab_out_ref, *, max_iters: int):
    H, W = mask_ref.shape
    big = float(H * W)
    fg = mask_ref[:] > 0
    # Mosaic requires integer iota; cast to f32 afterwards
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0
                                       ).astype(jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1
                                       ).astype(jnp.float32)
    init = jnp.where(fg, row_ids * W + col_ids, big)

    def sweep(lab):
        up = jnp.concatenate([lab[1:], jnp.full((1, W), big)], axis=0)
        down = jnp.concatenate([jnp.full((1, W), big), lab[:-1]], axis=0)
        left = jnp.concatenate([lab[:, 1:], jnp.full((H, 1), big)],
                               axis=1)
        right = jnp.concatenate([jnp.full((H, 1), big), lab[:, :-1]],
                                axis=1)
        m = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        return jnp.where(fg, jnp.minimum(lab, m), big)

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        lab, _, it = state
        new = sweep(lab)
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    lab_out_ref[:] = lab


@partial(jax.jit, static_argnames=("max_iters", "interpret"))
def label_components_pallas(mask: jnp.ndarray, max_iters: int = 4096,
                            interpret: bool = False) -> jnp.ndarray:
    """Labels connected components (4-neighborhood); returns int32 root
    labels (min flat index per component; H*W for background).

    Equivalent to `atomai_tpu.ops.cc_label.label_components` but the whole
    fixpoint iteration stays in VMEM.
    """
    H, W = mask.shape
    lab_f = pl.pallas_call(
        partial(_cc_kernel, max_iters=max_iters),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        interpret=interpret,
    )(mask.astype(jnp.float32))
    return lab_f.astype(jnp.int32)


# VMEM budget: mask + 2 label buffers in f32
_PALLAS_MAX_PIXELS = 1024 * 1024


def label_components_auto(mask: jnp.ndarray, max_iters: int = 4096
                          ) -> jnp.ndarray:
    """Chooses the Pallas in-VMEM kernel on TPU for images that fit, the
    XLA while-loop path otherwise."""
    from .cc_label import label_components
    H, W = mask.shape
    # the kernel is TPU-only (pltpu.VMEM): a GPU/METAL backend must take
    # the portable XLA path, not "anything that isn't cpu". "axon" is a
    # remote-TPU plugin platform name (canonicalizes to tpu for MLIR).
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and H * W <= _PALLAS_MAX_PIXELS and W >= 128:
        return label_components_pallas(mask, max_iters)
    return label_components(mask, max_iters)
