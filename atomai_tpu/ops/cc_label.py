"""Connected-component labeling + per-blob center of mass on device.

Replaces the reference's host loop over ``scipy.ndimage.label`` +
``center_of_mass`` (`atomai/utils/coords.py:21-34`, called per image/class
from `atomai/predictors/predictor.py:582-608`) with an XLA program:

1. every foreground pixel starts labeled with its flat index,
2. iterate {4-neighborhood min-propagation; pointer jumping
   (label <- label[label], a log-diameter accelerator)} inside a
   ``lax.while_loop`` until fixpoint,
3. per-blob pixel counts / first moments via ``segment_sum`` over root
   labels,
4. blob extraction with a *static* ``max_blobs`` bound via
   ``jnp.nonzero(..., size=max_blobs)`` — XLA static shapes; a validity
   mask marks real blobs.

Connectivity is 4-neighbor, matching ``scipy.ndimage.label``'s default
structure. Blob ordering matches scipy's raster-scan order because root
labels are minimal flat indices.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


# largest tiled-image pixel count run as ONE program: root labels are
# int32 flat indices (headroom below 2^31 for the background sentinel)
_INT32_SAFE_PIXELS = 2 ** 31 - 2 ** 20

# HBM cap on one tiled chunk: the program holds ~5 O(pixels) buffers at
# peak (int32 labels + mask + three float32 segment sums, plus while-loop
# temporaries), ~48 B/px — 2^26 px keeps the op around 3 GB so it shares
# a 16 GB chip with resident model/data. Overridable for big-HBM parts.
_TILED_PIXEL_BUDGET = 2 ** 26


def _neighbor_min(lab: jnp.ndarray, big: jnp.int32) -> jnp.ndarray:
    """Min over the 4-neighborhood (plus self) with BIG padding."""
    up = jnp.concatenate([lab[1:], jnp.full_like(lab[:1], big)], axis=0)
    down = jnp.concatenate([jnp.full_like(lab[:1], big), lab[:-1]], axis=0)
    left = jnp.concatenate([lab[:, 1:], jnp.full_like(lab[:, :1], big)],
                           axis=1)
    right = jnp.concatenate([jnp.full_like(lab[:, :1], big), lab[:, :-1]],
                            axis=1)
    return jnp.minimum(jnp.minimum(jnp.minimum(up, down),
                                   jnp.minimum(left, right)), lab)


@partial(jax.jit, static_argnames=("max_iters",))
def label_components(mask: jnp.ndarray, max_iters: int = 4096
                     ) -> jnp.ndarray:
    """Labels connected components of a binary mask.

    Args:
        mask: (H, W) bool/float foreground mask.
        max_iters: safety bound on propagation rounds.

    Returns:
        (H, W) int32 array: for foreground pixels, the root label (minimal
        flat index of the component); BIG (=H*W) for background.
    """
    H, W = mask.shape
    big = jnp.int32(H * W)
    fg = mask > 0
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    lab = jnp.where(fg, idx, big)

    def cond(state):
        lab, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        lab, _, it = state
        new = _neighbor_min(lab, big)
        new = jnp.where(fg, new, big)
        # pointer jumping x2: label <- label[label]
        flat = new.reshape(-1)
        flat_ext = jnp.concatenate([flat, jnp.array([big], jnp.int32)])
        safe = jnp.minimum(flat, H * W)
        flat = jnp.minimum(flat, flat_ext[safe])
        safe = jnp.minimum(flat, H * W)
        flat = jnp.minimum(flat, flat_ext[safe])
        new = jnp.where(fg, flat.reshape(H, W), big)
        changed = jnp.any(new != lab)
        return new, changed, it + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab, jnp.bool_(True), jnp.int32(0)))
    return lab


@partial(jax.jit, static_argnames=("band",))
def _blob_moments(lab: jnp.ndarray, band: int = 0
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-root pixel counts / first moments via segment_sum. Three 1D
    scatters: fusing into one (H*W, 3) scatter pads the 3-wide lane
    dimension to 128 on TPU (42x write inflation, ~8x slower).

    ``band`` > 0 (the tiled-stack path) accumulates BAND-LOCAL row
    indices: global tiled rows reach N*(H+1), so their weighted sums
    overflow float32's 2^24 integer-exact range and CoMs would drift
    with frame index. Row iotas are int32 (exact) until the final cast;
    local rows stay < band, so the sums stay exact."""
    H, W = lab.shape
    flat_lab = jnp.minimum(lab.reshape(-1), H * W)
    n_seg = H * W + 1
    ones = (flat_lab < H * W).astype(jnp.float32)
    # int32 2D iota, NOT a float flat arange: float32 is integer-exact
    # only to 2^24 and tall tiled stacks exceed 2^24 rows*pixels
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    if band:
        rows_i = rows_i % band
    rows = rows_i.reshape(-1).astype(jnp.float32) * ones
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (H, W), 1).reshape(-1).astype(jnp.float32) * ones
    counts = jax.ops.segment_sum(ones, flat_lab, num_segments=n_seg)
    row_sum = jax.ops.segment_sum(rows, flat_lab, num_segments=n_seg)
    col_sum = jax.ops.segment_sum(cols, flat_lab, num_segments=n_seg)
    return counts, row_sum, col_sum


@partial(jax.jit, static_argnames=("max_blobs", "hw"))
def _blob_extract(counts, row_sum, col_sum, max_blobs: int, hw: int):
    """Returns (coords, sizes, valid, roots): ``roots`` is each blob's
    root label (minimal flat pixel index), exact int32 — the tiled path
    derives frame indices from it."""
    counts = counts[:-1]
    root_idx = jnp.nonzero(counts > 0, size=max_blobs, fill_value=hw)[0]
    valid = root_idx < hw
    safe_idx = jnp.minimum(root_idx, hw - 1)
    c = counts[safe_idx]
    cy = row_sum[:-1][safe_idx] / jnp.maximum(c, 1.0)
    cx = col_sum[:-1][safe_idx] / jnp.maximum(c, 1.0)
    coords = jnp.stack([cy, cx], axis=-1)
    coords = jnp.where(valid[:, None], coords, 0.0)
    sizes = jnp.where(valid, c.astype(jnp.int32), 0)
    return coords, sizes, valid, root_idx


def blob_centers(mask: jnp.ndarray, max_blobs: int = 2048
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Centers of mass of connected components (binary weights, matching
    ``ndimage.center_of_mass`` on a thresholded map).

    Runs as three separately-jitted stages (label -> moments -> extract):
    one monolithic jit schedules ~4x slower at 2048^2 on TPU and costs
    minutes of XLA compile time per (shape, max_blobs) pair, while the
    stages compile once each and the extract recompiles only per
    max_blobs bucket.

    Returns:
        coords: (max_blobs, 2) float32 (row, col) centers (0 for padding).
        sizes: (max_blobs,) int32 pixel counts (0 for padding).
        valid: (max_blobs,) bool validity mask.
    """
    H, W = mask.shape
    # in-VMEM Pallas labeling on TPU for images that fit; XLA while-loop
    # otherwise (see atomai_tpu/ops/pallas_cc.py)
    from .pallas_cc import label_components_auto
    lab = label_components_auto(mask)
    counts, row_sum, col_sum = _blob_moments(lab)
    return _blob_extract(counts, row_sum, col_sum, max_blobs, H * W)[:3]


def find_com_device(image_data: jnp.ndarray, max_blobs: int = 2048):
    """Device analog of `atomai/utils/coords.py:21-34` ``find_com``."""
    return blob_centers(image_data, max_blobs)


def blob_centers_stack(masks: jnp.ndarray, max_blobs: int = 2048):
    """Batched blob centers: (N, H, W) -> ((N, max_blobs, 2), (N, max_blobs),
    (N, max_blobs)).

    Frames run through the single-mask jitted program sequentially (all
    dispatched before stacking): vmapping the while-loop labeler batches
    its gathers pathologically (4x2048^2: ~5.5 s vmapped vs ~1.5 s looped)
    and recompiles per frame count, several minutes of XLA time at 2048^2.
    For MANY frames use :func:`blob_centers_tiled` — one program for the
    whole stack."""
    outs = [blob_centers(masks[i], max_blobs)
            for i in range(masks.shape[0])]
    coords, sizes, valids = zip(*outs)
    return (jnp.stack(coords), jnp.stack(sizes), jnp.stack(valids))


def blob_centers_tiled(masks: jnp.ndarray, max_blobs_total: int = 65536
                       ) -> Tuple[jnp.ndarray, ...]:
    """Blob centers for a WHOLE stack in one device program.

    Frames tile vertically with a one-row background separator —
    4-connectivity cannot cross it, so components never merge across
    frames — and the tiled (N*(H+1), W) image runs through a single
    label -> moments -> extract pass. This amortizes per-frame dispatch
    latency (~0.1-0.5 s each over a remote-TPU tunnel) over the stack:
    at 64x512^2 it is one dispatch chain instead of 64x3.

    Returns:
        coords: (max_blobs_total, 2) float32 per-frame-local (row, col).
        frames: (max_blobs_total,) int32 frame index of each blob.
        sizes:  (max_blobs_total,) int32 pixel counts (0 for padding).
        valid:  (max_blobs_total,) bool validity mask.

    Blob order is frame-major then per-frame raster order — identical to
    concatenating :func:`blob_centers` results frame by frame.
    """
    N, H, W = masks.shape
    # chunk long stacks on two bounds: the labeler's root labels are
    # int32 FLAT indices of the tiled image (a 512-frame 2048^2 movie
    # crosses 2^31 pixels), and the program's ~5 O(pixels) buffers must
    # fit in HBM alongside the resident model (_TILED_PIXEL_BUDGET)
    max_frames = max(
        1, min(_INT32_SAFE_PIXELS, _TILED_PIXEL_BUDGET) // ((H + 1) * W))
    if N > max_frames:
        import numpy as _np
        pcs, pfs, pss = [], [], []
        for s in range(0, N, max_frames):
            c, f, z, v = blob_centers_tiled(masks[s:s + max_frames],
                                            max_blobs_total)
            nv = int(_np.asarray(jnp.sum(v)))  # valid blobs form a prefix
            pcs.append(_np.asarray(c)[:nv])
            pfs.append(_np.asarray(f)[:nv] + s)
            pss.append(_np.asarray(z)[:nv])
        coords = _np.concatenate(pcs)[:max_blobs_total]
        frames = _np.concatenate(pfs)[:max_blobs_total]
        sizes = _np.concatenate(pss)[:max_blobs_total]
        nv = coords.shape[0]
        pad = max_blobs_total - nv
        coords = _np.pad(coords, ((0, pad), (0, 0)))
        frames = _np.pad(frames, (0, pad), constant_values=-1)
        sizes = _np.pad(sizes, (0, pad))
        valid = _np.arange(max_blobs_total) < nv
        return (jnp.asarray(coords), jnp.asarray(frames),
                jnp.asarray(sizes), jnp.asarray(valid))
    tiled = jnp.pad(masks, ((0, 0), (0, 1), (0, 0))).reshape(
        N * (H + 1), W)
    from .pallas_cc import label_components_auto
    lab = label_components_auto(tiled)
    # band-local row moments: global tiled row sums overflow float32's
    # integer-exact range on long stacks (CoM drift ~frame_index*eps)
    counts, row_sum, col_sum = _blob_moments(lab, band=H + 1)
    local, sizes, valid, roots = _blob_extract(
        counts, row_sum, col_sum, max_blobs_total, N * (H + 1) * W)
    # the root label is the blob's minimal flat pixel index — exact
    # int32 arithmetic recovers the frame (no float row division)
    frames = (roots // W) // (H + 1)
    local = jnp.where(valid[:, None], local, 0.0)
    frames = jnp.where(valid, frames, -1)
    return local, frames, sizes, valid
