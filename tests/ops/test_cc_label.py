"""Connected-component labeling parity vs the scipy oracle the reference
uses (`atomai/utils/coords.py:21-34`)."""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from atomai_tpu.ops.cc_label import (blob_centers, blob_centers_stack,
                                     blob_centers_tiled)


def _scipy_com(mask):
    labels, nlabels = ndimage.label(mask)
    if nlabels == 0:
        return np.zeros((0, 2))
    coms = np.array(ndimage.center_of_mass(
        mask, labels, np.arange(nlabels) + 1))
    return coms.reshape(-1, 2)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_blob_centers_match_scipy(seed):
    rng = np.random.RandomState(seed)
    mask = np.zeros((64, 64), np.float32)
    # plant random blobs
    for _ in range(10):
        y, x = rng.randint(5, 59, 2)
        r = rng.randint(1, 4)
        yy, xx = np.ogrid[:64, :64]
        mask[(yy - y) ** 2 + (xx - x) ** 2 <= r * r] = 1.0
    expected = _scipy_com(mask)
    coords, sizes, valid = blob_centers(jnp.asarray(mask), max_blobs=64)
    got = np.asarray(coords)[np.asarray(valid)]
    assert got.shape == expected.shape
    # raster order must match scipy's labeling order
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_blob_centers_empty():
    mask = np.zeros((32, 32), np.float32)
    coords, sizes, valid = blob_centers(jnp.asarray(mask), max_blobs=16)
    assert not np.asarray(valid).any()


def test_blob_centers_stack_batched():
    rng = np.random.RandomState(3)
    masks = (rng.rand(4, 32, 32) > 0.95).astype(np.float32)
    coords, sizes, valid = blob_centers_stack(jnp.asarray(masks), 64)
    assert coords.shape == (4, 64, 2)
    for i in range(4):
        expected = _scipy_com(masks[i])
        got = np.asarray(coords[i])[np.asarray(valid[i])]
        assert len(got) == len(expected)
        np.testing.assert_allclose(got, expected, atol=1e-4)


def test_blob_centers_tiled_matches_per_frame():
    """Many-frame single-program path: identical blobs (frame-major,
    raster order) to the per-frame dispatch loop, incl. blobs touching the
    frame's bottom edge (adjacent to the separator row)."""
    rng = np.random.RandomState(7)
    masks = (rng.rand(16, 24, 24) > 0.9).astype(np.float32)
    masks[:, -1, ::3] = 1.0          # blobs on the tiled seam
    coords_t, frames_t, sizes_t, valid_t = blob_centers_tiled(
        jnp.asarray(masks), 1024)
    coords_t = np.asarray(coords_t)
    frames_t = np.asarray(frames_t)
    valid_t = np.asarray(valid_t)
    for i in range(16):
        expected = _scipy_com(masks[i])
        got = coords_t[(frames_t == i) & valid_t]
        assert len(got) == len(expected), i
        np.testing.assert_allclose(got, expected, atol=1e-4)


def test_blob_centers_tiled_chunked_matches_single(monkeypatch):
    """Stacks whose tiled image would overflow int32 flat indices split
    into chunks; the merged output must equal the single-program path."""
    import atomai_tpu.ops.cc_label as cc

    rng = np.random.RandomState(3)
    masks = (rng.rand(10, 16, 16) > 0.88).astype(np.float32)
    ref = [np.asarray(a) for a in blob_centers_tiled(jnp.asarray(masks),
                                                     256)]
    # force chunking at ~3 frames per chunk
    monkeypatch.setattr(cc, "_INT32_SAFE_PIXELS", 3 * 17 * 16)
    got = [np.asarray(a) for a in blob_centers_tiled(jnp.asarray(masks),
                                                     256)]
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, atol=1e-4)


def test_blob_centers_tiled_deep_stack_exact():
    """CoMs of blobs in LATE frames of a deep stack must be exact: the
    tiled image's global row indices produce weighted sums beyond
    float32's 2^24 integer-exact range (here ~3.3e7), so moments must
    accumulate frame-local rows and recover the frame from the int32
    root label, not from a float row division."""
    N, H, W = 2000, 64, 64
    masks = np.zeros((N, H, W), np.float32)
    masks[-1, 20:36, 8:24] = 1.0          # 256-px block, frame 1999
    masks[0, 2:6, 2:6] = 1.0              # early-frame control
    coords, frames, sizes, valid = blob_centers_tiled(
        jnp.asarray(masks), 256)
    coords, frames = np.asarray(coords), np.asarray(frames)
    valid = np.asarray(valid)
    assert valid.sum() == 2
    late = coords[(frames == N - 1) & valid]
    np.testing.assert_allclose(late, [[27.5, 15.5]], atol=1e-4)
    early = coords[(frames == 0) & valid]
    np.testing.assert_allclose(early, [[3.5, 3.5]], atol=1e-4)


def test_tiled_pixel_budget_bounds_chunks(monkeypatch):
    """The tiled path must chunk on the HBM pixel budget, not only on
    int32 label safety — one unbounded program OOMs real chips."""
    import atomai_tpu.ops.cc_label as cc

    rng = np.random.RandomState(5)
    masks = (rng.rand(12, 16, 16) > 0.88).astype(np.float32)
    ref = [np.asarray(a) for a in blob_centers_tiled(jnp.asarray(masks),
                                                     256)]
    calls = []
    orig = cc._blob_moments

    def spy(lab, band=0):
        calls.append(lab.shape)
        return orig(lab, band)

    monkeypatch.setattr(cc, "_blob_moments", spy)
    monkeypatch.setattr(cc, "_TILED_PIXEL_BUDGET", 4 * 17 * 16)
    got = [np.asarray(a) for a in blob_centers_tiled(jnp.asarray(masks),
                                                     256)]
    assert len(calls) == 3 and all(s[0] <= 4 * 17 for s in calls)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, atol=1e-4)


def test_locator_many_frames_matches_few():
    """Locator's tiled (>8 masks) and per-frame (<=8) paths must agree."""
    from atomai_tpu.predictors import Locator

    rng = np.random.RandomState(1)
    prob = rng.rand(10, 32, 32, 1).astype(np.float32)
    loc = Locator(threshold=0.9, dist_edge=2)
    out_tiled = loc.run(prob)                  # 10 masks -> tiled path
    out_frame = {}
    for i in range(10):
        out_frame[i] = loc.run(prob[i:i + 1])[0]   # 1 mask -> per-frame
    for i in range(10):
        np.testing.assert_allclose(out_tiled[i], out_frame[i], atol=1e-4)


def test_snake_blob():
    """Long thin connected structure — stresses propagation convergence."""
    mask = np.zeros((32, 32), np.float32)
    mask[1, 1:30] = 1
    mask[1:30, 29] = 1
    mask[29, 5:30] = 1
    expected = _scipy_com(mask)
    coords, _, valid = blob_centers(jnp.asarray(mask), max_blobs=8)
    got = np.asarray(coords)[np.asarray(valid)]
    assert len(got) == 1 == len(expected)
    np.testing.assert_allclose(got, expected, atol=1e-4)
