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


@pytest.mark.parametrize("case", [
    "all_fg", "all_bg", "corners", "single_px", "checker", "row", "col",
    "border_ring", "tall", "wide"])
def test_blob_centers_adversarial_geometries(case):
    """Degenerate geometries vs the scipy oracle: full-foreground,
    isolated corner pixels, checkerboards (max component count),
    full-width/height lines, a border ring, extreme aspect ratios."""
    H, W = 24, 24
    m = np.zeros((H, W), np.float32)
    if case == "all_fg":
        m[:] = 1
    elif case == "all_bg":
        pass
    elif case == "corners":
        m[0, 0] = m[0, -1] = m[-1, 0] = m[-1, -1] = 1
    elif case == "single_px":
        m[11, 7] = 1
    elif case == "checker":
        m[::2, ::2] = 1
    elif case == "row":
        m[5, :] = 1
    elif case == "col":
        m[:, 9] = 1
    elif case == "border_ring":
        m[0, :] = m[-1, :] = 1
        m[:, 0] = m[:, -1] = 1
    elif case == "tall":
        m = np.zeros((64, 4), np.float32)
        m[10:20, 1:3] = 1
    elif case == "wide":
        m = np.zeros((4, 64), np.float32)
        m[1:3, 30:50] = 1
    expected = _scipy_com(m)
    coords, sizes, valid = (np.asarray(a) for a in
                            blob_centers(jnp.asarray(m), 1024))
    got = coords[valid]
    assert len(got) == len(expected), case
    if len(got):
        np.testing.assert_allclose(got, expected, atol=1e-4, err_msg=case)
    # sizes must sum to the foreground pixel count
    assert sizes[valid].sum() == int(m.sum()), case


@pytest.mark.parametrize("seed", range(6))
def test_blob_centers_random_density_sweep(seed):
    """Random masks across densities (sparse dots -> near-full) and
    non-square shapes; exact blob-count and CoM parity with scipy."""
    rng = np.random.RandomState(seed)
    H = int(rng.randint(8, 50))
    W = int(rng.randint(8, 50))
    density = [0.02, 0.2, 0.5, 0.8, 0.95, 0.99][seed]
    m = (rng.rand(H, W) < density).astype(np.float32)
    expected = _scipy_com(m)
    coords, sizes, valid = (np.asarray(a) for a in
                            blob_centers(jnp.asarray(m), H * W))
    got = coords[valid]
    assert len(got) == len(expected), (H, W, density)
    order = np.lexsort((got[:, 1], got[:, 0])) if len(got) else []
    eorder = np.lexsort((expected[:, 1], expected[:, 0])) \
        if len(expected) else []
    if len(got):
        np.testing.assert_allclose(got[order], expected[eorder], atol=1e-4)
