"""Image-utility tests (reference model: `test/utils/test_img.py`)."""

import numpy as np
import pytest

from atomai_tpu.utils import (crop_borders, cv_thresh, extract_patches,
                              extract_patches_and_spectra,
                              extract_subimages, filter_cells, FFTmask,
                              FFTsub, get_blob_params, get_contours,
                              get_coord_grid, get_imgstack, img_pad,
                              img_resize, threshImg)


def test_img_pad_to_multiple():
    x = np.ones((2, 30, 29))
    out = img_pad(x, 8)
    assert out.shape == (2, 32, 32)
    np.testing.assert_array_equal(out[:, 30:, :], 0)


def test_img_pad_noop():
    x = np.ones((2, 32, 32))
    assert img_pad(x, 8).shape == (2, 32, 32)


def test_img_resize():
    x = np.random.rand(2, 16, 16)
    out = img_resize(x, (32, 32))
    assert out.shape == (2, 32, 32)


def test_get_imgstack_filters_edges():
    img = np.random.rand(32, 32, 1)
    coord = np.array([[16.0, 16.0], [1.0, 1.0]])  # 2nd too close to edge
    stack, com = get_imgstack(img, coord, 8)
    assert stack.shape == (1, 8, 8, 1)
    np.testing.assert_array_equal(com[0], [16.0, 16.0])


def test_extract_subimages_dict():
    imgs = np.random.rand(2, 32, 32, 1)
    coords = {i: np.array([[16.0, 16.0, 0.0], [20.0, 12.0, 1.0]])
              for i in range(2)}
    sub, com, frames = extract_subimages(imgs, coords, 8, coord_class=0)
    assert sub.shape == (2, 8, 8, 1)
    assert set(frames.tolist()) == {0, 1}


def test_extract_subimages_more_frames_than_images():
    """A multi-frame coordinate dict applied to a shorter image stack
    truncates to the image count (reference zip() tolerance) instead of
    raising on the out-of-range frame index."""
    img = np.random.rand(32, 32)
    coords = {i: np.array([[16.0, 16.0, 0.0]]) for i in range(3)}
    sub, com, frames = extract_subimages(img, coords, 8, coord_class=0)
    assert sub.shape == (1, 8, 8, 1)
    assert frames.tolist() == [0]


def test_extract_patches_pairs():
    img = np.random.rand(64, 64)
    mask = (img > .5).astype(float)
    ims, ms = extract_patches(img, mask, 16, 10, random_state=1)
    assert ims.shape == (10, 16, 16)
    # image/mask patches must be cut at identical positions
    np.testing.assert_array_equal((ims > .5).astype(float), ms)


def test_extract_patches_and_spectra():
    cube = np.random.rand(32, 32, 16)
    img = cube.mean(-1)
    coords = np.array([[16.0, 16.0], [10.0, 20.0]])
    patches, spectra, out_coords = extract_patches_and_spectra(
        cube, img, coordinates=coords, window_size=8, avg_pool=2)
    assert patches.shape[0] == spectra.shape[0] == len(out_coords)
    assert spectra.shape[-1] == 8  # 16 / avg_pool


def test_fft_defect_tooling():
    img = np.random.rand(64, 64)
    F2, F3 = FFTmask(img, maskratio=8)
    diff = FFTsub(img, F3)
    assert diff.min() >= 0 and diff.max() <= 1
    defects = threshImg(diff, 0.25, 0.75)
    assert defects.dtype == bool


def test_crop_borders():
    img = np.zeros((16, 16, 1))
    img[4:12, 4:12, 0] = 1.0
    out = crop_borders(img, thresh=0)
    assert out.shape == (8, 8, 1)


def test_coord_grid_dict_format():
    imgs = np.random.rand(2, 16, 16)
    d = get_coord_grid(imgs, step=4, return_dict=True)
    assert set(d.keys()) == {0, 1}
    assert d[0].shape[-1] == 3


def test_cv_thresh_strictly_greater():
    x = np.array([[0.4, 0.5, 0.6]])
    np.testing.assert_array_equal(cv_thresh(x, 0.5), [[0, 0, 1]])


def test_filter_cells_removes_small_blobs():
    img = np.zeros((32, 32))
    img[2:4, 2:4] = 1           # 4 px blob
    img[10:20, 10:20] = 1       # 100 px blob
    out = filter_cells(img[None], im_thresh=.5, blob_thresh=50,
                       filter_="below")[0]
    assert out[12, 12] == 1
    assert out[2, 2] == 0


def test_get_contours_and_blob_params():
    img = np.zeros((32, 32))
    img[10:20, 10:18] = 1
    contours = get_contours(img)
    assert len(contours) == 1
    assert contours[0].shape[-1] == 2
    blobs = get_blob_params(img[None, ..., None], 0.5, 10)
    assert blobs[0]["coordinates"] is not None


# ---- interpolation-semantics tolerance tests (SURVEY.md hard-part #3:
# cv2 INTER_AREA/INTER_CUBIC vs jax.image — match within tolerance, not
# bit-exactly). torch.nn.functional.interpolate follows the same
# half-pixel-center conventions as OpenCV for these modes and serves as
# the oracle (cv2 itself is not installed in this environment).

def _smooth_image(n=64):
    x = np.linspace(0, 3 * np.pi, n)
    return (np.sin(x)[:, None] * np.cos(x * 0.7)[None, :] * 0.5
            + 0.5).astype(np.float32)


def test_resize_upsample_matches_torch_bilinear():
    import torch
    import torch.nn.functional as F
    from atomai_tpu.utils.img import cv_resize

    img = _smooth_image(32)
    ours = cv_resize(img, (64, 64))
    with torch.no_grad():
        ref = F.interpolate(torch.from_numpy(img)[None, None],
                            size=(64, 64), mode="bilinear",
                            align_corners=False).numpy()[0, 0]
    assert np.abs(ours - ref).max() < 0.02
    assert np.corrcoef(ours.ravel(), ref.ravel())[0, 1] > 0.9999


def test_resize_downsample_matches_torch_area():
    """jax.image.resize anti-aliased linear downsampling approximates
    cv2.INTER_AREA (= torch 'area') on smooth images (reference uses
    INTER_AREA/INTER_CUBIC in `utils/img.py:64`)."""
    import torch
    import torch.nn.functional as F
    from atomai_tpu.utils.img import cv_resize

    img = _smooth_image(64)
    ours = cv_resize(img, (16, 16))
    with torch.no_grad():
        ref = F.interpolate(torch.from_numpy(img)[None, None],
                            size=(16, 16), mode="area").numpy()[0, 0]
    assert np.abs(ours - ref).max() < 0.03
    assert np.corrcoef(ours.ravel(), ref.ravel())[0, 1] > 0.999


def test_resize_downsample_matches_torch_bicubic():
    import torch
    import torch.nn.functional as F
    from atomai_tpu.utils.img import cv_resize

    img = _smooth_image(48)
    ours = cv_resize(img, (24, 24))
    with torch.no_grad():
        ref = F.interpolate(torch.from_numpy(img)[None, None],
                            size=(24, 24), mode="bicubic",
                            align_corners=False,
                            antialias=True).numpy()[0, 0]
    assert np.abs(ours - ref).max() < 0.03


def test_get_imgstack_matches_slice_loop_oracle():
    """Vectorized batched gather must reproduce the reference's per-atom
    slice loop exactly (`atomai/utils/img.py:138-180`), including the
    edge rule for odd/even windows and NaN rejection."""
    rng = np.random.RandomState(3)
    img = rng.rand(40, 37).astype(np.float32)
    img[10, 11] = np.nan
    coord = np.stack([rng.uniform(-2, 42, 200),
                      rng.uniform(-2, 39, 200)], axis=1)
    for r in (5, 6):
        crops, kept = get_imgstack(img, coord, r)
        # oracle: literal python slicing per coordinate
        exp_crops, exp_kept = [], []
        for c in coord:
            cx, cy = int(np.around(c[0])), int(np.around(c[1]))
            if r % 2:
                w = img[cx - r // 2:cx + r // 2 + 1,
                        cy - r // 2:cy + r // 2 + 1]
            else:
                w = img[cx - r // 2:cx + r // 2, cy - r // 2:cy + r // 2]
            if w.shape == (r, r) and not np.isnan(w).any():
                exp_crops.append(w)
                exp_kept.append(c)
        assert len(kept) == len(exp_kept)
        np.testing.assert_array_equal(crops, np.stack(exp_crops))
        np.testing.assert_array_equal(kept, np.stack(exp_kept))


def test_get_intensities_clipped_window_means():
    """Summed-area-table intensities equal naive clipped-window means for
    interior AND off-edge atoms."""
    from atomai_tpu.utils.coords import get_intensities_

    rng = np.random.RandomState(0)
    img = rng.rand(30, 33)
    coord = np.stack([rng.uniform(0, 30, 100),
                      rng.uniform(0, 33, 100)], axis=1)
    # fully out-of-bounds atoms (e.g. drift-extrapolated) must yield NaN,
    # not a fabricated low intensity
    coord = np.concatenate([coord, [[-10.0, -10.0], [95.0, 5.0]]])
    for r in (3, 4):
        got = get_intensities_(coord, img, r)
        for k, c in enumerate(coord):
            cx, cy = int(np.around(c[0])), int(np.around(c[1]))
            x0, x1 = max(cx - r // 2, 0), min(cx - r // 2 + r, 30)
            y0, y1 = max(cy - r // 2, 0), min(cy - r // 2 + r, 33)
            if x1 > x0 and y1 > y0:
                np.testing.assert_allclose(got[k], img[x0:x1, y0:y1].mean(),
                                           rtol=1e-10)
            else:
                assert np.isnan(got[k]), (k, got[k])


def test_cv_rotate_direction_consistent_and_multichannel():
    """Arbitrary-angle rotation must match the 90-degree fast path's CCW
    convention (cv2 positive angle) and accept (H, W, C) images."""
    from atomai_tpu.utils import cv_rotate

    img = np.zeros((16, 16), np.float32)
    img[2, :] = 1.0                      # bright row near the top
    exact = cv_rotate(img, 90)           # np.rot90 fast path (CCW)
    warped = cv_rotate(img, 90.0001)     # warp path
    # the bright line must land on the SAME side for both paths
    assert abs(exact.sum(0).argmax() - warped.sum(0).argmax()) <= 1
    # multichannel arbitrary-angle rotation must not crash
    rgb = np.stack([img, img * 2, img * 3], axis=-1)
    out = cv_rotate(rgb, 45)
    assert out.shape == rgb.shape and np.isfinite(out).all()


def test_extract_subimages_empty_returns_arrays():
    """No-valid-coordinate inputs must return empty ARRAYS of matching
    rank — bare lists crash extract_patches_and_spectra's .squeeze()."""
    from atomai_tpu.utils import extract_subimages

    img = np.random.RandomState(0).rand(1, 32, 32, 1)
    # every coordinate within window_size//2 of the edge -> all dropped
    coords = {0: np.array([[0.0, 0.0, 0.0], [31.0, 31.0, 0.0]])}
    subs, coms, frames = extract_subimages(img, coords, window_size=16)
    assert subs.shape == (0, 16, 16, 1)
    assert coms.shape == (0, 2) and frames.shape == (0,)
