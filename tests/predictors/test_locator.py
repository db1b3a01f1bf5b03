"""Locator end-to-end tests with a scipy oracle reproducing the reference
pipeline (`atomai/predictors/predictor.py:531-639` + golden-fixture style of
`/root/reference/test/predictors/test_locator.py`)."""

import numpy as np
from scipy import ndimage

from atomai_tpu.predictors import Locator
from atomai_tpu.utils import make_lattice_stack


def _oracle_locator(nn_output, threshold=0.5, dist_edge=5):
    """Host reimplementation of the reference Locator with scipy."""
    if nn_output.shape[-1] == 1:
        nn_output = np.concatenate([nn_output, 1 - nn_output], axis=3)
    d_coord = {}
    for i, dec in enumerate(nn_output):
        coordinates = np.empty((0, 2))
        category = np.empty((0, 1))
        for ch in range(dec.shape[-1] - 1):
            mask = (dec[..., ch] > threshold).astype(float)
            labels, nlab = ndimage.label(mask)
            if nlab:
                coord = np.array(ndimage.center_of_mass(
                    mask, labels, np.arange(nlab) + 1)).reshape(-1, 2)
            else:
                coord = np.zeros((0, 2))
            h, w = dec.shape[:2]
            keep = ~((coord[:, 0] > h - dist_edge) |
                     (coord[:, 0] < dist_edge) |
                     (coord[:, 1] > w - dist_edge) |
                     (coord[:, 1] < dist_edge))
            coord = coord[keep]
            coordinates = np.append(coordinates, coord, axis=0)
            category = np.append(
                category, np.zeros((len(coord), 1)) + ch, axis=0)
        d_coord[i] = np.concatenate([coordinates, category], axis=1)
    return d_coord


def test_locator_matches_scipy_oracle():
    _, masks, _ = make_lattice_stack(n_images=3, size=64, spacing=12,
                                     seed=2)
    nn_output = masks[..., None].astype(np.float32)
    ours = Locator(0.5).run(nn_output)
    oracle = _oracle_locator(nn_output)
    for k in oracle:
        assert ours[k].shape == oracle[k].shape
        # sort rows for comparison robustness
        a = ours[k][np.lexsort(ours[k][:, :2].T)]
        b = oracle[k][np.lexsort(oracle[k][:, :2].T)]
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_locator_multiclass():
    rng = np.random.RandomState(0)
    out = np.zeros((1, 32, 32, 3), np.float32)
    out[0, 10:13, 10:13, 0] = 1.0
    out[0, 20:23, 20:23, 1] = 1.0
    out[..., 2] = 1 - out[..., 0] - out[..., 1]  # background last
    coords = Locator(0.5, dist_edge=1).run(out)
    assert coords[0].shape == (2, 3)
    classes = sorted(coords[0][:, 2].tolist())
    assert classes == [0.0, 1.0]


def test_locator_refine_runs():
    imgs, masks, _ = make_lattice_stack(n_images=1, size=64, spacing=12,
                                        seed=3)
    nn_output = masks[..., None].astype(np.float32)
    loc = Locator(0.5, refine=True, d=4)
    coords = loc.run(nn_output, imgs[..., None])
    assert coords[0].shape[1] == 3
    assert len(coords[0]) > 0


def test_locator_no_silent_truncation_single_pixel_blobs():
    """N isolated single-pixel atoms must yield exactly N coordinates:
    under 4-connectivity the component count can equal the foreground
    pixel count, so the static blob bound may not assume >= 2 px/blob
    (scipy.ndimage.label never drops components)."""
    h = w = 64
    prob = np.zeros((1, h, w, 1), np.float32)
    ys, xs = np.mgrid[8:h - 8:2, 8:w - 8:2]  # isolated pixels, spacing 2
    prob[0, ys.ravel(), xs.ravel(), 0] = 1.0
    n_atoms = ys.size
    coords = Locator(threshold=0.5, dist_edge=1).run(prob)[0]
    assert coords.shape[0] == n_atoms
    got = {(int(r), int(c)) for r, c in coords[:, :2]}
    expect = {(int(r), int(c)) for r, c in zip(ys.ravel(), xs.ravel())}
    assert got == expect


def test_find_com_no_silent_truncation():
    from atomai_tpu.utils.coords import find_com
    img = np.zeros((32, 32), np.float32)
    ys, xs = np.mgrid[2:30:2, 2:30:2]
    img[ys.ravel(), xs.ravel()] = 1.0
    coords = find_com(img)
    assert coords.shape[0] == ys.size


def test_locator_channel_first_dim_order():
    """Locator(dim_order='channel_first') on NCHW maps matches the
    channel-last result (reference `test_locator.py:35-39`)."""
    rng = np.random.RandomState(2)
    prob = rng.rand(2, 32, 32, 2).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)      # softmax-like, 2 channels
    loc_l = Locator(threshold=0.6)
    loc_f = Locator(threshold=0.6, dim_order="channel_first")
    out_l = loc_l.run(prob)
    out_f = loc_f.run(prob.transpose(0, 3, 1, 2))
    for k in out_l:
        np.testing.assert_allclose(out_f[k], out_l[k], atol=1e-6)
