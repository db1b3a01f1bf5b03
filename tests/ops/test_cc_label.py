"""Connected-component labeling parity vs the scipy oracle the reference
uses (`atomai/utils/coords.py:21-34`)."""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from atomai_tpu.ops.cc_label import blob_centers, blob_centers_stack


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
