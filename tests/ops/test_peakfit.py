"""Batched 2D-Gaussian peak refinement tests (reference behavior:
`atomai/utils/coords.py:179-231`)."""

import numpy as np
import jax.numpy as jnp

from atomai_tpu.ops.peakfit import refine_peaks
from atomai_tpu.utils.coords import gaussian_2d


def _make_image_with_peaks(centers, size=64, sigma=1.5):
    x, y = np.mgrid[:size, :size]
    img = np.zeros((size, size), np.float32)
    for (cy, cx) in centers:
        img += gaussian_2d((x, y), 1.0, cy, cx, sigma, sigma, 0, 0
                           ).reshape(size, size)
    return img


def test_refine_recovers_subpixel_centers():
    true_centers = np.array([[20.3, 20.7], [40.6, 18.2], [30.1, 45.9]])
    img = _make_image_with_peaks(true_centers)
    # start from rounded (integer) guesses
    init = np.round(true_centers)
    refined = np.asarray(refine_peaks(jnp.asarray(img),
                                      jnp.asarray(init, jnp.float32), d=6))
    err_init = np.abs(init - true_centers).max()
    err_ref = np.abs(refined - true_centers).max()
    assert err_ref < 0.15
    assert err_ref < err_init


def test_refine_keeps_coord_on_failure():
    """Out-of-bounds windows must fall back to the input coordinate
    (reference `coords.py:220-226`)."""
    img = np.random.RandomState(0).rand(32, 32).astype(np.float32)
    init = np.array([[1.0, 1.0], [30.0, 30.0]])
    refined = np.asarray(refine_peaks(jnp.asarray(img),
                                      jnp.asarray(init, jnp.float32), d=6))
    np.testing.assert_allclose(refined, init)
