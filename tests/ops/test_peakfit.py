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


def test_refine_falls_back_when_fit_moves_over_3px():
    """A window whose best-fit center is >= 3 px from the window center
    must keep the original coordinate (reference `coords.py:220-224`)."""
    size = 32
    x, y = np.mgrid[:size, :size]
    # single bright peak far from the queried location
    img = gaussian_2d((x, y), 1.0, 24.0, 24.0, 1.5, 1.5, 0, 0
                      ).reshape(size, size).astype(np.float32)
    init = np.array([[16.0, 16.0]])  # window [10..22): peak at 24 outside
    refined = np.asarray(refine_peaks(jnp.asarray(img),
                                      jnp.asarray(init, jnp.float32), d=6))
    np.testing.assert_allclose(refined, init)


def test_refine_matches_scipy_curve_fit():
    """Accuracy oracle: the vmapped LM recovers centers as well as
    scipy.optimize.curve_fit on the same windows."""
    from scipy.optimize import curve_fit

    true_centers = np.array([[15.35, 14.6], [40.75, 41.3]])
    img = _make_image_with_peaks(true_centers, size=56, sigma=1.8)
    rng = np.random.RandomState(0)
    img = img + 0.01 * rng.randn(*img.shape).astype(np.float32)
    init = np.round(true_centers)
    d = 6
    refined = np.asarray(refine_peaks(jnp.asarray(img),
                                      jnp.asarray(init, jnp.float32), d=d))
    sp = []
    for (cx, cy) in init.astype(int):
        win = img[cx - d:cx + d, cy - d:cy + d]
        xy = np.mgrid[:2 * d, :2 * d].astype(np.float64)
        p0 = [win[d, d], d, d, 1.0, 1.0, 0.0, 0.0]
        popt, _ = curve_fit(gaussian_2d, (xy[0], xy[1]), win.ravel(),
                            p0=p0, maxfev=2000)
        sp.append([popt[1] + cx - d, popt[2] + cy - d])
    sp = np.asarray(sp)
    err_ours = np.abs(refined - true_centers).max()
    err_scipy = np.abs(sp - true_centers).max()
    assert err_ours < max(2 * err_scipy, 0.05)
