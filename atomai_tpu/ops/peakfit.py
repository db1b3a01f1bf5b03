"""Batched 2D-Gaussian peak refinement (vmapped Levenberg–Marquardt).

Replaces the reference's sequential per-atom ``scipy.optimize.curve_fit``
loop (`atomai/utils/coords.py:179-231` ``peak_refinement``) with a single
vmapped LM solver over all atom windows at once: window extraction is a
vmapped ``dynamic_slice``, the Jacobian of the 7-parameter 2D Gaussian
(`coords.py:152-176` ``gaussian_2d``) comes from ``jax.jacfwd``, and each
iteration solves a tiny 7x7 damped normal system. Acceptance semantics match
the reference (`coords.py:220-224`): keep the refined center only if it
moved < 3 px from the window center; otherwise fall back to the original
coordinate.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def gaussian_2d_jax(xy, amp, xo, yo, sigma_x, sigma_y, theta, offset):
    """2D Gaussian model (parity: `atomai/utils/coords.py:152-176`)."""
    x, y = xy
    a = (jnp.cos(theta) ** 2) / (2 * sigma_x ** 2) + \
        (jnp.sin(theta) ** 2) / (2 * sigma_y ** 2)
    b = -(jnp.sin(2 * theta)) / (4 * sigma_x ** 2) + \
        (jnp.sin(2 * theta)) / (4 * sigma_y ** 2)
    c = (jnp.sin(theta) ** 2) / (2 * sigma_x ** 2) + \
        (jnp.cos(theta) ** 2) / (2 * sigma_y ** 2)
    g = offset + amp * jnp.exp(
        -(a * ((x - xo) ** 2) + 2 * b * (x - xo) * (y - yo) +
          c * ((y - yo) ** 2)))
    return g.reshape(-1)


def _residual(p, xy, target):
    return gaussian_2d_jax(xy, *p) - target


def _lm_fit(window: jnp.ndarray, d: int, n_iter: int = 25,
            lam0: float = 1e-2) -> jnp.ndarray:
    """LM fit of one (2d, 2d) window; returns the 7-param vector."""
    e1, e2 = window.shape
    x, y = jnp.mgrid[:e1, :e2]
    xy = (x.astype(jnp.float32), y.astype(jnp.float32))
    target = window.reshape(-1).astype(jnp.float32)
    p0 = jnp.array([window[d, d], d, d, 1.0, 1.0, 0.0, 0.0],
                   dtype=jnp.float32)

    jac_fn = jax.jacfwd(_residual)

    def body(i, state):
        p, lam = state
        r = _residual(p, xy, target)
        J = jac_fn(p, xy, target)
        JtJ = J.T @ J
        g = J.T @ r
        A = JtJ + lam * jnp.diag(jnp.diag(JtJ) + 1e-8)
        dp = jnp.linalg.solve(A, g)
        p_new = p - dp
        c_old = jnp.sum(r * r)
        r_new = _residual(p_new, xy, target)
        c_new = jnp.sum(r_new * r_new)
        improved = c_new < c_old
        p = jnp.where(improved, p_new, p)
        lam = jnp.where(improved, lam * 0.5, lam * 2.0)
        return p, lam

    p, _ = jax.lax.fori_loop(0, n_iter, body,
                             (p0, jnp.float32(lam0)))
    return p


@partial(jax.jit, static_argnames=("d",))
def refine_peaks(imgdata: jnp.ndarray, coords: jnp.ndarray, d: int
                 ) -> jnp.ndarray:
    """Batched peak refinement.

    Args:
        imgdata: (H, W) image.
        coords: (N, 2) float (row, col) initial coordinates.
        d: half-side of the fitting window.

    Returns:
        (N, 2) refined coordinates (falls back to input where the fit moved
        >= 3 px or the window fell outside the image).
    """
    H, W = imgdata.shape
    size = 2 * d

    def one(c):
        cx = jnp.round(c[0]).astype(jnp.int32)
        cy = jnp.round(c[1]).astype(jnp.int32)
        in_bounds = (cx - d >= 0) & (cy - d >= 0) & \
                    (cx + d <= H) & (cy + d <= W)
        x0 = jnp.clip(cx - d, 0, H - size)
        y0 = jnp.clip(cy - d, 0, W - size)
        win = jax.lax.dynamic_slice(imgdata, (x0, y0), (size, size))
        p = _lm_fit(win, d)
        center = p[1:3]
        ok = in_bounds & (jnp.linalg.norm(center - d) < 3.0)
        refined = center + jnp.round(c) - d
        return jnp.where(ok, refined, c)

    return jax.vmap(one)(coords.astype(jnp.float32))
