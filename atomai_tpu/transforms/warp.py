"""Geometric warping primitives (bilinear sampling on device)."""

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                    ) -> jnp.ndarray:
    """Samples img (H, W) at float coordinates (ys, xs) with bilinear
    interpolation and zero padding outside."""
    H, W = img.shape
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1, x1 = y0 + 1, x0 + 1
    wy = ys - y0
    wx = xs - x0

    def at(y, x):
        inb = (y >= 0) & (y < H) & (x >= 0) & (x < W)
        yc = jnp.clip(y, 0, H - 1)
        xc = jnp.clip(x, 0, W - 1)
        return jnp.where(inb, img[yc, xc], 0.0)

    v00 = at(y0, x0)
    v01 = at(y0, x1)
    v10 = at(y1, x0)
    v11 = at(y1, x1)
    return ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01 +
            wy * (1 - wx) * v10 + wy * wx * v11)


def rotate_image(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotates a 2D image by ``angle`` (radians) about its center."""
    H, W = img.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    c, s = jnp.cos(angle), jnp.sin(angle)
    ys = c * (yy - cy) - s * (xx - cx) + cy
    xs = s * (yy - cy) + c * (xx - cx) + cx
    return bilinear_sample(img, ys, xs)
