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


def interp_matrix(coords: jnp.ndarray, n: int) -> jnp.ndarray:
    """Bilinear-interpolation matrix A (S, n): ``A @ v`` samples a length-n
    signal at float ``coords`` with zero padding outside [0, n-1].

    Turns axis-aligned warps into MXU matmuls — a 2D gather warp on TPU
    lowers to pointwise gathers (~100x slower than the two dense matmuls
    ``Ay @ img @ Ax.T`` at 512^2)."""
    i0 = jnp.floor(coords).astype(jnp.int32)
    w = (coords - i0)[:, None]
    cols = jnp.arange(n)[None, :]
    in0 = ((i0 >= 0) & (i0 <= n - 1))[:, None]
    in1 = ((i0 + 1 >= 0) & (i0 + 1 <= n - 1))[:, None]
    m0 = (cols == jnp.clip(i0, 0, n - 1)[:, None]) & in0
    m1 = (cols == jnp.clip(i0 + 1, 0, n - 1)[:, None]) & in1
    return m0 * (1.0 - w) + m1 * w


def separable_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                     ) -> jnp.ndarray:
    """Bilinear-samples img (H, W) on the grid ``ys x xs`` (axis-aligned
    warp; ys (S,), xs (T,)) via interpolation-matrix matmuls."""
    H, W = img.shape
    Ay = interp_matrix(ys, H)
    Ax = interp_matrix(xs, W)
    return Ay @ img @ Ax.T


def separable_sample_nhwc(stack: jnp.ndarray, ys: jnp.ndarray,
                          xs: jnp.ndarray) -> jnp.ndarray:
    """Same axis-aligned warp for a channel-last stack (H, W, C).

    Runs at HIGHEST matmul precision: this path resamples label masks that
    get rounded back to integers, where bf16 MXU error (~5e-3) could flip
    pixels near the 0.5 decision boundary."""
    H, W = stack.shape[0], stack.shape[1]
    Ay = interp_matrix(ys, H)
    Ax = interp_matrix(xs, W)
    return jnp.einsum("sh,hwc,tw->stc", Ay, stack, Ax,
                      precision=jax.lax.Precision.HIGHEST)


def rotate_image(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotates an (H, W) or (H, W, C) image by ``angle`` (radians)
    COUNTER-clockwise about its center — the cv2 positive-angle
    convention, consistent with ``np.rot90(img, 1)`` at 90 degrees
    (``cv_rotate``'s fast path). Sampling uses the INVERSE map: each
    output pixel pulls from the source location that a CCW rotation
    would move onto it."""
    H, W = img.shape[0], img.shape[1]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    c, s = jnp.cos(angle), jnp.sin(angle)
    ys = c * (yy - cy) + s * (xx - cx) + cy
    xs = -s * (yy - cy) + c * (xx - cx) + cx
    if img.ndim == 3:
        return jax.vmap(lambda ch: bilinear_sample(ch, ys, xs),
                        in_axes=2, out_axes=2)(img)
    return bilinear_sample(img, ys, xs)
