"""GP modules: feature extractors and pure-JAX kernels.

Replaces the reference's gpytorch modules (`atomai/nets/gp.py`):
- fcFeatureExtractor (MLP 1000-500-50-embedim, `gp.py:14-26`) -> linen MLP.
- The kernel zoo (batched ARD-RBF / Matern, scale kernel, lengthscale
  interval constraints, `gp.py:63-131`) -> jittable kernel functions over
  raw (unconstrained) parameters. The exact-GP machinery (Cholesky solves,
  marginal log-likelihood) lives in `atomai_tpu/trainers/gptrainer.py` as
  batched JAX linear algebra; KISS-GP's grid interpolation is replaced by
  exact/subsampled inference with identical public behavior (SURVEY.md §7
  hard-part #4).
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class fcFeatureExtractor(nn.Module):
    """MLP feature extractor (`atomai/nets/gp.py:14-26`)."""
    feat_dim: int
    embedim: int
    hidden_dim: Tuple[int, ...] = (1000, 500, 50)

    @nn.compact
    def __call__(self, x):
        dims = list(self.hidden_dim) + [self.embedim]
        x = nn.Dense(dims[0])(x)
        for h in dims[1:]:
            x = nn.relu(x)
            x = nn.Dense(h)(x)
        return x


def compute_bounds_stats(x):
    """Per-dim min/max over the point axis — the train-time statistics of
    gpytorch's ScaleToBounds (which stores them in train mode and reuses
    them in eval mode)."""
    return (jnp.min(x, axis=-2, keepdims=True),
            jnp.max(x, axis=-2, keepdims=True))


def scale_to_bounds(x, lb: float = -1.0, ub: float = 1.0, eps: float = 1e-8,
                    stats=None):
    """Min-max scales features into [lb, ub] (gpytorch ScaleToBounds
    equivalent used at `atomai/nets/gp.py:48`).

    ``stats``: optional (xmin, xmax) computed on the TRAINING embedding via
    :func:`compute_bounds_stats`. Must be passed when scaling test/candidate
    embeddings so they share the training affine transform — rescaling per
    prediction batch would make predictions depend on batch composition
    (and collapse entirely for batch_size=1).
    """
    xmin, xmax = compute_bounds_stats(x) if stats is None else stats
    x01 = (x - xmin) / jnp.maximum(xmax - xmin, eps)
    return lb + (ub - lb) * x01


# ----------------------------------------------------------------------
# Kernels over raw (unconstrained) hyperparameters.
# raw -> positive via softplus; interval constraints via scaled sigmoid.
# ----------------------------------------------------------------------

def softplus(x):
    return jax.nn.softplus(x)


def inv_softplus(y):
    y = jnp.asarray(y, jnp.float32)
    return jnp.log(jnp.expm1(jnp.maximum(y, 1e-6)))


def constrain(raw, lower=None, upper=None):
    """Positive (softplus) or interval (sigmoid-scaled) transform."""
    if lower is None and upper is None:
        return softplus(raw)
    lower = 0.0 if lower is None else lower
    return lower + (upper - lower) * jax.nn.sigmoid(raw)


def sq_dist(x1, x2, lengthscale):
    """Scaled squared distance: ||x1/l - x2/l||^2, shapes (..., n, d),
    (..., m, d) -> (..., n, m). Pinned to HIGHEST matmul precision —
    kernel matrices feed Cholesky factorizations."""
    x1 = x1 / lengthscale
    x2 = x2 / lengthscale
    x1n = jnp.sum(x1 * x1, axis=-1, keepdims=True)
    x2n = jnp.sum(x2 * x2, axis=-1, keepdims=True)
    cross = jnp.einsum("...nd,...md->...nm", x1, x2,
                       precision=jax.lax.Precision.HIGHEST)
    d2 = x1n - 2.0 * cross + jnp.swapaxes(x2n, -1, -2)
    return jnp.maximum(d2, 0.0)


def rbf_kernel(x1, x2, lengthscale, outputscale):
    """ARD-RBF: outputscale * exp(-0.5 * d2)."""
    return outputscale[..., None, None] * jnp.exp(
        -0.5 * sq_dist(x1, x2, lengthscale[..., None, :]))


def matern52_kernel(x1, x2, lengthscale, outputscale):
    """ARD Matern-5/2 (gpytorch MaternKernel default nu=2.5)."""
    d = jnp.sqrt(sq_dist(x1, x2, lengthscale[..., None, :]) + 1e-12)
    s5d = jnp.sqrt(5.0) * d
    k = (1.0 + s5d + (5.0 / 3.0) * d * d) * jnp.exp(-s5d)
    return outputscale[..., None, None] * k


KERNELS = {"rbf": rbf_kernel, "matern": matern52_kernel}


def kernel_diag(kernel, X, lengthscale, outputscale):
    """diag(kernel(X, X)) without forming the n x n matrix.

    Returns shape ``batch_shape + (n,)`` where ``batch_shape`` comes from the
    hyperparameters (e.g. ``(1, n)`` for ``lengthscale`` of shape ``(1, d)``).
    The built-in stationary kernels have a constant diagonal equal to the
    outputscale, which is used as a fast path; user-supplied kernel callables
    get the general per-point evaluation (the reference delegates this to
    gpytorch, which evaluates the kernel's own diagonal).
    """
    if kernel in (rbf_kernel, matern52_kernel):
        n = X.shape[-2]
        return jnp.broadcast_to(outputscale[..., None],
                                outputscale.shape + (n,))
    def one(x):
        return kernel(x[None], x[None], lengthscale, outputscale)[..., 0, 0]
    return jax.vmap(one, out_axes=-1)(X)


def init_gp_params(input_dim: int, batch_shape: Tuple[int, ...] = (),
                   ) -> dict:
    """Raw GP hyperparameters: ARD lengthscales, outputscale, noise, mean.

    Initialized to softplus^-1 so the constrained values start at
    lengthscale ~ 0.693 (gpytorch's softplus(0) default), outputscale ~ 0.693,
    noise floor near gpytorch's default initial noise.
    """
    return {
        "raw_lengthscale": jnp.zeros(batch_shape + (input_dim,)),
        "raw_outputscale": jnp.zeros(batch_shape),
        "raw_noise": jnp.zeros(batch_shape),
        "mean_const": jnp.zeros(batch_shape),
    }
