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

from .blocks import init_kwargs


class fcFeatureExtractor(nn.Module):
    """MLP feature extractor (`atomai/nets/gp.py:14-26`)."""
    feat_dim: int
    embedim: int
    hidden_dim: Tuple[int, ...] = (1000, 500, 50)

    @nn.compact
    def __call__(self, x):
        dims = list(self.hidden_dim) + [self.embedim]
        x = nn.Dense(dims[0], **init_kwargs(x.shape[-1]))(x)
        for h in dims[1:]:
            x = nn.relu(x)
            x = nn.Dense(h, **init_kwargs(x.shape[-1]))(x)
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


class GPRegressionModel:
    """DKL GP module bundle (reference `atomai/nets/gp.py:29-60`).

    JAX-native equivalent of the gpytorch ``ExactGP`` subclass: bundles the
    feature extractor, ARD-RBF kernel and constant mean into one object with
    explicit parameter pytrees. ``likelihood`` is accepted for signature
    parity; the observation noise lives in the GP parameter pytree
    (``raw_noise``) as in :func:`init_gp_params`. KISS-GP grid interpolation
    (``grid_size``) is replaced by exact batched inference — the trainers
    switch to the SGPR collapsed bound for large N.
    """

    def __init__(self, X, y, likelihood=None, feature_extractor=None,
                 embedim: int = 2, grid_size: int = 50) -> None:
        self.X = jnp.asarray(X, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        self.y = y if y.ndim == 2 else y[None]
        self.batch_dim = self.y.shape[0]
        self.embedim = embedim
        self.grid_size = grid_size
        self.feature_extractor = feature_extractor or fcFeatureExtractor(
            self.X.shape[-1], embedim)
        self.kernel = rbf_kernel

    def init(self, key) -> dict:
        """Initializes {"fe": ..., "gp": ...} parameter pytrees; GP
        hyperparameters carry a leading output-batch axis."""
        fe = self.feature_extractor.init(key, self.X[:1])["params"]
        gp = init_gp_params(self.embedim, (self.batch_dim,))
        return {"fe": fe, "gp": gp}

    def train_stats(self, params):
        """ScaleToBounds statistics of the CURRENT params' training-set
        embedding. Recomputed per call (pure — no cached state, so the
        class is safe under jit/grad and never serves stale stats after
        an optimizer update); pass the result to :meth:`embed` to
        amortize it across prediction batches."""
        emb = self.feature_extractor.apply({"params": params["fe"]},
                                           self.X)
        return compute_bounds_stats(emb)

    def embed(self, params, x, stats=None):
        emb = self.feature_extractor.apply({"params": params["fe"]}, x)
        return scale_to_bounds(
            emb, stats=self.train_stats(params) if stats is None else stats)

    def forward(self, params, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """GP prior at the embedded inputs: (mean, cov), batched over
        outputs — the functional analog of the reference's ``forward``
        returning a MultivariateNormal."""
        from ..trainers.gptrainer import _hyp
        emb = self.embed(params, x)
        ls, os_, _, _ = _hyp(params["gp"])
        cov = self.kernel(emb[None], emb[None], ls, os_)
        mean = jnp.broadcast_to(params["gp"]["mean_const"][:, None],
                                (self.batch_dim, emb.shape[0]))
        return mean, cov

    __call__ = forward


class CustomGPModel:
    """Configurable GP model (reference `atomai/nets/gp.py:63-131`).

    Bundles kernel choice ('rbf'/'matern' or a callable), kernel type
    ('exact', 'sparse' with explicit inducing points, or 'kissgp' — an
    inducing grid over the input bounding box), and optional lengthscale
    interval constraints. Methods delegate to the batched JAX linear
    algebra in ``atomai_tpu.trainers.gptrainer``.
    """

    def __init__(self, train_x, train_y, likelihood=None,
                 kernel_type: str = "kissgp", base_kernel="rbf",
                 inducing_points=None, grid_points_ratio: float = 1.0,
                 lengthscale_constraints=None, **kwargs) -> None:
        self.X = jnp.asarray(train_x, jnp.float32)
        self.y = jnp.asarray(train_y, jnp.float32)
        if isinstance(base_kernel, str):
            if base_kernel not in KERNELS:
                raise ValueError(
                    "base_kernel must be 'rbf', 'matern', or a callable")
            base_kernel = KERNELS[base_kernel]
        self.kernel = base_kernel
        self.kernel_type = kernel_type
        self.lengthscale_constraints = lengthscale_constraints
        if kernel_type == "sparse":
            if inducing_points is None:
                raise ValueError(
                    "kernel_type='sparse' requires inducing_points")
            self.Z = jnp.asarray(inducing_points, jnp.float32)
        elif kernel_type == "kissgp":
            from ..trainers.gptrainer import make_inducing_grid
            self.Z = make_inducing_grid(self.X, grid_points_ratio)
        else:
            self.Z = None

    def init(self) -> dict:
        return init_gp_params(self.X.shape[-1])

    def neg_mll(self, params) -> jnp.ndarray:
        from ..trainers import gptrainer as gt
        if self.Z is not None:
            return gt.neg_mll_sparse(params, self.X, self.y, self.Z,
                                     self.kernel,
                                     self.lengthscale_constraints)
        return gt.neg_mll(params, self.X, self.y, self.kernel,
                          self.lengthscale_constraints)

    def posterior(self, params, Xs, full_cov: bool = False):
        from ..trainers import gptrainer as gt
        Xs = jnp.asarray(Xs, jnp.float32)
        if self.Z is not None:
            cache = gt.sparse_posterior_cache(
                params, self.X, self.y, self.Z, self.kernel,
                self.lengthscale_constraints)
            return gt.sparse_posterior(cache, Xs, self.kernel)
        return gt.posterior(params, self.X, self.y, Xs, self.kernel,
                            self.lengthscale_constraints, full_cov)

    def forward(self, params, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """GP prior (mean, cov) at x."""
        from ..trainers.gptrainer import _hyp
        x = jnp.asarray(x, jnp.float32)
        # the same raw->constrained mapping the fitted objective uses
        ls, os_, _, _ = _hyp(params, self.lengthscale_constraints)
        cov = self.kernel(x, x, ls[None], os_[None])[0]
        mean = jnp.broadcast_to(params["mean_const"], (x.shape[0],))
        return mean, cov

    __call__ = forward


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
