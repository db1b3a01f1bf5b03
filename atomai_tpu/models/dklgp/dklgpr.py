"""dklGPR — deep-kernel-learning GP regression model.

Parity: `atomai/models/dklgp/dklgpr.py:23-241` — fit, fit_ensemble
(replicated scalar target -> independent GPs, :95-132), posterior
computation (:134-156), sample_from_posterior, Thompson sampling for
active learning (:174-192), batched predict (mean, var) (:202-217), embed
into the learned latent (:219-241).
"""

import warnings
from typing import Callable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...trainers.gptrainer import (dklGPTrainer, posterior,
                                   posterior_cache, posterior_from_cache)


class dklGPR(dklGPTrainer):
    """DKL-GPR model.

    Example:
        >>> dklgp = aoi.models.dklGPR(data_dim, embedim=2)
        >>> dklgp.fit(X, y, training_cycles=100, lr=1e-2)
        >>> mean, var = dklgp.predict(X_test)
        >>> obj, next_idx = dklgp.thompson(X_cand)
    """

    def __init__(self, indim: int, embedim: int = 2,
                 shared_embedding_space: bool = True, **kwargs):
        super().__init__(indim, embedim, shared_embedding_space, **kwargs)

    def fit(self, X, y, training_cycles: int = 1, **kwargs) -> None:
        """Initializes and trains the DKL-GP model
        (reference `dklgpr.py:70-93`)."""
        self.run(X, y, training_cycles, **kwargs)

    def fit_ensemble(self, X, y, training_cycles: int = 1,
                     n_models: int = 5, **kwargs) -> None:
        """Ensemble of DKL models on a replicated scalar target
        (reference `dklgpr.py:95-132`)."""
        y = np.asarray(y)
        if y.ndim == 1:
            y = y[None]
        if y.shape[0] > 1:
            raise NotImplementedError(
                "The ensemble training is currently supported only for "
                "scalar targets")
        y = np.repeat(y, n_models, axis=0)
        if self.correlated_output:
            warnings.warn(
                "Replacing a single shared embedding space with {} "
                "independent ones".format(n_models))
            self.correlated_output = False
        self.ensemble = True
        self.run(X, y, training_cycles, **kwargs)

    # --------------------------------------------------------- posterior
    def _get_cache(self):
        """Training-side factorizations, computed once per fit
        (invalidated by run())."""
        cache = getattr(self, "_post_cache", None)
        if cache is not None:
            return cache
        gp = self.gp_params
        if self.correlated_output:
            z_train = self._embed_fn(self.fe_params, self.X,
                                     self.scale_stats)
            caches = jax.vmap(
                lambda p, yy: posterior_cache(p, z_train, yy,
                                              self.kernel))(gp, self.y)
            z_trains = jnp.broadcast_to(
                z_train, (self.y.shape[0],) + z_train.shape)
        else:
            def one(fe_i, gp_i, y_i, st_i):
                z = self._embed_fn(fe_i, self.X, st_i)
                return posterior_cache(gp_i, z, y_i, self.kernel), z
            caches, z_trains = jax.vmap(one)(self.fe_params, gp, self.y,
                                             self.scale_stats)
        self._post_cache = (caches, z_trains)
        return self._post_cache

    def run(self, X=None, y=None, training_cycles: int = 1, **kwargs):
        self._post_cache = None
        return super().run(X, y, training_cycles, **kwargs)

    def _posteriors(self, Xs, full_cov: bool = False):
        """Per-output posterior(s) at Xs (cached train factorization,
        jitted evaluation)."""
        caches, z_trains = self._get_cache()
        jit_key = ("post", full_cov, self.correlated_output)
        fn = getattr(self, "_jit_posteriors", {}).get(jit_key)
        if fn is None:
            if self.correlated_output:
                def raw(fe_params, caches, z_trains, Xs, stats):
                    z_s = self._embed_fn(fe_params, Xs, stats)
                    return jax.vmap(
                        lambda c, zt: posterior_from_cache(
                            c, zt, z_s, self.kernel, full_cov=full_cov)
                    )(caches, z_trains)
            else:
                def raw(fe_params, caches, z_trains, Xs, stats):
                    def one(fe_i, c, zt, st_i):
                        z_s = self._embed_fn(fe_i, Xs, st_i)
                        return posterior_from_cache(
                            c, zt, z_s, self.kernel, full_cov=full_cov)
                    return jax.vmap(one)(fe_params, caches, z_trains,
                                         stats)
            fn = jax.jit(raw)
            if not hasattr(self, "_jit_posteriors"):
                self._jit_posteriors = {}
            self._jit_posteriors[jit_key] = fn
        return fn(self.fe_params, caches, z_trains, Xs, self.scale_stats)

    def sample_from_posterior(self, X, num_samples: int = 1000
                              ) -> np.ndarray:
        """Samples from the posterior at X
        (reference `dklgpr.py:158-172`)."""
        Xs, _ = self.set_data(X)
        mean, cov = self._posteriors(Xs, full_cov=True)
        b, M = mean.shape
        cov = cov + 1e-6 * jnp.eye(M)[None]
        L = jnp.linalg.cholesky(cov)
        eps = jax.random.normal(self.keys.next(), (num_samples, b, M))
        samples = mean[None] + jnp.einsum("bmn,sbn->sbm", L, eps)
        return np.asarray(samples)

    def thompson(self, X_cand, scalarize_func: Optional[Callable] = None,
                 maximize: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        """Thompson sampling for the next measurement point
        (reference `dklgpr.py:174-192`)."""
        tsample = self.sample_from_posterior(X_cand, num_samples=1)[0]
        if tsample.ndim > 1 and scalarize_func is not None:
            tsample = np.asarray(scalarize_func(tsample))[None]
        idx = tsample.argmax(-1) if maximize else tsample.argmin(-1)
        return tsample, idx

    def predict(self, x_new, **kwargs) -> Tuple[np.ndarray, np.ndarray]:
        """Batched posterior mean/variance
        (reference `dklgpr.py:202-217`)."""
        x_new, _ = self.set_data(x_new)
        batch_size = kwargs.get("batch_size", len(x_new))
        # dispatch all chunks, then one overlapped device->host fetch
        futures = [self._posteriors(x_new[i:i + batch_size])
                   for i in range(0, len(x_new), batch_size)]
        ms, vs = zip(*jax.device_get(futures))
        mean = np.concatenate([np.asarray(m) for m in ms], axis=-1)
        var = np.concatenate([np.asarray(v) for v in vs], axis=-1)
        return mean.squeeze(), var.squeeze()

    def _embed(self, x_new):
        if self.correlated_output:
            return self._embed_fn(self.fe_params, x_new, self.scale_stats)
        embs = jax.vmap(lambda fe_i, st_i: self._embed_fn(
            fe_i, x_new, st_i))(self.fe_params, self.scale_stats)
        return jnp.moveaxis(embs, 0, -1)  # (n, embedim, b)

    def embed(self, x_new, **kwargs) -> np.ndarray:
        """Embeds data into the learned latent space
        (reference `dklgpr.py:219-241`)."""
        x_new, _ = self.set_data(x_new)
        batch_size = kwargs.get("batch_size", len(x_new))
        futures = [self._embed(x_new[i:i + batch_size])
                   for i in range(0, len(x_new), batch_size)]
        emb = np.concatenate(
            [np.asarray(o) for o in jax.device_get(futures)], axis=0)
        if not self.correlated_output and not self.ensemble:
            emb = emb.transpose(2, 0, 1)
        return emb
