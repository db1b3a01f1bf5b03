"""Matrix decomposition & clustering in pure JAX.

Replaces the reference's scikit-learn calls (`atomai/stat/multivar.py`,
`atomai/stat/unmixer.py`, `atomai/stat/fft_nmf.py` use sklearn PCA /
FastICA / NMF / GaussianMixture / KMeans — SURVEY.md §2.9) with
TPU-resident implementations exposing the sklearn-compatible API subset the
reference relies on (``fit``, ``fit_transform``, ``transform``,
``fit_predict``, ``components_``, ``explained_variance_ratio_``).

Algorithms: PCA via SVD; FastICA (parallel, logcosh) on PCA-whitened data;
NMF via Lee–Seung multiplicative updates; GMM via EM (diag/full
covariances) with k-means++ init; KMeans via Lloyd iterations — all as
jitted ``lax`` loops over statically-shaped arrays.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _svd_flip(u, v):
    """Sign convention matching sklearn: largest-|.| row element of v
    positive."""
    max_abs = jnp.argmax(jnp.abs(v), axis=1)
    signs = jnp.sign(v[jnp.arange(v.shape[0]), max_abs])
    return u * signs[None, :], v * signs[:, None]


class PCA:
    """Principal component analysis via SVD."""

    def __init__(self, n_components: Optional[int] = None,
                 random_state: int = 1):
        self.n_components = n_components
        self.components_ = None
        self.mean_ = None
        self.explained_variance_ = None
        self.explained_variance_ratio_ = None

    def fit(self, X) -> "PCA":
        self._fit(jnp.asarray(X, jnp.float32))
        return self

    def _fit(self, X):
        n = X.shape[0]
        self.mean_ = jnp.mean(X, axis=0)
        Xc = X - self.mean_
        u, s, vt = jnp.linalg.svd(Xc, full_matrices=False)
        u, vt = _svd_flip(u, vt)
        var = (s ** 2) / max(n - 1, 1)
        ratio = var / jnp.sum(var)
        k = self.n_components or min(X.shape)
        self.components_ = np.asarray(vt[:k])
        self.explained_variance_ = np.asarray(var[:k])
        self.explained_variance_ratio_ = np.asarray(ratio[:k])
        self._u, self._s = u, s
        return u, s, vt

    def fit_transform(self, X) -> np.ndarray:
        X = jnp.asarray(X, jnp.float32)
        u, s, vt = self._fit(X)
        k = self.n_components or min(X.shape)
        return np.asarray(u[:, :k] * s[:k][None, :])

    def transform(self, X) -> np.ndarray:
        X = jnp.asarray(X, jnp.float32)
        return np.asarray((X - self.mean_) @ self.components_.T)


class FastICA:
    """Independent component analysis (parallel FastICA, logcosh)."""

    def __init__(self, n_components: int, random_state: int = 1,
                 max_iter: int = 200, tol: float = 1e-4):
        self.n_components = n_components
        self.random_state = random_state
        self.max_iter = max_iter
        self.tol = tol
        self.components_ = None
        self.mean_ = None

    def fit_transform(self, X) -> np.ndarray:
        X = jnp.asarray(X, jnp.float32)
        n, d = X.shape
        k = self.n_components
        self.mean_ = jnp.mean(X, axis=0)
        Xc = X - self.mean_
        # whitening via SVD
        u, s, vt = jnp.linalg.svd(Xc, full_matrices=False)
        K = (vt[:k] / s[:k][:, None]) * np.sqrt(n)   # (k, d)
        Xw = Xc @ K.T                                 # (n, k), whitened
        rng = np.random.RandomState(self.random_state)
        W0 = jnp.asarray(rng.normal(size=(k, k)), jnp.float32)

        def sym_decorrelate(W):
            s_, u_ = jnp.linalg.eigh(W @ W.T)
            return (u_ * (1.0 / jnp.sqrt(jnp.maximum(s_, 1e-10)))[None, :]
                    ) @ u_.T @ W

        def body(i, W):
            WX = Xw @ W.T                # (n, k)
            g = jnp.tanh(WX)
            g_prime = 1.0 - g ** 2
            W_new = (g.T @ Xw) / n - \
                jnp.mean(g_prime, axis=0)[:, None] * W
            return sym_decorrelate(W_new)

        W = sym_decorrelate(W0)
        W = jax.lax.fori_loop(0, self.max_iter, body, W)
        self._unmixing = W
        self.components_ = np.asarray(W @ K)   # (k, d)
        sources = Xw @ W.T
        return np.asarray(sources)

    def transform(self, X) -> np.ndarray:
        X = jnp.asarray(X, jnp.float32)
        return np.asarray((X - self.mean_) @ jnp.asarray(
            self.components_).T)


class NMF:
    """Non-negative matrix factorization (multiplicative updates)."""

    def __init__(self, n_components: int, random_state: int = 1,
                 max_iter: int = 1000, tol: float = 1e-5):
        self.n_components = n_components
        self.random_state = random_state
        self.max_iter = max_iter
        self.components_ = None

    def fit_transform(self, X) -> np.ndarray:
        X = jnp.asarray(X, jnp.float32)
        X = jnp.maximum(X, 0.0)
        n, d = X.shape
        k = self.n_components
        rng = np.random.RandomState(self.random_state)
        scale = float(np.sqrt(np.asarray(X).mean() / k + 1e-12))
        W0 = jnp.asarray(np.abs(rng.normal(size=(n, k))) * scale,
                         jnp.float32)
        H0 = jnp.asarray(np.abs(rng.normal(size=(k, d))) * scale,
                         jnp.float32)
        eps = 1e-10

        @jax.jit
        def run(W, H):
            def body(i, WH):
                W, H = WH
                H = H * (W.T @ X) / (W.T @ W @ H + eps)
                W = W * (X @ H.T) / (W @ (H @ H.T) + eps)
                return W, H
            return jax.lax.fori_loop(0, self.max_iter, body, (W, H))

        W, H = run(W0, H0)
        self.components_ = np.asarray(H)
        return np.asarray(W)

    def transform(self, X) -> np.ndarray:
        """Project onto fixed H via multiplicative updates on W."""
        X = jnp.maximum(jnp.asarray(X, jnp.float32), 0.0)
        H = jnp.asarray(self.components_)
        n, k = X.shape[0], H.shape[0]
        rng = np.random.RandomState(self.random_state)
        W = jnp.asarray(np.abs(rng.normal(size=(n, k))), jnp.float32)
        eps = 1e-10

        def body(i, W):
            return W * (X @ H.T) / (W @ (H @ H.T) + eps)
        W = jax.lax.fori_loop(0, 200, body, W)
        return np.asarray(W)


class KMeans:
    """Lloyd's k-means with k-means++ init."""

    def __init__(self, n_clusters: int, random_state: int = 42,
                 max_iter: int = 100):
        self.n_clusters = n_clusters
        self.random_state = random_state
        self.max_iter = max_iter
        self.cluster_centers_ = None

    def _init_centers(self, X: np.ndarray) -> np.ndarray:
        rng = np.random.RandomState(self.random_state)
        n = X.shape[0]
        centers = [X[rng.randint(n)]]
        for _ in range(1, self.n_clusters):
            d2 = np.min(
                [(np.linalg.norm(X - c, axis=1) ** 2) for c in centers],
                axis=0).astype(np.float64)
            if d2.sum() <= 0:
                centers.append(X[rng.randint(n)])
                continue
            probs = d2 / d2.sum()
            probs = probs / probs.sum()  # exact renormalization for choice
            centers.append(X[rng.choice(n, p=probs)])
        return np.stack(centers)

    def fit(self, X) -> "KMeans":
        Xn = np.asarray(X, np.float32)
        centers0 = jnp.asarray(self._init_centers(Xn))
        X = jnp.asarray(Xn)
        k = self.n_clusters

        @jax.jit
        def run(centers):
            def body(i, centers):
                d = jnp.sum((X[:, None, :] - centers[None]) ** 2, axis=-1)
                lab = jnp.argmin(d, axis=1)
                onehot = jax.nn.one_hot(lab, k)                # (n, k)
                counts = jnp.maximum(onehot.sum(0), 1.0)
                new_centers = (onehot.T @ X) / counts[:, None]
                return jnp.where(onehot.sum(0)[:, None] > 0,
                                 new_centers, centers)
            return jax.lax.fori_loop(0, self.max_iter, body, centers)

        self.cluster_centers_ = np.asarray(run(centers0))
        self.labels_ = self.predict(Xn)
        return self

    def predict(self, X) -> np.ndarray:
        X = jnp.asarray(X, jnp.float32)
        d = jnp.sum((X[:, None, :] -
                     jnp.asarray(self.cluster_centers_)[None]) ** 2,
                    axis=-1)
        return np.asarray(jnp.argmin(d, axis=1))

    def fit_predict(self, X) -> np.ndarray:
        self.fit(X)
        return self.labels_


class GaussianMixture:
    """Gaussian mixture model via EM (diag or full covariances)."""

    def __init__(self, n_components: int, covariance_type: str = "diag",
                 random_state: int = 1, max_iter: int = 100,
                 reg_covar: float = 1e-6):
        if covariance_type not in ("diag", "full", "spherical", "tied"):
            raise ValueError("Unknown covariance type")
        # 'spherical'/'tied' are mapped to 'diag'/'full' equivalents
        self.n_components = n_components
        self.covariance_type = "full" if covariance_type == "tied" \
            else ("diag" if covariance_type == "spherical"
                  else covariance_type)
        self.random_state = random_state
        self.max_iter = max_iter
        self.reg_covar = reg_covar
        self.means_ = None
        self.weights_ = None
        self.covariances_ = None

    def _log_prob(self, X, means, covs):
        k = self.n_components
        if self.covariance_type == "diag":
            prec = 1.0 / covs                                  # (k, d)
            diff = X[:, None, :] - means[None]                  # (n, k, d)
            lp = -0.5 * (jnp.sum(diff ** 2 * prec[None], axis=-1)
                         + jnp.sum(jnp.log(covs), axis=-1)[None]
                         + X.shape[1] * jnp.log(2 * jnp.pi))
        else:  # full
            def one(mean_k, cov_k):
                L = jnp.linalg.cholesky(cov_k)
                diff = X - mean_k
                sol = jax.scipy.linalg.solve_triangular(L, diff.T,
                                                        lower=True)
                maha = jnp.sum(sol ** 2, axis=0)
                logdet = 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
                return -0.5 * (maha + logdet +
                               X.shape[1] * jnp.log(2 * jnp.pi))
            lp = jax.vmap(one)(means, covs).T                  # (n, k)
        return lp

    def fit_predict(self, X) -> np.ndarray:
        Xn = np.asarray(X, np.float32)
        n, d = Xn.shape
        k = self.n_components
        km = KMeans(k, random_state=self.random_state)
        labels0 = km.fit_predict(Xn)
        means0 = jnp.asarray(km.cluster_centers_)
        X = jnp.asarray(Xn)
        if self.covariance_type == "diag":
            covs0 = jnp.ones((k, d)) * jnp.var(X, axis=0)[None] + \
                self.reg_covar
        else:
            base = jnp.cov(X.T) + self.reg_covar * jnp.eye(d)
            covs0 = jnp.broadcast_to(base, (k, d, d))
        weights0 = jnp.ones(k) / k
        reg = self.reg_covar
        cov_type = self.covariance_type
        log_prob = self._log_prob

        @jax.jit
        def run(means, covs, weights):
            def body(i, state):
                means, covs, weights = state
                lp = log_prob(X, means, covs) + jnp.log(weights)[None]
                log_resp = lp - jax.scipy.special.logsumexp(
                    lp, axis=1, keepdims=True)
                resp = jnp.exp(log_resp)                        # (n, k)
                nk = resp.sum(0) + 1e-10
                means = (resp.T @ X) / nk[:, None]
                if cov_type == "diag":
                    diff2 = (X[:, None, :] - means[None]) ** 2
                    covs = jnp.einsum("nk,nkd->kd", resp, diff2) / \
                        nk[:, None] + reg
                else:
                    diff = X[:, None, :] - means[None]          # (n, k, d)
                    covs = jnp.einsum("nk,nkd,nke->kde", resp, diff,
                                      diff) / nk[:, None, None]
                    covs = covs + reg * jnp.eye(d)[None]
                weights = nk / nk.sum()
                return means, covs, weights
            return jax.lax.fori_loop(0, self.max_iter, body,
                                     (means, covs, weights))

        means, covs, weights = run(means0, covs0, weights0)
        self.means_ = np.asarray(means)
        self.covariances_ = np.asarray(covs)
        self.weights_ = np.asarray(weights)
        lp = log_prob(X, means, covs) + jnp.log(weights)[None]
        return np.asarray(jnp.argmax(lp, axis=1))

    def fit(self, X) -> "GaussianMixture":
        self.fit_predict(X)
        return self

    def predict(self, X) -> np.ndarray:
        X = jnp.asarray(np.asarray(X, np.float32))
        lp = self._log_prob(X, jnp.asarray(self.means_),
                            jnp.asarray(self.covariances_)) + \
            jnp.log(jnp.asarray(self.weights_))[None]
        return np.asarray(jnp.argmax(lp, axis=1))
