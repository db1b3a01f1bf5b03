"""JAX decomposition library tests with sklearn oracles (replacing the
reference's direct sklearn dependency, SURVEY.md §2.9)."""

import numpy as np
import pytest

from atomai_tpu.stat import PCA, FastICA, NMF, GaussianMixture, KMeans


@pytest.fixture(scope="module")
def X():
    return np.random.RandomState(0).rand(100, 20).astype(np.float32)


def test_pca_matches_sklearn(X):
    from sklearn.decomposition import PCA as skPCA
    p = PCA(n_components=3)
    Xt = p.fit_transform(X)
    sk = skPCA(n_components=3)
    Xt_sk = sk.fit_transform(X)
    np.testing.assert_allclose(np.abs(p.components_),
                               np.abs(sk.components_), atol=1e-3)
    np.testing.assert_allclose(p.explained_variance_ratio_,
                               sk.explained_variance_ratio_, atol=1e-4)
    np.testing.assert_allclose(np.abs(Xt), np.abs(Xt_sk), atol=1e-2)


def test_pca_transform_consistency(X):
    p = PCA(n_components=4)
    Xt = p.fit_transform(X)
    Xt2 = p.transform(X)
    np.testing.assert_allclose(Xt, Xt2, atol=1e-3)


def test_nmf_reconstruction():
    # genuinely rank-5 non-negative data
    rng = np.random.RandomState(0)
    Xlow = (np.abs(rng.rand(100, 5)) @
            np.abs(rng.rand(5, 20))).astype(np.float32)
    nm = NMF(n_components=5, max_iter=1000)
    W = nm.fit_transform(Xlow)
    assert (W >= 0).all() and (nm.components_ >= 0).all()
    rec_err = np.linalg.norm(Xlow - W @ nm.components_) / \
        np.linalg.norm(Xlow)
    assert rec_err < 0.05


def test_nmf_matches_sklearn_quality(X):
    from sklearn.decomposition import NMF as skNMF
    nm = NMF(n_components=5, max_iter=500)
    W = nm.fit_transform(X)
    ours = np.linalg.norm(X - W @ nm.components_) / np.linalg.norm(X)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sk = skNMF(5, max_iter=500, init="random", random_state=0)
        Wsk = sk.fit_transform(X)
    theirs = np.linalg.norm(X - Wsk @ sk.components_) / np.linalg.norm(X)
    assert ours <= theirs * 1.05


def test_ica_separates_sources():
    t = np.linspace(0, 8, 500)
    S = np.stack([np.sin(2 * t), np.sign(np.cos(3 * t))]).T
    A = np.array([[1., .5], [.5, 1.]])
    Xm = (S @ A.T).astype(np.float32)
    ica = FastICA(n_components=2, random_state=0)
    S_est = ica.fit_transform(Xm)
    corr = np.abs(np.corrcoef(S.T, S_est.T))[0:2, 2:4]
    assert (corr.max(axis=1) > 0.95).all()


def test_gmm_separates_blobs():
    rng = np.random.RandomState(1)
    Xg = np.concatenate([rng.randn(100, 2),
                         rng.randn(100, 2) + 6]).astype(np.float32)
    for cov in ("diag", "full"):
        g = GaussianMixture(2, covariance_type=cov, random_state=0)
        lab = g.fit_predict(Xg)
        same0 = (lab[:100] == lab[0]).mean()
        same1 = (lab[100:] == lab[100]).mean()
        assert same0 > 0.95 and same1 > 0.95
        assert lab[0] != lab[100]


def test_kmeans_blobs():
    rng = np.random.RandomState(2)
    Xg = np.concatenate([rng.randn(50, 3),
                         rng.randn(50, 3) + 8]).astype(np.float32)
    km = KMeans(2)
    lab = km.fit_predict(Xg)
    assert lab[:50].std() == 0 and lab[50:].std() == 0
    assert lab[0] != lab[50]
    # predict on new data works
    lab2 = km.predict(Xg[:5])
    assert (lab2 == lab[0]).all()
