"""GP/DKL trainer tests (reference model:
`test/trainers/test_gptrainer.py:35-43` — hyperparameters must move;
`test/models/test_dklgpr.py:12-58` — posterior shapes)."""

import jax
import numpy as np
import pytest

from atomai_tpu.models import dklGPR, Reconstructor
from atomai_tpu.trainers import GPTrainer


@pytest.fixture(scope="module")
def gp_data():
    rng = np.random.RandomState(0)
    X = rng.randn(100, 8).astype(np.float32)
    w = rng.randn(8)
    y = (X @ w + 0.05 * rng.randn(100)).astype(np.float32)
    return X, y


def test_gp_hyperparams_move(gp_data):
    X, y = gp_data
    t = GPTrainer()
    t.compile_trainer(X[:, :2], y, training_cycles=3)
    before = {k: np.asarray(v).copy() for k, v in t.gp_params.items()}
    t.train_step()
    after = t.gp_params
    moved = any(not np.allclose(before[k], np.asarray(after[k]))
                for k in before)
    assert moved


def test_gp_loss_decreases(gp_data):
    X, y = gp_data
    t = GPTrainer()
    t.run(X[:, :2], y, training_cycles=30, print_loss=30)
    assert t.train_loss[-1] < t.train_loss[0]


def test_dkl_shared_predict_shapes(gp_data):
    X, y = gp_data
    m = dklGPR(8, embedim=2)
    m.fit(X, y, training_cycles=5, print_loss=5)
    mean, var = m.predict(X[:20])
    assert mean.shape == (20,)
    assert var.shape == (20,)
    assert (var > 0).all()


def test_dkl_multiout(gp_data):
    X, y = gp_data
    Y = np.stack([y, -y])
    m = dklGPR(8, embedim=2)
    m.fit(X, Y, training_cycles=3, print_loss=3)
    mean, var = m.predict(X[:10])
    assert mean.shape == (2, 10)


def test_dkl_independent_outputs(gp_data):
    X, y = gp_data
    Y = np.stack([y, -y, 2 * y])
    m = dklGPR(8, embedim=2, shared_embedding_space=False)
    m.fit(X, Y, training_cycles=3, print_loss=3)
    mean, var = m.predict(X[:10])
    assert mean.shape == (3, 10)


def test_dkl_ensemble(gp_data):
    X, y = gp_data
    m = dklGPR(8, embedim=2)
    with pytest.warns(UserWarning):
        m.fit_ensemble(X, y, training_cycles=3, n_models=3, print_loss=3)
    mean, var = m.predict(X[:10])
    assert mean.shape == (3, 10)


def test_dkl_thompson_and_sampling(gp_data):
    X, y = gp_data
    m = dklGPR(8, embedim=2)
    m.fit(X, y, training_cycles=3, print_loss=3)
    samples = m.sample_from_posterior(X[:15], num_samples=50)
    assert samples.shape == (50, 1, 15)
    obj, idx = m.thompson(X[:15])
    assert 0 <= int(idx[0]) < 15


def test_dkl_embed(gp_data):
    X, y = gp_data
    m = dklGPR(8, embedim=3)
    m.fit(X, y, training_cycles=2, print_loss=2)
    emb = m.embed(X[:10])
    assert emb.shape == (10, 3)
    assert np.abs(emb).max() <= 1.0 + 1e-5  # scale_to_bounds


def test_reconstructor():
    rng = np.random.RandomState(1)
    yy, xx = np.mgrid[:20, :20]
    true = np.sin(yy / 3.0) * np.cos(xx / 3.0)
    img = np.where(rng.rand(20, 20) > 0.5, true, 0.0).astype(np.float32)
    rec = Reconstructor()
    out = rec.reconstruct(img, training_cycles=100, print_loss=100)
    assert out.shape == (20, 20)
    assert np.abs(out - true).mean() < 0.15


@pytest.mark.parametrize("kernel_type,kw", [
    ("sparse", {"num_inducing": 64}),
    ("kissgp", {"grid_points_ratio": 0.1}),
])
def test_sparse_gp_matches_exact(gp_data, kernel_type, kw):
    X, y = gp_data
    X2 = X[:, :2]
    exact = GPTrainer()
    exact.run(X2, y, training_cycles=40, print_loss=40)
    m_e, _ = exact.predict(X2[:40])
    sp = GPTrainer()
    sp.run(X2, y, training_cycles=40, print_loss=40,
           kernel_type=kernel_type, **kw)
    m_s, v_s = sp.predict(X2[:40])
    assert (v_s > 0).all()
    # sparse approximation should track the exact posterior closely
    err = np.abs(m_s - m_e).mean() / max(np.abs(m_e).mean(), 1e-6)
    assert err < 0.35


def test_reconstructor_sparse_path():
    rng = np.random.RandomState(1)
    yy, xx = np.mgrid[:24, :24]
    true = np.sin(yy / 4.0) * np.cos(xx / 4.0)
    img = np.where(rng.rand(24, 24) > 0.5, true, 0.0).astype(np.float32)
    rec = Reconstructor()
    rec.MAX_EXACT_POINTS = 100  # force the inducing-grid path
    out = rec.reconstruct(img, training_cycles=120, print_loss=120)
    assert np.isfinite(out).all()
    assert np.abs(out - true).mean() < 0.2


def test_dkl_predict_batch_invariant(gp_data):
    """Eval-time embeddings must use the stored train-set ScaleToBounds
    statistics: predictions may not depend on prediction-batch composition
    (gpytorch parity; degenerate case is batch_size=1, where per-batch
    min-max scaling would collapse every embedding to a constant)."""
    X, y = gp_data
    m = dklGPR(8, embedim=2)
    m.fit(X, y, training_cycles=5, print_loss=5)
    Xt = X[:6] + 0.1
    mf, vf = m.predict(Xt)
    m1, v1 = m.predict(Xt, batch_size=1)
    assert np.allclose(mf, m1, atol=1e-5)
    assert np.allclose(vf, v1, atol=1e-5)
    assert np.std(m1) > 1e-6  # not collapsed
    e_full = m.embed(Xt)
    e_one = np.concatenate([m.embed(Xt[i:i + 1]) for i in range(6)], 0)
    assert np.allclose(e_full, e_one, atol=1e-5)


def test_custom_kernel_variance_uses_kernel_diag(gp_data):
    """Predictive variance must come from the kernel's own diagonal, not a
    hardcoded outputscale (wrong for user-supplied kernel callables)."""
    from atomai_tpu.nets.gp import kernel_diag, rbf_kernel
    import jax.numpy as jnp

    def doubled(x1, x2, ls, os):
        return 2.0 * rbf_kernel(x1, x2, ls, os)

    ls = jnp.ones((1, 2))
    os = jnp.ones((1,))
    Xs = jnp.asarray(np.random.RandomState(0).randn(5, 2), jnp.float32)
    d = kernel_diag(doubled, Xs, ls, os)
    assert np.allclose(np.asarray(d), 2.0)
    d_rbf = kernel_diag(rbf_kernel, Xs, ls, os)
    assert np.allclose(np.asarray(d_rbf), 1.0)

    X, y = gp_data
    g = GPTrainer()
    g.run(X[:, :2], y, training_cycles=10, print_loss=10,
          base_kernel=doubled)
    _, vv = g.predict(X[:10, :2])
    assert (vv > 0).all()


def test_sgpr_reconstruction_parity_with_exact():
    """SGPR (the KISS-GP substitute, `gptrainer.py:100-170`) must match
    exact-GP reconstruction accuracy at the reference's default grid
    density (grid_size=50 on the pixel grid, `/root/reference/atomai/
    nets/gp.py:118-121`) — SURVEY.md hard-part #4's documented-parity
    requirement."""
    from atomai_tpu.models import Reconstructor

    n = 40
    xx, yy = np.meshgrid(np.linspace(0, 3, n), np.linspace(0, 3, n))
    truth = (np.sin(2 * xx) * np.cos(1.5 * yy)).astype(np.float32)
    rng = np.random.RandomState(0)
    mask = rng.rand(n, n) < 0.35
    sparse = np.where(mask, truth + 0.02 * rng.randn(n, n), 0
                      ).astype(np.float32)

    recon_exact = Reconstructor(seed=1).reconstruct(
        sparse, training_cycles=60, kernel_type="exact", print_loss=60)
    recon_sgpr = Reconstructor(seed=1).reconstruct(
        sparse, training_cycles=60, kernel_type="kissgp",
        grid_points_ratio=1.0, print_loss=60)

    rmse_exact = float(np.sqrt(np.mean((recon_exact - truth) ** 2)))
    rmse_sgpr = float(np.sqrt(np.mean((recon_sgpr - truth) ** 2)))
    rmse_mean_fill = float(np.sqrt(np.mean(
        (np.full_like(truth, truth[mask].mean()) - truth) ** 2)))
    # both reconstruct far better than trivial fill, and SGPR is within
    # 1.5x of the exact-GP error
    assert rmse_exact < 0.3 * rmse_mean_fill
    assert rmse_sgpr < 0.3 * rmse_mean_fill
    assert rmse_sgpr < 1.5 * rmse_exact + 1e-3


def test_dkl_trainer_level_predict_embeds(gp_data):
    """dklGPTrainer.predict must go through the feature extractor —
    the inherited raw-input posterior would crash (indim != embedim)
    or silently mis-predict (indim == embedim)."""
    from atomai_tpu.trainers import dklGPTrainer

    X, y = gp_data
    t = dklGPTrainer(8, embedim=2)            # indim != embedim
    t.run(X, y[None], training_cycles=20, print_loss=20)
    m, v = t.predict(X[:10])
    assert m.shape[-1] == 10 and np.all(np.isfinite(m))
    assert np.all(np.asarray(v) > -1e-6)
    # predictions at training points should track the targets after
    # a short fit better than the prior mean does
    resid = np.abs(np.asarray(m).ravel() - y[:10])
    assert resid.mean() < np.abs(y[:10]).mean()
    # independent-output mode
    Y = np.stack([y, -y])
    t2 = dklGPTrainer(8, embedim=2, shared_embedding_space=False)
    t2.run(X, Y, training_cycles=5, print_loss=5)
    m2, v2 = t2.predict(X[:6])
    assert m2.shape == (2, 6) and np.all(np.isfinite(m2))


def test_gp_recompile_clears_posterior_cache(gp_data):
    """compile_trainer on NEW data must invalidate the cached posterior
    factorization — a stale cache crashes on size mismatch or silently
    serves the old fit."""
    X, y = gp_data
    t = GPTrainer()
    t.run(X, y[None], training_cycles=5, print_loss=5)
    t.predict(X[:5])                  # populates _post_cache
    assert t._post_cache is not None
    t.compile_trainer(X[:40], y[None, :40], training_cycles=5)
    assert t._post_cache is None
    t.run(training_cycles=5, print_loss=5)
    m, _ = t.predict(X[:5])
    assert np.all(np.isfinite(np.asarray(m)))


def test_thompson_scalarize_multioutput(gp_data):
    """thompson(scalarize_func=...) collapses multi-output samples to one
    acquisition row (reference `test_dklgpr.py:123-133`)."""
    X, y = gp_data
    Y = np.stack([y, -y, 2 * y])
    m = dklGPR(8, embedim=2)
    m.fit(X, Y, training_cycles=3, print_loss=3)
    sample, idx = m.thompson(X[:20], scalarize_func=lambda s: s.mean(0))
    assert sample.shape == (1, 20)
    assert np.asarray(idx).shape in ((), (1,))
    assert 0 <= int(np.asarray(idx).ravel()[0]) < 20
