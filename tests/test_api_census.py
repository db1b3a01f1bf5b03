"""Reference public-symbol parity additions (round 3 census sweep).

Covers the per-type checkpoint loaders (`atomai/models/loaders.py:67-224`),
the module-level ensemble data helpers (`atomai/trainers/etrainer.py:437-513`),
the no-batching preproc variants (`atomai/utils/preproc.py:204-660`) and the
JAX-native GP model bundles (`atomai/nets/gp.py:29-131`).
"""

import numpy as np
import pytest

import atomai_tpu
from atomai_tpu import models, nets, trainers, utils


def test_census_symbols_importable():
    for name in ("load_seg_model", "load_imspec_model", "load_reg_model",
                 "load_cls_model", "load_vae_model",
                 "load_denoising_autoencoder"):
        assert callable(getattr(models, name))
    for name in ("set_data_seg", "set_data_imspec", "accuracy_fn_seg"):
        assert callable(getattr(trainers.etrainer, name))
    for name in ("preprocess_training_image_data_",
                 "preprocess_training_imspec_data_",
                 "preprocess_training_reg_data_",
                 "preprocess_training_cls_data_"):
        assert callable(getattr(utils, name))
    assert callable(utils.datasets.ProgressBar)
    for name in ("GPRegressionModel", "CustomGPModel"):
        assert callable(getattr(nets, name))


def test_typed_loader_roundtrip(tmp_path):
    model = atomai_tpu.models.Segmentor("Unet", nb_classes=1, nb_filters=4,
                                        layers=[1, 1, 1, 1])
    path = str(tmp_path / "seg.tar")
    model.save_model(path)
    loaded = models.load_seg_model(path)
    assert loaded.meta_state_dict["model_type"] == "seg"
    with pytest.raises(ValueError, match="not a imspec"):
        models.load_imspec_model(path)


def test_set_data_seg_split_and_cast():
    X = np.random.rand(20, 16, 16).astype(np.float64)
    y = (np.random.rand(20, 16, 16) > 0.5).astype(np.float64)
    X_tr, y_tr, X_ts, y_ts = trainers.etrainer.set_data_seg(X, y)
    assert X_tr.dtype == np.float32 and y_tr.dtype == np.float32
    assert len(X_tr) + len(X_ts) == 20 and len(X_ts) >= 1
    with pytest.raises(AssertionError):
        trainers.etrainer.set_data_seg(X, y, nb_classes_set=3)


def test_set_data_imspec_dims_check():
    X = np.random.rand(12, 8, 8).astype(np.float32)
    y = np.random.rand(12, 16).astype(np.float32)
    out = trainers.etrainer.set_data_imspec(X, y, dims=((8, 8), (16,)))
    assert all(a.dtype == np.float32 for a in out)
    with pytest.raises(AssertionError):
        trainers.etrainer.set_data_imspec(X, y, dims=((4, 4), (16,)))


def test_accuracy_fn_seg_matches_iou():
    from atomai_tpu.losses_metrics import iou_score
    fn = trainers.etrainer.accuracy_fn_seg(1)
    y = (np.random.rand(2, 8, 8) > 0.5).astype(np.float32)
    logits = np.random.randn(2, 8, 8, 1).astype(np.float32)
    assert np.allclose(float(fn(y, logits)), float(iou_score(y, logits)))


def test_preprocess_underscore_variants():
    X = np.random.rand(10, 8, 8)
    y = np.random.randint(0, 3, (10, 8, 8))
    out = utils.preprocess_training_image_data_(X, y, X[:4], y[:4])
    X_tr, y_tr, X_ts, y_ts, nb = out
    assert nb == 3 and y_tr.dtype == np.int32 and X_tr.shape[-1] == 1

    Xs = np.random.rand(10, 8, 8)
    ys = np.random.rand(10, 16)
    *arrs, dims = utils.preprocess_training_imspec_data_(
        Xs, ys, Xs[:4], ys[:4])
    assert dims == ((8, 8), (16,))
    assert all(a.dtype == np.float32 for a in arrs)

    Xr = np.random.rand(10, 8, 8)
    yr = np.random.rand(10)
    X_tr, y_tr, X_ts, y_ts = utils.preprocess_training_reg_data_(
        Xr, yr, Xr[:4], yr[:4])
    assert X_tr.shape == (10, 8, 8, 1) and y_tr.shape == (10, 1)

    yc = np.random.randint(0, 2, (10,))
    X_tr, y_tr, X_ts, y_ts = utils.preprocess_training_cls_data_(
        Xr, yc, Xr[:4], yc[:4])
    assert y_tr.dtype == np.int32 and y_tr.shape == (10,)


def test_custom_gp_model_exact_and_kissgp():
    import jax
    rng = np.random.RandomState(0)
    X = rng.rand(40, 2).astype(np.float32)
    y = np.sin(X[:, 0] * 3) + 0.1 * rng.randn(40).astype(np.float32)
    for kernel_type in ("exact", "kissgp"):
        gp = nets.CustomGPModel(X, y, kernel_type=kernel_type,
                                base_kernel="matern")
        params = gp.init()
        nll = float(gp.neg_mll(params))
        assert np.isfinite(nll)
        mean, var = gp.posterior(params, X[:5])
        assert mean.shape == (5,) and np.all(np.asarray(var) > 0)
        pm, pc = gp.forward(params, X[:5])
        assert pm.shape == (5,) and pc.shape == (5, 5)
    with pytest.raises(ValueError, match="inducing_points"):
        nets.CustomGPModel(X, y, kernel_type="sparse")
    # gradient of the kissgp bound flows through the raw hypers
    gp = nets.CustomGPModel(X, y, kernel_type="kissgp")
    g = jax.grad(gp.neg_mll)(gp.init())
    assert np.isfinite(float(g["raw_lengthscale"][0]))


def test_gp_regression_model_forward():
    import jax
    rng = np.random.RandomState(1)
    X = rng.rand(30, 8).astype(np.float32)
    y = rng.rand(2, 30).astype(np.float32)   # two outputs -> batched GP
    m = nets.GPRegressionModel(X, y, embedim=2)
    params = m.init(jax.random.PRNGKey(0))
    mean, cov = m(params, X[:6])
    assert mean.shape == (2, 6) and cov.shape == (2, 6, 6)
    # embedding reuses train-set scale stats (batch-size independent)
    e1 = m.embed(params, X[:1])
    e2 = m.embed(params, X[:6])[:1]
    assert np.allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


def test_gp_regression_model_pure_under_transforms():
    """train_stats/embed must be pure: usable under jit/grad with no
    cached tracer state, and never stale after a params update."""
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(1)
    X = rng.rand(20, 4).astype(np.float32)
    y = rng.rand(1, 20).astype(np.float32)
    m = nets.GPRegressionModel(X, y, embedim=2)
    params = m.init(jax.random.PRNGKey(0))

    def loss(p):
        mean, cov = m.forward(p, X[:4])
        return jnp.sum(mean) + jnp.sum(cov)

    g = jax.grad(loss)(params)          # traced call first
    e_after = m.embed(params, X[:3])    # eager call after the trace
    assert np.all(np.isfinite(np.asarray(e_after)))
    # stats follow the CURRENT params: perturbing fe changes the scaling
    params2 = jax.tree.map(lambda a: a + 0.5, params)
    s1 = m.train_stats(params)
    s2 = m.train_stats(params2)
    assert not np.allclose(np.asarray(s1[0]), np.asarray(s2[0]))
    del g


def test_torch_tensor_inputs_accepted():
    """Migrating users hand over torch tensors — fit/predict must accept
    them anywhere numpy arrays are accepted (reference
    `test_predictor.py` preprocess_torch contract)."""
    import torch
    from atomai_tpu.models import Segmentor
    from atomai_tpu.utils import make_lattice_stack

    imgs, masks, _ = make_lattice_stack(4, 32, 10, seed=1)
    m = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    m.fit(torch.from_numpy(imgs), torch.from_numpy(masks),
          training_cycles=2, batch_size=4, print_loss=2,
          filename="/tmp/aoi_torch_in", mesh=False)
    out = m.predict(torch.from_numpy(imgs[:2]), compute_coords=False,
                    verbose=False)
    assert np.asarray(out).shape == (2, 32, 32, 1)
