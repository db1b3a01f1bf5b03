"""Data-parallel training over the virtual 8-device CPU mesh
(the JAX-idiomatic fake cluster, SURVEY.md §4/§2.10)."""

import jax
import numpy as np
import pytest

from atomai_tpu.core.mesh import get_mesh
from atomai_tpu.models import Segmentor


@pytest.fixture(autouse=True)
def _auto_mesh_on(monkeypatch):
    """This module IS the dedicated 8-wide coverage of the auto-mesh
    production paths — re-enable what the suite-wide conftest default
    (AOI_AUTO_MESH=0, a 1-core-CI cost control) turns off."""
    monkeypatch.setenv("AOI_AUTO_MESH", "1")


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_dp_training_matches_single_device():
    rng = np.random.RandomState(0)
    X = rng.rand(16, 32, 32).astype(np.float32)
    y = (X > 0.5).astype(np.float32)

    m1 = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1], seed=5)
    m1.fit(X, y, training_cycles=5, batch_size=8, print_loss=5,
           filename="/tmp/aoi_dp1", mesh=False)

    # mesh auto-builds on a multi-device host (opt-out via mesh=False)
    m2 = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1], seed=5)
    m2.fit(X, y, training_cycles=5, batch_size=8, print_loss=5,
           filename="/tmp/aoi_dp2")

    # identical math, different partitioning: cross-shard reductions
    # accumulate in a different order and the tiny differences get
    # amplified by gradient descent, so assert trajectory closeness
    # rather than bitwise parameter equality
    tr1 = np.asarray(m1.loss_acc["train_loss"])
    tr2 = np.asarray(m2.loss_acc["train_loss"])
    np.testing.assert_allclose(tr1, tr2, rtol=0.05)
    l1 = jax.tree.leaves(m1.params)
    l2 = jax.tree.leaves(m2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2)
    # batches really are sharded over the data axis — WITHOUT mesh= being
    # passed (auto-DP default; the reference is single-device by design,
    # `atomai/trainers/trainer.py:70-75`)
    assert len(m2.Xb_train.sharding.device_set) == 8
    assert m1.mesh is None and m2.mesh is not None


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
@pytest.mark.parametrize("engine", ["scan", "loop"])
def test_vae_dp_training_matches_single_device(engine):
    """viBaseTrainer data parallelism: rVAE (a PRIMARY baseline metric)
    must shard its ELBO epochs over the mesh data axis by default, with
    trajectory parity vs the single-device run (VERDICT r2 item #1;
    reference loop being beaten: `atomai/trainers/vitrainer.py:292-318`)."""
    from atomai_tpu.models import rVAE

    rng = np.random.RandomState(0)
    X = rng.rand(64, 16, 16).astype(np.float32)

    def train(mesh):
        m = rVAE((16, 16), latent_dim=2, seed=4,
                 numlayers_encoder=1, numhidden_encoder=32,
                 numlayers_decoder=1, numhidden_decoder=32)
        m.engine = engine
        m.fit(X, training_cycles=3, batch_size=16, mesh=mesh,
              filename="/tmp/aoi_vae_dp")
        return m

    m_dp = train(None)      # auto mesh over the 8 virtual devices
    assert m_dp.mesh is not None
    assert len(m_dp.X_train.sharding.device_set) == 8
    m_1 = train(False)
    assert m_1.mesh is None
    tr_dp = np.asarray(m_dp.loss_history["train_loss"])
    tr_1 = np.asarray(m_1.loss_history["train_loss"])
    np.testing.assert_allclose(tr_dp, tr_1, rtol=0.05)
    for a, b in zip(jax.tree.leaves(m_dp.params),
                    jax.tree.leaves(m_1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_ensemble_members_shard_across_devices():
    """Library-level ensemble parallelism: EnsembleTrainer must place the
    member-stacked params over the mesh model axis by itself (not just the
    graft entry), with loss parity vs the unsharded run."""
    from atomai_tpu.trainers import EnsembleTrainer
    from atomai_tpu.utils import make_lattice_stack

    imgs, masks, _ = make_lattice_stack(8, 32, 10, seed=1)

    def train(mesh):
        et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                             layers=[1, 1, 1, 1], seed=3)
        et.compile_ensemble_trainer(training_cycles=4, batch_size=4,
                                    filename="/tmp/aoi_ens_md",
                                    mesh=mesh)
        et.train_ensemble_from_scratch(imgs, masks, n_models=4)
        return et

    et_sharded = train(None)     # auto mesh over the 8 virtual devices
    leaf = jax.tree.leaves(et_sharded.params_stack)[0]
    assert len(leaf.sharding.device_set) >= 4, leaf.sharding
    et_single = train(False)     # sharding disabled
    tr_s = np.asarray(et_sharded.loss_acc["train_loss"])
    tr_1 = np.asarray(et_single.loss_acc["train_loss"])
    np.testing.assert_allclose(tr_s, tr_1, rtol=0.05)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_ensemble_baseline_fit_uses_auto_dp():
    """The single-model fits inside train_ensemble_from_baseline /
    train_swag have no member axis, so they must data-shard over the
    auto mesh like any fit() — and the member phase must still run
    cleanly on its own member mesh afterwards."""
    from atomai_tpu.trainers import EnsembleTrainer
    from atomai_tpu.utils import make_lattice_stack

    imgs, masks, _ = make_lattice_stack(8, 32, 10, seed=1)
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1], seed=3)
    et.compile_ensemble_trainer(training_cycles=4, batch_size=8,
                                filename="/tmp/aoi_ens_bl")
    meshes = []
    orig_fit = EnsembleTrainer.fit

    def spy(self):
        meshes.append(self.mesh)
        return orig_fit(self)

    EnsembleTrainer.fit = spy
    try:
        _, ens = et.train_ensemble_from_baseline(
            imgs, masks, n_models=2, training_cycles_base=4,
            training_cycles_ensemble=2)
    finally:
        EnsembleTrainer.fit = orig_fit
    assert meshes and meshes[0] is not None, \
        "baseline fit did not auto-build a data mesh"
    assert len(ens) == 2
    # trained state was de-committed from the data mesh for member work
    leaf = np.asarray(jax.tree.leaves(ens[0])[0])
    assert np.isfinite(leaf).all()
    # mesh=False must disable the baseline data mesh too
    et2 = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                          layers=[1, 1, 1, 1], seed=3)
    et2.compile_ensemble_trainer(training_cycles=4, batch_size=8,
                                 filename="/tmp/aoi_ens_bl2", mesh=False)
    et2.train_baseline(imgs, masks)
    assert et2.mesh is None


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_ensemble_predictor_shards_members():
    from atomai_tpu.predictors import EnsemblePredictor
    from atomai_tpu.nets import init_fcnn_model

    net, _ = init_fcnn_model("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    x0 = np.zeros((1, 32, 32, 1), np.float32)
    members = {}
    for i in range(4):
        k = jax.random.key(i)
        v = dict(net.init({"params": k, "dropout": k}, x0, False))
        # full-state members: per-member BatchNorm stats shard with the
        # member axis (shard_map in_specs (M, M, R))
        members[i] = {"params": v["params"],
                      "batch_stats": v["batch_stats"]}
    p = EnsemblePredictor(net, members, nb_classes=1, verbose=0)
    assert p.batch_stats_stack is not None
    leaf = jax.tree.leaves(p.params_stack)[0]
    assert len(leaf.sharding.device_set) >= 4, leaf.sharding
    X = np.random.RandomState(0).rand(2, 32, 32).astype(np.float32)
    mean, var = p.predict(X, num_batches=1)
    assert mean.shape == (2, 32, 32, 1) and np.isfinite(mean).all()
    # parity vs unsharded
    p1 = EnsemblePredictor(net, members, nb_classes=1, verbose=0,
                           mesh=False)
    mean1, var1 = p1.predict(X, num_batches=1)
    np.testing.assert_allclose(mean, mean1, atol=1e-5)
    np.testing.assert_allclose(var, var1, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_independent_dkl_shards_over_model_axis():
    """Independent-output DKL mode: the vmapped per-output NN+GP stacks
    place on the mesh model axis by default (VERDICT r2 item #4; reference
    capability: 128-GP IndependentModelList,
    `atomai/trainers/gptrainer.py:213-228`), with loss parity vs the
    single-device run."""
    from atomai_tpu.models import dklGPR

    rng = np.random.RandomState(0)
    X = rng.randn(64, 16).astype(np.float32)
    y = rng.randn(8, 64).astype(np.float32)

    def train(mesh):
        m = dklGPR(16, embedim=2, shared_embedding_space=False, seed=2)
        m.fit(X, y, training_cycles=5, mesh=mesh, print_loss=10)
        return m

    m_sh = train(None)      # auto model mesh over the 8 virtual devices
    assert m_sh.model_mesh is not None
    leaf = jax.tree.leaves(m_sh.fe_params)[0]
    assert len(leaf.sharding.device_set) == 8, leaf.sharding
    m_1 = train(False)
    assert m_1.model_mesh is None
    np.testing.assert_allclose(np.asarray(m_sh.train_loss),
                               np.asarray(m_1.train_loss), rtol=0.05)
    # posterior parity through the sharded stacks (loose: 5 training
    # steps amplify the layout-dependent reduction-order float noise)
    mean_sh, var_sh = m_sh.predict(X[:8])
    mean_1, var_1 = m_1.predict(X[:8])
    np.testing.assert_allclose(mean_sh, mean_1, atol=2e-2)
    np.testing.assert_allclose(var_sh, var_1, atol=2e-2)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_sharded_tiled_predict_matches_single_device():
    """SegPredictor shards the frame axis over the mesh data axis (the
    domain's context parallelism); outputs must match single-device
    prediction, including non-divisible frame counts (padding path)."""
    from atomai_tpu.predictors import SegPredictor
    from atomai_tpu.nets import init_fcnn_model

    net, _ = init_fcnn_model("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    k = jax.random.key(0)
    x0 = np.zeros((1, 32, 32, 1), np.float32)
    v = dict(net.init({"params": k, "dropout": k}, x0, False))
    X = np.random.RandomState(0).rand(10, 32, 32).astype(np.float32)

    p_sh = SegPredictor(net, v["params"], v.get("batch_stats"),
                        nb_classes=1, verbose=False)
    assert p_sh.mesh is not None
    out_sh = p_sh.predict(X, num_batches=1)
    p_1 = SegPredictor(net, v["params"], v.get("batch_stats"),
                       nb_classes=1, verbose=False, mesh=False)
    assert p_1.mesh is None
    out_1 = p_1.predict(X, num_batches=1)
    np.testing.assert_allclose(out_sh, out_1, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_ensemble_map_layout_with_member_mesh():
    """The sequential lax.map member layout (TPU default) composed with
    member-mesh sharding — the combination a real multi-chip TPU host
    runs: shard_map partitions members over the model axis, lax.map
    iterates the LOCAL member slice inside each shard."""
    from atomai_tpu.trainers import EnsembleTrainer
    from atomai_tpu.utils import make_lattice_stack

    imgs, masks, _ = make_lattice_stack(8, 32, 10, seed=1)

    def train(layout, mesh):
        et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                             layers=[1, 1, 1, 1], seed=3)
        et.compile_ensemble_trainer(training_cycles=4, batch_size=4,
                                    filename="/tmp/aoi_ens_ml",
                                    mesh=mesh, member_layout=layout)
        et.train_ensemble_from_scratch(imgs, masks, n_models=4)
        return et

    et_map = train("map", None)      # sharded + sequential local members
    leaf = jax.tree.leaves(et_map.params_stack)[0]
    assert len(leaf.sharding.device_set) >= 4, leaf.sharding
    et_ref = train("vmap", False)    # unsharded vmap reference
    tr_m = np.asarray(et_map.loss_acc["train_loss"])
    tr_r = np.asarray(et_ref.loss_acc["train_loss"])
    np.testing.assert_allclose(tr_m, tr_r, rtol=0.05)
