"""Data-parallel training over the virtual 8-device CPU mesh
(the JAX-idiomatic fake cluster, SURVEY.md §4/§2.10)."""

import jax
import numpy as np
import pytest

from atomai_tpu.core.mesh import get_mesh
from atomai_tpu.models import Segmentor


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_dp_training_matches_single_device():
    rng = np.random.RandomState(0)
    X = rng.rand(16, 32, 32).astype(np.float32)
    y = (X > 0.5).astype(np.float32)

    m1 = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1], seed=5)
    m1.fit(X, y, training_cycles=5, batch_size=8, print_loss=5,
           filename="/tmp/aoi_dp1")

    mesh = get_mesh(n_data=8, n_model=1)
    m2 = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1], seed=5)
    m2.fit(X, y, training_cycles=5, batch_size=8, print_loss=5,
           filename="/tmp/aoi_dp2", mesh=mesh)

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
    # batches really are sharded over the data axis
    assert len(m2.Xb_train.sharding.device_set) == 8


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
