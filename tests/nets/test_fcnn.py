"""FCNN architecture tests (reference model: shape contracts as in
`/root/reference/test/nets/*` and introspection tests of
`test/trainers/test_trainer.py:232-489`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomai_tpu.nets import (Unet, dilnet, SegResNet, ResHedNet,
                             init_fcnn_model, DOWNSAMPLE_FACTORS)


@pytest.mark.parametrize("model_cls,kwargs", [
    (Unet, {}),
    (Unet, {"with_dilation": True}),
    (Unet, {"batch_norm": False}),
    (Unet, {"dropout": True}),
    (dilnet, {}),
    (SegResNet, {}),
    (ResHedNet, {}),
])
@pytest.mark.parametrize("nb_classes", [1, 3])
def test_fcnn_output_shape(model_cls, kwargs, nb_classes):
    net = model_cls(nb_classes=nb_classes, nb_filters=4, **kwargs)
    x = jnp.ones((2, 32, 32, 1))
    variables = net.init({"params": jax.random.key(0),
                          "dropout": jax.random.key(1)}, x, False)
    out = net.apply(variables, x, False)
    assert out.shape == (2, 32, 32, nb_classes)


@pytest.mark.parametrize("model_name", ["Unet", "dilnet", "SegResNet",
                                        "ResHedNet"])
def test_factory_metadict(model_name):
    net, meta = init_fcnn_model(model_name, 2, nb_filters=8)
    assert meta["model_type"] == "seg"
    assert meta["model"] == model_name
    assert meta["nb_classes"] == 2
    assert meta["nb_filters"] == 8
    assert model_name in DOWNSAMPLE_FACTORS


def test_downsample_divisibility():
    """Input divisible by the advertised downsample factor must roundtrip."""
    for name, f in DOWNSAMPLE_FACTORS.items():
        net, _ = init_fcnn_model(name, 1, nb_filters=4)
        x = jnp.ones((1, f * 4, f * 4, 1))
        variables = net.init({"params": jax.random.key(0),
                              "dropout": jax.random.key(0)}, x, False)
        out = net.apply(variables, x, False)
        assert out.shape[1:3] == x.shape[1:3]


def test_train_mode_updates_batch_stats():
    net = Unet(nb_classes=1, nb_filters=4)
    x = jnp.ones((2, 16, 16, 1))
    variables = net.init({"params": jax.random.key(0),
                          "dropout": jax.random.key(0)}, x, False)
    assert "batch_stats" in variables
    out, mutated = net.apply(variables, x, True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(2)})
    # running stats must actually change
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after))
    assert changed


@pytest.mark.parametrize("bn, n_bn, layers", [
    (True, 16, [1, 2, 3, 4]),
    (True, 20, [2, 3, 3, 4]),
    (False, 0, [2, 3, 3, 4])])
def test_unet_batchnorm_counts_match_reference(bn, n_bn, layers):
    """Unet instantiates the same number of BatchNorm layers per config
    as the reference (`test_trainer.py:232-245`)."""
    net, _ = init_fcnn_model("Unet", 3, batch_norm=bn, layers=layers)
    v = dict(net.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(0)},
                      jnp.zeros((1, 32, 32, 1)), False))
    bs = v.get("batch_stats", {})
    n = len([1 for p, _ in jax.tree_util.tree_leaves_with_path(bs)
             if p[-1].key == "mean"]) if bs else 0
    assert n == n_bn


@pytest.mark.parametrize("dropout", [False, True])
def test_unet_dropout_active_only_when_enabled(dropout):
    """dropout=True adds stochastic layers that fire in train mode
    (reference `test_trainer.py:248-260` counts 3 Dropout modules)."""
    net, _ = init_fcnn_model("Unet", 1, dropout=dropout,
                             layers=[1, 1, 1, 1], nb_filters=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 1),
                    jnp.float32)
    v = dict(net.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(0)}, x, False))
    var = {"params": v["params"]}
    if "batch_stats" in v:
        var["batch_stats"] = v["batch_stats"]

    def fwd(key):
        out = net.apply(var, x, True, rngs={"dropout": key},
                        mutable=["batch_stats"])
        return np.asarray(out[0] if isinstance(out, tuple) else out)

    o1, o2 = fwd(jax.random.key(1)), fwd(jax.random.key(2))
    if dropout:
        assert not np.array_equal(o1, o2)
    else:
        np.testing.assert_array_equal(o1, o2)


def _n_bn(v):
    bs = dict(v).get("batch_stats", {})
    return len([1 for p, _ in jax.tree_util.tree_leaves_with_path(bs)
                if p[-1].key == "mean"]) if bs else 0


@pytest.mark.parametrize("bn, n_bn, layers", [
    (True, 6, [1, 2, 2, 1]),
    (True, 10, [2, 3, 3, 2]),
    (False, 0, [3, 4, 4, 1])])
def test_dilnet_batchnorm_counts_match_reference(bn, n_bn, layers):
    """dilnet BatchNorm layer census per config matches the reference
    (`test_trainer.py:280-293`)."""
    net, _ = init_fcnn_model("dilnet", 3, batch_norm=bn, layers=layers)
    v = net.init({"params": jax.random.key(0),
                  "dropout": jax.random.key(0)},
                 jnp.zeros((1, 32, 32, 1)), False)
    assert _n_bn(v) == n_bn


@pytest.mark.parametrize("bn, el, dl, n_bn", [
    (True, 2, 2, 5), (True, 3, 4, 8), (False, 3, 4, 0)])
def test_imspec_batchnorm_counts_match_reference(bn, el, dl, n_bn):
    """ImSpec encoder/decoder BatchNorm census per config matches the
    reference (`test_trainer.py:355-368`)."""
    from atomai_tpu.nets import init_imspec_model

    net, _ = init_imspec_model((16, 16), (32,), 2, batch_norm=bn,
                               nblayers_encoder=el, nblayers_decoder=dl)
    v = net.init({"params": jax.random.key(0),
                  "dropout": jax.random.key(0)},
                 jnp.zeros((1, 16, 16)), False)
    assert _n_bn(v) == n_bn
