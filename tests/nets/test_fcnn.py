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
