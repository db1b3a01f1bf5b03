"""Building-block shape contracts (reference model:
`test/nets/test_blocks.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomai_tpu.nets import (ConvBlock, DilatedBlock, ResBlock, ResModule,
                             UpsampleBlock, ConvBackbone, SignalED,
                             RegressorNet, ClassifierNet,
                             MultiTaskClassifierNet)


def _init_apply(mod, x, train=False):
    keys = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    v = mod.init(keys, x, train) if _takes_train(mod) else mod.init(keys, x)
    if _takes_train(mod):
        if train and "batch_stats" in v:
            out, _ = mod.apply(v, x, train, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.key(2)})
            return out
        return mod.apply(v, x, train, rngs={"dropout": jax.random.key(2)})
    return mod.apply(v, x)


def _takes_train(mod):
    return not isinstance(mod, UpsampleBlock)


@pytest.mark.parametrize("ndim,shape", [(2, (2, 16, 16, 3)),
                                        (1, (2, 16, 3))])
def test_convblock_shapes(ndim, shape):
    x = jnp.ones(shape)
    out = _init_apply(ConvBlock(ndim, 2, 8, batch_norm=True,
                                dropout_=0.1), x, train=True)
    assert out.shape == shape[:-1] + (8,)


@pytest.mark.parametrize("ndim,shape,exp", [
    (2, (2, 8, 8, 4), (2, 16, 16, 6)),
    (1, (2, 8, 4), (2, 16, 6)),
])
def test_upsample_shapes(ndim, shape, exp):
    x = jnp.ones(shape)
    out = _init_apply(UpsampleBlock(ndim, 6), x)
    assert out.shape == exp


def test_resblock_and_module():
    x = jnp.ones((2, 16, 16, 4))
    out = _init_apply(ResBlock(2, 8), x)
    assert out.shape == (2, 16, 16, 8)
    out = _init_apply(ResModule(2, 3, 8), x)
    assert out.shape == (2, 16, 16, 8)


def test_dilated_block_sums_intermediates():
    x = jnp.ones((2, 16, 16, 4))
    out = _init_apply(DilatedBlock(2, 8, [2, 4], [2, 4],
                                   batch_norm=True), x)
    assert out.shape == (2, 16, 16, 8)


def test_conv_backbone_pools():
    x = jnp.ones((2, 32, 32, 1))
    for bt in ("mobilenet", "vgg", "resnet"):
        out = _init_apply(ConvBackbone(bt), x)
        assert out.ndim == 2 and out.shape[0] == 2


def test_backbone_invalid_type():
    x = jnp.ones((2, 32, 32, 1))
    with pytest.raises(ValueError):
        _init_apply(ConvBackbone("alexnet"), x)


def test_signal_ed_image_to_spectrum():
    net = SignalED((16, 16), (10,), 4, nbfilters_encoder=8,
                   nbfilters_decoder=8)
    x = jnp.ones((2, 16, 16))
    keys = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    v = net.init(keys, x, False)
    out = net.apply(v, x, False)
    assert out.shape == (2, 10)
    z = net.apply(v, x, False, method=net.encode)
    assert z.shape == (2, 4)


def test_reg_cls_nets():
    x = jnp.ones((2, 32, 32, 1))
    out = _init_apply(RegressorNet(1, 3), x)
    assert out.shape == (2, 3)
    out = _init_apply(ClassifierNet(1, 5), x)
    assert out.shape == (2, 5)
    # log-softmax output sums to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(1), 1.0,
                               atol=1e-5)
    outs = _init_apply(MultiTaskClassifierNet(1, (3, 4)), x)
    assert len(outs) == 2
    assert outs[0].shape == (2, 3) and outs[1].shape == (2, 4)
