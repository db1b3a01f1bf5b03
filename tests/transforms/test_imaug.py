"""On-device augmentation tests (reference semantics:
`atomai/transforms/imaug.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomai_tpu.transforms import (DataTransform, seg_augmentor,
                                   squeeze_channels, unsqueeze_channels)


def _batch(seed=0, n=4, size=32):
    rng = np.random.RandomState(seed)
    imgs = rng.rand(n, size, size).astype(np.float32)
    gts = (rng.rand(n, size, size) > .5).astype(np.float32)[..., None]
    return jnp.asarray(imgs), jnp.asarray(gts)


ALL_OPS = dict(rotation=True, zoom=True, gauss_noise=True, jitter=True,
               poisson_noise=True, salt_and_pepper=True, blur=True,
               contrast=True, background=True, resize=True)


@pytest.mark.parametrize("op", list(ALL_OPS))
def test_each_op_preserves_shapes(op):
    imgs, gts = _batch()
    dt = DataTransform(1, **{op: ALL_OPS[op]})
    out_i, out_g = dt.run(jax.random.key(0), imgs, gts)
    assert out_i.shape == imgs.shape
    assert out_g.shape == gts.shape
    assert np.isfinite(np.asarray(out_i)).all()


def test_pipeline_is_deterministic():
    imgs, gts = _batch()
    dt = DataTransform(1, rotation=True, gauss_noise=True, zoom=True)
    a1 = dt.run(jax.random.key(42), imgs, gts)
    a2 = dt.run(jax.random.key(42), imgs, gts)
    np.testing.assert_allclose(np.asarray(a1[0]), np.asarray(a2[0]))
    b = dt.run(jax.random.key(43), imgs, gts)
    assert not np.allclose(np.asarray(a1[0]), np.asarray(b[0]))


def test_pipeline_jittable():
    imgs, gts = _batch()
    dt = DataTransform(1, rotation=True, gauss_noise=[10, 20], blur=True)
    jitted = jax.jit(dt.run)
    out_i, out_g = jitted(jax.random.key(0), imgs, gts)
    assert out_i.shape == imgs.shape


def test_seg_augmentor_binary():
    aug = seg_augmentor(1, rotation=True, zoom=True)
    imgs = jnp.asarray(np.random.rand(4, 32, 32, 1).astype(np.float32))
    labels = jnp.asarray((np.random.rand(4, 32, 32) > .5
                          ).astype(np.float32))
    X, y = aug(jax.random.key(0), imgs, labels)
    assert X.shape == (4, 32, 32, 1)
    assert y.shape == (4, 32, 32)
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}


def test_seg_augmentor_multiclass():
    aug = seg_augmentor(3, rotation=True)
    imgs = jnp.asarray(np.random.rand(4, 32, 32, 1).astype(np.float32))
    labels = jnp.asarray(np.random.randint(0, 3, (4, 32, 32)))
    X, y = aug(jax.random.key(0), imgs, labels)
    assert y.shape == (4, 32, 32)
    assert np.asarray(y).max() <= 2


def test_seg_augmentor_none_when_no_kwargs():
    assert seg_augmentor(1) is None
    assert seg_augmentor(1, unrelated_kwarg=5) is None


def test_squeeze_unsqueeze_roundtrip():
    labels = jnp.asarray(np.random.randint(0, 4, (2, 16, 16)))
    onehot = unsqueeze_channels(labels, 4)
    assert onehot.shape == (2, 16, 16, 4)
    back = squeeze_channels(onehot)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(labels))
