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


class TestSeparableWarp:
    """The zoom/scale-jitter warps run as interpolation-matrix matmuls;
    pin equivalence to direct 2D bilinear gather sampling."""

    def test_matches_gather_bilinear(self):
        from atomai_tpu.transforms.warp import (bilinear_sample,
                                                separable_sample)
        rng = np.random.RandomState(3)
        img = jnp.asarray(rng.rand(37, 41), jnp.float32)
        ys = jnp.asarray(np.sort(rng.uniform(-2, 38, 23)), jnp.float32)
        xs = jnp.asarray(np.sort(rng.uniform(-2, 42, 29)), jnp.float32)
        YS, XS = jnp.meshgrid(ys, xs, indexing="ij")
        ref = bilinear_sample(img, YS, XS)
        new = separable_sample(img, ys, xs)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(new),
                                   atol=1e-5)

    def test_nhwc_channels_consistent(self):
        from atomai_tpu.transforms.warp import (separable_sample,
                                                separable_sample_nhwc)
        rng = np.random.RandomState(4)
        stack = jnp.asarray(rng.rand(16, 18, 3), jnp.float32)
        ys = jnp.asarray(np.linspace(0, 15, 11), jnp.float32)
        xs = jnp.asarray(np.linspace(0, 17, 13), jnp.float32)
        out = separable_sample_nhwc(stack, ys, xs)
        assert out.shape == (11, 13, 3)
        for c in range(3):
            np.testing.assert_allclose(
                np.asarray(out[..., c]),
                np.asarray(separable_sample(stack[..., c], ys, xs)),
                atol=1e-5)

    def test_interp_matrix_zero_outside(self):
        from atomai_tpu.transforms.warp import interp_matrix
        coords = jnp.asarray([-1.5, -1.0, 0.0, 3.5, 6.0, 6.5], jnp.float32)
        A = np.asarray(interp_matrix(coords, 7))
        # fully out-of-range rows are all-zero (zero padding)
        assert A[0].sum() == 0.0
        # boundary rows interpolate with partial weight
        np.testing.assert_allclose(A[1].sum(), 0.0, atol=1e-6)
        np.testing.assert_allclose(A[2].sum(), 1.0, atol=1e-6)
        np.testing.assert_allclose(A[3].sum(), 1.0, atol=1e-6)
        np.testing.assert_allclose(A[4].sum(), 1.0, atol=1e-6)
        # coord 6.5: i0=6 in range (weight .5), i0+1=7 out -> half weight
        np.testing.assert_allclose(A[5].sum(), 0.5, atol=1e-6)


@pytest.mark.parametrize("kw", [
    {"gauss_noise": True}, {"poisson_noise": True},
    {"salt_and_pepper": True}, {"contrast": True}, {"jitter": True},
    {"background": True}, {"blur": True}])
def test_noise_transforms_leave_labels_unchanged(kw):
    """Noise/intensity transforms perturb IMAGES only — labels must pass
    through bit-identical (reference `test_imaug.py:16-21` contract)."""
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(5, 16, 16).astype(np.float32))
    y = jnp.asarray(
        rng.randint(0, 2, (5, 16, 16, 1)).astype(np.float32))
    tf = DataTransform(n_channels=1, **kw)
    X_t, y_t = tf.run(jax.random.key(1), X, y)
    np.testing.assert_array_equal(np.asarray(y_t), np.asarray(y))
    assert not np.array_equal(np.asarray(X_t), np.asarray(X))


@pytest.mark.parametrize("kw", [{"rotation": True}, {"zoom": True},
                                {"resize": (0.8, 1.2)}])
def test_affine_transforms_move_labels_with_images(kw):
    """Geometric transforms must warp images AND labels together
    (reference `test_imaug.py:27-32` contract)."""
    rng = np.random.RandomState(1)
    X = rng.rand(4, 32, 32).astype(np.float32)
    y = np.zeros((4, 32, 32, 1), np.float32)
    y[:, 4:12, 4:12, 0] = 1.0            # asymmetric mask
    tf = DataTransform(n_channels=1, **kw)
    X_t, y_t = tf.run(jax.random.key(3), jnp.asarray(X), jnp.asarray(y))
    assert not np.array_equal(np.asarray(y_t), y), kw
    assert not np.array_equal(np.asarray(X_t), X), kw
