"""Reference-API compatibility surface tests
(`atomai_tpu/utils/compat.py`)."""

import numpy as np
import pytest

from atomai_tpu.utils import (array2list, array2list_, channels2indices,
                              dummy_optimizer, get_array_memsize, Hook,
                              init_dataloader, init_fcnn_dataloaders,
                              preprocess_training_image_data,
                              torch_format_image, torch_format_spectra,
                              train_test_split)


def test_array2list_equal_batches():
    X = np.arange(10 * 2).reshape(10, 2)
    batches = array2list_(X, 3)
    assert len(batches) == 3
    assert all(b.shape == (3, 2) for b in batches)


def test_array2list_four_arrays():
    X = np.random.rand(9, 4)
    y = np.random.rand(9)
    out = array2list(X, y, X, y, batch_size=4)
    assert len(out) == 4
    assert out[0][0].shape == (4, 4)


def test_get_array_memsize():
    x64 = np.zeros(10, np.float64)
    assert get_array_memsize(x64, "single") == x64.nbytes / 2
    assert get_array_memsize(None) == 0


def test_torch_format_aliases():
    img = np.random.rand(2, 8, 8)
    out = torch_format_image(img)
    assert out.shape == (2, 8, 8, 1)
    sp = torch_format_spectra(np.random.rand(2, 16))
    assert sp.shape == (2, 16)


def test_train_test_split_order():
    X = np.arange(20)[:, None]
    y = np.arange(20)
    X_tr, X_ts, y_tr, y_ts = train_test_split(X, y, test_size=0.25)
    assert len(X_ts) == 5 and len(y_ts) == 5
    np.testing.assert_array_equal(X_tr[:, 0], y_tr)


def test_init_dataloader_batches():
    X = np.random.rand(10, 3)
    y = np.arange(10)
    batches = init_dataloader(X, y, batch_size=4)
    assert len(batches) == 3
    assert batches[0][0].shape == (4, 3)
    tr, ts = init_fcnn_dataloaders(X, y, X[:4], y[:4], batch_size=4)
    assert len(tr) == 3 and len(ts) == 1


def test_preprocess_training_image_data():
    X = np.random.rand(8, 16, 16)
    y = (X > .5).astype(float)
    Xb, yb, Xtb, ytb, nb = preprocess_training_image_data(
        X, y, X[:4], y[:4], batch_size=4)
    assert nb == 1
    assert Xb[0].shape == (4, 16, 16, 1)


def test_channels2indices():
    onehot = np.eye(3)[np.random.randint(0, 3, (2, 8, 8))]
    idx = channels2indices(onehot)
    assert idx.shape == (2, 8, 8)
    assert idx.max() <= 2


def test_hook_captures_intermediates():
    import jax
    import jax.numpy as jnp
    from atomai_tpu.nets import init_fcnn_model
    net, _ = init_fcnn_model("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    x = jnp.ones((1, 16, 16, 1))
    v = net.init({"params": jax.random.key(0),
                  "dropout": jax.random.key(0)}, x, False)
    h = Hook(net, v)
    out = h(x)
    assert out.shape == (1, 16, 16, 1)
    assert len(h.intermediates) > 0


def test_dummy_optimizer():
    import jax.numpy as jnp
    tx = dummy_optimizer()
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
    np.testing.assert_array_equal(np.asarray(updates["w"]), 1.0)


def test_array2list_rejects_oversized_batch():
    """batch_size > n must error loudly (reference parity) — a silent
    single EMPTY batch flows NaN losses downstream."""
    import pytest
    X = np.random.rand(4, 8, 8)
    with pytest.raises(ValueError, match="exceeds"):
        array2list_(X, 32)


def test_train_test_split_shuffle_false_keeps_order():
    """shuffle=False must keep chronological order — silently shuffling
    leaks future frames into a time-ordered training split."""
    X = np.arange(20)[:, None].astype(np.float32)
    y = np.arange(20).astype(np.float32)
    X_tr, X_ts, y_tr, y_ts = train_test_split(X, y, test_size=0.2,
                                              shuffle=False)
    np.testing.assert_array_equal(X_tr.ravel(), np.arange(16))
    np.testing.assert_array_equal(X_ts.ravel(), np.arange(16, 20))
    # and shuffle=True (default) does shuffle
    X_tr2, _, _, _ = train_test_split(X, y, test_size=0.2)
    assert not np.array_equal(X_tr2.ravel(), np.arange(16))
