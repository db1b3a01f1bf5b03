"""Preprocessing utils tests (reference semantics:
`atomai/utils/preproc.py`)."""

import numpy as np
import pytest

from atomai_tpu.utils import preproc


def test_num_classes_binary():
    labels = np.array([[0, 1], [1, 0]])
    assert preproc.num_classes_from_labels(labels) == 1


def test_num_classes_multi():
    labels = np.array([[0, 1, 2], [2, 1, 0]])
    assert preproc.num_classes_from_labels(labels) == 3


def test_num_classes_bad_start():
    with pytest.raises(AssertionError):
        preproc.num_classes_from_labels(np.array([1, 2]))


def test_num_classes_gap():
    with pytest.raises(AssertionError):
        preproc.num_classes_from_labels(np.array([0, 2]))


def test_check_image_dims_channel_last():
    X = np.zeros((4, 8, 8))
    y = np.zeros((4, 8, 8))
    Xc, yc, _, _ = preproc.check_image_dims(X, y, X, y, 1)
    assert Xc.shape == (4, 8, 8, 1)
    assert yc.shape == (4, 8, 8)


def test_check_image_dims_nchw_input():
    X = np.zeros((4, 1, 8, 8))
    y = np.zeros((4, 1, 8, 8))
    Xc, yc, _, _ = preproc.check_image_dims(X, y, X, y, 1)
    assert Xc.shape == (4, 8, 8, 1)
    assert yc.shape == (4, 8, 8)


def test_stack_batches_drops_remainder():
    X = np.arange(10 * 4).reshape(10, 4)
    b = preproc.stack_batches(X, 3)
    assert b.shape == (3, 3, 4)
    np.testing.assert_array_equal(b[0], X[:3])


def test_stack_batches_small_n():
    X = np.zeros((2, 4))
    b = preproc.stack_batches(X, 8)
    assert b.shape == (1, 2, 4)


def test_data_split_deterministic():
    X = np.arange(20)[:, None].astype(float)
    y = np.arange(20).astype(float)
    a = preproc.data_split(X, y, test_size=0.25, random_state=3)
    b = preproc.data_split(X, y, test_size=0.25, random_state=3)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(u, v)
    assert len(a[2]) == 5


def test_format_image_normalizes():
    img = np.random.rand(2, 8, 8) * 100
    out = preproc.format_image(img)
    assert out.shape == (2, 8, 8, 1)
    assert out.min() == pytest.approx(0) and out.max() == pytest.approx(1)


def test_to_onehot():
    oh = preproc.to_onehot(np.array([0, 2, 1]), 3)
    np.testing.assert_array_equal(
        oh, np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], dtype=np.float32))
    with pytest.raises(AssertionError):
        preproc.to_onehot(np.array([3]), 3)


def test_prepare_gp_input():
    img = np.zeros((4, 4))
    img[1, 2] = 5.0
    gp_in, targets, full = preproc.prepare_gp_input(img)
    assert gp_in.shape == (1, 2)
    assert targets[0] == 5.0
    assert full.shape == (16, 2)
