"""Loss/metric tests (reference semantics:
`atomai/losses_metrics/losses.py`, `metrics.py`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from atomai_tpu.losses_metrics import (dice_loss, focal_loss, select_loss,
                                       iou_score, ce_loss, mse_loss)


def test_dice_perfect_prediction_near_zero():
    labels = jnp.asarray(np.random.RandomState(0).randint(0, 2, (2, 8, 8))
                         .astype(np.float32))
    logits = (labels * 2 - 1)[..., None] * 20.0  # huge logits
    assert float(dice_loss(logits, labels)) < 0.01


def test_dice_wrong_prediction_near_one():
    labels = jnp.ones((2, 8, 8))
    logits = -20.0 * jnp.ones((2, 8, 8, 1))
    assert float(dice_loss(logits, labels)) > 0.9


def test_focal_less_than_bce_for_easy_examples():
    labels = jnp.ones((4, 8, 8))
    logits = 5.0 * jnp.ones((4, 8, 8, 1))
    fl = float(focal_loss(logits, labels))
    bce = float(select_loss("ce", 1)(logits, labels))
    assert fl < bce


def test_select_loss_registry():
    assert select_loss("mse") is mse_loss
    assert callable(select_loss("dice"))
    assert callable(select_loss("focal"))
    assert callable(select_loss("ce", 3))
    with pytest.raises(ValueError):
        select_loss("ce")
    with pytest.raises(NotImplementedError):
        select_loss("bogus", 2)
    custom = lambda a, b: 0.0
    assert select_loss(custom) is custom


def test_ce_matches_manual():
    logits = jnp.asarray(np.random.RandomState(1).randn(4, 3))
    labels = jnp.asarray([0, 1, 2, 1])
    from scipy.special import log_softmax
    expected = -np.mean([log_softmax(np.asarray(logits[i]))[labels[i]]
                         for i in range(4)])
    assert float(ce_loss(logits, labels)) == pytest.approx(expected,
                                                           abs=1e-5)


def test_iou_perfect():
    labels = jnp.asarray(np.random.RandomState(2).randint(0, 2, (2, 8, 8))
                         .astype(np.float32))
    logits = (labels * 2 - 1)[..., None] * 20.0
    assert float(iou_score(labels, logits)) == pytest.approx(1.0, abs=1e-5)


def test_iou_multiclass_range():
    rng = np.random.RandomState(3)
    labels = jnp.asarray(rng.randint(0, 3, (2, 8, 8)))
    logits = jnp.asarray(rng.randn(2, 8, 8, 3))
    v = float(iou_score(labels, logits))
    assert 0.0 <= v <= 1.0
