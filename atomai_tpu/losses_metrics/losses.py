"""Loss functions (pure JAX, channel-last logits).

Parity targets: `atomai/losses_metrics/losses.py` — focal (`losses.py:13-50`),
Sørensen–Dice (`losses.py:53-89`), multitask weighted sum (`losses.py:92-136`),
and the string->criterion registry `select_loss` (`losses.py:139-174`).

Conventions: logits are channel-LAST (N, ..., C); segmentation targets are
float masks (N, H, W) for the single-class case and integer masks (N, H, W)
for multi-class; regression targets are float arrays; classification targets
integer labels.
"""

from typing import Any, Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp


def _bce_with_logits(logits, labels, reduction: str = "mean"):
    """Numerically stable binary cross-entropy with logits."""
    neg_abs = -jnp.abs(logits)
    loss = (jnp.maximum(logits, 0.0) - logits * labels +
            jnp.log1p(jnp.exp(neg_abs)))
    if reduction == "mean":
        return jnp.mean(loss)
    return loss


def focal_loss(prediction, labels, alpha: float = 0.5, gamma: float = 2.0,
               with_logits: bool = True):
    """Focal loss (arXiv:1708.02002). Reference quirk preserved
    (`losses.py:40-50`): the modulating factor is applied to the *mean* CE,
    not per-pixel."""
    prediction = prediction[..., 0] if prediction.ndim == labels.ndim + 1 \
        else prediction
    if with_logits:
        ce = _bce_with_logits(prediction, labels)
    else:
        eps = 1e-12
        ce = -jnp.mean(labels * jnp.log(prediction + eps) +
                       (1 - labels) * jnp.log(1 - prediction + eps))
    pt = jnp.exp(-ce)
    return alpha * (1 - pt) ** gamma * ce


def dice_loss(logits, labels, eps: float = 1e-7):
    """Sørensen–Dice loss (`losses.py:53-89`), channel-last."""
    num_classes = logits.shape[-1]
    if num_classes == 1:
        labels_int = labels.astype(jnp.int32)
        true_1_hot = jax.nn.one_hot(labels_int, 2)         # (..., 2) [bg, fg]
        # reorder to [fg, bg] to match [pos_prob, neg_prob]
        true_1_hot = true_1_hot[..., ::-1]
        pos = jax.nn.sigmoid(logits[..., 0])
        probas = jnp.stack([pos, 1.0 - pos], axis=-1)
    else:
        true_1_hot = jax.nn.one_hot(labels.astype(jnp.int32), num_classes)
        probas = jax.nn.softmax(logits, axis=-1)
    reduce_axes = tuple(range(probas.ndim - 1))  # all but class axis
    intersection = jnp.sum(probas * true_1_hot, axis=reduce_axes)
    cardinality = jnp.sum(probas + true_1_hot, axis=reduce_axes)
    dice = jnp.mean(2.0 * intersection / (cardinality + eps))
    return 1.0 - dice


def ce_loss(logits, labels):
    """Softmax cross-entropy with integer labels (channel-last)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), logits.shape[-1])
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def nll_loss(log_probs, labels):
    """NLL over log-probabilities (torch NLLLoss equivalent)."""
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), log_probs.shape[-1])
    return -jnp.mean(jnp.sum(onehot * log_probs, axis=-1))


def mse_loss(prediction, target):
    if prediction.ndim == target.ndim + 1 and prediction.shape[-1] == 1:
        prediction = prediction[..., 0]
    return jnp.mean((prediction - target) ** 2)


def multitask_loss(outputs: Sequence, labels: Sequence,
                   loss_fn: Callable = nll_loss,
                   weights: Optional[Sequence[float]] = None):
    """Weighted sum of per-task losses (`losses.py:92-136`)."""
    if weights is None:
        weights = [1.0] * len(outputs)
    assert len(weights) == len(outputs)
    total = 0.0
    for w, o, l in zip(weights, outputs, labels):
        total = total + w * loss_fn(o, l)
    return total


class MultiTaskLoss:
    """Class-style multitask loss wrapper (reference `losses.py:92-136`)."""

    def __init__(self, num_tasks: int, loss_fn: Callable = nll_loss,
                 weights: Optional[Sequence[float]] = None):
        self.num_tasks = num_tasks
        self.loss_fn = loss_fn
        if weights is not None:
            assert len(weights) == num_tasks, \
                "The length of weights must match num_tasks"
        self.weights = weights

    def __call__(self, outputs, labels):
        return multitask_loss(outputs, labels, self.loss_fn, self.weights)


def select_loss(loss: Union[str, Callable], nb_classes: Optional[Any] = None,
                **kwargs) -> Callable:
    """String -> criterion registry (`losses.py:139-174`).

    Returns a pure function criterion(logits, targets) -> scalar.
    """
    if callable(loss):
        return loss
    if loss in ("ce", "multitask_nll", "multitask_ce") and nb_classes is None:
        raise ValueError("For cross-entropy loss function, you must "
                         "specify the number of classes")
    if loss == "dice":
        return dice_loss
    if loss == "focal":
        return focal_loss
    if loss == "ce":
        if nb_classes == 1:
            return lambda logits, labels: _bce_with_logits(
                logits[..., 0] if logits.shape[-1] == 1 and
                logits.ndim == labels.ndim + 1 else logits, labels)
        # nb_classes >= 2 (the reference erred out on exactly 2; we accept)
        return ce_loss
    if loss == "nll":
        return nll_loss
    if loss == "multitask_nll":
        if not isinstance(nb_classes, (list, tuple)):
            raise ValueError("Provide number of classes for each task as "
                             "a list")
        return lambda outs, labs: multitask_loss(outs, labs, nll_loss,
                                                 kwargs.get("weights"))
    if loss == "multitask_ce":
        if not isinstance(nb_classes, (list, tuple)):
            raise ValueError("Provide number of classes for each task as "
                             "a list")
        return lambda outs, labs: multitask_loss(outs, labs, ce_loss,
                                                 kwargs.get("weights"))
    if loss == "mse":
        return mse_loss
    raise NotImplementedError(
        "Select Dice loss ('dice'), focal loss ('focal'), cross-entropy "
        "loss ('ce'), mean-squared error ('mse'), multitask loss "
        "('multitask_nll'/'multitask_ce') or pass a custom loss function")
