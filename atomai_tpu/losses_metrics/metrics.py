"""Accuracy metrics (jittable).

Parity: `atomai/losses_metrics/metrics.py:16-95` — mean IoU via per-batch
confusion histogram. The reference round-trips through cv2 thresholding on
the host per image; here the whole metric is a fused on-device computation
usable inside the jitted train step.
"""

import jax
import jax.numpy as jnp


def iou_score(true, pred_logits, activation: bool = True,
              thresh: float = 0.5):
    """Mean Jaccard index over classes (channel-last logits).

    Args:
        true: ground truth labels (N, H, W) int (multiclass) or float
            binary mask.
        pred_logits: model output (N, H, W, C).
        activation: apply softmax (C>1) / sigmoid (C==1) first.
        thresh: binarization threshold for the single-class case.
    """
    nb = pred_logits.shape[-1]
    if nb > 1:
        probs = jax.nn.softmax(pred_logits, axis=-1) if activation \
            else pred_logits
        pred = jnp.argmax(probs, axis=-1)
        n_cls = nb
    else:
        probs = jax.nn.sigmoid(pred_logits[..., 0]) if activation \
            else pred_logits[..., 0]
        pred = (probs > thresh).astype(jnp.int32)
        n_cls = 2
    true = true.astype(jnp.int32)
    mask = (true >= 0) & (true < n_cls)
    idx = jnp.where(mask, n_cls * true + pred, n_cls * n_cls)
    hist = jnp.bincount(idx.reshape(-1), length=n_cls * n_cls + 1)[:-1]
    hist = hist.reshape(n_cls, n_cls).astype(jnp.float32)
    inter = jnp.diag(hist)
    a = jnp.sum(hist, axis=1)
    b = jnp.sum(hist, axis=0)
    union = a + b - inter
    jcd = inter / (union + 1e-10)
    valid = union > 0
    return jnp.sum(jnp.where(valid, jcd, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


class IoU:
    """Object-style wrapper matching the reference call pattern
    (``IoU(true, pred).evaluate()``, `metrics.py:16-95`)."""

    def __init__(self, true, pred, activation: bool = True,
                 thresh: float = 0.5):
        self.true = true
        self.pred = pred
        self.activation = activation
        self.thresh = thresh

    def evaluate(self) -> float:
        return float(iou_score(self.true, self.pred, self.activation,
                               self.thresh))
