"""Losses and metrics (reference surface: `atomai/losses_metrics/__init__.py`)."""

from .losses import (focal_loss, dice_loss, ce_loss, nll_loss, mse_loss,
                     multitask_loss, MultiTaskLoss, select_loss)
from .metrics import IoU, iou_score
from .vi_losses import (reconstruction_loss, kld_normal, kld_discrete,
                        kld_rot, vae_loss, rvae_loss, joint_vae_loss,
                        joint_rvae_loss, infocapacity)

__all__ = ["focal_loss", "dice_loss", "ce_loss", "nll_loss", "mse_loss",
           "multitask_loss", "MultiTaskLoss", "select_loss", "IoU", "iou_score",
           "reconstruction_loss", "kld_normal", "kld_discrete", "kld_rot",
           "vae_loss", "rvae_loss", "joint_vae_loss", "joint_rvae_loss",
           "infocapacity"]
