"""Regression/classification nets (reference: `atomai/nets/reg_cls.py`).

The torchvision backbones are replaced by the own strided-conv
``ConvBackbone`` (see `atomai_tpu/nets/blocks.py`) — same
(features -> pooled vector -> head) contract and factory/metadict interface
(`reg_cls.py:129-162`).
"""

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax

from .blocks import init_kwargs, ConvBackbone


class RegressorNet(nn.Module):
    """Backbone + linear head -> (batch, output_size)
    (`reg_cls.py:16-49`)."""
    input_channels: int
    output_size: int
    backbone_type: str = "mobilenet"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBackbone(self.backbone_type)(x, train)
        return nn.Dense(self.output_size, **init_kwargs(x.shape[-1]))(x)


class ClassifierNet(nn.Module):
    """Backbone + linear + LogSoftmax head (`reg_cls.py:52-86`)."""
    input_channels: int
    num_classes: int
    backbone_type: str = "resnet"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBackbone(self.backbone_type)(x, train)
        x = nn.Dense(self.num_classes, **init_kwargs(x.shape[-1]))(x)
        return jax.nn.log_softmax(x, axis=1)


class MultiTaskClassifierNet(nn.Module):
    """Shared backbone with N log-softmax heads (`reg_cls.py:89-125`)."""
    input_channels: int
    num_classes: Tuple[int, ...]
    backbone_type: str = "resnet"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBackbone(self.backbone_type)(x, train)
        return [jax.nn.log_softmax(
            nn.Dense(n, **init_kwargs(x.shape[-1]))(x), axis=1)
                for n in self.num_classes]


def init_reg_model(out_dim: int, backbone_type: str,
                   input_channels: int = 1, **kwargs: Any
                   ) -> Tuple[nn.Module, Dict[str, Any]]:
    """Regression model factory (`reg_cls.py:129-137`)."""
    net = RegressorNet(input_channels, out_dim, backbone_type)
    meta_state_dict = {
        "model_type": "reg",
        "backbone": backbone_type,
        "in_channels": input_channels,
        "out_dim": out_dim,
    }
    return net, meta_state_dict


def init_cls_model(num_classes: int, backbone_type: str,
                   input_channels: int = 1, **kwargs: Any
                   ) -> Tuple[nn.Module, Dict[str, Any]]:
    """Classification model factory (`reg_cls.py:140-148`)."""
    net = ClassifierNet(input_channels, num_classes, backbone_type)
    meta_state_dict = {
        "model_type": "cls",
        "backbone": backbone_type,
        "in_channels": input_channels,
        "nb_classes": num_classes,
    }
    return net, meta_state_dict


def init_mtask_cls_model(num_classes: Sequence[int], backbone_type: str,
                         input_channels: int = 1, **kwargs: Any
                         ) -> Tuple[nn.Module, Dict[str, Any]]:
    """Multi-task classification factory (`reg_cls.py:151-162`)."""
    net = MultiTaskClassifierNet(input_channels, tuple(num_classes),
                                 backbone_type)
    meta_state_dict = {
        "model_type": "cls",
        "backbone": backbone_type,
        "in_channels": input_channels,
        "nb_classes": list(num_classes),
    }
    return net, meta_state_dict
