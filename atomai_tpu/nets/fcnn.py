"""Fully convolutional networks for semantic segmentation (Flax/NHWC).

Architecture parity with the reference zoo (`atomai/nets/fcnn.py`):
- Unet: 3-level encoder/decoder with skip concats and optional dilated
  bottleneck (`fcnn.py:18-142`), default filters 16, layers [1, 2, 2, 3].
- dilnet: 1 pool + two dilated cascades (`fcnn.py:145-226`), default
  filters 25, layers [1, 3, 3, 1] via factory (`fcnn.py:414-421`).
- ResHedNet: holistically-nested edge detector with 3 scale heads
  (`fcnn.py:229-296`).
- SegResNet: SegNet-style with residual modules (`fcnn.py:299-376`).
- init_fcnn_model: factory returning (net, meta_state_dict)
  (`fcnn.py:379-442`).

Inputs are NHWC; outputs are NHWC logits with ``nb_classes`` channels.
"""

from typing import Any, Dict, List, Tuple, Union

import flax.linen as nn
import jax

from .blocks import (init_kwargs, ConvBlock, DilatedBlock, ResModule, UpsampleBlock,
                     max_pool)


class Unet(nn.Module):
    nb_classes: int = 1
    nb_filters: int = 16
    dropout: bool = False
    batch_norm: bool = True
    upsampling_mode: str = "bilinear"
    with_dilation: bool = False
    layers: Tuple[int, ...] = (1, 2, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        nbl = list(self.layers)
        dilation_values = list(range(2, 2 * nbl[-1] + 1, 2))
        padding_values = dilation_values.copy()
        dropout_vals = [.1, .2, .1] if self.dropout else [0, 0, 0]
        nf = self.nb_filters
        bn_kw = dict(batch_norm=self.batch_norm)

        c1 = ConvBlock(2, nbl[0], nf, **bn_kw)(x, train)
        d1 = max_pool(c1, 2)
        c2 = ConvBlock(2, nbl[1], nf * 2, **bn_kw)(d1, train)
        d2 = max_pool(c2, 2)
        c3 = ConvBlock(2, nbl[2], nf * 4, dropout_=dropout_vals[0],
                       **bn_kw)(d2, train)
        d3 = max_pool(c3, 2)
        if self.with_dilation:
            bn = DilatedBlock(2, nf * 8, dilation_values, padding_values,
                              batch_norm=self.batch_norm,
                              dropout_=dropout_vals[1])(d3, train)
        else:
            bn = ConvBlock(2, nbl[3], nf * 8, dropout_=dropout_vals[1],
                           **bn_kw)(d3, train)
        u3 = UpsampleBlock(2, nf * 4, mode=self.upsampling_mode)(bn)
        u3 = jax.numpy.concatenate([c3, u3], axis=-1)
        u3 = ConvBlock(2, nbl[2], nf * 4, dropout_=dropout_vals[2],
                       **bn_kw)(u3, train)
        u2 = UpsampleBlock(2, nf * 2, mode=self.upsampling_mode)(u3)
        u2 = jax.numpy.concatenate([c2, u2], axis=-1)
        u2 = ConvBlock(2, nbl[1], nf * 2, **bn_kw)(u2, train)
        u1 = UpsampleBlock(2, nf, mode=self.upsampling_mode)(u2)
        u1 = jax.numpy.concatenate([c1, u1], axis=-1)
        u1 = ConvBlock(2, nbl[0], nf, **bn_kw)(u1, train)
        return nn.Conv(self.nb_classes, (1, 1), padding=0,
                       **init_kwargs(u1.shape[-1]))(u1)


class dilnet(nn.Module):
    nb_classes: int = 1
    nb_filters: int = 25
    dropout: bool = False
    batch_norm: bool = True
    upsampling_mode: str = "bilinear"
    layers: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        nbl = list(self.layers)
        dil1 = list(range(2, 2 * nbl[1] + 1, 2))
        dil2 = list(range(2, 2 * nbl[2] + 1, 2))
        dropout_vals = [.3, .3] if self.dropout else [0, 0]
        nf = self.nb_filters
        c1 = ConvBlock(2, nbl[0], nf, batch_norm=self.batch_norm)(x, train)
        d1 = max_pool(c1, 2)
        at1 = DilatedBlock(2, nf * 2, dil1, dil1,
                           batch_norm=self.batch_norm,
                           dropout_=dropout_vals[0])(d1, train)
        at2 = DilatedBlock(2, nf * 2, dil2, dil2,
                           batch_norm=self.batch_norm,
                           dropout_=dropout_vals[1])(at1, train)
        u1 = UpsampleBlock(2, nf, mode=self.upsampling_mode)(at2)
        u1 = jax.numpy.concatenate([c1, u1], axis=-1)
        u1 = ConvBlock(2, nbl[3], nf, batch_norm=self.batch_norm)(u1, train)
        return nn.Conv(self.nb_classes, (1, 1), padding=0,
                       **init_kwargs(u1.shape[-1]))(u1)


class ResHedNet(nn.Module):
    nb_classes: int = 1
    nb_filters: int = 64
    upsampling_mode: str = "bilinear"
    layers: Tuple[int, ...] = (3, 4, 5)

    @nn.compact
    def __call__(self, x, train: bool = False):
        nbl = list(self.layers)
        nf = self.nb_filters
        h, w = x.shape[1:3]
        net1out = ResModule(2, nbl[0], nf, batch_norm=True)(x, train)
        net2out = ResModule(2, nbl[1], nf * 2, batch_norm=True)(
            max_pool(net1out, 2), train)
        net3out = ResModule(2, nbl[2], nf * 4, batch_norm=True)(
            max_pool(net2out, 2), train)

        def score(t):
            t = nn.Conv(self.nb_classes, (1, 1), padding=0,
                       **init_kwargs(t.shape[-1]))(t)
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5)(t)

        s1 = score(net1out)
        s2 = score(net2out)
        s3 = score(net3out)
        method = "linear" if self.upsampling_mode == "bilinear" else "nearest"
        n = x.shape[0]
        s2 = jax.image.resize(s2, (n, h, w, s2.shape[-1]), method=method)
        s3 = jax.image.resize(s3, (n, h, w, s3.shape[-1]), method=method)
        cat = jax.numpy.concatenate([s1, s2, s3], axis=-1)
        return nn.Conv(self.nb_classes, (1, 1), padding=0,
                       **init_kwargs(cat.shape[-1]))(cat)


class SegResNet(nn.Module):
    nb_classes: int = 1
    nb_filters: int = 32
    batch_norm: bool = True
    upsampling_mode: str = "bilinear"
    layers: Tuple[int, ...] = (2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        nbl = list(self.layers)
        nf = self.nb_filters
        c1 = ConvBlock(2, 1, nf, batch_norm=self.batch_norm)(x, train)
        d1 = max_pool(c1, 2)
        c2 = ResModule(2, nbl[0], nf * 2, batch_norm=self.batch_norm)(
            d1, train)
        d2 = max_pool(c2, 2)
        bn = ResModule(2, nbl[1], nf * 4, batch_norm=self.batch_norm)(
            d2, train)
        u2 = UpsampleBlock(2, nf * 2, mode=self.upsampling_mode)(bn)
        u2 = jax.numpy.concatenate([c2, u2], axis=-1)
        u2 = ResModule(2, nbl[2], nf * 2, batch_norm=self.batch_norm)(
            u2, train)
        u1 = UpsampleBlock(2, nf, mode=self.upsampling_mode)(u2)
        u1 = jax.numpy.concatenate([c1, u1], axis=-1)
        u1 = ConvBlock(2, 1, nf, batch_norm=self.batch_norm)(u1, train)
        return nn.Conv(self.nb_classes, (1, 1), padding=0,
                       **init_kwargs(u1.shape[-1]))(u1)


# downsample factor of each architecture (static — replaces the reference's
# hook-based mock-forward introspection, `atomai/utils/nn.py:211-228`)
DOWNSAMPLE_FACTORS = {"Unet": 8, "dilnet": 2, "SegResNet": 4, "ResHedNet": 4}


def init_fcnn_model(model: Union[str, nn.Module], nb_classes: int,
                    **kwargs: Any) -> Tuple[nn.Module, Dict[str, Any]]:
    """Initializes a segmentation model + its self-describing metadict
    (reference contract: `atomai/nets/fcnn.py:379-442`)."""
    if not isinstance(model, str) and isinstance(model, nn.Module):
        meta_state_dict = {"model_type": "seg", "model": "custom",
                           "nb_classes": nb_classes}
        return model, meta_state_dict
    batch_norm = kwargs.get("batch_norm", True)
    dropout = kwargs.get("dropout", False)
    upsampling = kwargs.get("upsampling", "bilinear")
    meta_state_dict = {
        "model_type": "seg",
        "model": model,
        "nb_classes": nb_classes,
        "batch_norm": batch_norm,
        "dropout": dropout,
        "upsampling": upsampling,
    }
    if model == "Unet":
        with_dilation = kwargs.get("with_dilation", False)
        nb_filters = kwargs.get("nb_filters", 16)
        layers = kwargs.get("layers", [1, 2, 2, 3])
        net = Unet(nb_classes, nb_filters, dropout, batch_norm, upsampling,
                   with_dilation, tuple(layers))
        meta_state_dict["with_dilation"] = with_dilation
    elif model == "dilnet":
        nb_filters = kwargs.get("nb_filters", 25)
        layers = kwargs.get("layers", [1, 3, 3, 1])
        net = dilnet(nb_classes, nb_filters, dropout, batch_norm,
                     upsampling, tuple(layers))
    elif model == "SegResNet":
        nb_filters = kwargs.get("nb_filters", 32)
        layers = kwargs.get("layers", [2, 2, 2])
        net = SegResNet(nb_classes, nb_filters, batch_norm, upsampling,
                        tuple(layers))
    elif model == "ResHedNet":
        nb_filters = kwargs.get("nb_filters", 64)
        layers = kwargs.get("layers", [3, 4, 5])
        net = ResHedNet(nb_classes, nb_filters, upsampling, tuple(layers))
    else:
        raise NotImplementedError(
            "Currently implemented models are 'Unet', 'dilnet', "
            "'SegResNet', and 'ResHedNet'")
    if model in ("ResHedNet", "SegResNet"):
        meta_state_dict["dropout"] = None
    if model == "ResHedNet":
        meta_state_dict["batch_norm"] = True
    meta_state_dict["nb_filters"] = nb_filters
    meta_state_dict["layers"] = list(layers)
    return net, meta_state_dict
