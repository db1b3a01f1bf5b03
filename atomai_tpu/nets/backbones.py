"""Faithful ResNet50 / VGG16 / MobileNetV2 feature extractors (Flax, NHWC).

Architecture parity with the reference's ``CustomBackbone``
(`atomai/nets/blocks.py:332-399`), which wraps torchvision
``resnet50(weights=None)`` / ``vgg16(weights=None)`` /
``mobilenet_v2(weights=None)`` with the first convolution swapped for an
``input_channels``-channel one and the classifier head removed. Note the
reference instantiates the torchvision models with ``weights=None`` — no
ImageNet weights are involved; the capability is the *topology*. Users
who do have torchvision-format checkpoints can load them through
``atomai_tpu.models.conversion.convert_backbone_state_dict``.

Submodule names mirror the torchvision layer names (``conv1``, ``bn1``,
``layer1_0`` ...) so converted parameters map one-to-one.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


_BN = dict(momentum=0.9, epsilon=1e-5)  # torch BatchNorm2d defaults

# torchvision resnet/vgg/mobilenet apply kaiming_normal(fan_out, relu)
# to every conv at construction (weights=None keeps that init); match
# the distribution so training-from-scratch dynamics are comparable.
_TV_CONV_INIT = dict(
    kernel_init=nn.initializers.variance_scaling(2.0, "fan_out",
                                                 "normal"))


class Bottleneck(nn.Module):
    """torchvision ResNet Bottleneck (expansion 4)."""
    filters: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        identity = x
        out = nn.Conv(f, (1, 1), use_bias=False, name="conv1",
                      **_TV_CONV_INIT)(x)
        out = nn.BatchNorm(use_running_average=not train, name="bn1",
                           **_BN)(out)
        out = nn.relu(out)
        out = nn.Conv(f, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, name="conv2",
                      **_TV_CONV_INIT)(out)
        out = nn.BatchNorm(use_running_average=not train, name="bn2",
                           **_BN)(out)
        out = nn.relu(out)
        out = nn.Conv(4 * f, (1, 1), use_bias=False, name="conv3",
                      **_TV_CONV_INIT)(out)
        out = nn.BatchNorm(use_running_average=not train, name="bn3",
                           **_BN)(out)
        if self.downsample:
            identity = nn.Conv(4 * f, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv",
                               **_TV_CONV_INIT)(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    name="downsample_bn", **_BN)(identity)
        return nn.relu(out + identity)


class ResNet50Features(nn.Module):
    """torchvision ``resnet50`` minus avgpool/fc: conv7x7/2 -> bn -> relu
    -> maxpool3/2 -> 4 bottleneck stages [3, 4, 6, 3]. Output channels
    2048 at 1/32 resolution."""
    in_features = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1", **_TV_CONV_INIT)(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1",
                         **_BN)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for li, (f, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)],
                start=1):
            for b in range(blocks):
                first = b == 0
                x = Bottleneck(
                    f, stride if first else 1, downsample=first,
                    name=f"layer{li}_{b}")(x, train)
        return x


_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512)


class VGG16Features(nn.Module):
    """torchvision ``vgg16.features`` minus the final maxpool (the
    reference drops ``features[-1]``, `blocks.py:358-370`): 13 conv3x3 +
    ReLU with 4 interior maxpools. Output channels 512."""
    in_features = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torchvision Sequential index -> conv name parity
        idx = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                idx += 1
            else:
                x = nn.Conv(v, (3, 3), padding=1, name=f"conv{idx}",
                            **_TV_CONV_INIT)(x)
                x = nn.relu(x)
                idx += 2
        return x


class InvertedResidual(nn.Module):
    """torchvision MobileNetV2 inverted residual."""
    in_ch: int
    out_ch: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.in_ch * self.expand_ratio
        use_res = self.stride == 1 and self.in_ch == self.out_ch
        out = x
        if self.expand_ratio != 1:
            out = nn.Conv(hidden, (1, 1), use_bias=False, name="pw",
                          **_TV_CONV_INIT)(out)
            out = nn.BatchNorm(use_running_average=not train,
                               name="pw_bn", **_BN)(out)
            out = nn.relu6(out)
        out = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                      padding=1, feature_group_count=hidden,
                      use_bias=False, name="dw", **_TV_CONV_INIT)(out)
        out = nn.BatchNorm(use_running_average=not train, name="dw_bn",
                           **_BN)(out)
        out = nn.relu6(out)
        out = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                      name="project", **_TV_CONV_INIT)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           name="project_bn", **_BN)(out)
        return x + out if use_res else out


_MBV2_CFG: Sequence[Tuple[int, int, int, int]] = (
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class MobileNetV2Features(nn.Module):
    """torchvision ``mobilenet_v2.features``: conv3x3/2 (32) ->
    17 inverted residuals -> conv1x1 (1280). Output channels 1280."""
    in_features = 1280

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    name="stem_conv", **_TV_CONV_INIT)(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn",
                         **_BN)(x)
        x = nn.relu6(x)
        in_ch = 32
        bi = 1
        for t, c, n, s in _MBV2_CFG:
            for i in range(n):
                x = InvertedResidual(in_ch, c, s if i == 0 else 1, t,
                                     name=f"block{bi}")(x, train)
                in_ch = c
                bi += 1
        x = nn.Conv(1280, (1, 1), use_bias=False, name="head_conv",
                    **_TV_CONV_INIT)(x)
        x = nn.BatchNorm(use_running_average=not train, name="head_bn",
                         **_BN)(x)
        return nn.relu6(x)


BACKBONE_FEATURES = {
    "resnet": ResNet50Features,
    "vgg": VGG16Features,
    "mobilenet": MobileNetV2Features,
}
