"""Backbone architecture + conversion parity tests.

The reference's ``CustomBackbone`` (`atomai/nets/blocks.py:332-399`) wraps
torchvision ``resnet50 / vgg16 / mobilenet_v2`` (``weights=None``) with the
first conv swapped for n-channel input and the head removed. torchvision is
not installed here, so compact torch oracles below reproduce the exact
module structure AND state_dict key layout of the reference checkpoints
("backbone.backbone_layers.<Sequential idx>...."), which is what
``convert_backbone_state_dict`` consumes.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn


# ---------------------------------------------------------------- oracles

class _Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def _resnet50_modules(input_channels):
    """torchvision resnet50 children()[:-2] (conv1 swapped for n-channel
    input as the reference does)."""
    def make_layer(inplanes, planes, blocks, stride):
        down = tnn.Sequential(
            tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
            tnn.BatchNorm2d(planes * 4))
        layers = [_Bottleneck(inplanes, planes, stride, down)]
        for _ in range(1, blocks):
            layers.append(_Bottleneck(planes * 4, planes))
        return tnn.Sequential(*layers)

    return [tnn.Conv2d(input_channels, 64, 7, 2, 3, bias=False),
            tnn.BatchNorm2d(64), tnn.ReLU(inplace=True),
            tnn.MaxPool2d(3, 2, 1),
            make_layer(64, 64, 3, 1), make_layer(256, 128, 4, 2),
            make_layer(512, 256, 6, 2), make_layer(1024, 512, 3, 2)]


def _vgg16_modules(input_channels):
    """torchvision vgg16.features children()[:-1] (first conv swapped)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    mods, in_ch = [], input_channels
    for v in cfg:
        if v == "M":
            mods.append(tnn.MaxPool2d(2, 2))
        else:
            mods += [tnn.Conv2d(in_ch, v, 3, padding=1),
                     tnn.ReLU(inplace=True)]
            in_ch = v
    return mods


class _InvertedResidual(tnn.Module):
    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        hidden = inp * expand_ratio
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(tnn.Sequential(
                tnn.Conv2d(inp, hidden, 1, bias=False),
                tnn.BatchNorm2d(hidden), tnn.ReLU6(inplace=True)))
        layers += [tnn.Sequential(
            tnn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden,
                       bias=False),
            tnn.BatchNorm2d(hidden), tnn.ReLU6(inplace=True)),
            tnn.Conv2d(hidden, oup, 1, bias=False), tnn.BatchNorm2d(oup)]
        if expand_ratio == 1:
            # torchvision nests the depthwise ConvBNReLU directly
            layers = [layers[0], layers[1], layers[2]]
        self.conv = tnn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


def _mobilenet_v2_modules(input_channels):
    """torchvision mobilenet_v2.features children() (stem conv swapped)."""
    mods = [tnn.Sequential(
        tnn.Conv2d(input_channels, 32, 3, 2, 1, bias=False),
        tnn.BatchNorm2d(32), tnn.ReLU6(inplace=True))]
    in_ch = 32
    for t, c, n, s in [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                       (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                       (6, 320, 1, 1)]:
        for i in range(n):
            mods.append(_InvertedResidual(in_ch, c, s if i == 0 else 1, t))
            in_ch = c
    mods.append(tnn.Sequential(
        tnn.Conv2d(320, 1280, 1, bias=False), tnn.BatchNorm2d(1280),
        tnn.ReLU6(inplace=True)))
    return mods


_ORACLES = {"resnet": (_resnet50_modules, 2048),
            "vgg": (_vgg16_modules, 512),
            "mobilenet": (_mobilenet_v2_modules, 1280)}


class _TorchCustomBackbone(tnn.Module):
    """The reference CustomBackbone (`blocks.py:332-399`)."""

    def __init__(self, input_channels, backbone_type):
        super().__init__()
        mods, self.in_features = _ORACLES[backbone_type]
        self.backbone_layers = tnn.Sequential(*mods(input_channels))
        self.adaptive_pool = tnn.AdaptiveAvgPool2d((1, 1))

    def forward(self, x):
        return self.adaptive_pool(self.backbone_layers(x))


class _TorchRegressorNet(tnn.Module):
    """The reference RegressorNet (`reg_cls.py:16-49`)."""

    def __init__(self, input_channels, output_size, backbone_type):
        super().__init__()
        self.backbone = _TorchCustomBackbone(input_channels, backbone_type)
        self.output_layer = tnn.Linear(self.backbone.in_features,
                                       output_size)
        self.flatten = tnn.Flatten()

    def forward(self, x):
        return self.output_layer(self.flatten(self.backbone(x)))


class _TorchClassifierNet(tnn.Module):
    """The reference ClassifierNet (`reg_cls.py:52-86`)."""

    def __init__(self, input_channels, num_classes, backbone_type):
        super().__init__()
        self.backbone = _TorchCustomBackbone(input_channels, backbone_type)
        self.output_layer = tnn.Sequential(
            tnn.Linear(self.backbone.in_features, num_classes),
            tnn.LogSoftmax(dim=1))
        self.flatten = tnn.Flatten()

    def forward(self, x):
        return self.output_layer(self.flatten(self.backbone(x)))


# ----------------------------------------------------------------- tests

@pytest.mark.parametrize("backbone", ["resnet", "vgg", "mobilenet"])
def test_backbone_forward_parity(backbone):
    """Converted torch backbone == flax backbone forward (pooled feats)."""
    import jax.numpy as jnp

    from atomai_tpu.models.conversion import convert_backbone_state_dict
    from atomai_tpu.nets.backbones import BACKBONE_FEATURES

    torch.manual_seed(0)
    tnet = _TorchCustomBackbone(1, backbone)
    tnet.eval()
    sd = {f"backbone.{k}": v for k, v in tnet.state_dict().items()}
    params, bstats = convert_backbone_state_dict(sd, backbone)

    x = np.random.RandomState(0).rand(2, 1, 64, 64).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x)).numpy()[..., 0, 0]

    fnet = BACKBONE_FEATURES[backbone]()
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    feats = fnet.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       False)
    j_out = np.asarray(feats.mean(axis=(1, 2)))
    assert j_out.shape == t_out.shape == (2, _ORACLES[backbone][1])
    np.testing.assert_allclose(j_out, t_out, atol=1e-4)


@pytest.mark.parametrize("backbone", ["mobilenet"])
def test_reg_cls_state_dict_conversion(backbone):
    import jax.numpy as jnp

    from atomai_tpu.models.conversion import convert_reg_cls_state_dict

    torch.manual_seed(1)
    x = np.random.RandomState(1).rand(2, 1, 64, 64).astype(np.float32)

    treg = _TorchRegressorNet(1, 3, backbone)
    treg.eval()
    net, params, bstats = convert_reg_cls_state_dict(
        dict(treg.state_dict()), "reg", backbone, 1, 3)
    with torch.no_grad():
        t_out = treg(torch.from_numpy(x)).numpy()
    variables = {"params": params, "batch_stats": bstats}
    j_out = np.asarray(net.apply(variables,
                                 jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 False))
    np.testing.assert_allclose(j_out, t_out, atol=1e-4)

    tcls = _TorchClassifierNet(1, 4, backbone)
    tcls.eval()
    net, params, bstats = convert_reg_cls_state_dict(
        dict(tcls.state_dict()), "cls", backbone, 1, 4)
    with torch.no_grad():
        t_out = tcls(torch.from_numpy(x)).numpy()
    variables = {"params": params, "batch_stats": bstats}
    j_out = np.asarray(net.apply(variables,
                                 jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 False))
    np.testing.assert_allclose(j_out, t_out, atol=1e-4)


def test_load_torch_reg_checkpoint(tmp_path):
    """Reference-format reg checkpoint loads into a working Regressor."""
    from atomai_tpu.models.conversion import load_torch_checkpoint

    torch.manual_seed(2)
    tnet = _TorchRegressorNet(1, 2, "mobilenet")
    meta = {"model_type": "reg", "backbone": "mobilenet",
            "in_channels": 1, "out_dim": 2,
            "weights": tnet.state_dict()}
    path = str(tmp_path / "reg_metadict.tar")
    torch.save(meta, path)
    model = load_torch_checkpoint(path)
    x = np.random.RandomState(2).rand(3, 64, 64).astype(np.float32)
    out = model.predict(x, verbose=False)
    assert np.asarray(out).shape == (3, 2)


def test_backbone_names_and_slim_presets():
    """Canonical names map to faithful topologies; slim presets remain."""
    import jax

    from atomai_tpu.nets.blocks import ConvBackbone

    assert ConvBackbone("resnet").in_features == 2048
    assert ConvBackbone("vgg").in_features == 512
    assert ConvBackbone("mobilenet").in_features == 1280
    assert ConvBackbone("mobilenet-slim").in_features == 1280
    bb = ConvBackbone("mobilenet-slim")
    x = np.zeros((1, 32, 32, 1), np.float32)
    v = bb.init(jax.random.key(0), x, False)
    out = bb.apply(v, x, False, mutable=["batch_stats"])[0]
    assert out.shape == (1, 1280)
