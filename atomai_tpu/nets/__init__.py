"""Neural network zoo (Flax linen modules + factory functions).

Mirrors the reference export surface (`atomai/nets/__init__.py:1-16`).
"""

from .blocks import (ConvBlock, UpsampleBlock, ResBlock, ResModule,
                     DilatedBlock, ConvBackbone)
from .fcnn import (Unet, dilnet, ResHedNet, SegResNet, init_fcnn_model,
                   DOWNSAMPLE_FACTORS)
from .ed import (SignalEncoder, SignalDecoder, SignalED, convEncoderNet,
                 fcEncoderNet, jfcEncoderNet, jconvEncoderNet, fcDecoderNet,
                 convDecoderNet, rDecoderNet, coord_latent,
                 init_imspec_model, init_VAE_nets)
from .reg_cls import (RegressorNet, ClassifierNet, MultiTaskClassifierNet,
                      init_reg_model, init_cls_model, init_mtask_cls_model)
from .gp import (fcFeatureExtractor, rbf_kernel, matern52_kernel,
                 scale_to_bounds, init_gp_params, KERNELS,
                 GPRegressionModel, CustomGPModel)

# reference-name aliases
CustomBackbone = ConvBackbone  # `atomai/nets/blocks.py:332-399`

__all__ = ["ConvBlock", "UpsampleBlock", "ResBlock", "ResModule",
           "DilatedBlock", "ConvBackbone", "Unet", "dilnet", "ResHedNet",
           "SegResNet", "init_fcnn_model", "DOWNSAMPLE_FACTORS",
           "SignalEncoder", "SignalDecoder", "SignalED", "convEncoderNet",
           "fcEncoderNet", "jfcEncoderNet", "jconvEncoderNet",
           "fcDecoderNet", "convDecoderNet", "rDecoderNet", "coord_latent",
           "init_imspec_model", "init_VAE_nets", "RegressorNet",
           "ClassifierNet", "MultiTaskClassifierNet", "init_reg_model",
           "init_cls_model", "init_mtask_cls_model", "fcFeatureExtractor",
           "rbf_kernel", "matern52_kernel", "scale_to_bounds",
           "init_gp_params", "KERNELS", "CustomBackbone",
           "GPRegressionModel", "CustomGPModel"]
