"""On-device augmentation (reference surface:
`atomai/transforms/__init__.py:1-5`)."""

from .imaug import (datatransform, DataTransform, seg_augmentor,
                    imspec_augmentor, reg_augmentor, squeeze_channels,
                    unsqueeze_channels)
from .warp import rotate_image, bilinear_sample

__all__ = ["datatransform", "DataTransform", "seg_augmentor",
           "imspec_augmentor", "reg_augmentor", "squeeze_channels",
           "unsqueeze_channels", "rotate_image", "bilinear_sample"]
