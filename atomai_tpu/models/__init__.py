"""User-facing models (reference surface:
`atomai/models/__init__.py:1-16`)."""

from .segmentor import Segmentor
from .imspec import ImSpec
from .regressor import Regressor
from .classifier import Classifier
from .denoiser import DenoisingAutoencoder, denoise_images
from .dgm import BaseVAE, VAE, rVAE, jVAE, jrVAE
from .dklgp import dklGPR, Reconstructor
from .loaders import (load_model, load_ensemble, load_seg_model,
                      load_imspec_model, load_reg_model, load_cls_model,
                      load_vae_model, load_denoising_autoencoder)
from .conversion import (load_torch_checkpoint, load_torch_ensemble,
                         load_pretrained_model, convert_fcnn_state_dict)

__all__ = ["Segmentor", "ImSpec", "Regressor", "Classifier",
           "DenoisingAutoencoder", "denoise_images", "BaseVAE", "VAE",
           "rVAE", "jVAE", "jrVAE", "dklGPR", "Reconstructor",
           "load_model", "load_ensemble", "load_seg_model",
           "load_imspec_model", "load_reg_model", "load_cls_model",
           "load_vae_model", "load_denoising_autoencoder",
           "load_torch_checkpoint", "load_torch_ensemble",
           "load_pretrained_model", "convert_fcnn_state_dict"]
