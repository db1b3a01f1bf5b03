"""Denoising autoencoder for image cleaning.

Parity: `atomai/models/denoiser.py:20-270` — conv encoder/decoder built
from filter lists (:83-130), fit via the BaseTrainer engine (:132-186),
predict via BasePredictor (:188-213), ``denoise_images`` convenience
function (:238-270).
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import numpy as np

from ..core.checkpoint import load_checkpoint
from ..nets.blocks import init_kwargs, ConvBlock, UpsampleBlock, max_pool
from ..predictors import BasePredictor
from ..trainers import BaseTrainer
from ..utils import preproc


class DenoiserNet(nn.Module):
    """Conv encoder/decoder (reference `_build_autoencoder`,
    `denoiser.py:83-130`)."""
    encoder_filters: Tuple[int, ...] = (8, 16, 32, 64)
    decoder_filters: Tuple[int, ...] = (64, 32, 16, 8)
    encoder_layers: Tuple[int, ...] = (1, 2, 2, 2)
    decoder_layers: Tuple[int, ...] = (2, 2, 2, 1)
    use_batch_norm: bool = False
    upsampling_mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_enc = len(self.encoder_filters)
        for i, (filters, layers) in enumerate(
                zip(self.encoder_filters, self.encoder_layers)):
            x = ConvBlock(2, layers, filters,
                          batch_norm=self.use_batch_norm)(x, train)
            if i < n_enc - 1:
                x = max_pool(x, 2)
        for i, (filters, layers) in enumerate(
                zip(self.decoder_filters, self.decoder_layers)):
            if i > 0:
                x = UpsampleBlock(2, x.shape[-1],
                                  mode=self.upsampling_mode)(x)
            x = ConvBlock(2, layers, filters,
                          batch_norm=self.use_batch_norm)(x, train)
        return nn.Conv(1, (1, 1), padding=0,
                       **init_kwargs(x.shape[-1]))(x)


def preprocess_denoiser_data(X_train, y_train, X_test, y_test):
    """Canonicalizes noisy/clean image pairs to NHWC float32
    (reference `atomai/utils/preproc.py:698-795`)."""
    out = []
    for a in (X_train, y_train, X_test, y_test):
        a = np.asarray(a, np.float32)
        if a.ndim == 2:
            # single image: add BOTH batch and channel axes — (H, W, 1)
            # alone would stage H one-row "samples"
            a = a[None, ..., None]
        else:
            a = preproc.as_channel_last_images(a)
        out.append(a)
    return tuple(out)


class DenoisingAutoencoder(BaseTrainer):
    """Denoising autoencoder model (reference `denoiser.py:20-235`).

    Example:
        >>> model = aoi.models.DenoisingAutoencoder()
        >>> model.fit(noisy, clean, noisy_t, clean_t,
        >>>           training_cycles=500, swa=True)
        >>> cleaned = model.predict(new_noisy_images)
    """

    def __init__(self, encoder_filters: List[int] = (8, 16, 32, 64),
                 decoder_filters: List[int] = (64, 32, 16, 8),
                 encoder_layers: List[int] = (1, 2, 2, 2),
                 decoder_layers: List[int] = (2, 2, 2, 1),
                 use_batch_norm: bool = False,
                 upsampling_mode: str = "nearest", **kwargs) -> None:
        super().__init__(seed=kwargs.get("seed", 1))
        self.encoder_filters = tuple(encoder_filters)
        self.decoder_filters = tuple(decoder_filters)
        self.encoder_layers = tuple(encoder_layers)
        self.decoder_layers = tuple(decoder_layers)
        self.use_batch_norm = use_batch_norm
        self.upsampling_mode = upsampling_mode
        self.net = DenoiserNet(self.encoder_filters, self.decoder_filters,
                               self.encoder_layers, self.decoder_layers,
                               use_batch_norm, upsampling_mode)
        self.meta_state_dict = {
            "model_type": "denoising_autoencoder",
            "encoder_filters": list(encoder_filters),
            "decoder_filters": list(decoder_filters),
            "encoder_layers": list(encoder_layers),
            "decoder_layers": list(decoder_layers),
            "use_batch_norm": use_batch_norm,
            "upsampling_mode": upsampling_mode,
        }

    def set_data(self, X_train, y_train, X_test=None, y_test=None,
                 **kwargs) -> None:
        if X_test is None or y_test is None:
            X_train, y_train, X_test, y_test = preproc.data_split(
                X_train, y_train, kwargs.get("test_size", .15),
                kwargs.get("seed", 1))
        X_train, y_train, X_test, y_test = preprocess_denoiser_data(
            X_train, y_train, X_test, y_test)
        self._stage_batches(X_train, y_train, X_test, y_test)

    def fit(self, X_train, y_train, X_test=None, y_test=None,
            loss: str = "mse", optimizer=None, training_cycles: int = 500,
            batch_size: int = 32, compute_accuracy: bool = False,
            full_epoch: bool = False, swa: bool = True,
            perturb_weights: bool = False, **kwargs) -> None:
        """Trains the denoiser (reference `denoiser.py:132-186`)."""
        self.compile_trainer(
            (X_train, y_train, X_test, y_test), loss, optimizer,
            training_cycles, batch_size, compute_accuracy, full_epoch,
            swa, perturb_weights, **kwargs)
        self.run()

    def predict(self, data, **kwargs) -> np.ndarray:
        """Denoises input images (reference `denoiser.py:188-213`)."""
        data = np.asarray(data, np.float32)
        if data.ndim == 2:
            data = data[None, ..., None]
        else:
            data = preproc.as_channel_last_images(data)
        predictor = BasePredictor(self.net, self.params, self.batch_stats,
                                  **kwargs)
        prediction = predictor.predict(
            data, out_shape=data.shape[1:],
            num_batches=kwargs.get("num_batches", 10))
        return prediction.squeeze()

    def load_weights(self, filepath: str) -> None:
        _, arrays = load_checkpoint(filepath)
        self.params = arrays["params"]
        self.batch_stats = arrays.get("batch_stats")


def init_denoising_autoencoder(**kwargs):
    """Factory returning (net, meta_state_dict)
    (reference `denoiser.py:224-233`)."""
    model = DenoisingAutoencoder(**kwargs)
    return model.net, model.meta_state_dict


def denoise_images(noisy_images: np.ndarray, clean_images: np.ndarray,
                   test_noisy: Optional[np.ndarray] = None,
                   test_clean: Optional[np.ndarray] = None,
                   training_cycles: int = 500, **kwargs
                   ) -> Tuple[DenoisingAutoencoder, Optional[np.ndarray]]:
    """Trains a denoiser and predicts on test data
    (reference `denoiser.py:238-270`)."""
    model = DenoisingAutoencoder(**kwargs)
    model.fit(noisy_images, clean_images, test_noisy, test_clean,
              training_cycles=training_cycles, **kwargs)
    predictions = None
    if test_noisy is not None:
        predictions = model.predict(test_noisy)
    return model, predictions
