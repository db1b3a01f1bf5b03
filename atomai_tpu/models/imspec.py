"""ImSpec — image <-> spectrum translation model.

Parity: `atomai/models/imspec.py:9-170` — ImSpecTrainer facade with
on-device augmentation and ImSpecPredictor composition.
"""

from typing import Tuple

from ..core.checkpoint import load_checkpoint
from ..predictors import ImSpecPredictor
from ..trainers import ImSpecTrainer
from ..transforms import imspec_augmentor


class ImSpec(ImSpecTrainer):
    """Model for predicting spectra from images and vice versa.

    Example:
        >>> model = aoi.models.ImSpec((16, 16), (64,), latent_dim=10)
        >>> model.fit(imgs, spectra, imgs_t, spectra_t,
        >>>           full_epoch=True, training_cycles=120, swa=True)
        >>> prediction = model.predict(imgs_test, norm=False)
    """

    def __init__(self, in_dim: Tuple[int, ...], out_dim: Tuple[int, ...],
                 latent_dim: int = 2, **kwargs) -> None:
        super().__init__(in_dim, out_dim, latent_dim, **kwargs)
        self.latent_dim = latent_dim

    def fit(self, X_train, y_train, X_test=None, y_test=None,
            loss: str = "mse", optimizer=None, training_cycles: int = 1000,
            batch_size: int = 64, compute_accuracy: bool = False,
            full_epoch: bool = False, swa: bool = False,
            perturb_weights: bool = False, **kwargs) -> None:
        """Compiles the trainer and trains (reference
        `imspec.py:63-146`)."""
        self.compile_trainer(
            (X_train, y_train, X_test, y_test), loss, optimizer,
            training_cycles, batch_size, compute_accuracy, full_epoch,
            swa, perturb_weights, **kwargs)
        self.augment_fn = imspec_augmentor(self.in_dim, self.out_dim,
                                           **kwargs)
        self._compiled_chunk = None
        self.run()

    def predict(self, data, **kwargs):
        """Applies the trained model to new data (reference
        `imspec.py:148-163`)."""
        return ImSpecPredictor(
            self.net, self.params, self.out_dim, self.batch_stats,
            **kwargs).run(data, **kwargs)

    def load_weights(self, filepath: str) -> None:
        _, arrays = load_checkpoint(filepath)
        self.params = arrays["params"]
        self.batch_stats = arrays.get("batch_stats")
