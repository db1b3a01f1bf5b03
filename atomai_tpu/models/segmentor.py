"""Segmentor — user-facing semantic segmentation model.

Parity: `atomai/models/segmentor.py:10-207` — trainer facade with
``fit()`` = compile_trainer + on-device seg_augmentor + run (:142-149),
``predict()`` = SegPredictor composition (:151-200), ``load_weights``
(:202-207).
"""

from typing import Any, Optional, Tuple, Union

from ..core.checkpoint import load_checkpoint
from ..predictors import SegPredictor
from ..trainers import SegTrainer
from ..transforms import seg_augmentor


class Segmentor(SegTrainer):
    """Model for semantic segmentation-based analysis of images.

    Example:
        >>> model = aoi.models.Segmentor(nb_classes=3)
        >>> model.fit(images, masks, images_test, masks_test,
        >>>           training_cycles=300, compute_accuracy=True, swa=True)
        >>> nn_output, coordinates = model.predict(expdata)
    """

    def __init__(self, model: Union[str, Any] = "Unet",
                 nb_classes: int = 1, **kwargs) -> None:
        super().__init__(model, nb_classes, **kwargs)
        self.downsample_factor = None

    def fit(self, X_train, y_train, X_test=None, y_test=None,
            loss: str = "ce", optimizer=None, training_cycles: int = 1000,
            batch_size: int = 32, compute_accuracy: bool = False,
            full_epoch: bool = False, swa: bool = False,
            perturb_weights: bool = False, **kwargs) -> None:
        """Compiles the trainer and trains (reference
        `segmentor.py:61-149`). Augmentation kwargs (rotation=True,
        gauss_noise=[20, 60], zoom=True, ...) run on-device inside the
        jitted train step."""
        self.compile_trainer(
            (X_train, y_train, X_test, y_test), loss, optimizer,
            training_cycles, batch_size, compute_accuracy, full_epoch,
            swa, perturb_weights, **kwargs)
        self.augment_fn = seg_augmentor(self.nb_classes, **kwargs)
        self._compiled_chunk = None
        self.run()

    def predict(self, imgdata, refine: bool = False, logits: bool = True,
                resize: Optional[Tuple[int, int]] = None,
                compute_coords: bool = True, **kwargs):
        """Applies the trained model to new data (reference
        `segmentor.py:151-200`)."""
        prediction = SegPredictor(
            self.net, self.params, self.batch_stats, refine, resize,
            logits, nb_classes=self.nb_classes,
            **kwargs).run(imgdata, compute_coords, **kwargs)
        return prediction

    def load_weights(self, filepath: str) -> None:
        """Loads saved weights (reference `segmentor.py:202-207`)."""
        _, arrays = load_checkpoint(filepath)
        self.params = arrays["params"]
        self.batch_stats = arrays.get("batch_stats")
