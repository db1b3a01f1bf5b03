"""Classifier — image classification model.

Parity: `atomai/models/classifier.py:9-134` — clsTrainer facade with
reg_augmentor and clsPredictor composition.
"""

from ..core.checkpoint import load_checkpoint
from ..predictors import clsPredictor
from ..trainers import clsTrainer
from ..transforms import reg_augmentor


class Classifier(clsTrainer):
    """Model for image classification.

    Backbone names select the faithful torchvision topologies (see
    :class:`~atomai_tpu.models.Regressor`); ``'*-slim'`` presets remain
    for fast from-scratch training.

    Example:
        >>> model = aoi.models.Classifier(nb_classes=3, backbone="resnet")
        >>> model.fit(imgs, labels, imgs_t, labels_t, training_cycles=50)
        >>> predicted_classes = model.predict(imgs_new)
    """

    def __init__(self, model: str = "mobilenet",
                 nb_classes: int = None, **kwargs) -> None:
        # reference argument order (`classifier.py:20-26`); legacy
        # (nb_classes, backbone) calls and the backbone= kwarg still work
        if isinstance(model, int):
            backbone = nb_classes if isinstance(nb_classes, str) \
                else kwargs.pop("backbone", "mobilenet")
            model, nb_classes = backbone, model
        model = kwargs.pop("backbone", model)
        if nb_classes is None:
            raise AssertionError(
                "You must specify a number of classes (nb_classes) for "
                "your classification model")
        super().__init__(nb_classes, model, **kwargs)

    def fit(self, X_train, y_train, X_test=None, y_test=None,
            loss: str = "nll", optimizer=None, training_cycles: int = 1000,
            batch_size: int = 32, compute_accuracy: bool = True,
            full_epoch: bool = False, swa: bool = False,
            perturb_weights: bool = False, **kwargs) -> None:
        """Compiles the trainer and trains (reference
        `classifier.py:52-114`)."""
        self.compile_trainer(
            (X_train, y_train, X_test, y_test), loss, optimizer,
            training_cycles, batch_size, compute_accuracy, full_epoch,
            swa, perturb_weights, **kwargs)
        self.augment_fn = reg_augmentor(**kwargs)
        self._compiled_chunk = None
        self.run()

    def predict(self, data, **kwargs):
        """Predicts class labels (reference `classifier.py:116-128`)."""
        return clsPredictor(
            self.net, self.params, self.nb_classes, self.batch_stats,
            **kwargs).run(data, **kwargs)

    def load_weights(self, filepath: str) -> None:
        _, arrays = load_checkpoint(filepath)
        self.params = arrays["params"]
        self.batch_stats = arrays.get("batch_stats")
