"""Regressor — image-to-vector regression model.

Parity: `atomai/models/regressor.py:9-133` — RegTrainer facade with
reg_augmentor and RegPredictor composition; backbones mobilenet/resnet/vgg
(own ConvBackbone presets).
"""

from ..core.checkpoint import load_checkpoint
from ..predictors import RegPredictor
from ..trainers import RegTrainer
from ..transforms import reg_augmentor


class Regressor(RegTrainer):
    """Model for image-based regression analysis.

    Capability note (vs reference): the reference's mobilenet/resnet/vgg
    backbones are torchvision models shipping ImageNet weights
    (`atomai/nets/blocks.py:332-399`), giving it transfer learning out of
    the box. Here the same backbone names select size-matched ConvBackbone
    presets that train **from scratch** — ImageNet weights are not
    distributable with this package, and their NCHW torchvision
    architectures (depthwise blocks, downsample shortcuts) have no
    structural mapping onto the NHWC/flax backbone. For label-scarce
    problems, pre-train the backbone on synthetic data
    (``aoi.utils.make_lattice_stack``/``imgen``) and keep training it;
    weights saved by one Regressor/Classifier load into another via
    ``load_weights``.

    Example:
        >>> model = aoi.models.Regressor(out_dim=1, backbone="mobilenet")
        >>> model.fit(imgs, values, imgs_t, values_t, training_cycles=50)
        >>> prediction = model.predict(imgs_new)
    """

    def __init__(self, out_dim: int = 1, backbone: str = "mobilenet",
                 **kwargs) -> None:
        super().__init__(out_dim, backbone, **kwargs)

    def fit(self, X_train, y_train, X_test=None, y_test=None,
            loss: str = "mse", optimizer=None, training_cycles: int = 1000,
            batch_size: int = 32, compute_accuracy: bool = False,
            full_epoch: bool = False, swa: bool = False,
            perturb_weights: bool = False, **kwargs) -> None:
        """Compiles the trainer and trains (reference
        `regressor.py:51-113`)."""
        self.compile_trainer(
            (X_train, y_train, X_test, y_test), loss, optimizer,
            training_cycles, batch_size, compute_accuracy, full_epoch,
            swa, perturb_weights, **kwargs)
        self.augment_fn = reg_augmentor(**kwargs)
        self._compiled_chunk = None
        self.run()

    def predict(self, data, **kwargs):
        """Applies the trained model to new data (reference
        `regressor.py:115-127`)."""
        return RegPredictor(
            self.net, self.params, self.out_dim, self.batch_stats,
            **kwargs).run(data, **kwargs)

    def load_weights(self, filepath: str) -> None:
        _, arrays = load_checkpoint(filepath)
        self.params = arrays["params"]
        self.batch_stats = arrays.get("batch_stats")
