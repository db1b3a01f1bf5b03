"""Reference-API compatibility surface.

Thin aliases/equivalents for names the reference star-exports from
``atomai.utils`` (`atomai/utils/__init__.py`) that have direct
counterparts in the TPU-native design. Kept in one module so the main
modules stay idiomatic; everything here is re-exported from
``atomai_tpu.utils``.
"""

from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_checkpoint
from . import preproc as _preproc
from .img import (extract_patches_ as _extract_patches_,  # noqa: F401
                  filter_cells_, imcrop_randcoord, imcrop_randpx)
from .imgen import create_multiclass_lattice_mask_  # noqa: F401
from .coords import get_intensities_  # noqa: F401
from .graphx import filter_subgraphs_  # noqa: F401
from .nn import renumerate_classes_  # noqa: F401
from .viz import (animation_from_png, plot_lattice_bonds,  # noqa: F401
                  plot_trajectories, plot_trajectories_transitions,
                  plot_transitions, visualize_unmixing_results)

extract_patches_ = _extract_patches_


# --------------------------------------------------------------- formats
def torch_format_image(image_data: np.ndarray, norm: bool = True
                       ) -> np.ndarray:
    """Alias of format_image (`atomai/utils/preproc.py:798-826`); returns
    NHWC float32 (the TPU-native layout) instead of torch NCHW."""
    return _preproc.format_image(image_data, norm)


def torch_format_spectra(spectra: np.ndarray, norm: bool = False
                         ) -> np.ndarray:
    return _preproc.format_spectra(spectra, norm)


def torch_format(image_data: np.ndarray) -> np.ndarray:
    import warnings
    warnings.warn("torch_format is deprecated. Use format_image instead",
                  UserWarning)
    return _preproc.format_image(image_data)


def train_test_split(X, y, test_size: float = 0.15, shuffle: bool = True,
                     random_state: int = 1):
    """sklearn-ordered (X_tr, X_ts, y_tr, y_ts) split. shuffle=False
    keeps the input order (chronological holdouts must not leak shuffled
    future frames into training)."""
    if not shuffle:
        X, y = np.asarray(X), np.asarray(y)
        n_test = max(int(round(len(X) * test_size)), 1)
        return (X[:-n_test], X[-n_test:], y[:-n_test], y[-n_test:])
    X_tr, y_tr, X_ts, y_ts = _preproc.data_split(
        X, y, test_size, random_state)
    return X_tr, X_ts, y_tr, y_ts


# ------------------------------------------------------------- batching
def array2list_(x, batch_size: int, store_on_cpu: bool = False
                ) -> List[np.ndarray]:
    """Equal-size batch list, remainder dropped
    (`atomai/utils/preproc.py:170-183`)."""
    x = np.asarray(x)
    n_batches = x.shape[0] // batch_size
    if n_batches == 0:
        # the reference errors here too — one silent EMPTY batch would
        # flow NaN losses through every downstream consumer
        raise ValueError(
            f"batch_size {batch_size} exceeds the {x.shape[0]} available "
            "samples")
    return list(np.split(x[:n_batches * batch_size], n_batches))


def array2list(X_train, y_train, X_test, y_test, batch_size: int,
               memory_alloc: float = 4):
    """(`atomai/utils/preproc.py:184-203`) — device residency is automatic
    in the TPU-native design; memory_alloc is accepted for parity."""
    return (array2list_(X_train, batch_size),
            array2list_(y_train, batch_size),
            array2list_(X_test, batch_size),
            array2list_(y_test, batch_size))


def get_array_memsize(X_arr, precision: str = "single") -> float:
    """(`atomai/utils/preproc.py:138-167`)"""
    if X_arr is None:
        return 0
    arr = np.asarray(X_arr)
    arrsize = arr.nbytes
    if precision == "single" and arr.dtype in (np.float64, np.int64):
        arrsize = arrsize / 2
    elif precision == "double" and arr.dtype in (np.float32, np.int32):
        arrsize = arrsize * 2
    return arrsize


def create_batches(array, batch_size: int):
    return _preproc.create_batches(array, batch_size)


def init_dataloader(*arrays, batch_size: int = 32, shuffle: bool = False,
                    **kwargs):
    """Simple batch iterator over arrays (replaces torch DataLoaders,
    `atomai/utils/preproc.py:365-388`). Yields tuples of batches."""
    n = len(arrays[0])
    idx = np.arange(n)
    if shuffle:
        np.random.shuffle(idx)
    batches = []
    for i in range(0, n, batch_size):
        sel = idx[i:i + batch_size]
        batches.append(tuple(np.asarray(a)[sel] for a in arrays))
    return batches


def init_dataloaders(X_train, y_train, X_test, y_test,
                     batch_size: int = 32, **kwargs):
    return (init_dataloader(X_train, y_train, batch_size=batch_size),
            init_dataloader(X_test, y_test, batch_size=batch_size))


init_fcnn_dataloaders = init_dataloaders
init_imspec_dataloaders = init_dataloaders
init_reg_dataloaders = init_dataloaders
init_cls_dataloaders = init_dataloaders
init_vae_dataloaders = init_dataloaders


# -------------------------------------------------- task preprocessing
def preprocess_training_image_data(X_train, y_train, X_test, y_test,
                                   batch_size: int,
                                   memory_alloc: float = 4):
    """(`atomai/utils/preproc.py:237-278`) — canonicalized batch lists +
    inferred class count."""
    nb = _preproc.num_classes_from_labels(np.asarray(y_train))
    X_train, y_train, X_test, y_test = _preproc.check_image_dims(
        X_train, y_train, X_test, y_test, nb)
    out = array2list(X_train, y_train, X_test, y_test, batch_size)
    return (*out, nb)


def preprocess_training_imspec_data(X_train, y_train, X_test, y_test,
                                    batch_size: int,
                                    memory_alloc: float = 4):
    """(`atomai/utils/preproc.py:424-500`)"""
    X_train, y_train, X_test, y_test = _preproc.check_signal_dims(
        X_train, y_train, X_test, y_test)
    return array2list(X_train, y_train, X_test, y_test, batch_size)


def preprocess_training_reg_data(X_train, y_train, X_test, y_test,
                                 batch_size: int, memory_alloc: float = 4):
    return array2list(np.asarray(X_train, np.float32),
                      np.asarray(y_train, np.float32),
                      np.asarray(X_test, np.float32),
                      np.asarray(y_test, np.float32), batch_size)


def preprocess_training_cls_data(X_train, y_train, X_test, y_test,
                                 batch_size: int, memory_alloc: float = 4):
    return array2list(np.asarray(X_train, np.float32),
                      np.asarray(y_train, np.int32),
                      np.asarray(X_test, np.float32),
                      np.asarray(y_test, np.int32), batch_size)


def preprocess_training_image_data_(images_all, labels_all,
                                    images_test_all, labels_test_all):
    """Validates/casts image data without batching
    (`atomai/utils/preproc.py:204-236`). Returns the canonicalized arrays
    plus the inferred class count."""
    nb = _preproc.num_classes_from_labels(np.asarray(labels_all))
    arrays = _preproc.check_image_dims(
        images_all, labels_all, images_test_all, labels_test_all, nb)
    return (*_preproc.cast_image_arrays(*arrays, nb), nb)


def preprocess_training_imspec_data_(X_train, y_train, X_test, y_test):
    """Validates/casts im2spec / spec2im data without batching
    (`atomai/utils/preproc.py:281-320`). Returns arrays + (in_dim, out_dim)."""
    X_train, y_train, X_test, y_test = _preproc.check_signal_dims(
        X_train, y_train, X_test, y_test)
    # canonicalized to (n, h, w) images / (n, length) spectra
    in_dim, out_dim = X_train.shape[1:], y_train.shape[1:]
    f32 = lambda a: np.asarray(a, np.float32)  # noqa: E731
    return (f32(X_train), f32(y_train), f32(X_test), f32(y_test),
            (in_dim, out_dim))


def _ensure_channel_and_target_dims(X_train, y_train, X_test, y_test,
                                    ydtype):
    import warnings as _warnings
    X_train, X_test = np.asarray(X_train), np.asarray(X_test)
    y_train = np.asarray(y_train)
    y_test = np.asarray(y_test)
    if X_train.ndim == 3:
        _warnings.warn("Adding a channel dimension of 1 to training images",
                       UserWarning)
        X_train = X_train[..., None]
    if X_test.ndim == 3:
        _warnings.warn("Adding a channel dimension of 1 to test images",
                       UserWarning)
        X_test = X_test[..., None]
    if ydtype is np.float32 and y_train.ndim == 1:
        y_train, y_test = y_train[:, None], y_test[:, None]
    return (X_train.astype(np.float32), y_train.astype(ydtype),
            X_test.astype(np.float32), y_test.astype(ydtype))


def preprocess_training_reg_data_(X_train, y_train, X_test, y_test):
    """Validates/casts regression data without batching
    (`atomai/utils/preproc.py:481-530`); channel axis is NHWC-last."""
    return _ensure_channel_and_target_dims(
        X_train, y_train, X_test, y_test, np.float32)


def preprocess_training_cls_data_(X_train, y_train, X_test, y_test):
    """Validates/casts classification data without batching
    (`atomai/utils/preproc.py:613-660`); channel axis is NHWC-last,
    labels int32 (the package convention)."""
    return _ensure_channel_and_target_dims(
        X_train, y_train, X_test, y_test, np.int32)


from ..models.denoiser import preprocess_denoiser_data  # noqa: E402,F401


# ----------------------------------------------------------- nn helpers
def load_weights(model, weights_path: str):
    """Loads checkpoint weights into a model object
    (`atomai/utils/nn.py:23-56`). Returns the model."""
    _, arrays = load_checkpoint(weights_path)
    model.params = arrays["params"]
    if arrays.get("batch_stats") is not None:
        model.batch_stats = arrays.get("batch_stats")
    return model


class Hook:
    """Captures a named intermediate activation during a forward pass
    (`atomai/utils/nn.py:169-192`). The functional equivalent of torch
    forward hooks: uses linen's ``capture_intermediates``.

    Example:
        >>> h = Hook(net, variables)
        >>> out = h(x)
        >>> h.intermediates   # dict of all module outputs
    """

    def __init__(self, module, variables):
        self.module = module
        self.variables = variables
        self.intermediates: Dict[str, Any] = {}

    def __call__(self, x, train: bool = False):
        out, state = self.module.apply(
            self.variables, x, train, capture_intermediates=True,
            mutable=["intermediates"])
        self.intermediates = state["intermediates"]
        return out

    def close(self):
        self.intermediates = {}


def set_seed_and_precision(seed: int = 1, precision: str = "single"
                           ) -> None:
    """(`atomai/utils/nn.py:149-166`) — seeds numpy and sets the global
    dtype policy."""
    from ..core.dtypes import Precision, set_default_precision
    np.random.seed(seed)
    if precision == "double":
        jax.config.update("jax_enable_x64", True)
    set_default_precision(Precision.full())


def dummy_optimizer():
    """Returns an initialized no-op optax transformation
    (`atomai/utils/nn.py:231-235`)."""
    import optax
    return optax.identity()


def nb_filters_classes(weights_path: str) -> Tuple[int, int]:
    """Infers nb_filters and nb_classes from a saved checkpoint
    (`atomai/utils/nn.py:252-270`)."""
    meta, arrays = load_checkpoint(weights_path)
    return (int(meta.get("nb_filters", 0)),
            int(meta.get("nb_classes", 0)))


def channels2indices(mask: np.ndarray) -> np.ndarray:
    """One-hot channel mask -> integer class mask
    (`atomai/utils/nn.py:325-336`)."""
    mask = np.asarray(mask)
    out = np.zeros(mask.shape[:-1])
    for c in range(mask.shape[-1]):
        out += mask[..., c] * c
    return out


def combine_classes_(coord: np.ndarray,
                     classes_to_combine: List[List[int]]) -> np.ndarray:
    """Single-array variant of combine_classes
    (`atomai/utils/nn.py:252-279`)."""
    coord_ = coord.copy()
    for comb in classes_to_combine:
        for c in comb[1:]:
            coord_[:, -1][coord_[:, -1] == c] = comb[0]
    return coord_
