"""
atomai_tpu — TPU-native (JAX/XLA/Pallas) framework for deep/machine learning
analysis of atomically resolved and hyperspectral microscopy data.

A from-scratch rebuild of the capabilities of pycroscopy/atomai (v0.8.1,
see /root/reference) designed TPU-first:

* all compute paths are pure-functional JAX lowered through XLA:TPU,
* networks are Flax linen modules in NHWC layout (MXU-friendly),
* training loops are ``jax.lax.scan``-based jitted programs (no per-step
  Python dispatch),
* data augmentation runs on-device inside the jitted train step,
* ensembles train simultaneously via ``jax.vmap`` over parameter pytrees,
* multi-device scaling uses ``jax.sharding.Mesh`` + NamedSharding (DP over
  the batch axis, ensemble-member axis for deep ensembles).

Public API mirrors the reference package layout
(``atomai/__init__.py:1-7``): ``models``, ``trainers``, ``predictors``,
``nets``, ``utils``, ``transforms``, ``stat``, ``load_model``.
"""

from . import core
from .core.dtypes import enable_fast_matmul

enable_fast_matmul()

from . import utils
from . import nets
from . import losses_metrics
from . import transforms
from . import trainers
from . import predictors
from . import models
from . import stat
from .models import load_model, load_ensemble
from .core.export import export_model, load_exported
from .__version__ import version as __version__

__all__ = ["core", "models", "trainers", "predictors", "nets", "utils",
           "transforms", "stat", "losses_metrics", "load_model",
           "load_ensemble", "export_model", "load_exported",
           "__version__"]
