"""Core infrastructure: dtype policy, PRNG plumbing, device mesh helpers,
self-describing checkpoints, and the functional train state."""

from .dtypes import Precision, default_precision, set_default_precision
from .prng import KeySeq, key_from_seed
from .mesh import get_mesh, data_sharding, replicate, ensemble_mesh
from .checkpoint import save_checkpoint, load_checkpoint
from .state import TrainState
from .export import export_model, load_exported, ExportedModel
from . import profiling
from .profiling import trace, annotate, device_memory_stats

__all__ = ["Precision", "default_precision", "set_default_precision",
           "KeySeq", "key_from_seed", "get_mesh", "data_sharding",
           "replicate", "ensemble_mesh", "save_checkpoint",
           "load_checkpoint", "TrainState", "profiling", "trace",
           "annotate", "device_memory_stats", "export_model", "load_exported", "ExportedModel"]
