"""Multi-device scaling helpers (mesh/sharding live in core.mesh)."""

from ..core.mesh import (get_mesh, ensemble_mesh, data_sharding, replicate,
                         shard_batch, DATA_AXIS, MODEL_AXIS)

__all__ = ["get_mesh", "ensemble_mesh", "data_sharding", "replicate",
           "shard_batch", "DATA_AXIS", "MODEL_AXIS"]
