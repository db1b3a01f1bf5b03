"""Self-describing checkpoints.

The reference persists a ``meta_state_dict`` — constructor hyperparameters +
weights + pickled optimizer — via ``torch.save``
(`atomai/trainers/trainer.py:344-358`, `atomai/models/loaders.py:25-64`), and
rebuilds the model class from ``meta["model_type"]``. We keep the same
contract with a portable, pickle-free format:

    file = 8-byte little-endian header length
         | JSON meta header (model_type + all constructor kwargs)
         | msgpack-serialized pytree of numpy arrays (weights, batch stats,
           optionally optimizer state for step-level resume)

Step-level resume (absent in the reference — SURVEY.md §5) comes for free by
storing the optimizer state and step counter.
"""

import json
import struct
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    # jax.device_get issues async host copies for every leaf before
    # blocking, so the whole tree transfers in one overlapped round trip
    # instead of paying device->host latency per leaf (300-leaf ensemble
    # checkpoints: ~0.2 s vs ~50 s through a remote-TPU tunnel).
    return jax.tree.map(np.asarray, jax.device_get(tree))


def save_checkpoint(filename: str, meta: Dict[str, Any],
                    arrays: Dict[str, Any]) -> str:
    """Writes meta (JSON-able dict) + arrays (pytree of arrays) to one file."""
    if not filename.endswith(".aoi"):
        filename = filename + ".aoi"
    header = json.dumps(meta, default=_json_default).encode("utf-8")
    payload = serialization.msgpack_serialize(_to_numpy_tree(arrays))
    with open(filename, "wb") as f:
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(payload)
    return filename


def load_checkpoint(filename: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    if not filename.endswith(".aoi"):
        filename = filename + ".aoi"
    with open(filename, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        arrays = serialization.msgpack_restore(f.read())
    return meta, arrays


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"Not JSON serializable: {type(o)}")
