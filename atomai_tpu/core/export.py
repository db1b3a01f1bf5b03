"""AOT model export for deployment and serving (``jax.export``).

The reference deploys by pickling torch modules
(`atomai/models/segmentor.py` save/load via ``torch.save``), which ties
serving to a Python+torch runtime of the same version. The TPU-native
deployment path serializes the *compiled computation* instead: weights are
baked into a StableHLO program via ``jax.export``, so the artifact

- needs no model class, flax, or even this package to run — only jax;
- is lowered ahead-of-time for an explicit set of platforms
  (``tpu``/``cpu`` by default), so the same file serves on a TPU pod and
  falls back to CPU in CI;
- supports a symbolic batch dimension, so one artifact serves any batch
  size without retracing.

File layout mirrors ``core.checkpoint``: 8-byte little-endian header
length | JSON header | serialized Exported bytes.
"""

import json
import struct
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jexport

_MAGIC_KEY = "atomai_tpu_exported"
_FORMAT_VERSION = 1


def _eval_forward(net, params, batch_stats):
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    def forward(x):
        return net.apply(variables, x, False)
    return forward


def export_model(model, filename: str,
                 example_shape: Optional[Tuple[int, ...]] = None,
                 platforms: Sequence[str] = ("tpu", "cpu"),
                 batch_polymorphic: bool = True) -> str:
    """Exports a trained model's eval-mode forward as a self-contained
    serving artifact.

    Args:
        model: any trained atomai_tpu model/trainer exposing ``net``,
            ``params`` and (optionally) ``batch_stats`` — Segmentor,
            ImSpec, Regressor, Classifier, DenoisingAutoencoder, or a raw
            trainer.
        filename: output path ('.aot' appended if no extension).
        example_shape: per-sample input shape WITHOUT the batch axis,
            e.g. ``(256, 256, 1)``. Inferred from the model's staged
            training data or ``in_dim`` metadata when omitted.
        platforms: target platforms to lower for ahead-of-time.
        batch_polymorphic: export with a symbolic batch dimension so any
            batch size runs without retracing; set False to pin batch=1.

    Returns the written path.
    """
    net = getattr(model, "net", None) or getattr(model, "model", None)
    params = model.params
    if net is None or params is None:
        raise ValueError("Model must be initialized/trained before export")
    batch_stats = getattr(model, "batch_stats", None)

    if example_shape is None:
        example_shape = _infer_example_shape(model)
    example_shape = tuple(int(s) for s in example_shape)

    forward = _eval_forward(net, params, batch_stats)
    if batch_polymorphic:
        b = jexport.symbolic_shape("b")[0]
        spec = jax.ShapeDtypeStruct((b,) + example_shape, np.float32)
    else:
        spec = jax.ShapeDtypeStruct((1,) + example_shape, np.float32)

    exported = jexport.export(jax.jit(forward),
                              platforms=tuple(platforms))(spec)
    payload = exported.serialize()

    meta = dict(getattr(model, "meta_state_dict", {}) or {})
    header = {
        "magic": _MAGIC_KEY,
        "format_version": _FORMAT_VERSION,
        "model_type": meta.get("model_type", type(model).__name__),
        "example_shape": list(example_shape),
        "batch_polymorphic": bool(batch_polymorphic),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "meta": {k: v for k, v in meta.items()
                 if isinstance(v, (str, int, float, bool, list, tuple,
                                   type(None)))},
    }
    if not filename.endswith(".aot"):
        filename = filename + ".aot"
    blob = json.dumps(header).encode("utf-8")
    with open(filename, "wb") as f:
        f.write(struct.pack("<Q", len(blob)))
        f.write(blob)
        f.write(payload)
    return filename


def _infer_example_shape(model) -> Tuple[int, ...]:
    """Per-sample input shape as the model's trainer stages it. The
    staged-data path and the metadata fallback MUST agree — otherwise the
    same model would export incompatible artifacts depending on whether
    training data is still attached."""
    meta = getattr(model, "meta_state_dict", {}) or {}
    staged = getattr(model, "Xb_train", None)
    if staged is not None:
        return tuple(int(s) for s in staged.shape[2:])
    in_dim = meta.get("in_dim")
    if in_dim:
        in_dim = tuple(int(s) for s in in_dim)
        # imspec nets consume the staged (h, w)/(length,) signal directly;
        # image models stage NHWC with an explicit channel axis
        if meta.get("model_type") == "imspec":
            return in_dim
        return in_dim + (1,) if len(in_dim) in (1, 2) else in_dim
    raise ValueError(
        "Could not infer the input shape — pass example_shape=(H, W, C)")


class ExportedModel:
    """A deserialized serving artifact: callable forward + metadata.

    Runs without the original model class — the computation (weights
    included) lives in the compiled program. ``predict`` adds the
    standard image pre/post conventions (channel-last, optional min-max
    normalization, chunking) around the raw ``__call__``.
    """

    def __init__(self, header: Dict[str, Any], exported) -> None:
        self.header = header
        self.meta = header.get("meta", {})
        self.model_type = header.get("model_type")
        self.example_shape = tuple(header.get("example_shape", ()))
        self._exported = exported

    def __call__(self, x):
        x = np.asarray(x, np.float32)
        if not self.header.get("batch_polymorphic", True) and \
                x.shape[0] != 1:
            return np.concatenate(
                [np.asarray(self._exported.call(x[i:i + 1]))
                 for i in range(x.shape[0])])
        return self._exported.call(x)

    def _canonicalize(self, x: np.ndarray) -> np.ndarray:
        """Reshapes input to (N,) + example_shape: adds a missing batch
        axis, and adds or squeezes a singleton channel axis to match what
        the exported program was traced with."""
        es = self.example_shape
        if x.shape[1:] == es:
            return x
        if x.shape == es:
            return x[None]
        if x.ndim >= 1 and x.shape[1:] + (1,) == es:
            return x[..., None]                       # (N, H, W) -> NHW1
        if x.shape + (1,) == es:
            return x[None, ..., None]                 # (H, W) -> 1HW1
        if x.shape[-1] == 1 and x.shape[1:-1] == es:
            return x[..., 0]                          # NHW1 -> (N, H, W)
        if x.shape[-1] == 1 and x.shape[:-1] == es:
            return x[..., 0][None]                    # HW1 -> (1, H, W)
        raise ValueError(
            f"Input shape {x.shape} does not match the exported "
            f"program's per-sample shape {es}")

    def predict(self, imgs, norm: bool = True, max_batch: int = 32
                ) -> np.ndarray:
        """Batched eval-mode forward with the library's input conventions
        (float32 NHWC, per-stack min-max normalization)."""
        x = self._canonicalize(np.asarray(imgs, np.float32))
        if norm:
            lo, hi = x.min(), x.max()
            if hi > lo:
                x = (x - lo) / (hi - lo)
        outs = []
        for i in range(0, x.shape[0], max_batch):
            outs.append(np.asarray(self(x[i:i + max_batch])))
        return np.concatenate(outs)


def load_exported(filename: str) -> ExportedModel:
    """Loads a serving artifact written by :func:`export_model`."""
    try:
        with open(filename, "rb") as f:
            head = f.read(8)
            (hlen,) = struct.unpack("<Q", head)
            header = json.loads(f.read(hlen).decode("utf-8"))
            payload = f.read()
        if not isinstance(header, dict):
            raise ValueError
        magic_ok = header.get("magic") == _MAGIC_KEY
    except (struct.error, UnicodeDecodeError, json.JSONDecodeError,
            OverflowError, ValueError):
        # OverflowError = garbage header length too big for read()'s
        # ssize_t (a corrupt-file signal). NOT MemoryError: a genuine
        # OOM reading a valid multi-GB artifact must not masquerade as
        # file corruption
        raise ValueError(f"{filename} is not an atomai_tpu export")
    if not magic_ok:
        raise ValueError(f"{filename} is not an atomai_tpu export")
    exported = jexport.deserialize(payload)
    return ExportedModel(header, exported)
