"""Tracing / profiling hooks.

The reference has no profiling beyond wall-clock prints and nvidia-smi
polling (`atomai/predictors/predictor.py:283-297`,
`atomai/utils/nn.py:120-133`; SURVEY.md §5). The TPU-native framework
exposes first-class ``jax.profiler`` integration:

- ``trace(logdir)``: context manager capturing an xprof/TensorBoard trace
  of everything executed inside.
- ``annotate(name)``: TraceAnnotation context for labeling custom regions
  inside traces.
- ``device_memory_stats()``: live per-device memory usage (the TPU-native
  replacement for the reference's ``gpu_usage_map``).
- ``block_until_ready(tree)``: sync helper for honest wall-clock timing.
"""

import contextlib
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Captures a jax.profiler trace into ``logdir`` (view with
    TensorBoard's profile plugin or Perfetto)."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Labels a region inside a profiler trace."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Dict[str, Dict[str, Any]]:
    """Per-device memory statistics (replaces `atomai/utils/nn.py:120-133`
    nvidia-smi polling)."""
    stats = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
        except Exception:
            ms = None
        if ms:
            stats[str(d)] = {
                "bytes_in_use": ms.get("bytes_in_use"),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
                "bytes_limit": ms.get("bytes_limit"),
            }
        else:
            stats[str(d)] = {"bytes_in_use": None}
    return stats


def block_until_ready(tree: Any) -> Any:
    """Blocks until all arrays in a pytree are computed."""
    return jax.block_until_ready(tree)
