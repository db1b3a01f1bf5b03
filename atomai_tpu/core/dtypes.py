"""Precision policy for TPU execution.

The reference framework runs everything in float32/float64 on the torch side
(`atomai/utils/nn.py:149-166` exposes a seed+precision helper). On TPU the
MXU natively consumes bfloat16 with float32 accumulation, so the policy here
is: parameters and optimizer state in float32, activations/compute optionally
in bfloat16 ("mixed"), outputs in float32.
"""

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    """Dtype policy threaded through nets and trainers."""
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    output_dtype: jnp.dtype = jnp.float32

    @classmethod
    def mixed(cls) -> "Precision":
        return cls(param_dtype=jnp.float32,
                   compute_dtype=jnp.bfloat16,
                   output_dtype=jnp.float32)

    @classmethod
    def full(cls) -> "Precision":
        return cls()


_DEFAULT = None  # resolved lazily (env + backend)


def default_precision() -> Precision:
    """Global dtype policy.

    Resolution order: explicit ``set_default_precision`` call >
    ``ATOMAI_TPU_PRECISION`` env (``float32`` | ``mixed``) > automatic
    (mixed/bf16 activations on TPU backends, float32 elsewhere).
    """
    global _DEFAULT
    if _DEFAULT is not None:
        return _DEFAULT
    import os
    env = os.environ.get("ATOMAI_TPU_PRECISION", "").lower()
    if env in ("float32", "f32", "highest"):
        _DEFAULT = Precision.full()
    elif env in ("mixed", "bf16", "bfloat16"):
        _DEFAULT = Precision.mixed()
    else:
        import jax
        _DEFAULT = Precision.mixed() \
            if jax.default_backend() not in ("cpu",) else Precision.full()
    return _DEFAULT


def set_default_precision(p: Precision) -> None:
    global _DEFAULT
    _DEFAULT = p


def enable_fast_matmul() -> None:
    """Routes f32 matmuls/convs through single-pass bf16 MXU execution
    (f32 accumulation) — the standard TPU training precision. Parameters
    and optimizer state stay float32. Opt out with
    ``ATOMAI_TPU_PRECISION=float32``. Numerically sensitive paths (GP
    kernel distances, Cholesky inputs) pin ``precision=HIGHEST``
    explicitly and are unaffected."""
    import os

    import jax
    if os.environ.get("ATOMAI_TPU_PRECISION", "").lower() in (
            "float32", "f32", "highest"):
        return
    jax.config.update("jax_default_matmul_precision", "bfloat16")


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature set. XLA:CPU's persistent
    cache does NOT key on machine type: AOT executables compiled on a
    host with different vector extensions load with a 'could lead to
    SIGILL' warning and machine-dependent codegen numerics (observed when
    this container migrated hosts). Segregating the cache per CPU
    fingerprint makes stale cross-host entries unreachable."""
    import hashlib
    import platform
    feats = model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                low = line.lower()
                # x86 lists CPU features under 'flags'; aarch64 under
                # 'Features' — without the latter, ARM hosts with
                # different vector extensions would share one cache dir
                # (the exact SIGILL scenario this fingerprint prevents)
                if not feats and low.startswith(("flags", "features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                # the model name too: LLVM tunes per CPU MODEL, not just
                # per ISA flags (+prefer-no-scatter/+prefer-no-gather on
                # some microarchitectures) — two hosts with identical
                # flag sets still produced a machine-feature-mismatch
                # AOT load warning (observed 2026-08-19)
                elif not model and low.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                if feats and model:
                    break
    except OSError:
        pass  # non-Linux: no /proc — fall back to the platform id alone
    if not feats:
        feats = platform.processor()
    key = f"{platform.machine()}|{model}|{feats}"
    return hashlib.sha256(key.encode()).hexdigest()[:8]


def enable_compilation_cache(path: str = "/tmp/atomai_tpu_xla_cache",
                             min_compile_secs: float = 0.0) -> None:
    """Enables JAX's persistent compilation cache.

    Identical HLO programs (same net/shape/config) compile once and are
    reloaded from disk afterwards — across processes AND across repeated
    jit traces within one process. On the single-core CPU test platform
    XLA compilation dominates suite wall time, and on the TPU tunnel the
    first train-step compile costs tens of seconds, so both the test
    suite and the bench enable this. The directory is suffixed with a
    host-CPU fingerprint (see :func:`_host_fingerprint`).
    """
    import os

    import jax
    path = os.path.join(path, _host_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without the knobs: cache is best-effort
        pass
