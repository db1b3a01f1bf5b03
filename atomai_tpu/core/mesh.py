"""Device-mesh and sharding helpers.

The reference is strictly single-device (`atomai/trainers/trainer.py:70-75`
picks one of mps/cuda/cpu; §2.10 of SURVEY.md: no DDP/NCCL anywhere). The
TPU-native replacement scales over an ICI mesh with two named axes:

* ``"data"``  — batch (data-parallel) axis; gradients are reduced by XLA
  collectives inserted automatically under ``jit`` with sharded inputs.
* ``"model"`` — ensemble-member axis: deep ensembles (the reference's only
  multi-model axis, trained *sequentially* in `atomai/trainers/etrainer.py:
  144-151`) are vmapped over parameters and sharded member-per-device here.

All helpers degrade gracefully to a single device (trivial 1x1 mesh).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def get_mesh(n_data: Optional[int] = None, n_model: int = 1,
             devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Builds a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_data is None:
        n_data = n_dev // n_model
    assert n_data * n_model <= n_dev, (
        f"mesh {n_data}x{n_model} needs more than {n_dev} devices")
    dev_array = np.asarray(devices[:n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def ensemble_mesh(n_models: int,
                  devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh that shards ensemble members across devices: the model axis is
    the largest divisor of ``n_models`` that fits the device count, so the
    member-stacked arrays always shard evenly."""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    n_model = 1
    for d in range(min(n_models, n_dev), 0, -1):
        if n_models % d == 0:
            n_model = d
            break
    return get_mesh(n_data=n_dev // n_model, n_model=n_model,
                    devices=devices)


def _auto_mesh_enabled() -> bool:
    """``AOI_AUTO_MESH=0`` turns OFF auto mesh building (explicit Mesh
    objects are always honored). Production default is on; the test suite
    sets 0 so feature tests run single-device — on the 1-core CI host an
    8-way virtual SPMD program costs ~3x the wall of the same single-device
    program, and the sharded paths have dedicated 8-wide coverage
    (tests/trainers/test_multidevice.py, the driver dryrun, and the
    multichip example), which re-enable the knob."""
    import os
    val = os.environ.get("AOI_AUTO_MESH", "1").strip().lower()
    return val not in ("0", "false", "off", "no")


def resolve_data_mesh(mesh=None, batch_size: Optional[int] = None
                      ) -> Optional[Mesh]:
    """Resolves the data-parallel mesh default shared by every training and
    prediction engine:

    * ``None``  — auto-build a pure-data mesh when more than one device is
      present (the reference is single-device by design,
      `atomai/trainers/trainer.py:70-75`; beating that is the point of the
      rebuild, so multi-chip hosts data-shard by default). With
      ``batch_size`` given, the mesh is sized to the largest device count
      that divides the batch — an auto mesh that cannot actually shard the
      batch is skipped rather than compiled as a no-win SPMD program.
      ``AOI_AUTO_MESH=0`` disables this auto path entirely;
    * ``False`` — explicitly disable sharding (single-device run);
    * a ``jax.sharding.Mesh`` — used as given.
    """
    if mesh is False:
        return None
    if mesh is not None:
        return mesh
    if not _auto_mesh_enabled():
        return None
    n_dev = jax.device_count()
    if n_dev <= 1:
        return None
    n_data = n_dev
    if batch_size is not None:
        n_data = 1
        for d in range(min(n_dev, batch_size), 0, -1):
            if batch_size % d == 0:
                n_data = d
                break
        if n_data <= 1:
            return None
    return get_mesh(n_data=n_data, n_model=1,
                    devices=jax.devices()[:n_data])


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_member_stacked(tree, mesh: Mesh):
    """Places member-stacked pytrees with the leading (member/model) axis
    sharded over the mesh MODEL axis; scalars replicate. Used for deep-
    ensemble members (`trainers/etrainer.py`) and the independent-output
    DKL-GP stacks (`trainers/gptrainer.py`) — the reference trains both
    sequentially / in one process (`atomai/trainers/etrainer.py:144-151`,
    `atomai/trainers/gptrainer.py:213-228`)."""

    def put(leaf):
        import jax.numpy as jnp
        leaf = jnp.asarray(leaf)
        spec = P(MODEL_AXIS, *([None] * (leaf.ndim - 1))) \
            if leaf.ndim >= 1 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def resolve_model_mesh(mesh, n_models: int) -> Optional[Mesh]:
    """Model-axis analog of :func:`resolve_data_mesh`: ``None`` auto-builds
    an :func:`ensemble_mesh` over all devices when members actually spread
    out, ``False`` disables, a Mesh is used as given."""
    if mesh is False:
        return None
    if mesh is not None:
        return mesh
    if not _auto_mesh_enabled():
        return None
    if jax.device_count() > 1:
        m = ensemble_mesh(n_models)
        if m.shape[MODEL_AXIS] > 1:
            return m
    return None


def shard_batch(mesh: Optional[Mesh], *arrays):
    """Places arrays with leading-dim sharded over the mesh data axis.

    With no mesh (single device), returns the arrays untouched. Arrays whose
    batch dim does not divide the mesh data-axis size are replicated.
    """
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    n_data = mesh.shape[DATA_AXIS]
    out = []
    for a in arrays:
        if hasattr(a, "shape") and a.ndim >= 1 and a.shape[0] % n_data == 0:
            out.append(jax.device_put(a, data_sharding(mesh, a.ndim)))
        else:
            out.append(jax.device_put(a, replicate(mesh)))
    return tuple(out) if len(out) > 1 else out[0]
