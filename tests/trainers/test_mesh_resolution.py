"""Mesh auto-resolution semantics (`atomai_tpu/core/mesh.py`): the
defaults every trainer/predictor shares."""

import jax
import pytest

from atomai_tpu.core.mesh import (DATA_AXIS, MODEL_AXIS, ensemble_mesh,
                                  get_mesh, resolve_data_mesh,
                                  resolve_model_mesh)

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 (virtual) devices")


@pytest.fixture(autouse=True)
def _auto_mesh_on(monkeypatch):
    """These tests pin the AUTO-resolution semantics — re-enable what the
    suite-wide conftest default (AOI_AUTO_MESH=0) turns off."""
    monkeypatch.setenv("AOI_AUTO_MESH", "1")


@needs8
def test_auto_mesh_env_optout(monkeypatch):
    """AOI_AUTO_MESH=0 disables AUTO building only — explicit Mesh objects
    (and mesh=False) behave identically (`core/mesh.py:_auto_mesh_enabled`,
    the suite-wide 1-core-CI cost control)."""
    monkeypatch.setenv("AOI_AUTO_MESH", "0")
    assert resolve_data_mesh(None, 32) is None
    assert resolve_model_mesh(None, 8) is None
    m = get_mesh(n_data=2, n_model=1)
    assert resolve_data_mesh(m, 32) is m
    assert resolve_model_mesh(m, 8) is m
    assert resolve_data_mesh(False, 32) is None


@needs8
def test_auto_data_mesh_sizes_to_batch_divisor():
    # full device count when the batch divides it
    assert resolve_data_mesh(None, 32).shape[DATA_AXIS] == 8
    assert resolve_data_mesh(None, 8).shape[DATA_AXIS] == 8
    # largest divisor otherwise (12 -> 6, 4 -> 4)
    assert resolve_data_mesh(None, 12).shape[DATA_AXIS] == 6
    assert resolve_data_mesh(None, 4).shape[DATA_AXIS] == 4
    # nothing to shard -> no mesh (avoids a no-win SPMD program)
    assert resolve_data_mesh(None, 1) is None
    assert resolve_data_mesh(None, 7).shape[DATA_AXIS] == 7
    # no batch hint -> all devices
    assert resolve_data_mesh(None).shape[DATA_AXIS] == 8


@needs8
def test_explicit_mesh_choices_respected():
    assert resolve_data_mesh(False, 32) is None
    m = get_mesh(n_data=2, n_model=1)
    assert resolve_data_mesh(m, 5) is m          # user mesh wins verbatim
    assert resolve_model_mesh(False, 8) is None
    assert resolve_model_mesh(m, 8) is m


@needs8
def test_model_mesh_spreads_members():
    assert resolve_model_mesh(None, 8).shape[MODEL_AXIS] == 8
    assert resolve_model_mesh(None, 4).shape[MODEL_AXIS] == 4
    # 3 members on 8 devices: largest divisor of 3 that fits is 3
    assert resolve_model_mesh(None, 3).shape[MODEL_AXIS] == 3
    m = ensemble_mesh(4)
    assert m.shape[MODEL_AXIS] == 4 and m.shape[DATA_AXIS] == 2
