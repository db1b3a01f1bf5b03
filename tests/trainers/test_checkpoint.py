"""Checkpoint write semantics: atomicity + async per-epoch saves."""

import json
import os
import struct

import numpy as np

from atomai_tpu.core.checkpoint import (flush_async_checkpoints,
                                        load_checkpoint, save_checkpoint,
                                        save_checkpoint_async)


def test_save_checkpoint_atomic_no_temp_left(tmp_path):
    path = str(tmp_path / "m")
    out = save_checkpoint(path, {"model_type": "weights", "a": 1},
                          {"params": {"w": np.ones((3, 3), np.float32)}})
    meta, arrays = load_checkpoint(out)
    assert meta["a"] == 1
    np.testing.assert_array_equal(arrays["params"]["w"], np.ones((3, 3)))
    assert [f for f in os.listdir(tmp_path) if f.endswith(".tmp")] == []


def test_async_save_latest_wins_and_flushes(tmp_path):
    """Queued saves of the same file coalesce to the newest payload;
    flush blocks until the bytes are on disk."""
    path = str(tmp_path / "a")
    for v in range(5):
        save_checkpoint_async(
            path, {"model_type": "weights", "v": v},
            {"params": {"w": np.full((2,), float(v), np.float32)}})
    flush_async_checkpoints()
    meta, arrays = load_checkpoint(path)
    assert meta["v"] == 4
    np.testing.assert_array_equal(arrays["params"]["w"], [4.0, 4.0])
    assert [f for f in os.listdir(tmp_path) if f.endswith(".tmp")] == []


def test_vae_epoch_checkpoints_are_readable(tmp_path):
    """The VAE per-epoch async saves must leave a loadable, CURRENT
    checkpoint at the end of fit."""
    from atomai_tpu.models import VAE, load_model

    X = np.random.RandomState(0).rand(32, 8, 8).astype(np.float32)
    path = str(tmp_path / "vck")
    v = VAE((8, 8), latent_dim=2, numlayers_encoder=1,
            numhidden_encoder=8, numlayers_decoder=1, numhidden_decoder=8)
    v.fit(X, training_cycles=2, batch_size=16, mesh=False, filename=path)
    loaded = load_model(path + ".aoi")
    z_live = v.encode(X[:4])
    z_loaded = loaded.encode(X[:4])
    for a, b in zip(z_live, z_loaded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_async_write_failure_surfaces_at_flush(tmp_path):
    """A failed background write must not wedge flush() forever (the
    drain thread must task_done() even on error), and the error must
    surface at flush instead of being swallowed."""
    import pytest

    bad = str(tmp_path / "no_such_dir" / "deep" / "x")
    save_checkpoint_async(bad, {"model_type": "weights"},
                          {"params": {"w": np.zeros(2, np.float32)}})
    good = str(tmp_path / "ok")
    save_checkpoint_async(good, {"model_type": "weights"},
                          {"params": {"w": np.ones(2, np.float32)}})
    with pytest.raises(OSError):
        flush_async_checkpoints()   # returns (no hang) and raises
    meta, arrays = load_checkpoint(good)   # good save still landed
    np.testing.assert_array_equal(arrays["params"]["w"], [1.0, 1.0])
    # the writer recovers: subsequent saves and flushes work
    save_checkpoint_async(good, {"model_type": "weights", "v": 2},
                          {"params": {"w": np.full(2, 2.0, np.float32)}})
    flush_async_checkpoints()
    meta, _ = load_checkpoint(good)
    assert meta["v"] == 2
