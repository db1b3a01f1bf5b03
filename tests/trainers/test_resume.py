"""Step-level resume + profiling-hook tests (aux subsystems,
SURVEY.md §5)."""

import jax
import numpy as np

from atomai_tpu.core.profiling import device_memory_stats
from atomai_tpu.models import Segmentor


def _data(n=8, size=32, seed=1):
    rng = np.random.RandomState(seed)
    X = rng.rand(n, size, size).astype(np.float32)
    y = (X > 0.5).astype(np.float32)
    return X, y


def test_save_with_optimizer_and_resume(tmp_path):
    X, y = _data()
    m = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    m.fit(X, y, training_cycles=4, batch_size=4, print_loss=4,
          filename=str(tmp_path / "m"))
    ckpt = m.save_model(str(tmp_path / "resumable"),
                        include_optimizer=True)
    params_before = jax.tree.leaves(m.params)
    m.resume_training(ckpt, additional_cycles=4)
    assert len(m.loss_acc["train_loss"]) == 8
    params_after = jax.tree.leaves(m.params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(params_before, params_after))


def test_resume_requires_optimizer_state(tmp_path):
    X, y = _data()
    m = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    m.fit(X, y, training_cycles=2, batch_size=4, print_loss=2,
          filename=str(tmp_path / "m2"))
    ckpt = m.save_model(str(tmp_path / "plain"))
    import pytest
    with pytest.raises(ValueError):
        m.resume_training(ckpt)


def test_device_memory_stats():
    stats = device_memory_stats()
    assert len(stats) >= 1


def test_tunnel_probe_keys_and_sanity():
    """The bench 'tunnel weather' probe (core/profiling.py): keys exist,
    all positive, bandwidths finite — on the virtual CPU backend the
    'wire' is host memcpy, so values are large but the contract holds."""
    from atomai_tpu.core.profiling import tunnel_probe
    p = tunnel_probe(payload_mb=1.0, n_rtt=3, n_bw=2)
    assert set(p) == {"rtt_ms", "d2h_mbps", "h2d_mbps", "payload_mb"}
    assert p["rtt_ms"] >= 0
    assert p["d2h_mbps"] > 0 and np.isfinite(p["d2h_mbps"])
    assert p["h2d_mbps"] > 0 and np.isfinite(p["h2d_mbps"])
    assert p["payload_mb"] == 1.0
