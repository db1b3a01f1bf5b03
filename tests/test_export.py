"""AOT export / serving artifact tests (``core/export.py``).

The artifact must reproduce the live model's outputs, run batch sizes it
was never traced with (symbolic batch dim), and round-trip through disk
without the original model class.
"""

import numpy as np
import pytest

import atomai_tpu as aoi


@pytest.fixture(scope="module")
def trained_seg(tmp_path_factory):
    rng = np.random.RandomState(0)
    X = rng.rand(8, 32, 32).astype(np.float32)
    y = (rng.rand(8, 32, 32) > 0.5).astype(np.float32)
    m = aoi.models.Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1],
                             seed=3)
    m.fit(X, y, training_cycles=2, batch_size=4, print_loss=2, mesh=False,
          filename=str(tmp_path_factory.mktemp("seg") / "m"))
    return m


def test_export_roundtrip_matches_live_forward(trained_seg, tmp_path):
    m = trained_seg
    path = aoi.export_model(m, str(tmp_path / "seg"), platforms=("cpu",))
    assert path.endswith(".aot")
    served = aoi.load_exported(path)
    x = np.random.RandomState(1).rand(3, 32, 32, 1).astype(np.float32)
    got = np.asarray(served(x))
    want = np.asarray(m.trainer._apply_eval(m.params, m.batch_stats, x)) \
        if hasattr(m, "trainer") else None
    if want is None:
        variables = {"params": m.params}
        if m.batch_stats is not None:
            variables["batch_stats"] = m.batch_stats
        want = np.asarray(m.net.apply(variables, x, False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_symbolic_batch(trained_seg, tmp_path):
    path = aoi.export_model(trained_seg, str(tmp_path / "segb"),
                            platforms=("cpu",))
    served = aoi.load_exported(path)
    for n in (1, 2, 5):
        out = np.asarray(served(np.zeros((n, 32, 32, 1), np.float32)))
        assert out.shape[0] == n


def test_exported_predict_conventions(trained_seg, tmp_path):
    path = aoi.export_model(trained_seg, str(tmp_path / "segc"),
                            platforms=("cpu",))
    served = aoi.load_exported(path)
    img = np.random.RandomState(2).rand(32, 32) * 100  # unnormalized 2D
    out = served.predict(img)
    assert out.shape == (1, 32, 32, 1)
    stack = np.random.RandomState(2).rand(4, 32, 32)
    assert served.predict(stack).shape == (4, 32, 32, 1)
    with pytest.raises(ValueError, match="does not match"):
        served.predict(np.zeros((16, 16)))


def test_export_header_metadata(trained_seg, tmp_path):
    path = aoi.export_model(trained_seg, str(tmp_path / "segd"),
                            platforms=("cpu",))
    served = aoi.load_exported(path)
    assert served.model_type == "seg"
    assert served.example_shape == (32, 32, 1)
    assert served.header["platforms"] == ["cpu"]
    with pytest.raises(ValueError, match="not an atomai_tpu export"):
        bad = tmp_path / "bad.aot"
        import json, struct
        blob = json.dumps({"magic": "nope"}).encode()
        bad.write_bytes(struct.pack("<Q", len(blob)) + blob)
        aoi.load_exported(str(bad))


def test_export_requires_initialized_model():
    m = aoi.models.Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    assert m.params is None  # guard: construction must not init params
    with pytest.raises(ValueError, match="initialized"):
        aoi.export_model(m, "/tmp/never")


def test_load_exported_rejects_foreign_files(tmp_path):
    short = tmp_path / "short.aot"
    short.write_bytes(b"abc")
    with pytest.raises(ValueError, match="not an atomai_tpu export"):
        aoi.load_exported(str(short))
    binary = tmp_path / "junk.aot"
    binary.write_bytes(b"\xff" * 64)
    with pytest.raises(ValueError, match="not an atomai_tpu export"):
        aoi.load_exported(str(binary))


def test_export_imspec_shape_inference_consistent(tmp_path):
    """Staged-data and metadata shape inference must produce the same
    artifact input layout (channel-less imspec signals)."""
    rng = np.random.RandomState(0)
    X = rng.rand(12, 8, 8).astype(np.float32)
    y = rng.rand(12, 16).astype(np.float32)
    m = aoi.models.ImSpec((8, 8), (16,), latent_dim=2)
    m.fit(X, y, X[:4], y[:4], training_cycles=2, batch_size=4,
          print_loss=2, mesh=False,
          filename=str(tmp_path / "ims"))
    p1 = aoi.export_model(m, str(tmp_path / "staged"), platforms=("cpu",))
    # simulate a reloaded model: no staged data, metadata only
    from atomai_tpu.core.export import _infer_example_shape

    class _Shell:
        net, params = m.net, m.params
        batch_stats = m.batch_stats
        meta_state_dict = {"model_type": "imspec", "in_dim": (8, 8)}
        Xb_train = None
    assert _infer_example_shape(_Shell()) == \
        tuple(int(s) for s in m.Xb_train.shape[2:])
    served = aoi.load_exported(p1)
    # NHW and NHW1 both accepted for a channel-less program
    out = served.predict(X[:3], norm=False)
    out2 = served.predict(X[:3][..., None], norm=False)
    np.testing.assert_allclose(out, out2, rtol=1e-6)
