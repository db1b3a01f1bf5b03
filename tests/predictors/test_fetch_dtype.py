"""Reduced-precision output fetch (``fetch_dtype``): the wire dtype of
the device->host transfer is narrowed inside the jitted forward, the
public API still returns float32, and quantization error stays within
the documented bounds (BasePredictor/SegPredictor in
`atomai_tpu/predictors/predictor.py`; the transfer being shrunk is the
reference's chunked fetch, `atomai/predictors/predictor.py:82-106`).
"""

import numpy as np
import pytest

from atomai_tpu.models import Segmentor
from atomai_tpu.predictors import SegPredictor


@pytest.fixture(scope="module")
def trained(lattice_data):
    imgs, masks, _ = lattice_data
    model = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    model.fit(imgs, masks, training_cycles=4, batch_size=4,
              print_loss=4, filename="/tmp/aoi_fetch_dtype")
    return model, imgs


def _predictor(model, **kw):
    return SegPredictor(model.net, model.params, model.batch_stats,
                        nb_classes=1, verbose=False, **kw)


def test_default_is_exact_f32(trained):
    model, imgs = trained
    out = _predictor(model).predict(imgs[:2])
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0


@pytest.mark.parametrize("wire,tol", [("float16", 1e-3),
                                      ("bfloat16", 8e-3),
                                      ("uint8", 1 / 255 / 2 + 1e-6)])
def test_narrow_wire_matches_f32(trained, wire, tol):
    model, imgs = trained
    exact = _predictor(model).predict(imgs[:2])
    narrow = _predictor(model, fetch_dtype=wire).predict(imgs[:2])
    # public API contract: float32 out regardless of the wire dtype
    assert narrow.dtype == np.float32
    assert narrow.shape == exact.shape
    # probabilities live in [0, 1]: absolute error bounds the
    # quantization step of each wire format
    assert np.max(np.abs(narrow - exact)) <= tol


def test_uint8_wire_preserves_locator_output(trained):
    model, imgs = trained
    p_exact = _predictor(model)
    p_u8 = _predictor(model, fetch_dtype="uint8")
    from atomai_tpu.predictors import Locator
    loc = Locator(threshold=0.5, dist_edge=5)
    c_exact = loc.run(p_exact.predict(imgs[:2]))
    c_u8 = loc.run(p_u8.predict(imgs[:2]))
    assert set(c_exact) == set(c_u8)
    for k in c_exact:
        assert c_exact[k].shape == c_u8[k].shape
        if len(c_exact[k]):
            # CoM positions move at most by the mask flips a half-step
            # quantization could cause — none on this comfortably-
            # saturated trained output
            np.testing.assert_allclose(c_exact[k], c_u8[k], atol=1e-5)


def test_invalid_fetch_dtype_rejected(trained):
    model, _ = trained
    with pytest.raises(ValueError, match="fetch_dtype"):
        _predictor(model, fetch_dtype="int4")
    # uint8 needs probability semantics and float16 overflows past
    # |y| > 65504: the generic arbitrary-scale BasePredictor refuses
    # both (SegPredictor's bounded [0, 1] outputs widen the allowed set)
    from atomai_tpu.predictors.predictor import BasePredictor
    for wire in ("uint8", "float16"):
        with pytest.raises(ValueError, match="fetch_dtype"):
            BasePredictor(model.net, model.params, model.batch_stats,
                          fetch_dtype=wire)
    # bfloat16 keeps f32 range: allowed on the generic predictor
    BasePredictor(model.net, model.params, model.batch_stats,
                  fetch_dtype="bfloat16")


def test_fetch_dtype_mutation_cannot_misscale(trained):
    """fetch_dtype is baked at first trace; decode keys on the ACTUAL
    wire dtype, so mutating the attribute afterwards cannot mis-scale
    the output (it is simply ignored)."""
    model, imgs = trained
    p = _predictor(model)
    exact = p.predict(imgs[:2])
    p.fetch_dtype = "uint8"  # too late: forward cached with f32 wire
    after = p.predict(imgs[:2])
    np.testing.assert_array_equal(exact, after)


def test_forward_cache_does_not_pin_predictor(trained):
    """The module-global jitted-forward cache must key on the (hashable)
    net module + scalars only — a closure capturing the predictor would
    pin its full parameter set in device memory for process lifetime
    (one dead param set per architecture in a long session)."""
    import gc
    import weakref
    model, imgs = trained
    p = _predictor(model)
    p.predict(imgs[:2])  # populates _FWD_CACHE
    ref = weakref.ref(p)
    del p
    gc.collect()
    assert ref() is None, \
        "_FWD_CACHE closure pins the predictor (device-memory leak)"


def test_model_predict_accepts_fetch_dtype(trained):
    """The user-facing Segmentor.predict path threads fetch_dtype."""
    model, imgs = trained
    exact = model.predict(imgs[:2], compute_coords=False, verbose=False)
    narrow = model.predict(imgs[:2], compute_coords=False, verbose=False,
                           fetch_dtype="uint8")
    assert narrow.dtype == np.float32
    assert np.max(np.abs(narrow - exact)) <= 1 / 255 / 2 + 1e-6
