"""ImSpec / Regressor / Classifier / Denoiser model tests."""

import numpy as np
import pytest

from atomai_tpu.models import (ImSpec, Regressor, Classifier,
                               DenoisingAutoencoder, load_model)


@pytest.fixture(scope="module")
def imspec_data():
    rng = np.random.RandomState(0)
    X = rng.rand(48, 16, 16).astype(np.float32)
    y = rng.rand(48, 10).astype(np.float32)
    return X, y


def test_imspec_fit_predict(imspec_data, tmp_path):
    X, y = imspec_data
    m = ImSpec((16, 16), (10,), latent_dim=4, nbfilters_encoder=8,
               nbfilters_decoder=8)
    m.fit(X, y, training_cycles=3, batch_size=16, print_loss=3,
          filename=str(tmp_path / "m"))
    pred = m.predict(X[:4], verbose=False)
    assert pred.shape == (4, 10)


def test_imspec_spec2im(tmp_path):
    rng = np.random.RandomState(1)
    X = rng.rand(48, 10).astype(np.float32)
    y = rng.rand(48, 16, 16).astype(np.float32)
    m = ImSpec((10,), (16, 16), latent_dim=4, nbfilters_encoder=8,
               nbfilters_decoder=8)
    m.fit(X, y, training_cycles=2, batch_size=16, print_loss=2,
          filename=str(tmp_path / "m2"))
    pred = m.predict(X[:4], verbose=False)
    assert pred.shape == (4, 16, 16)


def test_imspec_save_load(imspec_data, tmp_path):
    X, y = imspec_data
    m = ImSpec((16, 16), (10,), latent_dim=4, nbfilters_encoder=8,
               nbfilters_decoder=8)
    m.fit(X, y, training_cycles=2, batch_size=16, print_loss=2,
          filename=str(tmp_path / "m3"))
    path = m.save_model(str(tmp_path / "saved_imspec"))
    m2 = load_model(path)
    pred = m2.predict(X[:2], verbose=False)
    assert pred.shape == (2, 10)


# Module-scoped fits: a mobilenet-backbone fit costs ~15-30 s of trace+
# step time on the 1-core CI host, so the fit/predict tests and the
# save/load parity test share ONE fitted model per family instead of
# refitting (suite wall-time budget, VERDICT r3 item #6).
@pytest.fixture(scope="module")
def fitted_regressor(tmp_path_factory):
    rng = np.random.RandomState(2)
    X = rng.rand(48, 16, 16).astype(np.float32)
    y = (X.mean(axis=(1, 2), keepdims=False)[:, None] *
         np.ones((1, 2))).astype(np.float32)
    m = Regressor(out_dim=2, backbone="mobilenet")
    m.fit(X, y, training_cycles=3, batch_size=16, print_loss=3,
          filename=str(tmp_path_factory.mktemp("reg") / "reg"))
    return m, X


@pytest.fixture(scope="module")
def fitted_classifier(tmp_path_factory):
    rng = np.random.RandomState(3)
    X = rng.rand(48, 16, 16).astype(np.float32)
    y = rng.randint(0, 3, 48)
    m = Classifier(nb_classes=3, backbone="mobilenet")
    m.fit(X, y, training_cycles=3, batch_size=16, print_loss=3,
          filename=str(tmp_path_factory.mktemp("cls") / "cls"))
    return m, X


def test_regressor(fitted_regressor):
    m, X = fitted_regressor
    pred = m.predict(X[:4], verbose=False)
    assert pred.shape == (4, 2)


def test_classifier(fitted_classifier):
    m, X = fitted_classifier
    pred = m.predict(X[:4], verbose=False)
    assert pred.shape == (4,)
    assert pred.max() < 3


def test_denoiser(tmp_path):
    rng = np.random.RandomState(4)
    clean = rng.rand(32, 16, 16).astype(np.float32)
    noisy = clean + 0.1 * rng.randn(32, 16, 16).astype(np.float32)
    m = DenoisingAutoencoder(encoder_filters=[4, 8],
                             decoder_filters=[8, 4],
                             encoder_layers=[1, 1],
                             decoder_layers=[1, 1])
    m.fit(noisy, clean, training_cycles=3, batch_size=8, print_loss=3,
          filename=str(tmp_path / "den"))
    out = m.predict(noisy[:2])
    assert out.shape == (2, 16, 16)


def test_denoise_images_convenience(tmp_path):
    """One-call train+predict wrapper (reference
    `atomai/models/denoiser.py:238-270`): returns the trained model and
    predictions on the test stack."""
    from atomai_tpu.models.denoiser import denoise_images
    rng = np.random.RandomState(5)
    clean = rng.rand(32, 16, 16).astype(np.float32)
    noisy = clean + 0.1 * rng.randn(32, 16, 16).astype(np.float32)
    model, preds = denoise_images(
        noisy[:24], clean[:24], noisy[24:], clean[24:],
        training_cycles=3, batch_size=8, print_loss=3,
        encoder_filters=[4, 8], decoder_filters=[8, 4],
        encoder_layers=[1, 1], decoder_layers=[1, 1],
        filename=str(tmp_path / "den_conv"))
    assert isinstance(model, DenoisingAutoencoder)
    assert preds is not None and preds.shape == (8, 16, 16)
    assert np.all(np.isfinite(preds))
    # without test data the wrapper trains but returns no predictions
    model2, preds2 = denoise_images(
        noisy[:24], clean[:24], training_cycles=2, batch_size=8,
        print_loss=2, encoder_filters=[4, 8], decoder_filters=[8, 4],
        encoder_layers=[1, 1], decoder_layers=[1, 1],
        filename=str(tmp_path / "den_conv2"))
    assert preds2 is None


def test_regressor_classifier_save_load_parity(
        fitted_regressor, fitted_classifier, tmp_path):
    """Regressor and Classifier round-trip through save_model/load_model
    with forward parity (reference `test_io_regressor`/`test_io_classifier`)."""
    reg, X = fitted_regressor
    p = reg.save_model(str(tmp_path / "regio_saved"))
    reg2 = load_model(p)
    np.testing.assert_allclose(reg2.predict(X[:4], verbose=False),
                               reg.predict(X[:4], verbose=False),
                               atol=1e-5)

    cls, Xc = fitted_classifier
    p = cls.save_model(str(tmp_path / "clsio_saved"))
    cls2 = load_model(p)
    np.testing.assert_array_equal(cls2.predict(Xc[:4], verbose=False),
                                  cls.predict(Xc[:4], verbose=False))
