"""VAE family shape/dtype contract tests (reference model:
`test/models/test_vae.py:13-194` parametrized matrices)."""

import numpy as np
import pytest

from atomai_tpu.models import VAE, rVAE, jVAE, jrVAE


@pytest.fixture(scope="module")
def imstack():
    rng = np.random.RandomState(0)
    return rng.rand(48, 16, 16).astype(np.float32)


def _fit(model, X, **kw):
    model.fit(X, training_cycles=2, batch_size=16,
              filename="/tmp/aoi_vae_t", verbose=False, **kw)


@pytest.mark.parametrize("conv_encoder", [False, True])
def test_vae_encode_decode(imstack, conv_encoder, tmp_path):
    vae = VAE((16, 16), latent_dim=2, conv_encoder=conv_encoder,
              numhidden_encoder=32, numhidden_decoder=32)
    _fit(vae, imstack)
    z_mean, z_logsd = vae.encode(imstack[:8])
    assert z_mean.shape == (8, 2)
    assert z_logsd.shape == (8, 2)
    dec = vae.decode(np.zeros((3, 2)))
    assert dec.shape == (3, 16, 16)


@pytest.mark.parametrize("translation,zdim", [(True, 5), (False, 3)])
def test_rvae_coord_latents(imstack, translation, zdim):
    rvae = rVAE((16, 16), latent_dim=2, translation=translation,
                numhidden_encoder=32, numhidden_decoder=32)
    _fit(rvae, imstack, rotation_prior=np.pi / 2)
    z_mean, z_logsd = rvae.encode(imstack[:4])
    assert z_mean.shape == (4, zdim)
    # decoding takes content latents only
    dec = rvae.decode(np.zeros((2, 2)))
    assert dec.shape == (2, 16, 16)


def test_jvae_discrete(imstack):
    jvae = jVAE((16, 16), latent_dim=2, discrete_dim=[3],
                numhidden_encoder=32, numhidden_decoder=32)
    _fit(jvae, imstack)
    z_mean, z_logsd, alphas = jvae.encode(imstack[:4])
    assert z_mean.shape == (4, 2)
    assert alphas.shape == (4, 3)
    trav = jvae.manifold_traversal(0, d=6, plot=False)
    assert trav.ndim == 2


def test_jrvae_runs(imstack):
    jrvae = jrVAE((16, 16), latent_dim=2, discrete_dim=[3],
                  numhidden_encoder=32, numhidden_decoder=32)
    _fit(jrvae, imstack, rotation_prior=np.pi / 2)
    out = jrvae.encode(imstack[:4])
    assert len(out) == 3


def test_vae_class_conditional(imstack):
    labels = np.random.RandomState(1).randint(0, 3, len(imstack))
    vae = VAE((16, 16), latent_dim=2, nb_classes=3,
              numhidden_encoder=32, numhidden_decoder=32)
    vae.fit(imstack, labels, training_cycles=2, batch_size=16,
            filename="/tmp/aoi_cvae_t", verbose=False)
    dec = vae.decode(np.zeros((1, 2)), y=1)
    assert dec.shape == (1, 16, 16)


def test_vae_manifold2d(imstack):
    vae = VAE((16, 16), latent_dim=2, numhidden_encoder=16,
              numhidden_decoder=16)
    _fit(vae, imstack)
    fig = vae.manifold2d(d=4)
    assert fig.shape == (64, 64)


def test_vae_reconstruct(imstack):
    vae = VAE((16, 16), latent_dim=2, numhidden_encoder=16,
              numhidden_decoder=16)
    _fit(vae, imstack)
    rec = vae.reconstruct(imstack[:1], num_samples=5)
    assert rec.shape == (5, 16, 16)


def test_vae_elbo_improves(imstack):
    vae = VAE((16, 16), latent_dim=2, numhidden_encoder=64,
              numhidden_decoder=64)
    vae.fit(imstack, training_cycles=12, batch_size=16,
            filename="/tmp/aoi_vae_imp", verbose=False)
    hist = vae.loss_history["train_loss"]
    assert hist[-1] > hist[0]  # ELBO increases


def test_vae_input_validation():
    vae = VAE((16, 16), latent_dim=2)
    X_bad = np.random.rand(8, 12, 12).astype(np.float32)
    with pytest.raises(RuntimeError):
        vae.fit(X_bad, training_cycles=1)


def test_vae_in_dim_required():
    with pytest.raises(AssertionError):
        VAE(None)
    with pytest.raises(AssertionError):
        VAE(28)


@pytest.mark.parametrize("cls", [VAE, rVAE])
def test_vae_seed_plumbed(imstack, cls):
    """The ``seed`` kwarg must actually reach the trainer RNG: different
    seeds give different trained losses, the same seed reproduces
    exactly (round-5 regression — all four DGM subclasses silently
    dropped ``seed`` before forwarding to BaseVAE)."""
    losses = []
    for seed in (0, 1, 0):
        m = cls((16, 16), latent_dim=2, seed=seed)
        _fit(m, imstack)
        losses.append(float(m.loss_history["train_loss"][-1]))
    assert losses[0] != losses[1]
    assert losses[0] == losses[2]
