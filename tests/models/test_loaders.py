"""Serialization round trips for all model types (reference model:
`test/models/test_loaders.py:63-90`)."""

import jax
import numpy as np
import pytest

from atomai_tpu.models import (VAE, rVAE, jVAE, jrVAE,
                               DenoisingAutoencoder, load_ensemble,
                               load_model)
from atomai_tpu.trainers import EnsembleTrainer


def _params_equal(p1, p2):
    l1, l2 = jax.tree.leaves(p1), jax.tree.leaves(p2)
    return all(np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(l1, l2))


@pytest.fixture(scope="module")
def imstack():
    return np.random.RandomState(0).rand(32, 16, 16).astype(np.float32)


@pytest.mark.parametrize("cls,kw", [
    (VAE, {}),
    (rVAE, {}),
    (jVAE, {"discrete_dim": [3]}),
])
def test_vae_save_load_roundtrip(cls, kw, imstack, tmp_path):
    vae = cls((16, 16), latent_dim=2, numhidden_encoder=16,
              numhidden_decoder=16, **kw)
    vae.fit(imstack, training_cycles=2, batch_size=16, verbose=False,
            filename=str(tmp_path / "vae"))
    path = vae.save_model(str(tmp_path / "vae_saved"))
    loaded = load_model(path)
    assert type(loaded).__name__ == cls.__name__
    assert _params_equal(vae.params, loaded.params)
    z = loaded.encode(imstack[:4])
    assert z[0].shape[0] == 4


@pytest.mark.parametrize("cls,kw", [
    (rVAE, {"translation": False}),
    (jrVAE, {"translation": False, "discrete_dim": [3]}),
    (jrVAE, {"translation": True, "discrete_dim": [3], "nb_classes": 2}),
])
def test_rvae_load_restores_coord_and_classes(cls, kw, imstack, tmp_path):
    """load_model must rebuild r-variants with the stored 'coord'
    (translation) and nb_classes; a mismatch silently corrupts the
    phi/dx/z latent split (reference parity: `loaders.py:67-148`)."""
    vae = cls((16, 16), latent_dim=2, numhidden_encoder=16,
              numhidden_decoder=16, **kw)
    y = (np.arange(32) % 2 if kw.get("nb_classes") else None)
    vae.fit(imstack, y, training_cycles=2, batch_size=16, verbose=False,
            filename=str(tmp_path / "rv"))
    path = vae.save_model(str(tmp_path / "rv_saved"))
    loaded = load_model(path)
    assert loaded.translation == vae.translation
    assert loaded.coord == vae.coord
    assert loaded.nb_classes == vae.nb_classes
    z1, z2 = vae.encode(imstack[:4]), loaded.encode(imstack[:4])
    for a, b in zip(z1, z2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_denoiser_save_load(imstack, tmp_path):
    den = DenoisingAutoencoder(encoder_filters=[4, 8],
                               decoder_filters=[8, 4],
                               encoder_layers=[1, 1],
                               decoder_layers=[1, 1])
    den.fit(imstack, imstack, training_cycles=2, batch_size=8,
            print_loss=2, filename=str(tmp_path / "den"))
    path = den.save_model(str(tmp_path / "den_saved"))
    loaded = load_model(path)
    out = loaded.predict(imstack[:2])
    assert out.shape == (2, 16, 16)


def test_ensemble_save_load(tmp_path):
    from atomai_tpu.utils import make_lattice_stack
    imgs, masks, _ = make_lattice_stack(8, 32, 10, seed=1)
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=4, batch_size=4,
                                filename=str(tmp_path / "ens"))
    _, ensemble = et.train_ensemble_from_scratch(imgs, masks, n_models=2)
    path = str(tmp_path / "ens") + "_ensemble_metadict"
    smodel, loaded_ens = load_ensemble(path)
    assert len(loaded_ens) == 2
    # members are full-state dicts when BN stats are present, both as
    # trained in memory and as round-tripped from disk
    for i in range(2):
        mem, ld = ensemble[i], loaded_ens[i]
        assert set(mem) == set(ld) == {"params", "batch_stats"}
        assert _params_equal(mem["params"], ld["params"])
        assert _params_equal(mem["batch_stats"], ld["batch_stats"])


def test_denoiser_save_load_nondefault_architecture(imstack, tmp_path):
    """use_batch_norm / upsampling_mode must survive the save/load round
    trip — rebuilding with defaults silently changes the architecture
    (flax apply ignores surplus BN params)."""
    den = DenoisingAutoencoder(encoder_filters=[4, 8],
                               decoder_filters=[8, 4],
                               encoder_layers=[1, 1],
                               decoder_layers=[1, 1],
                               use_batch_norm=True,
                               upsampling_mode="bilinear")
    den.fit(imstack, imstack, training_cycles=2, batch_size=8,
            print_loss=2, filename=str(tmp_path / "dna"))
    path = den.save_model(str(tmp_path / "dna_saved"))
    loaded = load_model(path)
    assert loaded.meta_state_dict["use_batch_norm"] is True
    assert loaded.net.use_batch_norm is True
    assert loaded.net.upsampling_mode == "bilinear"
    np.testing.assert_allclose(loaded.predict(imstack[:2]),
                               den.predict(imstack[:2]), atol=1e-5)


def test_imspec_ensemble_load_nondefault_architecture(tmp_path):
    """load_ensemble must rebuild the imspec skeleton with the STORED
    hyperparameters — defaults mismatch the member param structure."""
    rng = np.random.RandomState(0)
    X = rng.rand(32, 8, 8).astype(np.float32)
    y = rng.rand(32, 6).astype(np.float32)
    et = EnsembleTrainer("imspec", in_dim=(8, 8), out_dim=(6,),
                         latent_dim=2, nblayers_encoder=2,
                         nbfilters_encoder=8, nbfilters_decoder=8,
                         batch_norm=False)
    et.compile_ensemble_trainer(training_cycles=2, batch_size=8,
                                loss="mse",
                                filename=str(tmp_path / "ie"))
    _, ens = et.train_ensemble_from_scratch(X, y, n_models=2)
    (net, _), loaded = load_ensemble(str(tmp_path / "ie") +
                                     "_ensemble_metadict")
    # the rebuilt skeleton must accept the loaded member params
    member = loaded[0]["params"] if "params" in loaded[0] else loaded[0]
    out = net.apply({"params": member}, np.zeros((1, 8, 8), np.float32),
                    False)
    assert np.asarray(out).shape == (1, 6)


def test_denoiser_2d_input_gets_batch_axis():
    """A single 2D image must stage as (1, H, W, 1), not as H one-row
    pseudo-samples."""
    from atomai_tpu.models.denoiser import preprocess_denoiser_data
    img = np.random.RandomState(0).rand(16, 16).astype(np.float32)
    X, y, Xt, yt = preprocess_denoiser_data(img, img, img, img)
    assert X.shape == (1, 16, 16, 1) and yt.shape == (1, 16, 16, 1)


def test_vae_num_iter_restored_on_load(tmp_path):
    """The capacity/temperature-annealing iteration counter must survive
    the save/load round trip so continued training anneals from where
    the fit stopped (reference `test_loaders.py:162-169`)."""
    from atomai_tpu.models import jVAE

    X = np.random.RandomState(0).rand(16, 8, 8).astype(np.float32)
    m = jVAE((8, 8), latent_dim=2, discrete_dim=[2],
             numlayers_encoder=1, numhidden_encoder=8,
             numlayers_decoder=1, numhidden_decoder=8)
    m.fit(X, training_cycles=2, batch_size=8,
          filename=str(tmp_path / "jvi"))
    assert m.num_iter > 0
    loaded = load_model(str(tmp_path / "jvi") + ".aoi")
    assert loaded.num_iter == m.num_iter
    assert loaded.metadict["num_iter"] == m.metadict["num_iter"]
