"""Segmentor model end-to-end + serialization round trip (reference:
`test/models/test_loaders.py:63-90`)."""

import os

import jax
import numpy as np

from atomai_tpu.models import Segmentor, load_model


def test_fit_predict_roundtrip(tmp_path, lattice_data):
    imgs, masks, _ = lattice_data
    model = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    model.fit(imgs, masks, training_cycles=10, batch_size=4,
              print_loss=10, filename=str(tmp_path / "m"))
    out, coords = model.predict(imgs[:2], verbose=False)
    assert out.shape == (2, 64, 64, 1)
    assert isinstance(coords, dict) and 0 in coords and 1 in coords
    assert coords[0].shape[1] == 3


def test_save_load_parity(tmp_path, lattice_data):
    imgs, masks, _ = lattice_data
    model = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    model.fit(imgs, masks, training_cycles=4, batch_size=4,
              print_loss=4, filename=str(tmp_path / "m2"))
    path = model.save_model(str(tmp_path / "saved"))
    loaded = load_model(path)
    l1 = jax.tree.leaves(model.params)
    l2 = jax.tree.leaves(loaded.params)
    assert all(np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(l1, l2))
    # loaded model can predict
    out = loaded.predict(imgs[:1], compute_coords=False, verbose=False)
    assert out.shape == (1, 64, 64, 1)


def test_predict_pads_irregular_size():
    rng = np.random.RandomState(0)
    model = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    X = rng.rand(8, 40, 40).astype(np.float32)  # not divisible by 8
    y = (rng.rand(8, 40, 40) > .5).astype(np.float32)
    model.fit(X, y, training_cycles=2, batch_size=4, print_loss=2,
              filename="/tmp/aoi_pad")
    img = rng.rand(1, 40, 40).astype(np.float32)
    out = model.predict(img, compute_coords=False, verbose=False)
    assert out.shape[1] % 8 == 0 and out.shape[2] % 8 == 0
