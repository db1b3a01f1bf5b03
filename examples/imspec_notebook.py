"""Port of the reference `ImSpec.ipynb` notebook
(`/root/reference/examples/notebooks/ImSpec.ipynb`) against synthetic
data: im2spec — predicting a local property (spectrum) from local
structure (subimage).

The notebook's arc (run twice upstream, on SPM BEPS and STEM EELS data):
1. load paired (sub)images and spectra,
2. visual sanity check of a few pairs,
3. train/test split (``aoi.utils.data_split``),
4. initialize + train an ImSpec model (latent_dim=10, 300-ish cycles),
5. predict spectra for held-out images and compare.

Here the paired data are synthesized: each 16x16 image contains a blob
whose position/width parameterize a peak in a 32-point "spectrum", so the
model has a real structure -> property mapping to learn.

Run:  python examples/imspec_notebook.py        (CI-light)
      IMSPEC_FULL=1 python examples/imspec_notebook.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import atomai_tpu as aoi  # noqa: E402

FULL = bool(int(os.environ.get("IMSPEC_FULL", "0")))
# CI smoke tier: minimal cycles/samples, runnability only
SMOKE = bool(int(os.environ.get("AOI_SMOKE", "0")))
CYCLES = 300 if FULL else (5 if SMOKE else 30)
N = 1024 if FULL else (128 if SMOKE else 256)
IN_DIM = (16, 16)
OUT_DIM = (32,)


def make_paired_data(n, seed=0):
    """(image, spectrum) pairs: blob position x -> peak center, blob
    width -> peak width."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[:IN_DIM[0], :IN_DIM[1]]
    e = np.linspace(0, 1, OUT_DIM[0])
    pos = rng.uniform(4, 12, size=(n, 2))
    width = rng.uniform(1.2, 3.0, size=n)
    imgs = np.exp(-((yy - pos[:, 0, None, None]) ** 2 +
                    (xx - pos[:, 1, None, None]) ** 2) /
                  (2 * width[:, None, None] ** 2))
    imgs += 0.05 * rng.randn(*imgs.shape)
    centers = pos[:, 1] / IN_DIM[1]
    widths = width / 20.0
    spectra = np.exp(-0.5 * ((e[None] - centers[:, None]) /
                             widths[:, None]) ** 2)
    spectra += 0.02 * rng.randn(*spectra.shape)
    return imgs.astype(np.float32), spectra.astype(np.float32)


def main():
    # -- 1-2. paired data + sanity check -------------------------------
    imgs, spectra = make_paired_data(N)
    k = 5
    print("pair %d: image %s peak-at-col %.1f -> spectrum argmax %d/%d"
          % (k, imgs[k].shape, np.unravel_index(imgs[k].argmax(),
                                                IN_DIM)[1],
             spectra[k].argmax(), OUT_DIM[0]))

    # -- 3. train/test split -------------------------------------------
    imgs_train, spectra_train, imgs_test, spectra_test = \
        aoi.utils.data_split(imgs, spectra, test_size=0.15,
                             random_state=1)

    # -- 4. initialize + train (notebook: latent_dim=10, lr 1e-4 Adam) -
    model = aoi.models.ImSpec(IN_DIM, OUT_DIM, latent_dim=10,
                              nblayers_encoder=1 if SMOKE else 2,
                              nblayers_decoder=2 if SMOKE else 3)
    model.fit(imgs_train, spectra_train, imgs_test, spectra_test,
              full_epoch=True, training_cycles=CYCLES, batch_size=64,
              filename="/tmp/nb_imspec")

    # -- 5. predict on held-out images ---------------------------------
    prediction = model.predict(imgs_test, norm=False)
    assert prediction.shape == (len(imgs_test),) + OUT_DIM
    # the learned mapping must track the structural parameter: predicted
    # peak centers correlate with the true ones
    corr = np.corrcoef(prediction.argmax(-1),
                       spectra_test.argmax(-1))[0, 1]
    print("predicted spectra:", prediction.shape,
          "| peak-position correlation: %.3f" % corr)


if __name__ == "__main__":
    main()
