"""Port of the reference `rVAE_graphene.ipynb` notebook
(`/root/reference/examples/notebooks/rVAE_graphene.ipynb`) against
synthetic data: exploring order parameters in a (synthetic) graphene movie
via classical multivariate analysis (GMM), a standard VAE, and a
rotationally-invariant rVAE.

The notebook's arc:
1. load a STEM movie + its NN segmentation output -> atom coordinates,
2. build a stack of subimage descriptors around each atom (``imlocal``),
3. GMM on the raw stack (fails: rotations dominate the clustering),
4. VAE on the stack -> 2D manifold (rotations still entangle content),
5. rVAE -> rotation lands in a dedicated latent; content disentangles,
6. encode the whole movie and inspect latent distributions/trajectories.

Run:  python examples/rvae_graphene_notebook.py        (CI-light)
      RVAE_FULL=1 python examples/rvae_graphene_notebook.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import atomai_tpu as aoi  # noqa: E402

FULL = bool(int(os.environ.get("RVAE_FULL", "0")))
# CI smoke tier: minimal frames/cycles, runnability only
SMOKE = bool(int(os.environ.get("AOI_SMOKE", "0")))
CYCLES = 100 if FULL else (4 if SMOKE else 20)
N_FRAMES = 8 if FULL else (2 if SMOKE else 4)
# smoke also shrinks the nets (single-core CI compile time)
NET_KW = dict(numlayers_encoder=1, numhidden_encoder=64,
              numlayers_decoder=1, numhidden_decoder=64) if SMOKE else {}


def main():
    # -- 1. "experimental" movie + NN output ---------------------------
    # synthetic stand-in for 3DStack13-1-exp.npy: a drifting lattice
    # movie with known ground-truth masks (the notebook's segmented NN
    # output) and coordinates
    images, masks, coords = aoi.utils.make_lattice_stack(
        n_images=N_FRAMES, size=160, spacing=14, seed=1)
    nn_output = masks[..., None].astype(np.float32)
    coordinates = aoi.predictors.Locator(threshold=0.5).run(nn_output)
    print("frames:", images.shape, "| atoms in frame 0:",
          len(coordinates[0]))

    # -- 2. subimage descriptors around every atom (imlocal) -----------
    window_size = 24
    s = aoi.stat.imlocal(nn_output, coordinates,
                         window_size=window_size, coord_class=0)
    print("descriptor stack:", s.imgstack.shape)

    # -- 3. GMM on the raw stack (the notebook shows this fails to find
    #       chemically meaningful classes because of rotational variance)
    gmm_components, _, com_frames = s.gmm(n_components=4,
                                          random_state=42)
    gmm_classes = com_frames[:, -2].astype(int)   # 1-based class labels
    print("GMM components:", gmm_components.shape,
          "| class counts:", np.bincount(gmm_classes)[1:])

    # -- 4. standard VAE ----------------------------------------------
    imstack = s.imgstack[..., 0]
    vae = aoi.models.VAE((window_size, window_size), latent_dim=2,
                         **NET_KW)
    vae.fit(imstack, training_cycles=CYCLES, batch_size=64,
            filename="/tmp/nb_vae")
    vae_manifold = vae.manifold2d(d=6)
    print("VAE manifold:", vae_manifold.shape)

    # -- 5. rVAE: rotation becomes latent 0, translations 1-2 ----------
    rvae = aoi.models.rVAE((window_size, window_size), latent_dim=2,
                           **NET_KW)
    rvae.fit(imstack, training_cycles=CYCLES, batch_size=64,
             rotation_prior=np.pi / 3, translation_prior=0.1,
             filename="/tmp/nb_rvae")
    rvae_manifold = rvae.manifold2d(d=6)
    print("rVAE manifold:", rvae_manifold.shape)

    # -- 6. encode the whole movie --------------------------------------
    z_mean, z_sd = rvae.encode(imstack)
    angles, shifts, content = z_mean[:, 0], z_mean[:, 1:3], z_mean[:, 3:]
    print("encoded:", z_mean.shape,
          "| angle spread: %.3f rad" % np.std(angles),
          "| content latent spread:", np.std(content, 0).round(3))

    # latent trajectories of tracked atoms across frames (notebook's
    # final analysis: map encoded values back onto the movie)
    trajectories = rvae.encode_trajectories(
        nn_output, coordinates, window_size=window_size,
        min_length=N_FRAMES // 2, rmax=10)[0]
    print("encoded trajectories:", len(trajectories))


if __name__ == "__main__":
    main()
