"""Rotationally-invariant VAE on atomic patches (reference
rVAE_graphene notebook workflow).

Run:  python examples/rvae_workflow.py
      AOI_SMOKE=1 python examples/rvae_workflow.py   (CI gate)
"""

import os

import numpy as np

import atomai_tpu as aoi

# CI smoke tier: minimal frames/cycles, runnability only
SMOKE = bool(int(os.environ.get("AOI_SMOKE", "0")))
N_FRAMES, CYCLES = (2, 5) if SMOKE else (4, 30)
# smoke also shrinks the nets (single-core CI compile time)
NET_KW = dict(numlayers_encoder=1, numhidden_encoder=64,
              numlayers_decoder=1, numhidden_decoder=64) if SMOKE else {}


def main():
    # patches around atoms from a synthetic lattice movie
    images, masks, coords = aoi.utils.make_lattice_stack(
        n_images=N_FRAMES, size=128, spacing=14, seed=1)
    coord_dict = {i: np.concatenate(
        [coords[i], np.zeros((len(coords[i]), 1))], -1)
        for i in range(len(coords))}
    patches, centers, frames = aoi.utils.extract_subimages(
        images[..., None], coord_dict, window_size=24)
    patches = patches[..., 0]
    print("patches:", patches.shape)

    rvae = aoi.models.rVAE((24, 24), latent_dim=2, **NET_KW)
    rvae.fit(patches, training_cycles=CYCLES, batch_size=64,
             rotation_prior=np.pi / 4, filename="/tmp/example_rvae")

    # latent embedding: 1st dim = rotation, 2-3 = translation, rest content
    z_mean, z_sd = rvae.encode(patches)
    print("latent mean:", z_mean.shape, "(angle + dx,dy + content)")

    # learned manifold over the 2 content dimensions
    manifold = rvae.manifold2d(d=6)
    print("manifold image:", manifold.shape)


if __name__ == "__main__":
    main()
