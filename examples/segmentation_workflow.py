"""End-to-end atom-finding workflow (reference README 'Semantic
segmentation' example): synthetic lattice -> Segmentor.fit with on-device
augmentation + SWA -> predict -> atomic coordinates -> statistics.

Run:  python examples/segmentation_workflow.py
      AOI_SMOKE=1 python examples/segmentation_workflow.py   (CI gate)
"""

import os

import numpy as np

import atomai_tpu as aoi

# CI smoke tier: the default test gate runs every example end-to-end
# with minimal shapes/cycles (runnability, not model quality)
SMOKE = bool(int(os.environ.get("AOI_SMOKE", "0")))
N_IMAGES, SIZE, CYCLES = (8, 64, 20) if SMOKE else (16, 96, 80)
# smoke also shrinks the net: XLA compile time on the single-core CI
# host scales with program size, and the gate checks runnability
NET_KW = dict(nb_filters=8, layers=[1, 1, 1, 1]) if SMOKE else {}


def main():
    # synthetic training data: graphene-like lattices + ground-truth masks
    images, masks, true_coords = aoi.utils.make_lattice_stack(
        n_images=N_IMAGES, size=SIZE, spacing=12, seed=0)

    # train a UNet with stochastic weight averaging and on-device
    # rotation/noise augmentation
    model = aoi.models.Segmentor("Unet", nb_classes=1, **NET_KW)
    model.fit(images, masks,
              training_cycles=CYCLES, batch_size=8, swa=True,
              compute_accuracy=True, print_loss=CYCLES // 2,
              rotation=True, gauss_noise=[10, 40],
              filename="/tmp/example_seg")

    # predict + locate atoms on new data
    nn_output, coordinates = model.predict(images[:4])
    print("NN output:", nn_output.shape)
    print("atoms in frame 0:", len(coordinates[0]))

    # position accuracy vs ground truth
    from scipy.spatial import cKDTree
    d, _ = cKDTree(true_coords[0]).query(coordinates[0][:, :2])
    print("median position error: %.2f px" % np.median(d))

    # refine positions with batched 2D-Gaussian fitting
    refined = aoi.utils.peak_refinement(images[0], coordinates[0], d=6)
    print("refined coordinates:", refined.shape)

    # local-descriptor statistics around the located atoms
    imstack = aoi.stat.imlocal(nn_output, coordinates, window_size=16,
                               coord_class=0)
    components, projections, centers = imstack.pca(3)
    print("PCA components:", components.shape)


if __name__ == "__main__":
    main()
