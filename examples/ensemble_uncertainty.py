"""Deep-ensemble uncertainty workflow (reference README 'Deep ensembles'
example): train N segmentation models SIMULTANEOUSLY (vmapped — the
reference trains them one after another), predict per-pixel mean +
variance, and cluster per-atom position uncertainty.

On a multi-chip TPU slice the ensemble members automatically shard across
devices (the `model` mesh axis); on one chip they still train together in
a single compiled program.

Run:  python examples/ensemble_uncertainty.py        (CI-light)
      ENSEMBLE_FULL=1 python examples/ensemble_uncertainty.py
"""

import os

import numpy as np

import atomai_tpu as aoi

FULL = bool(int(os.environ.get("ENSEMBLE_FULL", "0")))
# CI smoke tier: the default test gate runs every example end-to-end
# with minimal shapes/cycles (runnability, not model quality)
SMOKE = bool(int(os.environ.get("AOI_SMOKE", "0")))
SIZE = 96 if FULL else (32 if SMOKE else 48)
CYCLES = 200 if FULL else (15 if SMOKE else 120)
N_MODELS = 10 if FULL else (2 if SMOKE else 4)
# smoke also shrinks the net (single-core CI compile time)
NET_KW = dict(nb_filters=8, layers=[1, 1, 1, 1]) if SMOKE else {}


def main():
    images, masks, _ = aoi.utils.make_lattice_stack(
        n_images=16, size=SIZE, spacing=12, seed=0)

    # all members train at once: parameters/optimizer states/batch
    # schedules carry a leading member axis inside one jitted scan
    etrainer = aoi.trainers.EnsembleTrainer("Unet", nb_classes=1,
                                            **NET_KW)
    etrainer.compile_ensemble_trainer(
        training_cycles=CYCLES, batch_size=8, swa=True,
        filename="/tmp/example_ens")
    smodel, ensemble = etrainer.train_ensemble_from_scratch(
        images, masks, n_models=N_MODELS,
        augment_fn=aoi.transforms.seg_augmentor(1, rotation=True,
                                                gauss_noise=[10, 40]))

    # one vmapped forward computes every member's prediction; mean and
    # variance reduce on device (members are full state dicts, BN
    # statistics included — nothing extra to thread through)
    predictor = aoi.predictors.EnsemblePredictor(
        smodel, ensemble, nb_classes=1, verbose=0)
    mean, var = predictor.predict(images[:4])
    print("prediction mean:", mean.shape, "variance:", var.shape)
    print("mean pixel uncertainty: %.4f" % float(var.mean()))

    # per-atom positional uncertainty: coordinates from every member,
    # DBSCAN-clustered into position mean + spread
    member_preds = predictor.ensemble_forward(
        predictor.preprocess(images[:1]))
    coord_mean, coord_var = aoi.predictors.ensemble_locate(
        member_preds, threshold=0.5, eps=1.5,
        min_samples=min(N_MODELS, 10))
    print("frame-0 atoms:", len(coord_mean[0]),
          "mean position spread: %.3f px" % float(np.mean(coord_var[0])))


if __name__ == "__main__":
    main()
