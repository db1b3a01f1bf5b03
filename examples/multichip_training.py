"""Multi-chip training walkthrough.

The reference is single-device by design
(`/root/reference/atomai/trainers/trainer.py:70-75`); atomai_tpu scales
over a `jax.sharding.Mesh` and does so AUTOMATICALLY — this example shows
what happens by default on a multi-chip host and how to control it.

Runs anywhere: on a single-chip (or CPU) host it provisions a virtual
8-device CPU platform, the same "fake cluster" the test suite and the
driver's multichip dryrun use.

Run:  python examples/multichip_training.py
"""

import os
import sys

# virtual 8-device platform BEFORE jax initializes (no-op on real slices
# with >= 8 chips)
os.environ.setdefault("XLA_FLAGS", "")
if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

# default to the virtual CPU mesh; set MULTICHIP_REAL=1 on a real slice.
# (The platform choice is sticky after the first backend init, so decide
# before touching any device — same logic as __graft_entry__.)
if not os.environ.get("MULTICHIP_REAL"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import atomai_tpu as aoi  # noqa: E402

# CI smoke tier: same sharding paths, minimal work (the gate checks that
# every stage provisions its mesh, not model quality)
SMOKE = bool(int(os.environ.get("AOI_SMOKE", "0")))
N_IMAGES, CYCLES = (8, 3) if SMOKE else (24, 10)


def main():
    print(f"devices: {jax.device_count()}")
    imgs, masks, _ = aoi.utils.make_lattice_stack(N_IMAGES, 64, 12, seed=1)

    # -- 1. data parallelism is the DEFAULT --------------------------------
    # batches shard over the mesh "data" axis (sized to the largest device
    # count dividing the batch); XLA inserts the gradient psum over ICI
    model = aoi.models.Segmentor("Unet", 1, nb_filters=4,
                                 layers=[1, 1, 1, 1])
    model.fit(imgs, masks, training_cycles=CYCLES, batch_size=8,
              print_loss=CYCLES, filename="/tmp/mc_seg")
    print("segmentor batch sharding:",
          model.Xb_train.sharding.spec,
          "over", len(model.Xb_train.sharding.device_set), "devices")
    # opt out with mesh=False, or pass your own jax.sharding.Mesh

    # -- 2. the VAE engine shards the same way -----------------------------
    rvae = aoi.models.rVAE((16, 16), latent_dim=2, numlayers_encoder=1,
                           numhidden_encoder=32, numlayers_decoder=1,
                           numhidden_decoder=32)
    patches = np.random.RandomState(0).rand(64, 16, 16).astype(np.float32)
    rvae.fit(patches, training_cycles=2 if SMOKE else 3, batch_size=16,
             filename="/tmp/mc_rvae")
    print("rVAE mesh:", dict(rvae.mesh.shape) if rvae.mesh else None)

    # -- 3. ensembles shard MEMBERS across chips ---------------------------
    # (the reference trains members sequentially on one device)
    et = aoi.trainers.EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                                      layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=2 if SMOKE else 4,
                                batch_size=4, filename="/tmp/mc_ens")
    et.train_ensemble_from_scratch(imgs, masks, n_models=4)
    leaf = jax.tree.leaves(et.params_stack)[0]
    print("ensemble member placement:",
          len(leaf.sharding.device_set), "devices")

    # -- 4. independent-output DKL-GPs shard over the model axis -----------
    rng = np.random.RandomState(0)
    X = rng.randn(48, 8).astype(np.float32)
    y = rng.randn(8, 48).astype(np.float32)   # 8 outputs -> 8 GPs
    gp = aoi.models.dklGPR(8, embedim=2, shared_embedding_space=False)
    gp.fit(X, y, training_cycles=2 if SMOKE else 3,
           print_loss=3)
    print("DKL model mesh:",
          dict(gp.model_mesh.shape) if gp.model_mesh else None)

    # -- 5. prediction shards the frame axis (tiled inference) -------------
    out = model.predict(imgs, compute_coords=False, verbose=False)
    print("tiled predict output:", out.shape)


if __name__ == "__main__":
    main()
