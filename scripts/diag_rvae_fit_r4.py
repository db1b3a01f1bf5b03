"""Times the PRODUCTION rVAE fit path (verbose off, per-epoch async
saves) after the round-4 lazy-epoch change."""
import time

import numpy as np

import atomai_tpu as aoi
from atomai_tpu.core.dtypes import enable_compilation_cache
from atomai_tpu.utils import extract_patches_2d

enable_compilation_cache("/tmp/atomai_tpu_xla_cache")

patches, _, _ = aoi.utils.make_lattice_stack(
    n_images=2, size=256, spacing=16, seed=3)
P = np.concatenate([extract_patches_2d(p, (32, 32), 512, i)
                    for i, p in enumerate(patches)])
nsteps = len(P) // 128

rvae = aoi.models.rVAE((32, 32), latent_dim=2)
rvae.fit(P, training_cycles=2, batch_size=128, verbose=False,
         filename="/tmp/diag_rvae_fit")  # compile

N_EPOCHS = 20
for rep in range(3):
    t0 = time.time()
    rvae.fit(P, training_cycles=N_EPOCHS, batch_size=128, verbose=False,
             filename="/tmp/diag_rvae_fit")
    t = time.time() - t0
    print(f"fit rep {rep}: {t:.3f}s = {N_EPOCHS * nsteps / t:.1f} steps/s")

# and the bare lazy loop (no saves), the bench-style number
rvae.train_epoch()
t0 = time.time()
for _ in range(N_EPOCHS):
    e = rvae.train_epoch_lazy()
np.asarray(e)
t = time.time() - t0
print(f"lazy loop (no saves): {t:.3f}s = {N_EPOCHS * nsteps / t:.1f} steps/s")
