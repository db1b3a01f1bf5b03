"""Round-4 diagnosis: config-A predict regression (0.557 -> 3.113 s).

Times each phase of the bench predict path separately:
preprocess (host+device), compiled forward dispatch, device->host fetch.
"""
import time

import numpy as np

import atomai_tpu as aoi
from atomai_tpu.core.dtypes import enable_compilation_cache

enable_compilation_cache("/tmp/atomai_tpu_xla_cache")

N_IMG, SIZE = 64, 256
imgs, masks, _ = aoi.utils.make_lattice_stack(
    n_images=N_IMG, size=SIZE, spacing=16, seed=0)

m = aoi.models.Segmentor("Unet", nb_classes=1)
m.fit(imgs, masks, training_cycles=3, batch_size=32,
      print_loss=3, filename="/tmp/diag_model")

# mimic bench.py exactly: warmup on 32 imgs num_batches=1, timed on 64 n=2
_ = m.predict(imgs[:N_IMG // 2], compute_coords=False, verbose=False,
              num_batches=1)

for rep in range(4):
    t0 = time.time()
    out = m.predict(imgs, compute_coords=False, verbose=False,
                    num_batches=2)
    print(f"rep {rep}: full predict {time.time() - t0:.3f}s")

# now phase-by-phase on the predictor object
p = m._build_predictor(verbose=False)
t0 = time.time()
x = p.preprocess(imgs)
x_host = np.asarray(x)  # force
t_pre = time.time() - t0
print(f"preprocess (fetch-forced): {t_pre:.3f}s  shape={x_host.shape}")

# forward per chunk
for nb in (1, 2):
    bs = len(x) // nb
    # warm
    outs = [p.forward_(x[i * bs:(i + 1) * bs]) for i in range(nb)]
    _ = [np.asarray(o) for o in outs]
    t0 = time.time()
    outs = [p.forward_(x[i * bs:(i + 1) * bs]) for i in range(nb)]
    t_disp = time.time() - t0
    t0 = time.time()
    import jax
    res = [np.asarray(f) for f in jax.device_get(outs)]
    t_fetch = time.time() - t0
    print(f"num_batches={nb}: dispatch {t_disp:.3f}s fetch {t_fetch:.3f}s")

# does predict() recompute num_batches / recompile?
t0 = time.time()
out = p.predict(imgs, num_batches=2)
print(f"p.predict(num_batches=2): {time.time() - t0:.3f}s")
t0 = time.time()
out = p.predict(imgs)
print(f"p.predict(auto num_batches): {time.time() - t0:.3f}s")
