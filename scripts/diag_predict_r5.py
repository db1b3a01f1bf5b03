#!/usr/bin/env python
"""Round-5 config-A predict diagnosis: warmed, repeated phase split +
tunnel-weather probe + wire-speed accounting.

Round-4's phase split was timed single-shot and cold (preprocess 2.099 s
+ forward 2.731 s "phases" for a 2.13 s total — VERDICT r4 weak #1).
This script times every phase the same way the timed call is timed:
exact-call warmup, n repeats, median, fetch-forced. It then compares the
measured predict wall against the wire cost implied by the tunnel probe
(bytes_in / h2d + bytes_out / d2h + dispatch RTTs).

Run on the real TPU:  python scripts/diag_predict_r5.py
"""

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_IMG, SIZE = 64, 256
REPEATS = 5


def med_times(fn, n=REPEATS):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return {"n": n, "median": round(statistics.median(ts), 4),
            "times": [round(t, 4) for t in ts]}


def main():
    import jax
    import jax.numpy as jnp
    import atomai_tpu as aoi
    from atomai_tpu.core.dtypes import enable_compilation_cache
    from atomai_tpu.core.profiling import tunnel_probe
    enable_compilation_cache("/tmp/atomai_tpu_xla_cache")

    probe0 = tunnel_probe()
    print("tunnel probe (start):", json.dumps(probe0))

    imgs, masks, _ = aoi.utils.make_lattice_stack(
        n_images=N_IMG, size=SIZE, spacing=16, seed=0)
    m = aoi.models.Segmentor("Unet", nb_classes=1)
    m.fit(imgs, masks, training_cycles=2, batch_size=32,
          print_loss=2, filename="/tmp/diag_r5")

    # --- the timed production call (exact bench protocol) --------------
    def predict_once():
        out = m.predict(imgs, compute_coords=False, verbose=False,
                        num_batches=2)
        assert out.shape == (N_IMG, SIZE, SIZE, 1)

    predict_once()  # warm
    total = med_times(predict_once)
    print("predict total:", json.dumps(total))

    # --- warmed, repeated phase split (same conditions) -----------------
    from atomai_tpu.predictors import SegPredictor
    pp = SegPredictor(m.net, m.params, m.batch_stats, nb_classes=1,
                      verbose=False)

    # phase 1: host-side preprocess (channel fixups, pad) + upload + norm;
    # synchronized with a 1-element fetch (production does NOT fetch the
    # stack back — it stays on device for the forward)
    def phase_pre():
        x = pp.preprocess(imgs)
        np.asarray(x[:1, :1, :1, 0])

    phase_pre()
    pre = med_times(phase_pre)
    print("phase preprocess+upload+norm:", json.dumps(pre))

    # phase 2: forward (2 chunks), 1-element fetch (no output wire cost)
    xdev = pp.preprocess(imgs)

    def phase_fwd():
        f1 = pp.forward_(xdev[:32])
        f2 = pp.forward_(xdev[32:])
        np.asarray(f1[:1, :1, :1, 0])
        np.asarray(f2[:1, :1, :1, 0])

    phase_fwd()
    fwd = med_times(phase_fwd)
    print("phase forward (1-elem fetch):", json.dumps(fwd))

    # phase 3: output fetch alone (full 64x256x256x1 f32 = 16.8 MB)
    f1 = pp.forward_(xdev[:32])
    f2 = pp.forward_(xdev[32:])
    np.asarray(f1[:1, :1, :1, 0]); np.asarray(f2[:1, :1, :1, 0])

    def phase_fetch():
        got = jax.device_get([f1, f2])
        assert got[0].shape[0] == 32

    phase_fetch()
    fetch = med_times(phase_fetch)
    print("phase output fetch:", json.dumps(fetch))

    probe1 = tunnel_probe()
    print("tunnel probe (end):", json.dumps(probe1))

    bytes_in = imgs.nbytes / 2**20
    bytes_out = N_IMG * SIZE * SIZE * 4 / 2**20
    wire_s = (bytes_in / probe1["h2d_mbps"] + bytes_out / probe1["d2h_mbps"]
              + 4 * probe1["rtt_ms"] / 1e3)
    print(json.dumps({
        "wire_accounting": {
            "bytes_in_mb": round(bytes_in, 1),
            "bytes_out_mb": round(bytes_out, 1),
            "expected_wire_s": round(wire_s, 3),
            "measured_total_s": total["median"],
            "sum_of_phases_s": round(
                pre["median"] + fwd["median"] + fetch["median"], 3),
        }}))


if __name__ == "__main__":
    main()
