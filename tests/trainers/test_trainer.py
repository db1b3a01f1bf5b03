"""Trainer engine tests (reference model: determinism + training contracts,
`/root/reference/test/trainers/test_trainer.py:77-183`)."""

import jax
import numpy as np
import pytest

from atomai_tpu.models import Segmentor
from atomai_tpu.trainers import SegTrainer


def _data(seed=1, n=8, size=32):
    rng = np.random.RandomState(seed)
    X = rng.rand(n, size, size).astype(np.float32)
    y = (rng.rand(n, size, size) > 0.5).astype(np.float32)
    return X, y, X.copy(), y.copy()


def _params_equal(p1, p2):
    l1 = jax.tree.leaves(p1)
    l2 = jax.tree.leaves(p2)
    return all(np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(l1, l2))


def test_determinism_same_seed():
    """Same seed -> identical final losses and parameters
    (reference `test_trainer.py:77-95`)."""
    X, y, Xt, yt = _data()
    results = []
    for _ in range(2):
        t = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1], seed=7)
        t.fit(X, y, Xt, yt, training_cycles=6, batch_size=4,
              print_loss=6, filename="/tmp/aoi_det")
        results.append((t.loss_acc["train_loss"][-1], t.params))
    assert results[0][0] == pytest.approx(results[1][0], abs=1e-6)
    assert _params_equal(results[0][1], results[1][1])


def test_different_seed_differs():
    X, y, Xt, yt = _data()
    finals = []
    for seed in (1, 2):
        t = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1],
                      seed=seed)
        t.fit(X, y, Xt, yt, training_cycles=6, batch_size=4,
              print_loss=6, filename="/tmp/aoi_det2")
        finals.append(t.params)
    assert not _params_equal(finals[0], finals[1])


def test_loss_decreases():
    X, y, _, _ = _data(n=16)
    # learnable target: masks correlated with images
    y = (X > 0.5).astype(np.float32)
    t = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    t.fit(X, y, training_cycles=60, batch_size=8, print_loss=30,
          filename="/tmp/aoi_lossdec")
    losses = t.loss_acc["train_loss"]
    assert losses[-1] < losses[0]


def test_full_epoch_mode():
    X, y, Xt, yt = _data(n=8)
    t = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    t.fit(X, y, Xt, yt, training_cycles=3, batch_size=4, full_epoch=True,
          print_loss=1, filename="/tmp/aoi_fullep")
    assert len(t.loss_acc["train_loss"]) == 3


def test_swa_changes_weights():
    X, y, Xt, yt = _data(n=8)
    t1 = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1], seed=3)
    t1.fit(X, y, Xt, yt, training_cycles=8, batch_size=4, swa=False,
           print_loss=8, filename="/tmp/aoi_noswa")
    t2 = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1], seed=3)
    t2.fit(X, y, Xt, yt, training_cycles=8, batch_size=4, swa=True,
           print_loss=8, filename="/tmp/aoi_swa")
    assert not _params_equal(t1.params, t2.params)


def test_perturb_weights_requires_no_bn():
    X, y, Xt, yt = _data()
    t = Segmentor("Unet", 1, nb_filters=4, batch_norm=True)
    with pytest.raises(AssertionError):
        t.fit(X, y, Xt, yt, training_cycles=2, batch_size=4,
              perturb_weights=True, filename="/tmp/aoi_pw")


def test_perturb_weights_runs_without_bn():
    X, y, Xt, yt = _data()
    t = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1],
                  batch_norm=False)
    t.fit(X, y, Xt, yt, training_cycles=4, batch_size=4,
          perturb_weights={"a": .01, "gamma": 1.5, "e_p": 2},
          print_loss=4, filename="/tmp/aoi_pw2")
    assert len(t.loss_acc["train_loss"]) == 4


def test_lr_scheduler():
    X, y, Xt, yt = _data()
    t = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    t.fit(X, y, Xt, yt, training_cycles=4, batch_size=4,
          lr_scheduler=[1e-3, 1e-4], print_loss=4,
          filename="/tmp/aoi_lrs")
    assert len(t.loss_acc["train_loss"]) == 4


def test_multiclass_training():
    rng = np.random.RandomState(0)
    X = rng.rand(8, 32, 32).astype(np.float32)
    y = rng.randint(0, 3, (8, 32, 32)).astype(np.int64)
    t = Segmentor("Unet", 3, nb_filters=4, layers=[1, 1, 1, 1])
    t.fit(X, y, training_cycles=4, batch_size=4, compute_accuracy=True,
          print_loss=4, filename="/tmp/aoi_mc")
    assert len(t.loss_acc["train_accuracy"]) == 4


def test_nb_classes_mismatch_raises():
    X, y, Xt, yt = _data()
    t = Segmentor("Unet", 3, nb_filters=4)
    with pytest.raises(AssertionError):
        t.fit(X, y, Xt, yt, training_cycles=2, batch_size=4,
              filename="/tmp/aoi_mm")


def test_mesh_false_persists_across_fits(monkeypatch):
    """An explicit mesh=False opt-out must survive later fit() calls on
    the same model that omit the kwarg — None conflating 'unset' and
    'disabled' silently re-enabled auto-DP mid-workflow."""
    # auto-mesh must be live or the 'second fit forgot the opt-out'
    # failure mode this test pins could never manifest
    monkeypatch.setenv("AOI_AUTO_MESH", "1")
    X, y, Xt, yt = _data()
    m = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1], seed=1)
    m.fit(X, y, Xt, yt, training_cycles=2, batch_size=4, print_loss=2,
          filename="/tmp/aoi_meshpersist", mesh=False)
    assert m.mesh is None and m._mesh_pref is False
    m.fit(X, y, Xt, yt, training_cycles=2, batch_size=4, print_loss=2,
          filename="/tmp/aoi_meshpersist")        # no mesh kwarg
    assert m.mesh is None, "mesh=False was forgotten by the second fit"
    # VAE engine: same contract
    from atomai_tpu.models import rVAE
    Xv = np.random.RandomState(0).rand(32, 8, 8).astype(np.float32)
    v = rVAE((8, 8), latent_dim=2, numlayers_encoder=1,
             numhidden_encoder=8, numlayers_decoder=1,
             numhidden_decoder=8)
    v.fit(Xv, training_cycles=1, batch_size=16, mesh=False,
          filename="/tmp/aoi_meshpersist_v")
    assert v.mesh is None and v._mesh_pref is False
    v.fit(Xv, training_cycles=1, batch_size=16,
          filename="/tmp/aoi_meshpersist_v")
    assert v.mesh is None, "VAE engine forgot mesh=False"


class TestEngineParity:
    """The scan-over-cycles engine (accelerator path) and the jitted
    python-loop engine (XLA:CPU path) must produce identical training
    trajectories — otherwise only the loop path would be CI-tested while
    only the scan path is benchmarked."""

    @pytest.mark.parametrize("full_epoch", [False, True])
    def test_scan_vs_loop_engine(self, full_epoch):
        X, y, Xt, yt = _data()
        histories, final = [], []
        for engine in ("loop", "scan"):
            t = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1],
                          seed=7)
            t.engine = engine
            # mesh=False: this test pins BITWISE scan/loop parity, which
            # holds per compiled program; the auto-DP mesh gives the two
            # engines different cross-device reduction orders (sharded
            # parity is asserted with tolerance in test_multidevice.py)
            t.fit(X, y, Xt, yt, training_cycles=6, batch_size=4,
                  full_epoch=full_epoch, swa=True, print_loss=3,
                  filename="/tmp/aoi_engpar", mesh=False)
            histories.append(np.asarray(t.loss_acc["train_loss"]))
            final.append(t.params)
        np.testing.assert_allclose(histories[0], histories[1],
                                   rtol=1e-5, atol=1e-6)
        assert _params_equal(final[0], final[1])

    def test_ensemble_scan_vs_loop_engine(self):
        from atomai_tpu.trainers import EnsembleTrainer
        X, y, Xt, yt = _data()
        losses = []
        for engine in ("loop", "scan"):
            et = EnsembleTrainer("Unet", nb_classes=1)
            et.engine = engine
            et.compile_ensemble_trainer(
                training_cycles=4, batch_size=4, nb_filters=4,
                layers=[1, 1, 1, 1], filename="/tmp/aoi_engpar_e",
                swa=True, seed=3)
            et.train_ensemble_from_scratch(X, y, Xt, yt, n_models=2)
            losses.append(np.asarray(et.loss_acc["train_loss"]))
        # loop and scan are DIFFERENT compiled programs: XLA fuses their
        # bodies differently, so single-device f32 trajectories drift by
        # O(1e-6)/cycle rounding noise (an engine bug shows as O(1e-2)+
        # or shape divergence). Measured relative drift (2026-08-19,
        # virtual CPU, 4 cycles x 2 members): [0, 0, 4.6e-6, 2.0e-5] —
        # cycle 0 bitwise-equal, last cycle 2.0e-5; rtol 1e-4 gives
        # ~5x headroom over the measured worst case.
        np.testing.assert_allclose(losses[0], losses[1],
                                   rtol=1e-4, atol=1e-6)
        # cycle 0 has accumulated no drift: both engines start from the
        # identical state, so the first loss must match far tighter —
        # this keeps the loose rtol from masking a real engine change
        np.testing.assert_allclose(losses[0][0], losses[1][0],
                                   rtol=1e-6, atol=1e-7)


def test_full_epoch_bytes_accounting():
    """Full-epoch per-cycle bytes rebuild from standalone batch-step
    probes (train*nb_tr + eval*nb_ts) — the chunk's own cost analysis
    counts each scan body once and must NOT be scaled by the combined
    trip count (that conflates train and eval body bytes)."""
    X, y, Xt, yt = _data(n=16)
    t = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1])
    t.engine = "scan"
    t.fit(X, y, Xt, yt, training_cycles=2, batch_size=4, full_epoch=True,
          print_loss=1, filename="/tmp/aoi_bytes_fe")
    b = t.train_bytes_per_cycle()
    assert b is not None and b > 0
    # 4 train + 4 eval batches: the per-cycle figure must exceed one
    # train batch's bytes by more than the eval-conflation would allow
    from atomai_tpu.core.profiling import compiled_bytes_accessed
    import jax
    tr_fn, ev_fn = t._probe_batch_steps
    tb = compiled_bytes_accessed(
        jax.jit(tr_fn), (t.params, t.batch_stats, t.opt_state),
        t.Xb_train[0], t.yb_train[0], jax.random.key(0))
    eb = compiled_bytes_accessed(
        jax.jit(ev_fn), t.params, t.batch_stats, t.Xb_test[0],
        t.yb_test[0], jax.random.key(0))
    nb_tr, nb_ts = t.Xb_train.shape[0], t.Xb_test.shape[0]
    assert b == tb * nb_tr + eb * nb_ts
    # eval (forward-only) must cost fewer bytes than a train step —
    # the property the old (tb+eb)*(nb_tr+nb_ts) scaling violated
    assert eb < tb


class TestRemat:
    """remat=True (jax.checkpoint over the forward) must reproduce the
    non-remat training trajectory exactly — rematerialization changes
    memory use, never values."""

    def test_remat_trajectory_parity(self):
        X, y, Xt, yt = _data()
        histories, finals = [], []
        for remat in (False, True):
            t = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1],
                          seed=7)
            t.fit(X, y, Xt, yt, training_cycles=6, batch_size=4,
                  print_loss=6, filename="/tmp/aoi_remat", mesh=False,
                  remat=remat)
            histories.append(np.asarray(t.loss_acc["train_loss"]))
            finals.append(t.params)
        np.testing.assert_allclose(histories[0], histories[1],
                                   rtol=1e-6, atol=1e-7)
        assert _params_equal(finals[0], finals[1])

    def test_remat_vae(self):
        from atomai_tpu.models import rVAE
        rng = np.random.RandomState(3)
        Xv = rng.rand(32, 16, 16).astype(np.float32)
        elbos = []
        for remat in (False, True):
            v = rVAE((16, 16), latent_dim=2, seed=5,
                     numlayers_encoder=1, numhidden_encoder=16,
                     numlayers_decoder=1, numhidden_decoder=16)
            v.fit(Xv, training_cycles=2, batch_size=16, mesh=False,
                  remat=remat)
            elbos.append(np.asarray(v.loss_history["train_loss"]))
        np.testing.assert_allclose(elbos[0], elbos[1], rtol=1e-5,
                                   atol=1e-6)


def test_set_data_invalidates_compiled_cycle():
    """Re-staging data after a fit must rebuild the compiled cycle —
    the scanned engine closes over the staged batches, so a cached
    chunk would silently keep training on the OLD data."""
    from atomai_tpu.trainers import SegTrainer

    X, y, Xt, yt = _data(seed=1)
    t = SegTrainer("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1], seed=1)
    t.compile_trainer((X, y, Xt, yt), training_cycles=2, batch_size=4,
                      print_loss=2, filename="/tmp/aoi_setdata",
                      mesh=False)
    t.run()
    assert t._compiled_chunk is not None
    X2 = np.zeros_like(X)           # loss on all-zero images is distinct
    t.set_data(X2, y, X2.copy(), yt)
    assert t._compiled_chunk is None, \
        "stale compiled cycle survived set_data"


def test_constructor_batch_seed_changes_schedule():
    """SegTrainer(batch_seed=...) must control the shuffled batch order;
    it was previously stored but never read."""
    from atomai_tpu.trainers import SegTrainer

    X, y, Xt, yt = _data(seed=1, n=16)
    scheds = []
    for bseed in (1, 7):
        t = SegTrainer("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1],
                       seed=1, batch_seed=bseed)
        t.compile_trainer((X, y, Xt, yt), training_cycles=8,
                          batch_size=4, print_loss=8,
                          filename="/tmp/aoi_bseed", mesh=False)
        scheds.append(np.asarray(t.batch_idx_train))
    assert not np.array_equal(scheds[0], scheds[1]), \
        "constructor batch_seed did not change the batch schedule"


def test_test_loss_measured_on_clean_data():
    """Per-cycle test metrics must be computed on UNaugmented test
    batches: with a destructive augment_fn the recorded test loss must
    equal a manual clean-data evaluation with the final params."""
    import jax.numpy as jnp

    X, y, Xt, yt = _data(seed=2, n=8)
    m = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1], seed=1)

    def nuke(images, targets):    # destroys inputs if applied at eval
        return jnp.zeros_like(images), targets

    m.fit(X, y, Xt, yt, training_cycles=3, batch_size=8, print_loss=3,
          filename="/tmp/aoi_cleaneval", mesh=False, swa=False,
          custom_transform=nuke)
    t = m  # Segmentor IS the trainer
    out = t.net.apply(
        {"params": t.params, **({"batch_stats": t.batch_stats}
                                if t.batch_stats is not None else {})},
        t.Xb_test[0], False)
    clean_loss = float(t.criterion(out, t.yb_test[0]))
    recorded = float(np.asarray(t.loss_acc["test_loss"])[-1])
    np.testing.assert_allclose(recorded, clean_loss, rtol=1e-4)


def test_metrics_log_jsonl(tmp_path):
    """fit(metrics_log=path) streams one JSON object per cycle with
    train/test losses (and accuracies when computed) — machine-readable
    observability beyond the reference's prints."""
    import json

    X, y, Xt, yt = _data()
    path = str(tmp_path / "run.jsonl")
    m = Segmentor("Unet", 1, nb_filters=4, layers=[1, 1, 1, 1], seed=1)
    m.fit(X, y, Xt, yt, training_cycles=5, batch_size=4, print_loss=2,
          filename=str(tmp_path / "mlog"), mesh=False,
          compute_accuracy=True, metrics_log=path)
    recs = [json.loads(line) for line in open(path)]
    assert [r["cycle"] for r in recs] == list(range(5))
    assert all({"wall_s", "train_loss", "test_loss",
                "train_accuracy"} <= set(r) for r in recs)
    np.testing.assert_allclose([r["train_loss"] for r in recs],
                               np.asarray(m.loss_acc["train_loss"]),
                               rtol=1e-6)
    # VAE engine: per-epoch ELBO stream through the same kwarg
    from atomai_tpu.models import VAE
    Xv = np.random.RandomState(0).rand(32, 8, 8).astype(np.float32)
    vpath = str(tmp_path / "vae.jsonl")
    v = VAE((8, 8), latent_dim=2, numlayers_encoder=1,
            numhidden_encoder=8, numlayers_decoder=1, numhidden_decoder=8)
    v.fit(Xv, training_cycles=2, batch_size=16, mesh=False,
          filename=str(tmp_path / "vml"), metrics_log=vpath)
    vrecs = [json.loads(line) for line in open(vpath)]
    assert len(vrecs) == 2 and "train_elbo" in vrecs[0]
