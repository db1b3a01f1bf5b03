"""Ensemble trainer/predictor tests (reference model:
`test/trainers/test_etrainer.py`)."""

import jax
import numpy as np
import pytest

from atomai_tpu.predictors import EnsemblePredictor, ensemble_locate
from atomai_tpu.trainers import EnsembleTrainer


@pytest.fixture(scope="module")
def seg_data():
    # enough images that the train split yields multiple batches — the
    # from_baseline strategy differentiates members only through batch
    # order (reference parity, `etrainer.py:217-224`)
    from atomai_tpu.utils import make_lattice_stack
    imgs, masks, _ = make_lattice_stack(n_images=16, size=32, spacing=10,
                                        seed=1)
    return imgs, masks


def _leaves_differ(p1, p2):
    l1, l2 = jax.tree.leaves(p1), jax.tree.leaves(p2)
    return any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(l1, l2))


def test_from_scratch_members_differ(seg_data, tmp_path):
    imgs, masks = seg_data
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=8, batch_size=4,
                                filename=str(tmp_path / "e"))
    _, ensemble = et.train_ensemble_from_scratch(imgs, masks, n_models=3)
    assert len(ensemble) == 3
    assert _leaves_differ(ensemble[0], ensemble[1])
    assert _leaves_differ(ensemble[1], ensemble[2])


def test_from_baseline(seg_data, tmp_path):
    imgs, masks = seg_data
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=6, batch_size=4,
                                print_loss=6,
                                filename=str(tmp_path / "eb"))
    _, ensemble = et.train_ensemble_from_baseline(
        imgs, masks, n_models=3, training_cycles_base=6,
        training_cycles_ensemble=4)
    assert len(ensemble) == 3
    assert _leaves_differ(ensemble[0], ensemble[1])


def test_swag(seg_data, tmp_path):
    imgs, masks = seg_data
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=6, batch_size=4,
                                print_loss=6,
                                filename=str(tmp_path / "es"))
    _, ensemble = et.train_swag(imgs, masks, n_models=4)
    assert len(ensemble) == 4
    assert _leaves_differ(ensemble[0], ensemble[1])


def test_ensemble_predictor(seg_data, tmp_path):
    imgs, masks = seg_data
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=6, batch_size=4,
                                filename=str(tmp_path / "ep"))
    _, ensemble = et.train_ensemble_from_scratch(imgs, masks, n_models=3)
    p = EnsemblePredictor(et.net, ensemble, nb_classes=1,
                          batch_stats=et.ensemble_batch_stats, verbose=0)
    # per-member BatchNorm running statistics must be used (sharing one
    # member's stats corrupts the others' eval-mode forwards)
    assert p.batch_stats_stack is not None
    mean, var = p.predict(imgs[:2], num_batches=1)
    assert mean.shape == (2, 32, 32, 1)
    assert var.shape == (2, 32, 32, 1)
    assert (np.asarray(var) >= 0).all()
    # variance must be nonzero somewhere (members differ)
    assert float(np.max(var)) > 0


def test_ensemble_batch_stats_roundtrip(seg_data, tmp_path):
    """Per-member BN stats survive the metadict save/load and are
    restored as full-state members."""
    from atomai_tpu.models import load_ensemble
    imgs, masks = seg_data
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=4, batch_size=4,
                                filename=str(tmp_path / "rt"))
    et.train_ensemble_from_scratch(imgs, masks, n_models=2)
    assert set(et.ensemble_batch_stats) == {0, 1}
    (net, _), ensemble = load_ensemble(str(tmp_path / "rt") +
                                       "_ensemble_metadict")
    assert "batch_stats" in ensemble[0]
    p = EnsemblePredictor(net, ensemble, nb_classes=1, verbose=0)
    assert p.batch_stats_stack is not None
    mean, var = p.predict(imgs[:1], num_batches=1)
    assert np.isfinite(np.asarray(mean)).all()


def test_full_state_members(seg_data, tmp_path):
    """Trained members come back as full state dicts ({"params",
    "batch_stats"}) so EnsemblePredictor works without manually
    threading BN statistics — for all three strategies."""
    imgs, masks = seg_data
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=4, batch_size=4,
                                filename=str(tmp_path / "fs"))
    _, ensemble = et.train_ensemble_from_scratch(imgs, masks, n_models=2)
    assert set(ensemble[0]) == {"params", "batch_stats"}
    p = EnsemblePredictor(et.net, ensemble, nb_classes=1, verbose=0)
    assert p.batch_stats_stack is not None
    mean, _ = p.predict(imgs[:1], num_batches=1)
    assert np.isfinite(np.asarray(mean)).all()

    et2 = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                          layers=[1, 1, 1, 1])
    et2.compile_ensemble_trainer(training_cycles=4, batch_size=4,
                                 filename=str(tmp_path / "fsw"))
    _, swag_ens = et2.train_swag(imgs, masks, n_models=3)
    assert set(swag_ens[0]) == {"params", "batch_stats"}
    p2 = EnsemblePredictor(et2.net, swag_ens, nb_classes=1, verbose=0)
    assert p2.batch_stats_stack is not None


def test_predictor_member_layout_parity(seg_data, tmp_path):
    """EnsemblePredictor's map and vmap member-forward layouts produce
    the same mean/variance (the map layout is the TPU default, 19%
    faster at config-D inference shapes)."""
    imgs, masks = seg_data
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=4, batch_size=4,
                                filename=str(tmp_path / "pl"))
    _, ensemble = et.train_ensemble_from_scratch(imgs, masks, n_models=3)
    outs = {}
    for layout in ("map", "vmap"):
        p = EnsemblePredictor(et.net, ensemble, nb_classes=1, verbose=0,
                              member_layout=layout)
        outs[layout] = p.predict(imgs[:2], num_batches=1)
    np.testing.assert_allclose(outs["map"][0], outs["vmap"][0], atol=1e-5)
    np.testing.assert_allclose(outs["map"][1], outs["vmap"][1], atol=1e-5)


def test_ensemble_locate_format():
    # synthetic "ensemble" with one blob; needs >= 10 members because
    # cluster_coord uses DBSCAN(min_samples=10) (reference parity,
    # `atomai/utils/coords.py:304-347`)
    pred = np.zeros((12, 1, 32, 32, 1), np.float32)
    pred[:, :, 10:14, 10:14, 0] = 1.0
    cm, cv = ensemble_locate(pred, eps=3.0, threshold=0.5)
    assert 0 in cm
    assert cm[0].shape == (1, 2)
    np.testing.assert_allclose(cm[0][0], [11.5, 11.5], atol=0.1)


def test_ensemble_locate_no_detections():
    """Zero detections across every member yields empty (not a DBSCAN
    crash on a 0-sample array)."""
    pred = np.zeros((4, 1, 32, 32, 1), np.float32)
    cm, cv = ensemble_locate(pred, eps=3.0, threshold=0.5,
                             min_samples=4)
    assert cm[0].shape == (0, 2)
    assert cv[0].shape == (0, 2)


def test_imspec_ensemble(tmp_path):
    rng = np.random.RandomState(0)
    X = rng.rand(32, 8, 8).astype(np.float32)
    y = rng.rand(32, 6).astype(np.float32)
    et = EnsembleTrainer("imspec", in_dim=(8, 8), out_dim=(6,),
                         latent_dim=2, nbfilters_encoder=4,
                         nbfilters_decoder=4)
    et.compile_ensemble_trainer(training_cycles=4, batch_size=8,
                                loss="mse",
                                filename=str(tmp_path / "ei"))
    _, ensemble = et.train_ensemble_from_scratch(X, y, n_models=2)
    assert len(ensemble) == 2


def test_member_layout_parity(seg_data, tmp_path):
    """The sequential lax.map member layout (TPU default, measured 16%
    faster than grouped-conv vmap at config-D shapes) and the vmap layout
    train to numerically equivalent members."""
    imgs, masks = seg_data

    def train(layout):
        et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                             layers=[1, 1, 1, 1])
        et.compile_ensemble_trainer(training_cycles=6, batch_size=4,
                                    filename=str(tmp_path / layout),
                                    member_layout=layout)
        _, ens = et.train_ensemble_from_scratch(imgs, masks, n_models=2)
        return et, ens

    et_m, ens_m = train("map")
    et_v, ens_v = train("vmap")
    assert et_m._member_layout() == "map"
    assert et_v._member_layout() == "vmap"
    # The two layouts lower convs differently (grouped vs individual), so
    # f32 rounding differs in the last ulps; under Adam a near-zero
    # gradient whose SIGN flips between lowerings drifts that element by
    # ~lr per cycle. Assert the loss trajectories match tightly and that
    # the overwhelming majority of parameters agree elementwise.
    _assert_trajectory_and_params(et_m, et_v, ens_m, ens_v)


def test_ensemble_remat_trajectory_parity(seg_data, tmp_path):
    """fit(remat=True) on the ensemble engine (jax.checkpoint around the
    member forward) must reproduce the non-remat training trajectory.
    Rematerialization recomputes the forward with a slightly different
    fusion plan, so the last-ulp rounding of near-zero gradients can
    differ (Adam then drifts those elements by ~lr) — the same
    phenomenon, and the same tolerances, as the layout-parity test."""
    imgs, masks = seg_data

    def train(remat):
        et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                             layers=[1, 1, 1, 1])
        et.compile_ensemble_trainer(training_cycles=6, batch_size=4,
                                    filename=str(tmp_path / f"r{remat}"),
                                    remat=remat)
        _, ens = et.train_ensemble_from_scratch(imgs, masks, n_models=2)
        return et, ens

    et_a, ens_a = train(False)
    et_b, ens_b = train(True)
    assert et_b.remat
    _assert_trajectory_and_params(et_a, et_b, ens_a, ens_b)


def test_remat_recompile_not_served_stale_engine(seg_data, tmp_path):
    """Re-compiling the SAME trainer with remat=True after a non-remat
    run must build a new engine — the cache key has to include the remat
    flag, or the user's memory-pressure opt-in is silently ignored."""
    imgs, masks = seg_data
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=2, batch_size=4,
                                filename=str(tmp_path / "a"))
    et.train_ensemble_from_scratch(imgs, masks, n_models=2)
    n_engines = len(et._ens_engines)
    et.compile_ensemble_trainer(training_cycles=2, batch_size=4,
                                filename=str(tmp_path / "b"), remat=True)
    assert et.remat
    et.train_ensemble_from_scratch(imgs, masks, n_models=2)
    assert len(et._ens_engines) == n_engines + 1, \
        "remat=True was served the cached non-remat engine"


def _assert_trajectory_and_params(et_a, et_b, ens_a, ens_b):
    la = np.asarray(et_a.loss_acc["train_loss"])
    lb = np.asarray(et_b.loss_acc["train_loss"])
    np.testing.assert_allclose(la, lb, rtol=1e-3)
    close = total = 0
    for m in range(len(ens_a)):
        for a, b in zip(jax.tree.leaves(ens_a[m]),
                        jax.tree.leaves(ens_b[m])):
            a, b = np.asarray(a), np.asarray(b)
            close += np.sum(np.abs(a - b) <= 1e-5 + 1e-3 * np.abs(b))
            total += a.size
    assert close / total > 0.99, f"only {close}/{total} params agree"


def test_predictor_handles_varied_batch_sizes(seg_data, tmp_path):
    """A second predict with a DIFFERENT number of frames must not
    reuse the first call's inferred output shape (silent garbage when
    element counts coincide, ValueError otherwise)."""
    imgs, masks = seg_data
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=2, batch_size=4,
                                filename=str(tmp_path / "vb"))
    _, ens = et.train_ensemble_from_scratch(imgs, masks, n_models=2)
    p = EnsemblePredictor(et.net, ens, nb_classes=1, verbose=0)
    # norm=False: predict min-max-normalizes over the GIVEN stack
    # (reference parity), which differs between the 4- and 5-frame calls
    m4, _ = p.predict(imgs[:4], num_batches=1, norm=False)
    m5, _ = p.predict(imgs[:5], num_batches=1, norm=False)
    assert m4.shape[0] == 4 and m5.shape[0] == 5
    np.testing.assert_allclose(m5[:4], m4, atol=1e-5)
    # element-count-coinciding reshape trap: 4x32x32 == 1x64x64 x 1/4 —
    # use an explicit different spatial size instead
    big = np.random.RandomState(0).rand(1, 64, 64).astype(np.float32)
    mb, _ = p.predict(big, num_batches=1)
    assert mb.shape == (1, 64, 64, 1)


def test_predictor_digit_string_keys_align_bn_stats(seg_data, tmp_path):
    """Digit-string member keys (a JSON round-trip artifact) must order
    members and their per-member BN stats identically for 10+ members."""
    imgs, masks = seg_data
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=2, batch_size=4,
                                filename=str(tmp_path / "ds"))
    _, ens = et.train_ensemble_from_scratch(imgs, masks, n_models=11)
    p_int = EnsemblePredictor(et.net, ens, nb_classes=1, verbose=0,
                              mesh=False)
    str_ens = {str(k): v for k, v in ens.items()}
    p_str = EnsemblePredictor(et.net, str_ens, nb_classes=1, verbose=0,
                              mesh=False)
    m_i, v_i = p_int.predict(imgs[:2], num_batches=1)
    m_s, v_s = p_str.predict(imgs[:2], num_batches=1)
    np.testing.assert_allclose(m_s, m_i, atol=1e-6)
    np.testing.assert_allclose(v_s, v_i, atol=1e-6)


def test_ensemble_forward_honors_num_batches(seg_data, tmp_path):
    """ensemble_forward(num_batches=k) must chunk dispatches (device
    memory control) and still return the full stacked prediction."""
    imgs, masks = seg_data
    et = EnsembleTrainer("Unet", nb_classes=1, nb_filters=4,
                         layers=[1, 1, 1, 1])
    et.compile_ensemble_trainer(training_cycles=2, batch_size=4,
                                filename=str(tmp_path / "nb"))
    _, ens = et.train_ensemble_from_scratch(imgs, masks, n_models=2)
    p = EnsemblePredictor(et.net, ens, nb_classes=1, verbose=0)
    x = p.preprocess(imgs[:6])
    one = p.ensemble_forward(x, num_batches=1)
    chunked = p.ensemble_forward(x, num_batches=3)
    assert one.shape == chunked.shape == (2, 6, 32, 32, 1)
    np.testing.assert_allclose(chunked, one, atol=1e-6)
