"""viBaseTrainer extension contract (reference model:
`test/trainers/test_vitrainer.py:26-48` — a minimal VAE subclass defined
in-test validates the abstract trainer)."""

import jax
import jax.numpy as jnp
import numpy as np

from atomai_tpu.nets import fcEncoderNet, fcDecoderNet
from atomai_tpu.trainers import viBaseTrainer
from atomai_tpu.losses_metrics import reconstruction_loss, kld_normal


class SimpleVAE(viBaseTrainer):
    """Minimal VAE built directly on the abstract VI trainer."""

    def __init__(self, in_dim=(8, 8), latent_dim=2):
        super().__init__()
        self.in_dim = in_dim
        self.z_dim = latent_dim
        self.coord = 0
        self.set_model(fcEncoderNet(in_dim, latent_dim, hidden_dim=16),
                       fcDecoderNet(in_dim, latent_dim, hidden_dim=16))

    def forward_compute_elbo_fn(self, params, x, y, key, num_iter,
                                train):
        z_mean, z_logsd = self.encoder_net.apply(
            {"params": params["encoder"]}, x, train)
        z = self.reparameterize(key, z_mean, jnp.exp(z_logsd))
        xr = self.decoder_net.apply({"params": params["decoder"]}, z,
                                    train)
        likelihood = -jnp.mean(
            reconstruction_loss("mse", self.in_dim, x, xr))
        kld = jnp.mean(kld_normal([z_mean, z_logsd]))
        return likelihood - kld


def test_custom_vitrainer_subclass_trains():
    rng = np.random.RandomState(0)
    X = rng.rand(32, 8, 8).astype(np.float32)
    vae = SimpleVAE()
    vae.compile_trainer((X, None), (X[:8], None), training_cycles=3,
                        batch_size=8, filename="/tmp/aoi_simple_vae")
    elbos = [vae.train_epoch() for _ in range(3)]
    assert np.isfinite(elbos).all()
    assert elbos[-1] > elbos[0]  # ELBO increases
    test_elbo = vae.evaluate_model()
    assert np.isfinite(test_elbo)


def test_reparameterize_moments():
    key = jax.random.key(0)
    mean = jnp.full((2000, 2), 1.5)
    sd = jnp.full((2000, 2), 0.5)
    z = viBaseTrainer.reparameterize(key, mean, sd)
    assert abs(float(z.mean()) - 1.5) < 0.05
    assert abs(float(z.std()) - 0.5) < 0.05


def test_reparameterize_discrete_simplex():
    key = jax.random.key(0)
    alpha = jax.nn.softmax(jnp.asarray(
        np.random.RandomState(0).randn(16, 4)), axis=1)
    z = viBaseTrainer.reparameterize_discrete(key, alpha, tau=0.67)
    np.testing.assert_allclose(np.asarray(z.sum(1)), 1.0, atol=1e-5)


def test_set_data_rebuilds_epoch_fns():
    """Re-staging data between epochs must rebuild the scanned epoch
    closures — they close over the staged arrays, so keeping them would
    silently train on the REPLACED dataset (active-learning loops)."""
    rng = np.random.RandomState(0)
    X1 = rng.rand(32, 8, 8).astype(np.float32)
    vae = SimpleVAE()
    vae.compile_trainer((X1, None), (X1[:8], None), training_cycles=2,
                        batch_size=8, filename="/tmp/aoi_vi_setdata")
    e1 = vae.train_epoch()
    assert vae._train_epoch_fn is not None
    X2 = np.zeros((32, 8, 8), np.float32)
    vae.set_data(X2, None, X2[:8], None)
    assert vae._train_epoch_fn is None and vae._eval_epoch_fn is None
    e2 = vae.train_epoch()
    assert np.isfinite([e1, e2]).all()
    # all-zero data: the reconstruction term collapses, so the ELBO
    # trajectory must visibly jump vs continuing on X1
    assert not np.isclose(e1, e2, rtol=1e-3)


def test_custom_optimizer_changes_training():
    """compile_trainer(optimizer=...) accepts a custom optax transform;
    a tiny LR must visibly slow ELBO movement vs a large one (reference
    `test_vitrainer.py:93-112` contract)."""
    import optax

    rng = np.random.RandomState(0)
    X = rng.rand(64, 8, 8).astype(np.float32)
    deltas = []
    for lr in (1e-2, 1e-7):
        vae = SimpleVAE()
        vae.compile_trainer((X, None), training_cycles=4, batch_size=16,
                            optimizer=optax.adam(lr),
                            filename="/tmp/aoi_customopt")
        elbos = [vae.train_epoch() for _ in range(4)]
        deltas.append(abs(elbos[-1] - elbos[0]))
    assert deltas[0] > deltas[1] * 10


def test_epochs_per_dispatch_parity(tmp_path):
    """fit(..., epochs_per_dispatch=n) scans n epochs per device dispatch
    with EXACT semantics parity vs the per-epoch loop: same PRNG stream,
    same annealing num_iter threading, same per-epoch history."""
    import atomai_tpu as aoi

    rng = np.random.RandomState(0)
    X = rng.rand(48, 8, 8).astype(np.float32)
    Xt = rng.rand(16, 8, 8).astype(np.float32)

    def fit_with(epd):
        m = aoi.models.rVAE((8, 8), latent_dim=2, seed=3,
                            numlayers_encoder=1, numhidden_encoder=16,
                            numlayers_decoder=1, numhidden_decoder=16)
        m.engine = "scan"  # the accelerator engine (chunking target)
        m.fit(X, None, Xt, None, training_cycles=6, batch_size=16,
              verbose=False, filename=str(tmp_path / f"epd{epd}"),
              epochs_per_dispatch=epd)
        return m

    a = fit_with(1)
    b = fit_with(3)
    np.testing.assert_allclose(a.loss_history["train_loss"],
                               b.loss_history["train_loss"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(a.loss_history["test_loss"],
                               b.loss_history["test_loss"],
                               rtol=1e-5, atol=1e-5)
    la = jax.tree.leaves(a.params)
    lb = jax.tree.leaves(b.params)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-6)
    assert len(a.loss_history["train_loss"]) == 6
    assert a.num_iter == b.num_iter


def test_set_data_invalidates_chunked_epoch_programs(tmp_path):
    """Chunked-epoch programs close over the staged arrays via the epoch
    fns; re-staging data must invalidate them or epochs_per_dispatch
    would silently train on the REPLACED data."""
    import atomai_tpu as aoi

    rng = np.random.RandomState(0)
    X = rng.rand(32, 8, 8).astype(np.float32)
    m = aoi.models.rVAE((8, 8), latent_dim=2, seed=3,
                        numlayers_encoder=1, numhidden_encoder=16,
                        numlayers_decoder=1, numhidden_decoder=16)
    m.engine = "scan"
    m.fit(X, training_cycles=4, batch_size=16, verbose=False,
          filename=str(tmp_path / "chunkinv"), epochs_per_dispatch=2)
    assert m._epochs_chunk_cache  # populated by the chunked fit
    m.set_data(np.zeros((32, 8, 8), np.float32))
    assert not m._epochs_chunk_cache
    assert m._train_epoch_fn is None
