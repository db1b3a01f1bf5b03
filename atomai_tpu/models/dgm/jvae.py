"""jVAE — joint continuous + discrete (Gumbel-Softmax) VAE.

Parity: `atomai/models/dgm/jvae.py:23-200` — joint latents with
temperature-relaxed discrete sampling and dual capacity schedules
(arXiv:1804.00104).
"""

from copy import deepcopy as dc
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...losses_metrics.vi_losses import joint_vae_loss
from .vae import BaseVAE


class jVAE(BaseVAE):
    """Joint continuous+discrete VAE.

    Example:
        >>> jvae = aoi.models.jVAE((28, 28), latent_dim=2,
        >>>                        discrete_dim=[10])
        >>> jvae.fit(imstack_train, training_cycles=100)
    """

    def __init__(self, in_dim: Tuple[int, ...] = None, latent_dim: int = 2,
                 discrete_dim: List[int] = [2], nb_classes: int = 0,
                 seed: int = 0, **kwargs) -> None:
        super().__init__(in_dim, latent_dim, nb_classes, 0, discrete_dim,
                         seed=seed, **kwargs)
        self.kdict_ = dc(kwargs)

    def elbo_fn(self, x, x_reconstr, *args, **kwargs):
        return joint_vae_loss(self.loss, self.in_dim, x, x_reconstr,
                              *args, **kwargs)

    def forward_compute_elbo_fn(self, params, x, y, key, num_iter,
                                train: bool):
        """Jittable forward + ELBO (reference `jvae.py:98-134`)."""
        tau = self.kdict_.get("temperature", .67)
        latent_ = self.encoder_net.apply(
            {"params": params["encoder"]}, x, train)
        z_mean, z_logsd = latent_[:2]
        z_sd = jnp.exp(z_logsd)
        k_cont, *k_disc = jax.random.split(
            key, 1 + len(self.discrete_dim))
        z_cont = self.reparameterize(k_cont, z_mean, z_sd)
        alphas = latent_[2:]
        z_disc = [self.reparameterize_discrete(k, a, tau)
                  for k, a in zip(k_disc, alphas)]
        z = jnp.concatenate([z_cont] + z_disc, axis=1)
        if y is not None:
            targets = jax.nn.one_hot(y.astype(jnp.int32), self.nb_classes)
            z = jnp.concatenate([z, targets], axis=-1)
        x_reconstr = self.decoder_net.apply(
            {"params": params["decoder"]}, z, train)
        kw = {k: v for k, v in self.kdict_.items()
              if k in ("cont_capacity", "disc_capacity")}
        return self.elbo_fn(x, x_reconstr, z_mean, z_logsd, alphas,
                            num_iter=num_iter, **kw)

    def fit(self, X_train, y_train=None, X_test=None, y_test=None,
            loss: str = "mse", **kwargs) -> None:
        """Trains the joint VAE (reference `jvae.py:137-196`)."""
        X_train = np.asarray(X_train, np.float32)
        self._check_inputs(X_train, y_train, X_test, y_test)
        for k, v in kwargs.items():
            if k in ("cont_capacity", "disc_capacity", "temperature"):
                self.kdict_[k] = v
        self._fit_loop(X_train, y_train, X_test, y_test, loss, **kwargs)
