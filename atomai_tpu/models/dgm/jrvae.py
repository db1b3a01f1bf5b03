"""jrVAE — joint continuous+discrete VAE with rotational invariance.

Parity: `atomai/models/dgm/jrvae.py:23-233` — spatial decoder with
rotation/translation latents plus Gumbel-Softmax discrete latents;
temperature + dual capacity schedules.
"""

from copy import deepcopy as dc
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...losses_metrics.vi_losses import joint_rvae_loss
from ...utils.coords import transform_coordinates
from .vae import BaseVAE


class jrVAE(BaseVAE):
    """Joint rotationally-invariant VAE.

    Example:
        >>> jrvae = aoi.models.jrVAE((28, 28), latent_dim=2,
        >>>                          discrete_dim=[10])
        >>> jrvae.fit(imstack_train, training_cycles=100,
        >>>           rotation_prior=np.pi/2)
    """

    def __init__(self, in_dim: Tuple[int, ...] = None, latent_dim: int = 2,
                 discrete_dim: List[int] = [2], nb_classes: int = 0,
                 translation: bool = True, seed: int = 0,
                 **kwargs) -> None:
        coord = 3 if translation else 1
        super().__init__(in_dim, latent_dim, nb_classes, coord,
                         discrete_dim, seed=seed, **kwargs)
        self.translation = translation
        self.dx_prior = None
        self.kdict_ = dc(kwargs)

    def elbo_fn(self, x, x_reconstr, *args, **kwargs):
        return joint_rvae_loss(self.loss, self.in_dim, x, x_reconstr,
                               *args, **kwargs)

    def forward_compute_elbo_fn(self, params, x, y, key, num_iter,
                                train: bool):
        """Jittable forward + ELBO (reference `jrvae.py:105-152`)."""
        tau = self.kdict_.get("temperature", .67)
        b = x.shape[0]
        x_coord = jnp.broadcast_to(self.x_coord,
                                   (b,) + self.x_coord.shape)
        latent_ = self.encoder_net.apply(
            {"params": params["encoder"]}, x, train)
        z_mean, z_logsd = latent_[:2]
        z_sd = jnp.exp(z_logsd)
        k_cont, *k_disc = jax.random.split(
            key, 1 + len(self.discrete_dim))
        z_cont = self.reparameterize(k_cont, z_mean, z_sd)
        phi = z_cont[:, 0]
        if self.translation:
            dx = z_cont[:, 1:3] * self.dx_prior
            dx = dx[:, None, :]
            z_cont = z_cont[:, 3:]
        else:
            dx = 0
            z_cont = z_cont[:, 1:]
        x_coord = transform_coordinates(x_coord, phi, dx)
        alphas = latent_[2:]
        z_disc = [self.reparameterize_discrete(k, a, tau)
                  for k, a in zip(k_disc, alphas)]
        z = jnp.concatenate([z_cont] + z_disc, axis=1)
        if y is not None:
            targets = jax.nn.one_hot(y.astype(jnp.int32), self.nb_classes)
            z = jnp.concatenate([z, targets], axis=-1)
        x_reconstr = self.decoder_net.apply(
            {"params": params["decoder"]}, x_coord, z, train)
        kw = {k: v for k, v in self.kdict_.items()
              if k in ("phi_prior", "cont_capacity", "disc_capacity")}
        return self.elbo_fn(x, x_reconstr, z_mean, z_logsd, alphas,
                            num_iter=num_iter, **kw)

    def fit(self, X_train, y_train=None, X_test=None, y_test=None,
            loss: str = "mse", **kwargs) -> None:
        """Trains the joint rVAE (reference `jrvae.py:155-229`)."""
        X_train = np.asarray(X_train, np.float32)
        self._check_inputs(X_train, y_train, X_test, y_test)
        self.dx_prior = kwargs.get("translation_prior", 0.1)
        self.kdict_["phi_prior"] = kwargs.get("rotation_prior", 0.1)
        for k, v in kwargs.items():
            if k in ("cont_capacity", "disc_capacity", "temperature"):
                self.kdict_[k] = v
        self._fit_loop(X_train, y_train, X_test, y_test, loss, **kwargs)
