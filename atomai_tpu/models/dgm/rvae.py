"""rVAE — rotationally+translationally invariant VAE.

Parity: `atomai/models/dgm/rvae.py:22-219` — Bepler-style spatial decoder
(arXiv:1909.11663): the first 1 (or 3) latents encode the rotation angle
(and xy shifts); the pixel coordinate grid is rotated/translated per sample
(`atomai/utils/coords.py:57-83`) before the spatial decoder; priors
``rotation_prior``/``translation_prior`` (:189-190); optional per-epoch
manifold recording (:211-215).
"""

from copy import deepcopy as dc
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...losses_metrics.vi_losses import rvae_loss
from ...utils.coords import transform_coordinates
from .vae import BaseVAE


class rVAE(BaseVAE):
    """Rotationally invariant VAE with spatial decoder.

    Example:
        >>> rvae = aoi.models.rVAE((28, 28))
        >>> rvae.fit(imstack_train, training_cycles=100,
        >>>          batch_size=100, rotation_prior=np.pi/2)
        >>> rvae.manifold2d()
    """

    def __init__(self, in_dim: Tuple[int, ...] = None, latent_dim: int = 2,
                 nb_classes: int = 0, translation: bool = True,
                 seed: int = 0, **kwargs) -> None:
        coord = 3 if translation else 1
        super().__init__(in_dim, latent_dim, nb_classes, coord,
                         seed=seed, **kwargs)
        self.translation = translation
        self.dx_prior = None
        self.kdict_ = dc(kwargs)

    def elbo_fn(self, x, x_reconstr, *args, **kwargs):
        return rvae_loss(self.loss, self.in_dim, x, x_reconstr, *args,
                         **kwargs)

    def forward_compute_elbo_fn(self, params, x, y, key, num_iter,
                                train: bool):
        """Jittable forward + ELBO (reference `rvae.py:110-147`)."""
        b = x.shape[0]
        x_coord = jnp.broadcast_to(self.x_coord,
                                   (b,) + self.x_coord.shape)
        z_mean, z_logsd = self.encoder_net.apply(
            {"params": params["encoder"]}, x, train)
        z_sd = jnp.exp(z_logsd)
        z = self.reparameterize(key, z_mean, z_sd)
        phi = z[:, 0]
        if self.translation:
            dx = z[:, 1:3] * self.dx_prior
            dx = dx[:, None, :]
            z = z[:, 3:]
        else:
            dx = 0
            z = z[:, 1:]
        if y is not None:
            targets = jax.nn.one_hot(y.astype(jnp.int32), self.nb_classes)
            z = jnp.concatenate([z, targets], axis=-1)
        x_coord = transform_coordinates(x_coord, phi, dx)
        x_reconstr = self.decoder_net.apply(
            {"params": params["decoder"]}, x_coord, z, train)
        kw = {k: v for k, v in self.kdict_.items()
              if k in ("phi_prior", "capacity")}
        return self.elbo_fn(x, x_reconstr, z_mean, z_logsd,
                            num_iter=num_iter, **kw)

    def fit(self, X_train, y_train=None, X_test=None, y_test=None,
            loss: str = "mse", **kwargs) -> None:
        """Trains the rVAE (reference `rvae.py:149-217`)."""
        X_train = np.asarray(X_train, np.float32)
        self._check_inputs(X_train, y_train, X_test, y_test)
        self.dx_prior = kwargs.get("translation_prior", 0.1)
        self.kdict_["phi_prior"] = kwargs.get("rotation_prior", 0.1)
        for k, v in kwargs.items():
            if k in ("capacity",):
                self.kdict_[k] = v
        self._fit_loop(X_train, y_train, X_test, y_test, loss, **kwargs)
