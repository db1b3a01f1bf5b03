"""Variational-inference losses (ELBOs) for the VAE family.

Parity: `atomai/losses_metrics/vi_losses.py` — sum-reduced reconstruction
loss (:13-37), closed-form normal KLD (:40-57), discrete (Gumbel-Softmax vs
uniform categorical) KLD (:60-74), rotation-prior KLD (:77-84), the four ELBO
assemblers (:87-221) and Burgess-style information-capacity annealing
(:224-251, arXiv:1804.03599 / arXiv:1804.00104).

All functions are jittable; ``num_iter`` may be a traced scalar.
"""

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def reconstruction_loss(loss_type: str, in_dim: Tuple[int, ...], x,
                        x_reconstr, logits: bool = True):
    """Per-sample reconstruction loss, no mean reduction (:13-37)."""
    batch_dim = x.shape[0]
    if loss_type == "mse":
        diff = x_reconstr.reshape(batch_dim, -1) - x.reshape(batch_dim, -1)
        return 0.5 * jnp.sum(diff * diff, axis=1)
    if loss_type == "ce":
        xr = x_reconstr.reshape(batch_dim, -1)
        xt = x.reshape(batch_dim, -1)
        if logits:
            neg_abs = -jnp.abs(xr)
            per_el = (jnp.maximum(xr, 0.0) - xr * xt +
                      jnp.log1p(jnp.exp(neg_abs)))
        else:
            eps = 1e-12
            per_el = -(xt * jnp.log(xr + eps) +
                       (1 - xt) * jnp.log(1 - xr + eps))
        return jnp.sum(per_el, axis=-1)
    raise NotImplementedError("Reconstruction loss must be 'mse' or 'ce'")


def kld_normal(q_param: Sequence, p_param: Optional[Sequence] = None):
    """KL divergence between two diagonal normals, summed over latent dims
    (:40-57)."""
    mu_1, log_sd_1 = q_param
    sd_1 = jnp.exp(log_sd_1)
    if p_param is None:
        kl = -log_sd_1 + 0.5 * sd_1 ** 2 + 0.5 * mu_1 ** 2 - 0.5
    else:
        mu_2, log_sd_2 = p_param
        sd_2 = jnp.exp(log_sd_2)
        kl = (log_sd_2 - log_sd_1 +
              0.5 * (sd_1 ** 2 + (mu_1 - mu_2) ** 2) / sd_2 ** 2 - 0.5)
    return jnp.sum(kl, axis=-1)


def kld_discrete(alpha):
    """KL between Gumbel-Softmax params and uniform categorical (:60-74)."""
    eps = 1e-12
    cat_dim = alpha.shape[-1]
    h1 = jnp.log(alpha + eps)
    h2 = np.log(1.0 / cat_dim + eps)
    return jnp.mean(jnp.sum(alpha * (h1 - h2), axis=1), axis=0).reshape(1)


def kld_rot(phi_prior: float, phi_logsd):
    """KL for the rotation latent (:77-84)."""
    phi_sd = jnp.exp(phi_logsd)
    return (-phi_logsd + jnp.log(phi_prior) +
            phi_sd ** 2 / (2 * phi_prior ** 2) - 0.5)


def vae_loss(recon_loss: str, in_dim, x, x_reconstr, *args, **kwargs):
    """Standard VAE ELBO (:87-113). Returns ELBO (to be maximized)."""
    if len(args) != 2:
        raise ValueError(
            "Pass mean and SD values of encoded distribution as args")
    q_param = args
    capacity = kwargs.get("capacity")
    num_iter = kwargs.get("num_iter", 0)
    likelihood = -jnp.mean(
        reconstruction_loss(recon_loss, in_dim, x, x_reconstr))
    kl_div = jnp.mean(kld_normal(q_param))
    if capacity is not None:
        kl_div = infocapacity(kl_div, capacity, num_iter=num_iter)
    return likelihood - kl_div


def rvae_loss(recon_loss: str, in_dim, x, x_reconstr, *args, **kwargs):
    """rVAE ELBO with rotation prior (:116-146)."""
    if len(args) != 2:
        raise ValueError(
            "Pass mean and SD values of encoded distribution as args")
    z_mean, z_logsd = args
    phi_prior = kwargs.get("phi_prior", 0.1)
    capacity = kwargs.get("capacity")
    num_iter = kwargs.get("num_iter", 0)
    phi_logsd = z_logsd[:, 0]
    z_mean, z_logsd = z_mean[:, 1:], z_logsd[:, 1:]
    likelihood = -jnp.mean(
        reconstruction_loss(recon_loss, in_dim, x, x_reconstr))
    kl_rot = jnp.mean(kld_rot(phi_prior, phi_logsd))
    kl_z = jnp.mean(kld_normal([z_mean, z_logsd]))
    kl_div = kl_z + kl_rot
    if capacity is not None:
        kl_div = infocapacity(kl_div, capacity, num_iter=num_iter)
    return likelihood - kl_div


def joint_vae_loss(recon_loss: str, in_dim, x, x_reconstr, *args, **kwargs):
    """Joint continuous+discrete ELBO (:149-185)."""
    if len(args) != 3:
        raise ValueError(
            "Pass continuous (mean, SD) and discrete (alphas) values "
            "of encoded distributions as args")
    z_mean, z_logsd, alphas = args
    cont_capacity = kwargs.get("cont_capacity", [5.0, 25000, 30])
    disc_capacity = kwargs.get("disc_capacity", [5.0, 25000, 30])
    num_iter = kwargs.get("num_iter", 0)
    disc_dims = [a.shape[1] for a in alphas]

    likelihood = -jnp.mean(
        reconstruction_loss(recon_loss, in_dim, x, x_reconstr))
    kl_cont_loss = jnp.mean(kld_normal([z_mean, z_logsd]))
    kl_disc = [kld_discrete(alpha) for alpha in alphas]
    kl_disc_loss = jnp.sum(jnp.concatenate(kl_disc))
    cont_cap_loss, disc_cap_loss = infocapacity(
        kl_cont_loss, cont_capacity, kl_disc_loss, disc_capacity,
        disc_dims, num_iter)
    return likelihood - cont_cap_loss - disc_cap_loss


def joint_rvae_loss(recon_loss: str, in_dim, x, x_reconstr, *args,
                    **kwargs):
    """Joint rotationally-invariant ELBO (:188-221)."""
    if len(args) != 3:
        raise ValueError(
            "Pass continuous (mean, SD) and discrete (alphas) values "
            "of encoded distributions as args")
    z_mean, z_logsd, alphas = args
    phi_prior = kwargs.get("phi_prior", 0.1)
    cont_capacity = kwargs.get("cont_capacity", [5.0, 25000, 30])
    disc_capacity = kwargs.get("disc_capacity", [5.0, 25000, 30])
    num_iter = kwargs.get("num_iter", 0)

    likelihood = -jnp.mean(
        reconstruction_loss(recon_loss, in_dim, x, x_reconstr))
    phi_logsd = z_logsd[:, 0]
    z_mean_, z_logsd_ = z_mean[:, 1:], z_logsd[:, 1:]
    kl_rot = jnp.mean(kld_rot(phi_prior, phi_logsd))
    kl_z = jnp.mean(kld_normal([z_mean_, z_logsd_]))
    kl_cont_loss = kl_z + kl_rot
    disc_dims = [a.shape[1] for a in alphas]
    kl_disc = [kld_discrete(alpha) for alpha in alphas]
    kl_disc_loss = jnp.sum(jnp.concatenate(kl_disc))
    cont_cap_loss, disc_cap_loss = infocapacity(
        kl_cont_loss, cont_capacity, kl_disc_loss, disc_capacity,
        disc_dims, num_iter)
    return likelihood - cont_cap_loss - disc_cap_loss


def infocapacity(kl_cont_loss, cont_capacity: List[float],
                 kl_disc_loss=None, disc_capacity: Optional[List] = None,
                 disc_dims: Optional[List[int]] = None, num_iter=0):
    """Burgess capacity annealing (:224-251)."""
    cont_max, cont_num_iters, cont_gamma = cont_capacity
    cont_cap = cont_max * (num_iter / float(cont_num_iters))
    cont_cap = jnp.minimum(cont_cap, cont_max)
    cont_capacity_loss = cont_gamma * jnp.abs(kl_cont_loss - cont_cap)
    if kl_disc_loss is None:
        return cont_capacity_loss
    disc_max, disc_num_iters, disc_gamma = disc_capacity
    disc_theory_max = sum(float(np.log(d)) for d in disc_dims)
    disc_cap = disc_max * (num_iter / float(disc_num_iters))
    disc_cap = jnp.minimum(jnp.minimum(disc_cap, disc_max), disc_theory_max)
    disc_capacity_loss = disc_gamma * jnp.abs(disc_cap - kl_disc_loss)
    return cont_capacity_loss, disc_capacity_loss
