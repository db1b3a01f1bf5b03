"""Encoder/decoder modules for VAE/VED and im2spec/spec2im models.

Flax/NHWC re-designs of the reference nets (`atomai/nets/ed.py`):
- SignalEncoder/SignalDecoder/SignalED (`ed.py:20-228`)
- fc/conv (j)EncoderNet -> (z_mu, z_logstd[, alphas...]) (`ed.py:231-468`)
- fc/conv DecoderNet (`ed.py:471-580`)
- rDecoderNet + coord_latent — the Bepler-style spatial decoder
  (`ed.py:583-687`, after arXiv:1909.11663): a per-pixel MLP over
  fc(coord 2->h) + fc(z->h) broadcast-add. On TPU this is pure batched
  matmul work (batch*H*W rows through the MXU) — the compute-heaviest op of
  the rVAE train step (SURVEY.md §3.3).
- init_imspec_model / init_VAE_nets factories + metadicts
  (`ed.py:690-790`).

Data layout: images (N, H, W) or (N, H, W, C); spectra (N, L); internally
channel-last everywhere.
"""

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .blocks import ConvBlock, DilatedBlock, _cdtype, init_kwargs


def _as_channel_last(x, ndim_signal: int):
    """(N, H, W) -> (N, H, W, 1); (N, L) -> (N, L, 1); keeps existing C."""
    if x.ndim == ndim_signal + 1:  # no channel dim
        return x[..., None]
    return x


class SignalEncoder(nn.Module):
    """Encodes a 1D/2D signal into a latent vector (`ed.py:20-79`)."""
    signal_dim: Tuple[int, ...]
    z_dim: int
    nb_layers: int
    nb_filters: int
    batch_norm: bool = True
    downsampling: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        sdim = self.signal_dim
        if isinstance(sdim, int):
            sdim = (sdim,)
        assert 0 < len(sdim) < 3, "signal dimensionality must be 1D or 2D"
        ndim = len(sdim)
        x = _as_channel_last(x, ndim)
        if self.downsampling:
            d = self.downsampling
            if ndim == 1:
                x = nn.avg_pool(x, (d,), (d,))
            else:
                x = nn.avg_pool(x, (d, d), (d, d))
        x = ConvBlock(ndim, self.nb_layers, self.nb_filters, lrelu_a=0.1,
                      batch_norm=self.batch_norm)(x, train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.z_dim, **init_kwargs(x.shape[-1]))(x)


class SignalDecoder(nn.Module):
    """Decodes a latent vector into a 1D/2D signal (`ed.py:82-157`)."""
    signal_dim: Tuple[int, ...]
    z_dim: int
    nb_layers: int
    nb_filters: int
    batch_norm: bool = True
    upsampling: bool = False

    @nn.compact
    def __call__(self, z, train: bool = False):
        sdim = self.signal_dim
        if isinstance(sdim, int):
            sdim = (sdim,)
        assert 0 < len(sdim) < 3, "signal dimensionality must be 1D or 2D"
        ndim = len(sdim)
        work_dim = tuple(s // 4 for s in sdim) if self.upsampling else sdim
        n = int(np.prod(work_dim))
        x = nn.Dense(self.nb_filters * n, dtype=_cdtype(),
                     **init_kwargs(z.shape[-1]))(z)
        x = x.reshape((-1,) + work_dim + (self.nb_filters,))
        if self.upsampling:
            for _ in range(2):
                x = ConvBlock(ndim, 1, self.nb_filters, lrelu_a=0.1,
                              batch_norm=self.batch_norm)(x, train)
                if ndim == 1:
                    nshape = (x.shape[0], x.shape[1] * 2, x.shape[2])
                else:
                    nshape = (x.shape[0], x.shape[1] * 2, x.shape[2] * 2,
                              x.shape[3])
                x = jax.image.resize(x, nshape, method="nearest")
        dil = list(range(1, self.nb_layers + 1))
        x = DilatedBlock(ndim, self.nb_filters, dil, dil, lrelu_a=0.1,
                         batch_norm=self.batch_norm)(x, train)
        x = ConvBlock(ndim, 1, 1, lrelu_a=0.1,
                      batch_norm=self.batch_norm)(x, train)
        x = nn.Conv(1, (1,) * ndim, padding=0,
                    **init_kwargs(x.shape[-1]))(x)
        return x[..., 0]  # drop channel dim -> (N, L) / (N, H, W)


class SignalED(nn.Module):
    """image <-> spectrum translator (`ed.py:160-228`)."""
    feature_dim: Tuple[int, ...]
    target_dim: Tuple[int, ...]
    latent_dim: int
    nblayers_encoder: int = 2
    nblayers_decoder: int = 2
    nbfilters_encoder: int = 64
    nbfilters_decoder: int = 2
    batch_norm: bool = True
    encoder_downsampling: int = 0
    decoder_upsampling: bool = False

    def setup(self):
        self.encoder = SignalEncoder(
            self.feature_dim, self.latent_dim, self.nblayers_encoder,
            self.nbfilters_encoder, batch_norm=self.batch_norm,
            downsampling=self.encoder_downsampling)
        self.decoder = SignalDecoder(
            self.target_dim, self.latent_dim, self.nblayers_decoder,
            self.nbfilters_decoder, batch_norm=self.batch_norm,
            upsampling=self.decoder_upsampling)

    def encode(self, features, train: bool = False):
        return self.encoder(features, train)

    def decode(self, latent, train: bool = False):
        return self.decoder(latent, train)

    def __call__(self, x, train: bool = False):
        return self.decode(self.encode(x, train), train)


class fcEncoderNet(nn.Module):
    """MLP encoder -> (z_mu, z_logstd) (`ed.py:293-343`)."""
    in_dim: Tuple[int, ...]
    latent_dim: int = 2
    num_layers: int = 2
    hidden_dim: int = 32
    softplus_out: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        # hidden layers in the policy compute dtype (bf16 on TPU; heads
        # stay f32 so z_mu/z_logstd keep full precision). Dense layers
        # draw from the torch-default init distribution the reference
        # VAEs actually train from (see blocks.init_kwargs).
        for _ in range(self.num_layers):
            x = jnp.tanh(nn.Dense(self.hidden_dim, dtype=_cdtype(),
                                  **init_kwargs(x.shape[-1]))(x))
        z_mu = nn.Dense(self.latent_dim, **init_kwargs(x.shape[-1]))(x)
        z_logstd = nn.Dense(self.latent_dim,
                            **init_kwargs(x.shape[-1]))(x)
        if self.softplus_out:
            z_logstd = jax.nn.softplus(z_logstd)
        return z_mu, z_logstd


class convEncoderNet(nn.Module):
    """Conv encoder -> (z_mu, z_logstd) (`ed.py:231-289`)."""
    in_dim: Tuple[int, ...]
    latent_dim: int = 2
    num_layers: int = 2
    hidden_dim: int = 32
    softplus_out: bool = False
    lrelu_a: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = 2 if len(self.in_dim) > 1 else 1
        x = _as_channel_last(x, ndim)
        x = ConvBlock(ndim, self.num_layers, self.hidden_dim,
                      lrelu_a=self.lrelu_a)(x, train)
        x = x.reshape(x.shape[0], -1)
        z_mu = nn.Dense(self.latent_dim, **init_kwargs(x.shape[-1]))(x)
        z_logstd = nn.Dense(self.latent_dim,
                            **init_kwargs(x.shape[-1]))(x)
        if self.softplus_out:
            z_logstd = jax.nn.softplus(z_logstd)
        return z_mu, z_logstd


class jfcEncoderNet(nn.Module):
    """MLP encoder with extra per-discrete-dim softmax heads
    (`ed.py:346-404`). Returns [z_mu, z_logstd, alphas...]."""
    in_dim: Tuple[int, ...]
    latent_dim: int = 2
    discrete_dim: Tuple[int, ...] = (1,)
    num_layers: int = 2
    hidden_dim: int = 32
    softplus_out: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        # hidden layers in the policy compute dtype (bf16 on TPU; heads
        # stay f32 so z_mu/z_logstd keep full precision)
        for _ in range(self.num_layers):
            x = jnp.tanh(nn.Dense(self.hidden_dim, dtype=_cdtype(),
                                  **init_kwargs(x.shape[-1]))(x))
        z_mu = nn.Dense(self.latent_dim, **init_kwargs(x.shape[-1]))(x)
        z_logstd = nn.Dense(self.latent_dim,
                            **init_kwargs(x.shape[-1]))(x)
        if self.softplus_out:
            z_logstd = jax.nn.softplus(z_logstd)
        encoded = [z_mu, z_logstd]
        for disc in self.discrete_dim:
            encoded.append(jax.nn.softmax(
                nn.Dense(disc, **init_kwargs(x.shape[-1]))(x), axis=1))
        return encoded


class jconvEncoderNet(nn.Module):
    """Conv encoder with discrete softmax heads (`ed.py:407-468`)."""
    in_dim: Tuple[int, ...]
    latent_dim: int = 2
    discrete_dim: Tuple[int, ...] = (1,)
    num_layers: int = 2
    hidden_dim: int = 32
    softplus_out: bool = False
    lrelu_a: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = 2 if len(self.in_dim) > 1 else 1
        x = _as_channel_last(x, ndim)
        x = ConvBlock(ndim, self.num_layers, self.hidden_dim,
                      lrelu_a=self.lrelu_a)(x, train)
        x = x.reshape(x.shape[0], -1)
        z_mu = nn.Dense(self.latent_dim, **init_kwargs(x.shape[-1]))(x)
        z_logstd = nn.Dense(self.latent_dim,
                            **init_kwargs(x.shape[-1]))(x)
        if self.softplus_out:
            z_logstd = jax.nn.softplus(z_logstd)
        encoded = [z_mu, z_logstd]
        for disc in self.discrete_dim:
            encoded.append(jax.nn.softmax(
                nn.Dense(disc, **init_kwargs(x.shape[-1]))(x), axis=1))
        return encoded


def _squeeze_or_chanlast(h, out_dim):
    """(N, H, W, C) -> (N, H, W) when C == 1, else channel-last (parity with
    `ed.py:523-527,576-580`)."""
    if h.shape[-1] == 1:
        return h[..., 0]
    return h


class fcDecoderNet(nn.Module):
    """MLP decoder (`ed.py:530-580`)."""
    out_dim: Tuple[int, ...]
    latent_dim: int
    num_layers: int = 2
    hidden_dim: int = 32

    @nn.compact
    def __call__(self, z, train: bool = False):
        c = self.out_dim[-1] if len(self.out_dim) > 2 else 1
        h = z
        # hidden layers in the compute dtype; the reconstruction head
        # stays f32 (it feeds the sum-reduced ELBO)
        for _ in range(self.num_layers):
            h = jnp.tanh(nn.Dense(self.hidden_dim, dtype=_cdtype(),
                                  **init_kwargs(h.shape[-1]))(h))
        h = nn.Dense(int(np.prod(self.out_dim)),
                     **init_kwargs(h.shape[-1]))(h)
        h = h.reshape((-1,) + tuple(self.out_dim[:2]) + (c,)) \
            if len(self.out_dim) > 1 else h.reshape((-1, self.out_dim[0], c))
        return _squeeze_or_chanlast(h, self.out_dim)


class convDecoderNet(nn.Module):
    """Conv decoder (`ed.py:471-527`)."""
    out_dim: Tuple[int, ...]
    latent_dim: int
    num_layers: int = 2
    hidden_dim: int = 32
    lrelu_a: float = 0.1

    @nn.compact
    def __call__(self, z, train: bool = False):
        ndim = 2 if len(self.out_dim) > 1 else 1
        c = self.out_dim[-1] if len(self.out_dim) > 2 else 1
        spatial = tuple(self.out_dim[:2]) if ndim == 2 \
            else (self.out_dim[0],)
        h = nn.Dense(self.hidden_dim * int(np.prod(spatial)),
                     use_bias=False, dtype=_cdtype(),
                     **init_kwargs(z.shape[-1]))(z)
        h = h.reshape((-1,) + spatial + (self.hidden_dim,))
        h = ConvBlock(ndim, self.num_layers, self.hidden_dim,
                      lrelu_a=self.lrelu_a)(h, train)
        h = nn.Conv(c, (1,) * ndim, padding=0)(h)
        return _squeeze_or_chanlast(h, self.out_dim)


class coord_latent(nn.Module):
    """Spatial part of the rVAE decoder (`ed.py:642-687`):
    h = fc(coords) + fc_nobias(z)[:, None, :], optional tanh.

    Shapes: x_coord (B, n, 2), z (B, latent) -> (B, n, out_dim). The n-pixel
    axis turns the whole decoder into large MXU matmuls.
    """
    out_dim: int
    activation: bool = False

    @nn.compact
    def __call__(self, x_coord, z, return_params: bool = False):
        d_x = nn.Dense(self.out_dim, dtype=_cdtype(),
                       **init_kwargs(x_coord.shape[-1]))
        d_z = nn.Dense(self.out_dim, use_bias=False, dtype=_cdtype(),
                       **init_kwargs(z.shape[-1]))
        if return_params:
            # instantiate params on zero-row inputs and hand the raw
            # arrays to the fused Pallas path (same names/structure as
            # the XLA path — checkpoints are interchangeable)
            _ = d_x(jnp.zeros((0, 0, 2), x_coord.dtype))
            _ = d_z(jnp.zeros((0, z.shape[-1]), z.dtype))
            return (d_x.variables["params"]["kernel"],
                    d_x.variables["params"]["bias"],
                    d_z.variables["params"]["kernel"])
        h_x = d_x(x_coord)                               # (B, n, h)
        h_z = d_z(z)                                     # (B, h)
        h = h_x + h_z[:, None, :]
        if self.activation:
            h = jnp.tanh(h)
        return h


class rDecoderNet(nn.Module):
    """Spatial decoder with optional residual skips (`ed.py:583-639`)."""
    out_dim: Tuple[int, ...]
    latent_dim: int
    num_layers: int
    hidden_dim: int
    skip: bool = False

    @nn.compact
    def __call__(self, x_coord, z, train: bool = False):
        if len(self.out_dim) == 2:
            c = 1
            reshape_ = tuple(self.out_dim)
        else:
            c = self.out_dim[-1]
            reshape_ = (self.out_dim[0], self.out_dim[1], c)
        batch_dim = x_coord.shape[0]
        n_pix = x_coord.shape[1]
        cl = coord_latent(self.hidden_dim, not self.skip)
        from ..ops.pallas_mlp import mlp_shapes_supported
        if (not self.skip and c == 1
                and mlp_shapes_supported(n_pix, self.hidden_dim)):
            # fused Pallas path: the whole tanh-MLP chain runs per
            # row-block in VMEM (one HBM write of y instead of one per
            # layer; backward recomputes activations in VMEM). Params are
            # the SAME flax Dense modules as the XLA branch below — only
            # the compute is rerouted.
            from ..ops.pallas_mlp import pad_rows, spatial_mlp
            Wc, bc, Wz = cl(x_coord, z, return_params=True)
            Ws, bs = [], []
            for _ in range(self.num_layers):
                d = nn.Dense(self.hidden_dim, dtype=_cdtype(),
                             **init_kwargs(self.hidden_dim))
                _ = d(jnp.zeros((0, self.hidden_dim)))
                Ws.append(d.variables["params"]["kernel"])
                bs.append(d.variables["params"]["bias"])
            d_out = nn.Dense(c, **init_kwargs(self.hidden_dim))
            _ = d_out(jnp.zeros((0, self.hidden_dim)))
            Wo = d_out.variables["params"]["kernel"]
            bo = d_out.variables["params"]["bias"]
            zb = z.astype(jnp.float32) @ Wz.astype(jnp.float32)
            xT = x_coord.astype(jnp.float32).swapaxes(1, 2)  # (B, 2, n)
            n_pad = pad_rows(n_pix)
            if n_pad != n_pix:
                xT = jnp.pad(xT, ((0, 0), (0, 0), (0, n_pad - n_pix)))
            y = spatial_mlp(
                xT, zb, Wc.astype(jnp.float32),
                bc.astype(jnp.float32)[None],
                jnp.stack(Ws).astype(jnp.float32),
                jnp.stack(bs).astype(jnp.float32),
                Wo.astype(jnp.float32),
                bo.astype(jnp.float32)[None])
            h = y[:, 0, :n_pix]
            return h.reshape((batch_dim,) + reshape_)
        h = cl(x_coord, z)
        if self.skip:
            # residual added after every Dense+tanh pair: the reference
            # iterates [Linear, Tanh]*L and adds at every even module index
            # (`ed.py:626-630`), i.e. once per layer.
            residual = h
            for _ in range(self.num_layers):
                h = jnp.tanh(nn.Dense(self.hidden_dim, dtype=_cdtype(),
                                      **init_kwargs(h.shape[-1]))(h))
                h = h + residual
        else:
            # per-pixel MLP in the compute dtype — the measured hot op of
            # the rVAE step (bandwidth-bound at f32, see
            # scripts/rvae_roofline_experiment.py); the output head stays
            # f32 for the ELBO
            for _ in range(self.num_layers):
                h = jnp.tanh(nn.Dense(self.hidden_dim, dtype=_cdtype(),
                                      **init_kwargs(h.shape[-1]))(h))
        h = nn.Dense(c, **init_kwargs(h.shape[-1]))(h)
        return h.reshape((batch_dim,) + reshape_)


def init_imspec_model(in_dim: Tuple[int, ...], out_dim: Tuple[int, ...],
                      latent_dim: int, **kwargs: Any
                      ) -> Tuple[nn.Module, Dict[str, Any]]:
    """ImSpec model factory + metadict (`ed.py:690-722`)."""
    nblayers_encoder = kwargs.get("nblayers_encoder", 3)
    nblayers_decoder = kwargs.get("nblayers_decoder", 4)
    nbfilters_encoder = kwargs.get("nbfilters_encoder", 64)
    nbfilters_decoder = kwargs.get("nbfilters_decoder", 64)
    batch_norm = kwargs.get("batch_norm", True)
    encoder_downsampling = kwargs.get("encoder_downsampling", 0)
    decoder_upsampling = kwargs.get("decoder_upsampling", False)
    net = SignalED(tuple(in_dim), tuple(out_dim), latent_dim,
                   nblayers_encoder, nblayers_decoder, nbfilters_encoder,
                   nbfilters_decoder, batch_norm, encoder_downsampling,
                   decoder_upsampling)
    meta_state_dict = {
        "model_type": "imspec",
        "in_dim": tuple(in_dim),
        "out_dim": tuple(out_dim),
        "latent_dim": latent_dim,
        "nblayers_encoder": nblayers_encoder,
        "nblayers_decoder": nblayers_decoder,
        "nbfilters_encoder": nbfilters_encoder,
        "nbfilters_decoder": nbfilters_decoder,
        "batchnorm": batch_norm,
        "encoder_downsampling": encoder_downsampling,
        "decoder_upsampling": decoder_upsampling,
    }
    return net, meta_state_dict


def init_VAE_nets(in_dim: Tuple[int, ...], latent_dim: int, coord: int = 0,
                  discrete_dim: Optional[List[int]] = None,
                  nb_classes: int = 0, **kwargs: Any
                  ) -> Tuple[nn.Module, nn.Module, Dict[str, Any]]:
    """Initializes encoder and decoder for the VAE family
    (`ed.py:725-790`)."""
    conv_e = kwargs.get("conv_encoder", False)
    conv_d = kwargs.get("conv_decoder", False) if not coord else False
    numlayers_e = kwargs.get("numlayers_encoder", 2)
    numlayers_d = kwargs.get("numlayers_decoder", 2)
    numhidden_e = kwargs.get("numhidden_encoder", 128)
    numhidden_d = kwargs.get("numhidden_decoder", 128)
    skip = kwargs.get("skip", False)
    sigmoid_out = kwargs.get("sigmoid_out", False)
    softplus_out = bool(kwargs.get("softplus_out") or False)

    discrete_dim_ = sum(discrete_dim) if discrete_dim else 0
    # The reference zeroes nb_classes here when discrete latents are present
    # (`atomai/nets/ed.py:749`), which contradicts its own jVAE/jrVAE forward
    # that concatenates one-hot class targets to z — conditional joint VAEs
    # crash upstream. We size the decoder for the actual forward input.
    dec_latent = latent_dim + discrete_dim_ + nb_classes

    if not coord:
        dnet = convDecoderNet if conv_d else fcDecoderNet
        decoder_net = dnet(tuple(in_dim), dec_latent, numlayers_d,
                           numhidden_d)
    else:
        decoder_net = rDecoderNet(tuple(in_dim), dec_latent, numlayers_d,
                                  numhidden_d, skip)
    if not discrete_dim:
        enet = convEncoderNet if conv_e else fcEncoderNet
        encoder_net = enet(tuple(in_dim), latent_dim + coord, numlayers_e,
                           numhidden_e, softplus_out=softplus_out)
    else:
        enet = jconvEncoderNet if conv_e else jfcEncoderNet
        encoder_net = enet(tuple(in_dim), latent_dim + coord,
                           tuple(discrete_dim), numlayers_e, numhidden_e,
                           softplus_out=softplus_out)

    meta_state_dict = {
        "model_type": "vae",
        "in_dim": tuple(in_dim),
        "latent_dim": latent_dim,
        "coord": coord,
        "conv_encoder": conv_e,
        "numlayers_encoder": numlayers_e,
        "numlayers_decoder": numlayers_d,
        "numhidden_encoder": numhidden_e,
        "numhidden_decoder": numhidden_d,
        "skip": skip,
        "nb_classes": nb_classes,
        "discrete_dim": discrete_dim,
        "sigmoid_out": sigmoid_out,
        "softplus_out": softplus_out,
    }
    if not coord:
        meta_state_dict["conv_decoder"] = conv_d
    return encoder_net, decoder_net, meta_state_dict
