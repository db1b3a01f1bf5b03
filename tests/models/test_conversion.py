"""Torch-checkpoint conversion parity tests.

Requires the reference package (read-only mount at /root/reference with
import shims); skipped when unavailable.
"""

import sys

import numpy as np
import pytest

import os
REF_PATHS = [os.path.join(os.path.dirname(__file__), "..", "_refshim"),
             "/root/reference"]


def _ref_available():
    for p in REF_PATHS:
        if p not in sys.path:
            sys.path.append(p)
    try:
        import atomai  # noqa: F401
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _ref_available(),
                                reason="reference atomai not importable")


@pytest.mark.parametrize("model,kw", [
    ("Unet", {}),
    ("Unet", {"with_dilation": True}),
    ("dilnet", {}),
    ("SegResNet", {}),
])
def test_converted_net_matches_torch_forward(model, kw):
    import jax.numpy as jnp
    import torch
    from atomai.nets import init_fcnn_model as ref_init

    from atomai_tpu.models.conversion import convert_fcnn_state_dict

    tnet, _ = ref_init(model, 2, nb_filters=8, **kw)
    tnet.eval()
    sd = dict(tnet.state_dict().items())
    net, params, bstats = convert_fcnn_state_dict(sd, model, 2,
                                                  nb_filters=8, **kw)
    x = np.random.RandomState(0).rand(2, 32, 32).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x[:, None])).numpy()
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    j_out = np.asarray(net.apply(variables, jnp.asarray(x[..., None]),
                                 False))
    np.testing.assert_allclose(j_out, t_out.transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_load_torch_checkpoint_roundtrip(tmp_path):
    import torch
    from atomai.nets import init_fcnn_model as ref_init

    from atomai_tpu.models.conversion import load_torch_checkpoint

    tnet, meta = ref_init("Unet", 1, nb_filters=8)
    meta["weights"] = tnet.state_dict()
    path = str(tmp_path / "ref_ckpt.tar")
    torch.save(meta, path)
    smodel = load_torch_checkpoint(path)
    out = smodel.predict(
        np.random.rand(1, 32, 32).astype(np.float32),
        compute_coords=False, verbose=False)
    assert out.shape == (1, 32, 32, 1)


@pytest.mark.parametrize("in_dim,out_dim,kw", [
    ((16, 16), (8,), {}),
    ((16, 16), (8,), {"encoder_downsampling": 2,
                      "decoder_upsampling": True}),
    ((16,), (8, 8), {}),
])
def test_converted_imspec_matches_torch_forward(in_dim, out_dim, kw):
    import jax.numpy as jnp
    import torch
    from atomai.nets import init_imspec_model as ref_init

    from atomai_tpu.models.conversion import convert_imspec_state_dict

    tnet, _ = ref_init(in_dim, out_dim, 3, nblayers_encoder=2,
                       nblayers_decoder=2, nbfilters_encoder=4,
                       nbfilters_decoder=4, **kw)
    tnet.eval()
    sd = dict(tnet.state_dict().items())
    net, params, bstats = convert_imspec_state_dict(
        sd, in_dim, out_dim, 3, nblayers_encoder=2, nblayers_decoder=2,
        nbfilters_encoder=4, nbfilters_decoder=4, **kw)
    x = np.random.RandomState(0).rand(2, *in_dim).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x).unsqueeze(1)).numpy()
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    j_out = np.asarray(net.apply(variables, jnp.asarray(x), False))
    np.testing.assert_allclose(j_out, t_out.squeeze(1), atol=1e-4)


@pytest.mark.parametrize("coord,conv_e,conv_d,discrete,skip", [
    (0, False, False, None, False),   # plain fc VAE
    (0, True, True, None, False),     # conv VAE
    (3, False, False, None, False),   # rVAE (rot+trans)
    (1, False, False, None, True),    # rVAE rot-only, skip connections
    (0, False, False, [3], False),    # jVAE
    (3, True, False, [3, 2], False),  # jrVAE, conv encoder
])
def test_converted_vae_nets_match_torch_forward(coord, conv_e, conv_d,
                                                discrete, skip):
    import jax.numpy as jnp
    import torch
    from atomai.nets import init_VAE_nets as ref_init

    from atomai_tpu.models.conversion import convert_vae_checkpoint

    in_dim, latent = (8, 8), 2
    enc, dec, meta = ref_init(
        in_dim, latent, coord=coord, discrete_dim=discrete,
        conv_encoder=conv_e, conv_decoder=conv_d, skip=skip,
        numlayers_encoder=2, numlayers_decoder=2,
        numhidden_encoder=16, numhidden_decoder=16)
    enc.eval(), dec.eval()
    meta = dict(meta)
    meta["encoder"] = enc.state_dict()
    meta["decoder"] = dec.state_dict()
    model = convert_vae_checkpoint(meta)

    rng = np.random.RandomState(0)
    x = rng.rand(4, *in_dim).astype(np.float32)
    with torch.no_grad():
        t_enc = [t.numpy() for t in enc(torch.from_numpy(x))]
    j_enc = model.encoder_net.apply(
        {"params": model.params["encoder"]}, jnp.asarray(x), False)
    if not isinstance(j_enc, (list, tuple)):
        j_enc = [j_enc]
    for t, j in zip(t_enc, list(j_enc)):
        np.testing.assert_allclose(np.asarray(j), t, atol=1e-4)

    zdim = latent + (sum(discrete) if discrete else 0)
    z = rng.randn(4, zdim).astype(np.float32)
    if coord:
        n = in_dim[0] * in_dim[1]
        xc = rng.rand(4, n, 2).astype(np.float32)
        with torch.no_grad():
            t_dec = dec(torch.from_numpy(xc), torch.from_numpy(z)).numpy()
        j_dec = np.asarray(model.decoder_net.apply(
            {"params": model.params["decoder"]}, jnp.asarray(xc),
            jnp.asarray(z), False))
    else:
        with torch.no_grad():
            t_dec = dec(torch.from_numpy(z)).numpy()
        j_dec = np.asarray(model.decoder_net.apply(
            {"params": model.params["decoder"]}, jnp.asarray(z), False))
    np.testing.assert_allclose(j_dec, t_dec.reshape(j_dec.shape), atol=1e-4)


def test_converted_denoiser_matches_torch_forward():
    import jax.numpy as jnp
    import torch
    from atomai.models import DenoisingAutoencoder as RefDAE

    from atomai_tpu.models.conversion import convert_denoiser_state_dict

    ref = RefDAE(encoder_filters=[2, 4], decoder_filters=[4, 2],
                 encoder_layers=[1, 1], decoder_layers=[1, 1],
                 use_batch_norm=True)
    ref.net.eval()
    sd = dict(ref.net.state_dict().items())
    net, params, bstats = convert_denoiser_state_dict(
        sd, encoder_filters=[2, 4], decoder_filters=[4, 2],
        encoder_layers=[1, 1], decoder_layers=[1, 1], use_batch_norm=True)
    x = np.random.RandomState(0).rand(2, 16, 16).astype(np.float32)
    with torch.no_grad():
        t_out = ref.net(torch.from_numpy(x).unsqueeze(1)).numpy()
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    j_out = np.asarray(net.apply(variables, jnp.asarray(x[..., None]),
                                 False))
    np.testing.assert_allclose(j_out[..., 0], t_out.squeeze(1), atol=1e-4)


def test_load_torch_vae_checkpoint_roundtrip(tmp_path):
    import torch
    from atomai.nets import init_VAE_nets as ref_init

    from atomai_tpu.models.conversion import load_torch_checkpoint

    enc, dec, meta = ref_init((8, 8), 2, coord=3, numlayers_encoder=2,
                              numlayers_decoder=2, numhidden_encoder=16,
                              numhidden_decoder=16)
    meta = dict(meta)
    meta["encoder"] = enc.state_dict()
    meta["decoder"] = dec.state_dict()
    path = str(tmp_path / "ref_rvae.tar")
    torch.save(meta, path)
    model = load_torch_checkpoint(path)
    out = model.encode(np.random.rand(3, 8, 8).astype(np.float32))
    assert out[0].shape == (3, 5)  # latent + coord(3)


def test_load_torch_ensemble(tmp_path):
    import torch
    from atomai.nets import init_fcnn_model as ref_init

    from atomai_tpu.models.conversion import load_torch_ensemble

    tnet, meta = ref_init("Unet", 1, nb_filters=8)
    members = {}
    for i in range(3):
        tnet_i, _ = ref_init("Unet", 1, nb_filters=8)
        members[i] = tnet_i.state_dict()
    meta = dict(meta)
    meta["weights"] = members
    path = str(tmp_path / "ref_ens.tar")
    torch.save(meta, path)
    model, stacked = load_torch_ensemble(path)
    import jax
    leaves = jax.tree.leaves(stacked)
    assert all(lf.shape[0] == 3 for lf in leaves)
    out = model.predict(np.random.rand(1, 32, 32).astype(np.float32),
                        compute_coords=False, verbose=False)
    assert out.shape == (1, 32, 32, 1)
