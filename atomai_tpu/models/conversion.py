"""Reference (PyTorch) checkpoint -> atomai_tpu weight conversion.

Lets users of the reference framework (pycroscopy/atomai) load their
existing trained models — including the published pretrained checkpoints
('G_MD', 'BFO', `atomai/models/loaders.py:272-294`) — directly into the
TPU-native nets.

Mechanics: a reference ``meta_state_dict`` (.tar, torch.load-able) stores
constructor kwargs + a torch ``state_dict``. Torch convs are OIHW, flax
convs HWIO; torch Linear is (out, in), flax Dense (in, out); BatchNorm
running stats move into the flax "batch_stats" collection. Sub-layer
pairing is order-based within each top-level block (state_dict key order
follows definition order in both frameworks — convs and batchnorms are
paired independently per kind).
"""

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..core.checkpoint import _to_numpy_tree

# per-architecture mapping: (torch prefix, flax module name); None maps the
# final 1x1 pixel conv to the top-level flax "Conv_0"
_UNET_PLAIN = [("c1", "ConvBlock_0"), ("c2", "ConvBlock_1"),
               ("c3", "ConvBlock_2"), ("bn", "ConvBlock_3"),
               ("upsample_block1", "UpsampleBlock_0"),
               ("c4", "ConvBlock_4"),
               ("upsample_block2", "UpsampleBlock_1"),
               ("c5", "ConvBlock_5"),
               ("upsample_block3", "UpsampleBlock_2"),
               ("c6", "ConvBlock_6"), ("px", "Conv_0")]
# with dilation, the bottleneck is DilatedBlock_0 and the decoder
# ConvBlock auto-numbering shifts down by one
_UNET_DIL = [("c1", "ConvBlock_0"), ("c2", "ConvBlock_1"),
             ("c3", "ConvBlock_2"), ("bn", "DilatedBlock_0"),
             ("upsample_block1", "UpsampleBlock_0"),
             ("c4", "ConvBlock_3"),
             ("upsample_block2", "UpsampleBlock_1"),
             ("c5", "ConvBlock_4"),
             ("upsample_block3", "UpsampleBlock_2"),
             ("c6", "ConvBlock_5"), ("px", "Conv_0")]
_DILNET = [("c1", "ConvBlock_0"), ("at1", "DilatedBlock_0"),
           ("at2", "DilatedBlock_1"), ("up1", "UpsampleBlock_0"),
           ("c2", "ConvBlock_1"), ("px", "Conv_0")]
_SEGRESNET = [("c1", "ConvBlock_0"), ("c2", "ResModule_0"),
              ("bn", "ResModule_1"),
              ("upsample_block1", "UpsampleBlock_0"),
              ("c3", "ResModule_2"),
              ("upsample_block2", "UpsampleBlock_1"),
              ("c4", "ConvBlock_1"), ("px", "Conv_0")]


def _block_mapping(model: str, with_dilation: bool) -> List[Tuple[str, str]]:
    if model == "Unet":
        return _UNET_DIL if with_dilation else _UNET_PLAIN
    if model == "dilnet":
        return _DILNET
    if model == "SegResNet":
        return _SEGRESNET
    raise NotImplementedError(
        f"Torch checkpoint conversion not implemented for '{model}'")


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") \
        else np.asarray(t)


def _collect_layers(state_dict: Dict[str, Any], prefix: str):
    """Groups a torch block's tensors into ordered conv and bn layers."""
    convs, bns = [], []
    cur_bn: Dict[str, np.ndarray] = {}
    # preserve state_dict order
    seen_prefixes: List[str] = []
    for k in state_dict:
        if not (k.startswith(prefix + ".") or k.split(".")[0] == prefix):
            continue
        layer_key = k.rsplit(".", 1)[0]
        if layer_key not in seen_prefixes:
            seen_prefixes.append(layer_key)
    for lk in seen_prefixes:
        w = state_dict.get(lk + ".weight")
        if w is None:
            continue
        w_np = _to_np(w)
        if w_np.ndim >= 3:  # conv (2D: OIHW, 1D: OIL)
            b = state_dict.get(lk + ".bias")
            convs.append((w_np, _to_np(b) if b is not None else None))
        elif w_np.ndim == 1 and (lk + ".running_mean") in state_dict:
            bns.append({
                "scale": w_np,
                "bias": _to_np(state_dict[lk + ".bias"]),
                "mean": _to_np(state_dict[lk + ".running_mean"]),
                "var": _to_np(state_dict[lk + ".running_var"]),
            })
        elif w_np.ndim == 2:  # linear
            b = state_dict.get(lk + ".bias")
            convs.append((w_np, _to_np(b) if b is not None else None))
    return convs, bns


def _conv_to_flax(w: np.ndarray, b: Optional[np.ndarray]):
    if w.ndim == 4:      # OIHW -> HWIO
        kernel = w.transpose(2, 3, 1, 0)
    elif w.ndim == 3:    # OIL -> LIO
        kernel = w.transpose(2, 1, 0)
    else:                # linear (out, in) -> (in, out)
        kernel = w.T
    out = {"kernel": kernel}
    if b is not None:
        out["bias"] = b
    return out


def _fill_module(flax_params: Dict, flax_bstats: Dict,
                 convs: List, bns: List) -> None:
    """Writes ordered conv/bn tensors into a flax module subtree
    (recursing into nested submodules in natural order)."""
    def natural_children(d):
        def keyfn(k):
            name, _, idx = k.rpartition("_")
            return (name, int(idx) if idx.isdigit() else 0)
        return sorted([k for k in d if isinstance(d[k], dict)], key=keyfn)

    conv_q = list(convs)
    bn_q = list(bns)

    def recurse(pd, bd):
        for k in natural_children(pd):
            sub = pd[k]
            if "kernel" in sub:  # a Conv/Dense leaf module
                if not conv_q:
                    raise ValueError("Torch/flax conv count mismatch")
                w, b = conv_q.pop(0)
                conv = _conv_to_flax(w, b)
                assert sub["kernel"].shape == conv["kernel"].shape, (
                    f"kernel shape mismatch: {sub['kernel'].shape} vs "
                    f"{conv['kernel'].shape}")
                pd[k] = conv
            elif "scale" in sub:  # BatchNorm
                if not bn_q:
                    raise ValueError("Torch/flax batchnorm count mismatch")
                bn = bn_q.pop(0)
                pd[k] = {"scale": bn["scale"], "bias": bn["bias"]}
                if bd is not None and k in bd:
                    bd[k] = {"mean": bn["mean"], "var": bn["var"]}
            else:
                recurse(sub, bd.get(k) if bd else None)

    recurse(flax_params, flax_bstats)
    if conv_q or bn_q:
        raise ValueError(
            f"Unconsumed torch layers: {len(conv_q)} convs, "
            f"{len(bn_q)} batchnorms")


def convert_fcnn_state_dict(torch_state_dict: Dict[str, Any],
                            model: str, nb_classes: int,
                            **kwargs) -> Tuple[Any, Dict, Dict]:
    """Converts a reference FCNN state_dict into (net, params,
    batch_stats)."""
    import jax
    import jax.numpy as jnp
    from ..nets import init_fcnn_model

    net, _ = init_fcnn_model(model, nb_classes, **kwargs)
    key = jax.random.key(0)
    f = {"Unet": 8, "dilnet": 2, "SegResNet": 4}.get(model, 8)
    x = jnp.zeros((1, f * 8, f * 8, 1), jnp.float32)
    variables = dict(net.init({"params": key, "dropout": key}, x, False))
    params = _to_numpy_tree(variables["params"])
    bstats = _to_numpy_tree(variables.get("batch_stats", {}))

    mapping = _block_mapping(model, kwargs.get("with_dilation", False))
    for torch_prefix, flax_name in mapping:
        convs, bns = _collect_layers(torch_state_dict, torch_prefix)
        if flax_name == "Conv_0":  # final pixel conv at top level
            w, b = convs[0]
            params["Conv_0"] = _conv_to_flax(w, b)
            continue
        sub_p = {flax_name: params[flax_name]}
        sub_b = {flax_name: bstats.get(flax_name, {})} \
            if flax_name in bstats else {flax_name: None}
        _fill_module(sub_p, sub_b, convs, bns)
        params[flax_name] = sub_p[flax_name]
        if sub_b[flax_name] is not None and flax_name in bstats:
            bstats[flax_name] = sub_b[flax_name]
    return net, params, bstats


def _relayout_linear(convs: List, layout: Tuple) -> List:
    """Permutes a torch Linear's features across the NCHW->NHWC flatten
    boundary.

    torch flattens conv activations channel-first (``C*prod(spatial)``
    with index ``c*n + h*W + w``); flax channel-last (``h*W*C + w*C + c``).
    ``layout`` is ("in"|"out", C, spatial): "in" reorders the weight's
    input columns (Linear consuming a flattened conv map), "out" reorders
    output rows + bias (Linear producing a map reshaped to (C, *spatial)
    in torch vs (*spatial, C) here).
    """
    mode, c, spatial = layout
    out = []
    for w, b in convs:
        if w.ndim != 2:
            raise ValueError("layout relayout applies to Linear layers "
                             f"only, got weight ndim={w.ndim}")
        sp = tuple(spatial)
        if mode == "in":
            # (z, C*n) -> (z, C, *sp) -> (z, *sp, C) -> (z, n*C)
            wt = w.reshape((w.shape[0], c) + sp)
            wt = np.moveaxis(wt, 1, -1).reshape(w.shape[0], -1)
            out.append((wt, b))
        else:
            # (C*n, z) -> (C, *sp, z) -> (*sp, C, z) -> (n*C, z)
            wt = w.reshape((c,) + sp + (w.shape[1],))
            wt = np.moveaxis(wt, 0, -2).reshape(-1, w.shape[1])
            bt = None
            if b is not None:
                bt = np.moveaxis(b.reshape((c,) + sp), 0, -1).ravel()
            out.append((wt, bt))
    return out


def _apply_mapping(params: Dict, bstats: Dict, torch_sd: Dict[str, Any],
                   mapping: List[Tuple]) -> None:
    """Fills flax modules at explicit paths from torch prefixes.

    ``mapping`` entries are ``(torch_prefix, flax_path)`` or
    ``(torch_prefix, flax_path, layout)`` — the optional ``layout``
    (see `_relayout_linear`) handles Linear layers that cross the
    NCHW->NHWC flatten boundary. Within each entry, layers are matched in
    creation order per kind (convs/linears vs batchnorms) with shape
    verification — the same contract `_fill_module` enforces for the
    FCNN conversion.
    """
    for entry in mapping:
        tprefix, fpath = entry[0], entry[1]
        layout = entry[2] if len(entry) > 2 else None
        convs, bns = _collect_layers(torch_sd, tprefix)
        if layout is not None:
            convs = _relayout_linear(convs, layout)
        if not convs and not bns:
            raise ValueError(
                f"no torch tensors under prefix '{tprefix}'")
        pd: Any = params
        bd: Any = bstats
        for name in fpath[:-1]:
            pd = pd[name]
            bd = bd.get(name) if isinstance(bd, dict) else None
        leaf = fpath[-1]
        if leaf not in pd:
            raise ValueError(f"flax module path {fpath} not found "
                             f"(available: {sorted(pd)})")
        sub_p = {leaf: pd[leaf]}
        has_b = isinstance(bd, dict) and leaf in bd
        sub_b = {leaf: bd[leaf]} if has_b else None
        _fill_module(sub_p, sub_b, convs, bns)
        pd[leaf] = sub_p[leaf]
        if has_b:
            bd[leaf] = sub_b[leaf]


# ---------------------------------------------------------------- ImSpec

def _imspec_mapping(decoder_upsampling: bool, in_dim, out_dim,
                    nbfilters_encoder: int, nbfilters_decoder: int,
                    encoder_downsampling: int) -> List[Tuple]:
    """SignalED layout (reference `ed.py:20-228` <-> flax `nets/ed.py`)."""
    enc_sp = tuple(s // encoder_downsampling for s in in_dim) \
        if encoder_downsampling else tuple(in_dim)
    dec_sp = tuple(s // 4 for s in out_dim) if decoder_upsampling \
        else tuple(out_dim)
    m: List[Tuple] = [
        ("encoder.conv", ("encoder", "ConvBlock_0")),
        ("encoder.fc", ("encoder", "Dense_0"),
         ("in", nbfilters_encoder, enc_sp)),
        ("decoder.fc", ("decoder", "Dense_0"),
         ("out", nbfilters_decoder, dec_sp)),
    ]
    if decoder_upsampling:
        m += [("decoder.deconv1", ("decoder", "ConvBlock_0")),
              ("decoder.deconv2", ("decoder", "ConvBlock_1")),
              ("decoder.conv", ("decoder", "ConvBlock_2"))]
    else:
        m += [("decoder.conv", ("decoder", "ConvBlock_0"))]
    m += [("decoder.dilblock", ("decoder", "DilatedBlock_0")),
          ("decoder.out", ("decoder", "Conv_0"))]
    return m


def convert_imspec_state_dict(torch_state_dict: Dict[str, Any],
                              in_dim, out_dim, latent_dim: int,
                              **kwargs) -> Tuple[Any, Dict, Dict]:
    """Converts a reference SignalED state_dict into (net, params,
    batch_stats)."""
    import jax
    import jax.numpy as jnp
    from ..nets import init_imspec_model

    net, _ = init_imspec_model(tuple(in_dim), tuple(out_dim), latent_dim,
                               **kwargs)
    key = jax.random.key(0)
    x = jnp.zeros((1,) + tuple(in_dim), jnp.float32)
    variables = dict(net.init({"params": key, "dropout": key}, x, False))
    params = _to_numpy_tree(variables["params"])
    bstats = _to_numpy_tree(variables.get("batch_stats", {}))
    _apply_mapping(params, bstats, torch_state_dict,
                   _imspec_mapping(kwargs.get("decoder_upsampling", False),
                                   in_dim, out_dim,
                                   kwargs.get("nbfilters_encoder", 64),
                                   kwargs.get("nbfilters_decoder", 64),
                                   kwargs.get("encoder_downsampling", 0)))
    return net, params, bstats


# ------------------------------------------------------------- VAE family

def _vae_encoder_mapping(conv_encoder: bool, num_layers: int,
                         n_discrete: int, in_dim, hidden_dim: int
                         ) -> List[Tuple]:
    """fc/conv (j)EncoderNet (reference `ed.py:231-468`).

    torch fc heads: fc11 (z_mu), fc12 (z_logstd), fc13.* (discrete); flax
    Dense auto-numbering continues past the trunk in the same order. With
    a conv trunk, every fc head consumes the flattened NCHW conv map and
    needs the "in" relayout.
    """
    if conv_encoder:
        lay = ("in", hidden_dim, tuple(in_dim[:2]))
        m: List[Tuple] = [("conv", ("ConvBlock_0",)),
                          ("fc11", ("Dense_0",), lay),
                          ("fc12", ("Dense_1",), lay)]
        m += [(f"fc13.{k}", (f"Dense_{2 + k}",), lay)
              for k in range(n_discrete)]
        return m
    m = [(f"dense.{2 * i}", (f"Dense_{i}",)) for i in range(num_layers)]
    m += [("fc11", (f"Dense_{num_layers}",)),
          ("fc12", (f"Dense_{num_layers + 1}",))]
    m += [(f"fc13.{k}", (f"Dense_{num_layers + 2 + k}",))
          for k in range(n_discrete)]
    return m


def _vae_decoder_mapping(coord: int, conv_decoder: bool, num_layers: int,
                         out_dim, hidden_dim: int) -> List[Tuple]:
    """fc/conv/r DecoderNet (reference `ed.py:471-639`)."""
    if coord:
        m: List[Tuple] = [
            ("coord_latent.fc_coord", ("coord_latent_0", "Dense_0")),
            ("coord_latent.fc_latent", ("coord_latent_0", "Dense_1"))]
        m += [(f"fc_decoder.{2 * i}", (f"Dense_{i}",))
              for i in range(num_layers)]
        m += [("out", (f"Dense_{num_layers}",))]
        return m
    if conv_decoder:
        return [("fc_linear", ("Dense_0",),
                 ("out", hidden_dim, tuple(out_dim[:2]))),
                ("decoder", ("ConvBlock_0",)),
                ("conv_1x1", ("Conv_0",))]
    c = out_dim[-1] if len(out_dim) > 2 else 1
    m = [(f"decoder.{2 * i}", (f"Dense_{i}",)) for i in range(num_layers)]
    m += [("out", (f"Dense_{num_layers}",),
           ("out", c, tuple(out_dim[:2])))]
    return m


def convert_vae_checkpoint(loaded: Dict[str, Any]):
    """Reconstructs a (j/r)VAE model from a reference vae-type metadict
    (reference `loaders.py:161-191`) and converts encoder+decoder weights.
    """
    meta = dict(loaded)
    enc_sd = meta.pop("encoder")
    dec_sd = meta.pop("decoder")
    meta.pop("optimizer", None)
    if hasattr(enc_sd, "items"):
        enc_sd = dict(enc_sd.items())
    if hasattr(dec_sd, "items"):
        dec_sd = dict(dec_sd.items())

    in_dim = tuple(meta["in_dim"])
    latent_dim = meta["latent_dim"]
    coord = meta.get("coord", 0)
    discrete_dim = meta.get("discrete_dim")
    nb_classes = meta.get("nb_classes", 0) or 0
    kwargs = {k: meta[k] for k in
              ("numlayers_encoder", "numlayers_decoder",
               "numhidden_encoder", "numhidden_decoder",
               "conv_encoder", "conv_decoder", "skip", "sigmoid_out")
              if k in meta and meta[k] is not None}
    if meta.get("softplus_out"):
        kwargs["softplus_out"] = True

    from . import dgm
    if coord:
        translation = coord == 3
        if discrete_dim:
            model = dgm.jrVAE(in_dim, latent_dim, discrete_dim,
                              nb_classes, translation, **kwargs)
        else:
            model = dgm.rVAE(in_dim, latent_dim, nb_classes, translation,
                             **kwargs)
    else:
        if discrete_dim:
            model = dgm.jVAE(in_dim, latent_dim, discrete_dim,
                             nb_classes, **kwargs)
        else:
            model = dgm.VAE(in_dim, latent_dim, nb_classes, **kwargs)
    model._init_params()

    import jax
    params = _to_numpy_tree(model.params)
    n_disc = len(discrete_dim) if discrete_dim else 0
    _apply_mapping(params["encoder"], {}, enc_sd,
                   _vae_encoder_mapping(meta.get("conv_encoder", False),
                                        kwargs.get("numlayers_encoder", 2),
                                        n_disc, in_dim,
                                        kwargs.get("numhidden_encoder",
                                                   128)))
    _apply_mapping(params["decoder"], {}, dec_sd,
                   _vae_decoder_mapping(coord,
                                        meta.get("conv_decoder", False),
                                        kwargs.get("numlayers_decoder", 2),
                                        in_dim,
                                        kwargs.get("numhidden_decoder",
                                                   128)))
    model.params = params
    return model


# ---------------------------------------------------------------- Denoiser

def _denoiser_mapping(encoder_filters, decoder_filters
                      ) -> List[Tuple[str, Tuple[str, ...]]]:
    """DenoisingAutoencoder Sequential(encoder, decoder) layout
    (reference `denoiser.py:83-130`): encoder interleaves ConvBlock/MaxPool
    (pool has no params), decoder interleaves UpsampleBlock/ConvBlock with
    a final 1x1 Conv2d."""
    n_enc = len(encoder_filters)
    n_dec = len(decoder_filters)
    m: List[Tuple[str, Tuple[str, ...]]] = []
    for i in range(n_enc):
        m.append((f"0.{2 * i}", (f"ConvBlock_{i}",)))
    for i in range(n_dec):
        if i > 0:
            m.append((f"1.{2 * i - 1}", (f"UpsampleBlock_{i - 1}",)))
        m.append((f"1.{2 * i}", (f"ConvBlock_{n_enc + i}",)))
    m.append((f"1.{2 * (n_dec - 1) + 1}", ("Conv_0",)))
    return m


def convert_denoiser_state_dict(torch_state_dict: Dict[str, Any],
                                **meta) -> Tuple[Any, Dict, Dict]:
    """Converts a reference DenoisingAutoencoder state_dict into (net,
    params, batch_stats)."""
    import jax
    import jax.numpy as jnp
    from .denoiser import DenoiserNet

    enc_f = tuple(meta.get("encoder_filters", (8, 16, 32, 64)))
    dec_f = tuple(meta.get("decoder_filters", (64, 32, 16, 8)))
    net = DenoiserNet(enc_f, dec_f,
                      tuple(meta.get("encoder_layers", (1, 2, 2, 2))),
                      tuple(meta.get("decoder_layers", (2, 2, 2, 1))),
                      meta.get("use_batch_norm", True),
                      meta.get("upsampling_mode", "nearest"))
    key = jax.random.key(0)
    s = 2 ** (len(enc_f) - 1) * 4
    x = jnp.zeros((1, s, s, 1), jnp.float32)
    variables = dict(net.init({"params": key, "dropout": key}, x, False))
    params = _to_numpy_tree(variables["params"])
    bstats = _to_numpy_tree(variables.get("batch_stats", {}))
    _apply_mapping(params, bstats, torch_state_dict,
                   _denoiser_mapping(enc_f, dec_f))
    return net, params, bstats


# ---------------------------------------------------------------- loaders

def _load_seg_checkpoint(loaded: Dict[str, Any]):
    model = loaded.get("model", "Unet")
    nb_classes = loaded.get("nb_classes", 1)
    kwargs = {k: loaded[k] for k in
              ("batch_norm", "dropout", "with_dilation", "nb_filters",
               "layers", "upsampling") if k in loaded
              and loaded[k] is not None}
    sd = loaded["weights"]
    if hasattr(sd, "items"):
        sd = dict(sd.items())
    net, params, bstats = convert_fcnn_state_dict(
        sd, model, nb_classes, **kwargs)

    from .segmentor import Segmentor
    smodel = Segmentor(model, nb_classes, **kwargs)
    smodel.params = params
    smodel.batch_stats = bstats if bstats else None
    return smodel


def _load_imspec_checkpoint(loaded: Dict[str, Any]):
    in_dim = tuple(loaded["in_dim"])
    out_dim = tuple(loaded["out_dim"])
    latent_dim = loaded.get("latent_dim", 2)
    kwargs = {k: loaded[k] for k in
              ("nblayers_encoder", "nblayers_decoder", "nbfilters_encoder",
               "nbfilters_decoder", "encoder_downsampling",
               "decoder_upsampling") if k in loaded
              and loaded[k] is not None}
    if "batchnorm" in loaded:
        kwargs["batch_norm"] = loaded["batchnorm"]
    sd = loaded["weights"]
    if hasattr(sd, "items"):
        sd = dict(sd.items())
    _, params, bstats = convert_imspec_state_dict(
        sd, in_dim, out_dim, latent_dim, **kwargs)

    from .imspec import ImSpec
    model = ImSpec(in_dim, out_dim, latent_dim, **kwargs)
    model.params = params
    model.batch_stats = bstats if bstats else None
    return model


def _load_denoiser_checkpoint(loaded: Dict[str, Any]):
    sd = loaded["weights"]
    if hasattr(sd, "items"):
        sd = dict(sd.items())
    meta = {k: loaded[k] for k in
            ("encoder_filters", "decoder_filters", "encoder_layers",
             "decoder_layers", "use_batch_norm", "upsampling_mode")
            if k in loaded and loaded[k] is not None}
    _, params, bstats = convert_denoiser_state_dict(sd, **meta)

    from .denoiser import DenoisingAutoencoder
    model = DenoisingAutoencoder(**meta)
    model.params = params
    model.batch_stats = bstats if bstats else None
    return model


# ------------------------------------------------------------------
# torchvision backbone conversion (reg/cls models)
# ------------------------------------------------------------------

def _resnet50_specs() -> List[Tuple[str, Tuple[str, ...], str]]:
    """(torch Sequential key, flax path, kind) for the reference's
    ResNet50 ``backbone_layers`` (torchvision resnet50 children[:-2]
    re-wrapped in nn.Sequential: 0=conv1 1=bn1 2=relu 3=maxpool
    4..7=layer1..4; `atomai/nets/blocks.py:344-356`)."""
    specs = [("0", ("conv1",), "conv"), ("1", ("bn1",), "bn")]
    for li, nblocks in [(1, 3), (2, 4), (3, 6), (4, 3)]:
        for b in range(nblocks):
            base = f"{3 + li}.{b}"
            blk = f"layer{li}_{b}"
            specs += [(f"{base}.conv1", (blk, "conv1"), "conv"),
                      (f"{base}.bn1", (blk, "bn1"), "bn"),
                      (f"{base}.conv2", (blk, "conv2"), "conv"),
                      (f"{base}.bn2", (blk, "bn2"), "bn"),
                      (f"{base}.conv3", (blk, "conv3"), "conv"),
                      (f"{base}.bn3", (blk, "bn3"), "bn")]
            if b == 0:
                specs += [(f"{base}.downsample.0",
                           (blk, "downsample_conv"), "conv"),
                          (f"{base}.downsample.1",
                           (blk, "downsample_bn"), "bn")]
    return specs


def _vgg16_specs() -> List[Tuple[str, Tuple[str, ...], str]]:
    """torchvision vgg16.features children[:-1]
    (`atomai/nets/blocks.py:358-370`); conv Sequential indices."""
    return [(str(i), (f"conv{i}",), "conv")
            for i in (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)]


def _mobilenet_v2_specs() -> List[Tuple[str, Tuple[str, ...], str]]:
    """torchvision mobilenet_v2.features (`blocks.py:372-385`):
    0=ConvBNReLU stem, 1..17=InvertedResidual, 18=ConvBNReLU head."""
    specs = [("0.0", ("stem_conv",), "conv"), ("0.1", ("stem_bn",), "bn")]
    bi = 1
    for t, _, n in [(1, 16, 1), (6, 24, 2), (6, 32, 3), (6, 64, 4),
                    (6, 96, 3), (6, 160, 3), (6, 320, 1)]:
        for _ in range(n):
            blk = f"block{bi}"
            if t == 1:  # no pointwise expansion in the first block
                specs += [(f"{bi}.conv.0.0", (blk, "dw"), "conv"),
                          (f"{bi}.conv.0.1", (blk, "dw_bn"), "bn"),
                          (f"{bi}.conv.1", (blk, "project"), "conv"),
                          (f"{bi}.conv.2", (blk, "project_bn"), "bn")]
            else:
                specs += [(f"{bi}.conv.0.0", (blk, "pw"), "conv"),
                          (f"{bi}.conv.0.1", (blk, "pw_bn"), "bn"),
                          (f"{bi}.conv.1.0", (blk, "dw"), "conv"),
                          (f"{bi}.conv.1.1", (blk, "dw_bn"), "bn"),
                          (f"{bi}.conv.2", (blk, "project"), "conv"),
                          (f"{bi}.conv.3", (blk, "project_bn"), "bn")]
            bi += 1
    specs += [("18.0", ("head_conv",), "conv"),
              ("18.1", ("head_bn",), "bn")]
    return specs


_BACKBONE_SPECS = {"resnet": _resnet50_specs, "vgg": _vgg16_specs,
                   "mobilenet": _mobilenet_v2_specs}


def convert_backbone_state_dict(state_dict: Dict[str, Any],
                                backbone_type: str,
                                prefix: str = "backbone.backbone_layers"
                                ) -> Tuple[Dict, Dict]:
    """Converts a torchvision-format backbone state_dict (as stored by the
    reference's ``CustomBackbone``, `atomai/nets/blocks.py:332-399`) into
    (params, batch_stats) for the matching
    `atomai_tpu.nets.backbones` features module. Also usable for raw
    torchvision checkpoints (e.g. ImageNet weights) with the appropriate
    ``prefix`` ('' for bare ``resnet50().state_dict()`` is NOT supported —
    wrap children the way the reference does, or remap keys first)."""
    if backbone_type not in _BACKBONE_SPECS:
        raise ValueError(f"Unknown backbone_type '{backbone_type}'")

    def set_path(tree, path, val):
        for p in path[:-1]:
            tree = tree.setdefault(p, {})
        tree[path[-1]] = val

    params: Dict[str, Any] = {}
    bstats: Dict[str, Any] = {}
    for tk, path, kind in _BACKBONE_SPECS[backbone_type]():
        full = f"{prefix}.{tk}" if prefix else tk
        if kind == "conv":
            w = _to_np(state_dict[full + ".weight"])
            b = state_dict.get(full + ".bias")
            set_path(params, path,
                     _conv_to_flax(w, _to_np(b) if b is not None else None))
        else:
            set_path(params, path,
                     {"scale": _to_np(state_dict[full + ".weight"]),
                      "bias": _to_np(state_dict[full + ".bias"])})
            set_path(bstats, path,
                     {"mean": _to_np(state_dict[full + ".running_mean"]),
                      "var": _to_np(state_dict[full + ".running_var"])})
    return params, bstats


def convert_reg_cls_state_dict(state_dict: Dict[str, Any], model_type: str,
                               backbone_type: str, input_channels: int,
                               output_size) -> Tuple[Any, Dict, Dict]:
    """Converts a reference Regressor/Classifier/MultiTaskClassifier
    state_dict (`atomai/nets/reg_cls.py:16-125`) into
    (net, params, batch_stats)."""
    from ..nets.reg_cls import (ClassifierNet, MultiTaskClassifierNet,
                                RegressorNet)

    bb_params, bb_bstats = convert_backbone_state_dict(
        state_dict, backbone_type)
    params: Dict[str, Any] = {
        "ConvBackbone_0": {"features": bb_params}}
    bstats: Dict[str, Any] = (
        {"ConvBackbone_0": {"features": bb_bstats}} if bb_bstats else {})

    def dense(prefix):
        return {"kernel": _to_np(state_dict[prefix + ".weight"]).T,
                "bias": _to_np(state_dict[prefix + ".bias"])}

    if model_type == "reg":
        params["Dense_0"] = dense("output_layer")
        net = RegressorNet(input_channels, int(output_size), backbone_type)
    elif model_type == "cls":
        params["Dense_0"] = dense("output_layer.0")
        net = ClassifierNet(input_channels, int(output_size), backbone_type)
    elif model_type == "multitask_cls":
        for t in range(len(output_size)):
            params[f"Dense_{t}"] = dense(f"output_layers.{t}.0")
        net = MultiTaskClassifierNet(input_channels, tuple(output_size),
                                     backbone_type)
    else:
        raise ValueError(f"Unknown model_type '{model_type}'")
    return net, params, bstats


def _load_reg_cls_checkpoint(loaded: Dict[str, Any]):
    model_type = loaded["model_type"]
    backbone = loaded.get("backbone", "mobilenet")
    in_channels = loaded.get("in_channels", 1)
    out = loaded.get("out_dim") if model_type == "reg" \
        else loaded.get("nb_classes")
    sd = loaded["weights"]
    if hasattr(sd, "items"):
        sd = dict(sd.items())
    _, params, bstats = convert_reg_cls_state_dict(
        sd, model_type, backbone, in_channels, out)

    if model_type == "reg":
        from .regressor import Regressor
        model = Regressor(backbone, int(out), input_channels=in_channels)
    else:
        from .classifier import Classifier
        model = Classifier(backbone, int(out), input_channels=in_channels)
    model.params = params
    model.batch_stats = bstats if bstats else None
    return model


def load_torch_checkpoint(filepath: str):
    """Loads a reference .tar checkpoint and returns an equivalent
    atomai_tpu model.

    Supported ``model_type``: 'seg', 'imspec', 'vae' (incl. rVAE/jVAE/
    jrVAE via the stored ``coord``/``discrete_dim``), 'reg'/'cls'
    (torchvision ResNet50/VGG16/MobileNetV2 backbones via
    `convert_backbone_state_dict`), and 'denoising_autoencoder' — the
    full `load_model` dispatch surface of the reference
    (`loaders.py:25-64`).
    """
    import torch

    loaded = torch.load(filepath, map_location="cpu",
                        weights_only=False)
    model_type = loaded.get("model_type")
    if model_type == "seg":
        return _load_seg_checkpoint(loaded)
    if model_type == "imspec":
        return _load_imspec_checkpoint(loaded)
    if model_type == "vae":
        return convert_vae_checkpoint(loaded)
    if model_type == "denoising_autoencoder":
        return _load_denoiser_checkpoint(loaded)
    if model_type in ("reg", "cls"):
        return _load_reg_cls_checkpoint(loaded)
    raise NotImplementedError(
        f"Torch checkpoint conversion for model_type={model_type} is not "
        "implemented (supported: 'seg', 'imspec', 'vae', 'reg', 'cls', "
        "'denoising_autoencoder')")


def load_torch_ensemble(filepath: str):
    """Loads a reference ensemble metadict
    (`*_ensemble_metadict.tar`, reference `etrainer.py:290-298` /
    `loaders.py:238-269`) and returns ``(model, member_params)`` where
    ``model`` carries the ensemble-averaged weights and ``member_params``
    is a member-stacked params pytree directly usable by
    ``EnsemblePredictor``."""
    import jax
    import numpy as np_
    import torch

    loaded = torch.load(filepath, map_location="cpu",
                        weights_only=False)
    model_type = loaded.get("model_type")
    if model_type != "seg":
        raise NotImplementedError(
            "Ensemble conversion currently supports segmentation "
            f"ensembles only (got model_type={model_type})")
    members = loaded["weights"]
    if not isinstance(members, dict):
        raise ValueError("expected ensemble weights as {index: state_dict}")

    per_member = []
    model = None
    for idx in sorted(members):
        entry = dict(loaded)
        entry["weights"] = members[idx]
        m = _load_seg_checkpoint(entry)
        per_member.append(m.params)
        model = m
    stacked = jax.tree.map(lambda *xs: np_.stack(xs), *per_member)
    # averaged-weights model (reference `load_ensemble` returns the mean)
    model.params = jax.tree.map(lambda x: x.mean(0), stacked)
    return model, stacked


def load_pretrained_model(model_name: str):
    """Downloads and converts a published pretrained reference model
    ('G_MD' or 'BFO', reference `loaders.py:272-294`)."""
    import urllib.request
    urls = {
        "BFO": ("https://github.com/ziatdinovmax/atomai/blob/master/"
                "pretrained/bfo.tar?raw=true", "./bfo.tar"),
        "G_MD": ("https://github.com/ziatdinovmax/atomai/blob/master/"
                 "pretrained/G_MD.tar?raw=true", "./G_MD.tar"),
    }
    if model_name not in urls:
        raise ValueError("Available pretrained models: 'G_MD', 'BFO'")
    url, path = urls[model_name]
    urllib.request.urlretrieve(url, path)
    return load_torch_checkpoint(path)
