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
    keys = [k for k in state_dict if k.startswith(prefix + ".")
            or k == prefix + ".weight" or k == prefix + ".bias"]
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
    params = jax.tree.map(np.asarray, variables["params"])
    bstats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

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


def load_torch_checkpoint(filepath: str):
    """Loads a reference .tar checkpoint and returns an equivalent
    atomai_tpu model (currently: segmentation models)."""
    import torch

    loaded = torch.load(filepath, map_location="cpu",
                        weights_only=False)
    model_type = loaded.get("model_type")
    if model_type != "seg":
        raise NotImplementedError(
            f"Torch checkpoint conversion for model_type={model_type} "
            "is not implemented yet (supported: 'seg')")
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
