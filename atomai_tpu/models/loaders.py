"""Model (de)serialization — self-describing checkpoints.

Parity: `atomai/models/loaders.py:25-294` — ``load_model`` dispatches on
``meta["model_type"]`` and reconstructs the model class with the stored
constructor kwargs; ``load_ensemble`` restores the averaged weights plus
all member weights.
"""

from typing import Any, Dict, Tuple, Union

from ..core.checkpoint import load_checkpoint


def _resolve_checkpoint(source: Union[str, Tuple[Dict, Dict], Dict]
                        ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Accepts a checkpoint path, a ``(meta, arrays)`` pair, or a dict with
    ``meta``/``arrays`` keys (the analog of the reference's in-memory
    ``meta_dict`` argument, `atomai/models/loaders.py:67-90`)."""
    if isinstance(source, str):
        return load_checkpoint(source)
    if isinstance(source, tuple) and len(source) == 2:
        return source
    if isinstance(source, dict) and "meta" in source:
        return source["meta"], source.get("arrays", {})
    raise TypeError(
        "Expected a checkpoint path, a (meta, arrays) pair, or a dict "
        f"with 'meta'/'arrays' keys; got {type(source).__name__}")


def load_model(filepath: Union[str, Tuple[Dict, Dict], Dict]):
    """Loads a trained model from a checkpoint file
    (reference `loaders.py:25-64`)."""
    meta, arrays = _resolve_checkpoint(filepath)
    model_type = meta.get("model_type")
    if model_type == "seg":
        from .segmentor import Segmentor
        kwargs = {k: v for k, v in meta.items()
                  if k in ("batch_norm", "dropout", "with_dilation",
                           "nb_filters", "layers")
                  and v is not None}
        if "upsampling" in meta:
            kwargs["upsampling"] = meta["upsampling"]
        model = Segmentor(meta.get("model", "Unet"),
                          meta.get("nb_classes", 1), **kwargs)
    elif model_type == "imspec":
        from .imspec import ImSpec
        kwargs = {k: meta[k] for k in
                  ("nblayers_encoder", "nblayers_decoder",
                   "nbfilters_encoder", "nbfilters_decoder",
                   "encoder_downsampling", "decoder_upsampling")
                  if k in meta}
        if "batchnorm" in meta:
            kwargs["batch_norm"] = meta["batchnorm"]
        model = ImSpec(tuple(meta["in_dim"]), tuple(meta["out_dim"]),
                       meta.get("latent_dim", 2), **kwargs)
    elif model_type == "reg":
        from .regressor import Regressor
        model = Regressor(meta.get("backbone", "mobilenet"),
                          meta.get("out_dim", 1),
                          input_channels=meta.get("in_channels", 1))
    elif model_type == "cls":
        from .classifier import Classifier
        model = Classifier(meta.get("backbone", "mobilenet"),
                           meta.get("nb_classes", 1),
                           input_channels=meta.get("in_channels", 1))
    elif model_type == "vae":
        from . import dgm
        cls_name = meta.get("vae_type", "VAE")
        vae_cls = getattr(dgm, cls_name)
        kwargs = {k: meta[k] for k in
                  ("numlayers_encoder", "numlayers_decoder",
                   "numhidden_encoder", "numhidden_decoder",
                   "conv_encoder", "conv_decoder", "skip", "sigmoid_out",
                   "softplus_out")
                  if k in meta and meta[k] is not None}
        nb_classes = meta.get("nb_classes", 0)
        discrete_dim = meta.get("discrete_dim")
        latent_dim = meta.get("latent_dim", 2)
        in_dim = tuple(meta["in_dim"])
        # rotationally-invariant variants: the stored 'coord' field encodes
        # translation (3 = angle+dx+dy, 1 = angle only); reconstructing with
        # the wrong coord misaligns the encoder latent split vs the weights
        if cls_name in ("rVAE", "jrVAE"):
            kwargs["translation"] = meta.get("coord", 3) == 3
        if cls_name in ("jVAE", "jrVAE") and discrete_dim is not None:
            model = vae_cls(in_dim, latent_dim, discrete_dim,
                            nb_classes=nb_classes, **kwargs)
        else:
            model = vae_cls(in_dim, latent_dim, nb_classes=nb_classes,
                            **kwargs)
        model.load_weights_from_arrays(arrays)
        # restore training-progress counters so continued training keeps
        # annealing capacity/temperature from where the fit stopped
        # (reference contract, `test_loaders.py:162-169`)
        if meta.get("num_iter") is not None:
            model.num_iter = int(meta["num_iter"])
            model.metadict["num_iter"] = model.num_iter
        if meta.get("num_epochs") is not None:
            model.current_epoch = int(meta["num_epochs"])
            model.metadict["num_epochs"] = model.current_epoch
        return model
    elif model_type == "denoising_autoencoder":
        from .denoiser import DenoisingAutoencoder
        model = DenoisingAutoencoder(
            encoder_filters=meta.get("encoder_filters", [8, 16, 32, 64]),
            decoder_filters=meta.get("decoder_filters", [64, 32, 16, 8]),
            encoder_layers=meta.get("encoder_layers", [1, 2, 2, 2]),
            decoder_layers=meta.get("decoder_layers", [2, 2, 2, 1]),
            # rebuilding with defaults here would silently change the
            # architecture (flax apply ignores surplus BN params)
            use_batch_norm=meta.get("use_batch_norm", False),
            upsampling_mode=meta.get("upsampling_mode", "nearest"))
    else:
        raise ValueError(f"Unknown model type in checkpoint: {model_type}")
    model.meta_state_dict = {**meta}
    model.params = arrays["params"]
    model.batch_stats = arrays.get("batch_stats")
    return model


def _load_typed(source, expected: Tuple[str, ...], kind: str):
    meta, arrays = _resolve_checkpoint(source)
    mt = meta.get("model_type")
    if mt not in expected:
        raise ValueError(
            f"Checkpoint holds a '{mt}' model, not a {kind} model")
    return load_model((meta, arrays))


def load_seg_model(meta_dict) -> Any:
    """Restores a Segmentor from checkpoint data
    (reference `loaders.py:67-88`)."""
    return _load_typed(meta_dict, ("seg",), "segmentation")


def load_imspec_model(meta_dict) -> Any:
    """Restores an ImSpec model (reference `loaders.py:91-112`)."""
    return _load_typed(meta_dict, ("imspec",), "imspec")


def load_reg_model(meta_dict) -> Any:
    """Restores a Regressor (reference `loaders.py:115-136`)."""
    return _load_typed(meta_dict, ("reg",), "regression")


def load_cls_model(meta_dict) -> Any:
    """Restores a Classifier (reference `loaders.py:139-160`)."""
    return _load_typed(meta_dict, ("cls",), "classification")


def load_vae_model(meta_dict) -> Any:
    """Restores a VAE-family model (reference `loaders.py:163-195`)."""
    return _load_typed(meta_dict, ("vae",), "VAE")


def load_denoising_autoencoder(meta_dict) -> Any:
    """Restores a DenoisingAutoencoder (reference `loaders.py:198-224`)."""
    return _load_typed(meta_dict, ("denoising_autoencoder",), "denoiser")


def load_ensemble(filepath: str):
    """Loads an ensemble: (smodel, ensemble_dict) (reference
    `loaders.py:238-269`)."""
    meta, arrays = load_checkpoint(filepath)
    smodel = load_single_from(meta, arrays)
    ensemble = {int(k): v for k, v in arrays["ensemble"].items()}
    ebs = arrays.get("ensemble_batch_stats")
    if ebs:
        # full-state members so EnsemblePredictor restores each member's
        # own BatchNorm running statistics
        ensemble = {k: {"params": v, "batch_stats": ebs[str(k)]}
                    for k, v in ensemble.items()}
    elif arrays.get("batch_stats"):
        # SWAG-style ensembles: weight samples share the baseline's BN
        # running statistics
        ensemble = {k: {"params": v,
                        "batch_stats": arrays["batch_stats"]}
                    for k, v in ensemble.items()}
    return smodel, ensemble


def load_single_from(meta: Dict[str, Any], arrays: Dict[str, Any]):
    from ..nets import init_fcnn_model, init_imspec_model
    model_type = meta.get("model_type")
    if model_type == "seg":
        kwargs = {k: v for k, v in meta.items()
                  if k in ("batch_norm", "dropout", "with_dilation",
                           "nb_filters", "layers", "upsampling")
                  and v is not None}
        net, _ = init_fcnn_model(meta.get("model", "Unet"),
                                 meta.get("nb_classes", 1), **kwargs)
        return net, arrays.get("params")
    if model_type == "imspec":
        # forward ALL stored architecture hyperparameters (like the seg
        # branch above and load_model's imspec branch) — defaults would
        # rebuild a skeleton whose param structure mismatches the members
        kwargs = {k: meta[k] for k in
                  ("nblayers_encoder", "nblayers_decoder",
                   "nbfilters_encoder", "nbfilters_decoder",
                   "encoder_downsampling", "decoder_upsampling")
                  if k in meta}
        if "batchnorm" in meta:
            kwargs["batch_norm"] = meta["batchnorm"]
        net, _ = init_imspec_model(tuple(meta["in_dim"]),
                                   tuple(meta["out_dim"]),
                                   meta.get("latent_dim", 2), **kwargs)
        return net, arrays.get("params")
    raise ValueError(f"Unsupported ensemble model type: {model_type}")
