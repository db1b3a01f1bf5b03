"""Ensemble prediction with uncertainty — vmapped over members.

Parity: `atomai/predictors/epredictor.py:21-267` — per-pixel mean+variance
over ensemble predictions (:121-161), batched prediction (:163-189),
output-shape inference for image/spectra in/out combos (:81-102), and
``ensemble_locate`` (coordinates for every ensemble prediction + DBSCAN
clustering into per-atom position mean/variance, :238-267).

TPU-first redesign: the reference swaps each member's state_dict into one
skeleton sequentially (`epredictor.py:142-159`). Here member parameters are
stacked with a leading axis and a single ``jax.vmap``-ed forward computes
every member's prediction at once; mean/variance reduce on device.
"""

from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.coords import cluster_coord
from ..utils.preproc import format_image, format_spectra
from .predictor import BasePredictor, Locator


class EnsemblePredictor(BasePredictor):
    """Prediction with an ensemble of models.

    Example:
        >>> p = aoi.predictors.EnsemblePredictor(skeleton, ensemble,
        >>>                                      nb_classes=3)
        >>> nn_out_mean, nn_out_var = p.predict(expdata)
    """

    def __init__(self, skeleton, ensemble: Dict[int, Any],
                 data_type: str = "image", output_type: str = "image",
                 nb_classes: Optional[int] = None,
                 in_dim: Optional[Tuple[int, ...]] = None,
                 out_dim: Optional[Tuple[int, ...]] = None,
                 batch_stats=None, **kwargs):
        super().__init__(skeleton, None, batch_stats, **kwargs)
        if output_type not in ("image", "spectra"):
            raise TypeError(
                "Supported output types are 'image' and 'spectra'")
        inout = [data_type, output_type]
        inout_d = not all([in_dim, out_dim])
        if inout in (["image", "spectra"], ["spectra", "image"]) and \
                inout_d:
            raise TypeError(
                "Specify input (in_dim) & output (out_dim) dimensions")
        self.ensemble = ensemble
        # stack member params along a leading axis for vmapped forward;
        # members may be bare param trees or full variable dicts
        # ({"params": ..., "batch_stats": ...}, the reference's
        # full-state_dict-per-member form)
        # digit-string keys (e.g. after a JSON round-trip) must sort
        # numerically — the SAME order the per-member batch_stats dict
        # uses below, or member 10 would run with member 2's BN stats
        def _member_order(k):
            return int(k) if isinstance(k, str) and k.isdigit() else k
        members = [ensemble[i]
                   for i in sorted(ensemble.keys(), key=_member_order)]
        if members and all(isinstance(m, dict) and "params" in m
                           for m in members):
            if batch_stats is None and "batch_stats" in members[0]:
                batch_stats = {i: m["batch_stats"]
                               for i, m in enumerate(members)}
            members = [m["params"] for m in members]
        self.params_stack = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *members)
        self.n_models = len(members)
        # batch_stats may be one shared tree OR a {member: tree} dict with
        # per-member BatchNorm running statistics (the correct analog of
        # the reference's full state_dict swap, `epredictor.py:142-159`)
        self.batch_stats_stack = None
        bs = batch_stats
        if isinstance(bs, dict) and bs and all(
                isinstance(k, int) or (isinstance(k, str) and k.isdigit())
                for k in bs):
            mem_bs = [bs[k] for k in sorted(bs, key=int)]
            if len(mem_bs) != self.n_models:
                raise ValueError(
                    f"batch_stats has {len(mem_bs)} members, ensemble has "
                    f"{self.n_models}")
            self.batch_stats_stack = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *mem_bs)
            batch_stats = None
            self.batch_stats = None
        # shard members across devices (mesh=None auto-builds over all
        # devices, mesh=False disables, or pass a jax.sharding.Mesh);
        # the reference swaps state_dicts sequentially on one device
        # (`epredictor.py:142-159`)
        from ..core.mesh import resolve_model_mesh, shard_member_stacked
        self._mesh = resolve_model_mesh(kwargs.get("mesh", None),
                                        self.n_models)
        if self._mesh is not None:
            self.params_stack = shard_member_stacked(self.params_stack,
                                                     self._mesh)
        self.data_type = data_type
        self.output_type = output_type
        self.nb_classes = nb_classes
        self.in_dim, self.out_dim = in_dim, out_dim
        self.logits = kwargs.get("logits", True)
        # 'auto' | 'map' | 'vmap' — see _make_ens_forward
        self.member_layout = kwargs.get("member_layout", "auto")
        # a constructor-level output_shape overrides inference for every
        # predict call; otherwise the shape is recomputed per call (a
        # cached first-call shape would corrupt later different-sized
        # predicts — silently, when element counts happen to coincide)
        self._user_output_shape = kwargs.get("output_shape")
        self.output_shape = self._user_output_shape
        verbose = kwargs.get("verbose", 1)
        self.everbose = bool(verbose)
        self.verbose = verbose > 1 if isinstance(verbose, int) else False
        self._jit_ens_forward = None
        self._jit_ens_stats = None

    def _set_output_shape(self, data) -> None:
        """Output-shape inference (reference `epredictor.py:81-102`),
        channel-last."""
        n = len(data)
        if self.data_type == self.output_type == "image":
            c = self.nb_classes if self.nb_classes else 1
            out_shape = (n, *data.shape[1:3], c)
        elif self.data_type == "spectra" and self.output_type == "image":
            c = self.nb_classes if self.nb_classes else 1
            out_shape = (n, *self.out_dim, c)
        elif self.data_type == "image" and self.output_type == "spectra":
            out_shape = (n, *self.out_dim, 1)
        elif self.data_type == self.output_type == "spectra":
            out_shape = (n, data.shape[1], 1)
        else:
            raise TypeError("Data not understood")
        self.output_shape = out_shape

    def preprocess(self, data, norm: bool = True):
        """(reference `epredictor.py:104-119`)"""
        data = np.asarray(data)
        if self.data_type == "image":
            if data.ndim == 2:
                data = data[None, ...]
            data = format_image(data, norm)
        else:
            if data.ndim == 1:
                data = data[None, ...]
            data = format_spectra(data, norm)
        return jnp.asarray(data)

    def _make_ens_forward(self):
        model = self.model
        nb = self.nb_classes or 0
        logits = self.logits
        batch_stats = self.batch_stats
        bs_stack = self.batch_stats_stack

        def member_fwd(params, member_bs, x):
            variables = {"params": params}
            if member_bs is not None:
                variables["batch_stats"] = member_bs
            elif batch_stats is not None:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, x, False)
            if logits:
                if nb > 1:
                    out = jax.nn.softmax(out, axis=-1)
                elif nb == 1:
                    out = jax.nn.sigmoid(out)
            else:
                if nb > 1:
                    out = jnp.exp(out)
            return out

        # member-axis layout mirrors BaseEnsembleTrainer._member_layout:
        # sequential lax.map lowers each member's convolutions as
        # ordinary (non-grouped) convs — measured 19% faster than the
        # grouped-conv vmap lowering at config-D inference shapes on TPU
        # (4x UNet-16, 8x512^2); vmap kept on CPU (threaded conv runtime
        # prefers one grouped call; golden tests pin its numerics)
        layout = getattr(self, "member_layout", "auto")
        if layout == "auto":
            layout = "map" if jax.default_backend() != "cpu" else "vmap"
        if layout == "map":
            if bs_stack is not None:
                def vfwd(ps, bss, x):
                    return jax.lax.map(
                        lambda s: member_fwd(s[0], s[1], x), (ps, bss))
            else:
                def vfwd(ps, x):
                    return jax.lax.map(lambda p: member_fwd(p, None, x),
                                       ps)
        elif bs_stack is not None:
            vfwd = jax.vmap(member_fwd, in_axes=(0, 0, None))
        else:
            vfwd = jax.vmap(lambda p, x: member_fwd(p, None, x),
                            in_axes=(0, None))
        if self._mesh is not None:
            # explicit SPMD over the member axis: each device runs its
            # local members' forwards; input replicates (GSPMD cannot
            # split the vmapped grouped convolutions)
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            from ..core.mesh import MODEL_AXIS
            M, R = P(MODEL_AXIS), P()
            in_specs = (M, M, R) if bs_stack is not None else (M, R)
            vfwd = shard_map(vfwd, mesh=self._mesh, in_specs=in_specs,
                             out_specs=M, check_vma=False)
        jitted = jax.jit(vfwd)
        if bs_stack is not None:
            if self._mesh is not None:
                from ..core.mesh import shard_member_stacked
                bs_stack = shard_member_stacked(bs_stack, self._mesh)
            return lambda p, x: jitted(p, bs_stack, x)
        return jitted

    def ensemble_forward(self, data, out_shape=None, num_batches: int = 1
                         ) -> np.ndarray:
        """All member predictions via the vmapped forward, chunked into
        ``num_batches`` dispatches (reference `epredictor.py:134-161`).
        Returns (n_models, n_samples, ...) — reshaped per model to
        ``out_shape`` when given."""
        if self._jit_ens_forward is None:
            self._jit_ens_forward = self._make_ens_forward()
        data = jnp.asarray(data)
        bsz = max(1, data.shape[0] // max(1, num_batches))
        futures = [self._jit_ens_forward(self.params_stack,
                                         data[s:s + bsz])
                   for s in range(0, data.shape[0], bsz)]
        preds = np.concatenate(
            [np.asarray(f) for f in jax.device_get(futures)], axis=1)
        if preds.ndim == 3:  # (models, n, length) -> add channel
            preds = preds[..., None]
        if out_shape is not None:
            preds = preds.reshape((self.n_models, *out_shape))
        return preds

    def ensemble_forward_(self, data, out_shape=None
                          ) -> Tuple[np.ndarray, np.ndarray]:
        """Mean and variance over members (reference
        `epredictor.py:121-132`)."""
        eprediction = self.ensemble_forward(data, out_shape)
        return np.mean(eprediction, axis=0), np.var(eprediction, axis=0)

    def ensemble_batch_predict(self, data, num_batches: int = 10
                               ) -> Tuple[np.ndarray, np.ndarray]:
        """Batch-by-batch ensemble prediction
        (reference `epredictor.py:163-189`)."""
        batch_size = len(data) // num_batches
        if batch_size < 1:
            # fewer items than requested chunks: ONE full-size chunk
            # (1 + (n-1) split would trace/compile two shapes for nothing)
            num_batches = 1
            batch_size = len(data)
        if self._jit_ens_forward is None:
            self._jit_ens_forward = self._make_ens_forward()
        if self._jit_ens_stats is None:
            fwd = self._jit_ens_forward

            @jax.jit
            def stats(params_stack, x):
                preds = fwd(params_stack, x)
                return jnp.mean(preds, axis=0), jnp.var(preds, axis=0)
            self._jit_ens_stats = stats
        # member mean/var reduce on device; all chunks dispatch before one
        # overlapped fetch (per-chunk host fetches would serialize on
        # device->host latency and move n_models x the data)
        futures = []
        for i in range(num_batches):
            if self.everbose:
                print("\rBatch {}/{}".format(i + 1, num_batches), end="")
            data_i = data[i * batch_size:(i + 1) * batch_size]
            futures.append(self._jit_ens_stats(self.params_stack,
                                               jnp.asarray(data_i)))
        data_i = data[num_batches * batch_size:]
        if len(data_i) > 0:
            futures.append(self._jit_ens_stats(self.params_stack,
                                               jnp.asarray(data_i)))
        ms, vs = zip(*jax.device_get(futures))

        def _fix(p):
            p = np.concatenate([np.asarray(x) for x in p])
            return p[..., None] if p.ndim == 3 else p
        return (_fix(ms).reshape(self.output_shape),
                _fix(vs).reshape(self.output_shape))

    def predict(self, data, num_batches: int = 10,
                format_out: str = "channel_last", norm: bool = True
                ) -> Tuple[np.ndarray, np.ndarray]:
        """Predicts mean and variance (reference
        `epredictor.py:191-235`)."""
        if format_out not in ("channel_first", "channel_last"):
            raise ValueError(
                "Specify channel_last or channel_first output format")
        data = self.preprocess(data, norm)
        if self._user_output_shape:
            self.output_shape = self._user_output_shape
        else:
            self._set_output_shape(data)
        mean, var = self.ensemble_batch_predict(data, num_batches)
        if format_out == "channel_first":
            axes = (0, mean.ndim - 1, *range(1, mean.ndim - 1))
            mean = mean.transpose(axes)
            var = var.transpose(axes)
        return mean, var


def ensemble_locate(nn_output_ensemble: np.ndarray, **kwargs
                    ) -> Tuple[Dict, Dict]:
    """Coordinates for every ensemble prediction + DBSCAN position
    mean/variance (reference `epredictor.py:238-267`).

    Args:
        nn_output_ensemble: (n_models, n_images, H, W, C) predictions.
    """
    eps = kwargs.get("eps", 0.5)
    thresh = kwargs.get("threshold", 0.5)
    # DBSCAN needs min_samples member-detections per atom; the reference
    # hardcodes 10 — forward it so small ensembles (< 10 members) can
    # still cluster
    min_samples = kwargs.get("min_samples", 10)
    n_models, n_images = nn_output_ensemble.shape[:2]
    # one batched Locator call over all (member, frame) maps instead of
    # n_models * n_images separate device dispatch+fetch rounds
    flat = np.reshape(np.asarray(nn_output_ensemble),
                      (n_models * n_images,
                       *nn_output_ensemble.shape[2:]))
    all_coords = Locator(thresh).run(flat)
    coord_mean_all = {}
    coord_var_all = {}
    for i in range(n_images):
        coordinates = {m: all_coords[m * n_images + i]
                       for m in range(n_models)}
        _, coord_mean, coord_var = cluster_coord(coordinates, eps,
                                                 min_samples)
        coord_mean_all[i] = coord_mean
        coord_var_all[i] = coord_var
    return coord_mean_all, coord_var_all
