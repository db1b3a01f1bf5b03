"""Deep ensemble training — vmapped over ensemble members.

Parity: `atomai/trainers/etrainer.py:29-513` —
``train_ensemble_from_scratch`` (N re-inits, per-model batch seed,
:109-151), ``train_ensemble_from_baseline`` (N short fine-tunes from a
shared baseline + weight averaging, :153-232), ``train_swag`` (SWAG-like
weight sampling from running SWA statistics, :234-271 +
`atomai/utils/nn.py:84-117`), ensemble metadict save (:290-298).

TPU-first redesign (SURVEY.md §2.10): the reference trains members
SEQUENTIALLY (`etrainer.py:144-151`). Here all members train
SIMULTANEOUSLY — parameters, optimizer states, batch schedules and PRNG
keys carry a leading member axis and the per-cycle step is ``jax.vmap``-ed
over it, inside one ``lax.scan``-over-cycles jitted program. On a multi-chip
mesh the member axis shards across devices (`atomai_tpu/core/mesh.py`
MODEL_AXIS).
"""

import warnings
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.checkpoint import save_checkpoint
from ..core.mesh import (MODEL_AXIS, resolve_model_mesh,
                         shard_member_stacked)
from ..losses_metrics import iou_score
from ..nets import init_fcnn_model, init_imspec_model
from ..utils import preproc
from ..utils.nn import sample_weights
from .trainer import BaseTrainer, _shuffled_batch_schedule


def set_data_seg(X_train, y_train, X_test=None, y_test=None,
                 nb_classes_set: int = 1, **kwargs):
    """Validates/splits/casts segmentation data
    (reference `etrainer.py:437-469`). NHWC layout."""
    nb_classes = preproc.num_classes_from_labels(np.asarray(y_train))
    if nb_classes != nb_classes_set:
        raise AssertionError(
            "Number of specified classes is different from the number of "
            "classes contained in training data")
    if X_test is None or y_test is None:
        X_train, y_train, X_test, y_test = preproc.data_split(
            X_train, y_train, kwargs.get("test_size", .15),
            kwargs.get("seed", 1))
    X_train, y_train, X_test, y_test = preproc.check_image_dims(
        X_train, y_train, X_test, y_test, nb_classes)
    return preproc.cast_image_arrays(X_train, y_train, X_test, y_test,
                                     nb_classes)


def set_data_imspec(X_train, y_train, X_test=None, y_test=None,
                    dims=None, **kwargs):
    """Validates/splits/casts im2spec / spec2im data
    (reference `etrainer.py:471-500`)."""
    if X_test is None or y_test is None:
        X_train, y_train, X_test, y_test = preproc.data_split(
            X_train, y_train, kwargs.get("test_size", .15),
            kwargs.get("seed", 1))
    X_train, y_train, X_test, y_test = preproc.check_signal_dims(
        X_train, y_train, X_test, y_test)
    if dims is not None:
        # check_signal_dims canonicalizes to (n, h, w) / (n, length)
        in_dim, out_dim = X_train.shape[1:], y_train.shape[1:]
        if tuple(dims[0]) != tuple(in_dim) or tuple(dims[1]) != tuple(out_dim):
            raise AssertionError(
                "The input/output dimensions of the model must match "
                "the height, width and length (for spectra) of training")
    f32 = lambda a: np.asarray(a, np.float32)  # noqa: E731
    return f32(X_train), f32(y_train), f32(X_test), f32(y_test)


def accuracy_fn_seg(nb_classes: int):
    """Returns an IoU accuracy callable (reference `etrainer.py:503-513`)."""
    # nb_classes is accepted for signature parity; the class count is
    # inferred from the logits' channel axis
    def accuracy(y, y_prob, *args):
        return iou_score(y, y_prob)
    return accuracy


def _stack_trees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _unstack_tree(tree, n):
    # One overlapped device->host transfer of the whole stacked tree, then
    # zero-copy numpy views per member. Eagerly slicing on device would
    # dispatch n * n_leaves tiny ops and fetch each leaf separately —
    # ruinous over a remote-TPU tunnel (~0.14 s latency per fetch).
    host = jax.device_get(tree)
    return [jax.tree.map(lambda x: x[i], host) for i in range(n)]


class BaseEnsembleTrainer(BaseTrainer):
    """Base class for deep ensemble training
    (reference `etrainer.py:29-298`)."""

    def __init__(self, model=None, nb_classes=None, **kwargs):
        super().__init__(seed=kwargs.get("seed", 1))
        if model is not None:
            self.net = model
            self.nb_classes = nb_classes
        self.ensemble_state_dict: Dict[int, Any] = {}
        self.ensemble_batch_stats: Dict[int, Any] = {}
        self.kdict: Dict[str, Any] = {}

    def compile_ensemble_trainer(self, **kwargs) -> None:
        """Stores compile kwargs (reference `etrainer.py:48-60`).

        ``mesh``: device mesh for member sharding — ``None`` (default)
        auto-builds one over all devices when more than one is present,
        ``False`` disables sharding, or pass a ``jax.sharding.Mesh``.

        ``member_layout``: ``'auto'`` (default) | ``'map'`` | ``'vmap'`` —
        how the member axis lowers inside the jitted step (see
        :meth:`_member_layout`).
        """
        # member-sharding mesh; kept separate from BaseTrainer.mesh (the
        # batch/DP mesh used by _shard_stacked). mesh=False disables ALL
        # parallelism, including the baseline fit's auto data mesh.
        self.member_mesh = kwargs.pop("mesh", None)
        self.kdict = kwargs
        # member training parallelizes over the MEMBER axis (shard_map
        # with replicated batches) — staged batches must not be committed
        # to a competing data mesh there; single-model baseline/SWAG fits
        # have no member axis and DO use the auto data mesh (train_baseline
        # normalizes placement afterwards)
        self.kdict.pop("mesh", None)
        self.full_epoch = self.kdict.get("full_epoch", False)
        self.batch_size = self.kdict.get("batch_size", 32)
        self.remat = bool(self.kdict.get("remat", False))
        self.kdict["overwrite_train_data"] = False

    def _resolve_mesh(self, n_models: int):
        """Mesh over which member-stacked state shards (or None)."""
        return resolve_model_mesh(getattr(self, "member_mesh", None),
                                  n_models)

    def _member_layout(self) -> str:
        """How the member axis lowers inside the jitted train step.

        ``"map"`` (sequential `lax.map`, ordinary convs) vs ``"vmap"``
        (grouped convs). ``"auto"`` picks "map" on accelerators — measured
        16% faster at config-D shapes — and "vmap" on CPU, whose
        threaded conv runtime prefers the single grouped call and whose
        golden tests pin the vmap numerics.
        """
        layout = self.kdict.get("member_layout", "auto")
        if layout == "auto":
            layout = "map" if jax.default_backend() != "cpu" else "vmap"
        if layout not in ("map", "vmap"):
            raise ValueError("member_layout must be 'auto'|'map'|'vmap'")
        return layout

    # ------------------------------------------------------ vmapped core
    def _vmapped_train(self, n_models: int, cycles: int,
                       from_params=None, augment_fn=None,
                       seed_offset: int = 0, swa: bool = False):
        """Trains n_models members simultaneously; returns list of param
        pytrees (one per member)."""
        tx = optax.adam(1e-3) if self.tx is None else self.tx
        criterion = self.criterion
        has_bn = self.batch_stats is not None
        Xb, yb = self.Xb_train, self.yb_train
        nb = int(Xb.shape[0])

        # per-member init: one vmapped (jit-cached) init over member keys
        # instead of n_models sequential flax traces + a host-side stack
        if from_params is None:
            keys = jax.random.split(self.keys.next(), n_models)
            x0 = self._example_input()
            init_key = (id(self.net), tuple(x0.shape), n_models)
            vinit_cache = getattr(self, "_vinit_cache", None)
            if vinit_cache is None:
                vinit_cache = self._vinit_cache = {}
            vinit = vinit_cache.get(init_key)
            if vinit is None:
                vinit = jax.jit(jax.vmap(
                    lambda k: dict(self.net.init(
                        {"params": k, "dropout": k}, x0, False))))
                vinit_cache[init_key] = vinit
            stacked = vinit(keys)
            params_stack = stacked["params"]
            bs_stack = stacked.get("batch_stats")
        else:
            params_stack = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n_models,) + x.shape),
                from_params)
            bs_stack = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n_models,) + x.shape),
                self.batch_stats) if has_bn else None

        opt_stack = jax.vmap(tx.init)(params_stack)

        # per-member batch schedules (reference per-model batch seeds,
        # `etrainer.py:144-146, 222-224`)
        sched = np.stack([
            _shuffled_batch_schedule(nb, cycles, i + seed_offset)
            for i in range(n_models)])  # (n_models, cycles)
        sched = jnp.asarray(sched)
        mkeys = jax.random.split(self.keys.next(), n_models)

        # shard member-stacked state across the mesh model axis; batches
        # replicate (XLA propagates the shardings through the scan)
        mesh = self._resolve_mesh(n_models)
        if mesh is not None:
            params_stack = shard_member_stacked(params_stack, mesh)
            if bs_stack is not None:
                bs_stack = shard_member_stacked(bs_stack, mesh)
            opt_stack = shard_member_stacked(opt_stack, mesh)
            sched = shard_member_stacked(sched, mesh)
            mkeys = shard_member_stacked(mkeys, mesh)

        swa_cycles = min(30, cycles)
        engine_key = (n_models, cycles, has_bn, bool(swa), id(augment_fn),
                      id(criterion), tuple(Xb.shape), tuple(yb.shape),
                      mesh, self._member_layout(), self.remat)
        cache = getattr(self, "_ens_engines", None)
        if cache is None:
            cache = self._ens_engines = {}
        if engine_key in cache:
            run_all, jit_vstep = cache[engine_key]
        else:
            run_all, jit_vstep = self._build_ens_engine(
                n_models, cycles, has_bn, swa, augment_fn, mesh, tx,
                criterion)
            cache[engine_key] = (run_all, jit_vstep)

        if self._cpu_loop_engine():
            # XLA:CPU runs scan bodies single-threaded; python-loop the
            # jitted vmapped step instead
            swa_sum = jax.tree.map(jnp.zeros_like, params_stack)
            swa_sq = jax.tree.map(jnp.zeros_like, params_stack)
            losses_all = []
            sched_np = np.asarray(sched)
            for e in range(cycles):
                keys_e = jax.vmap(
                    lambda k: jax.random.fold_in(k, e))(mkeys)
                params_stack, bs_stack, opt_stack, swa_sum, swa_sq, \
                    losses_e = jit_vstep(
                        params_stack, bs_stack, opt_stack, swa_sum,
                        swa_sq, jnp.asarray(sched_np[:, e]), keys_e,
                        jnp.int32(e), Xb, yb)
                losses_all.append(losses_e)
            if swa:
                params_stack = jax.tree.map(
                    lambda s: s / swa_cycles, swa_sum)
            losses = jnp.stack(losses_all)
        else:
            # kept for roofline accounting (bench.py lowers the engine to
            # read XLA's post-fusion bytes-accessed estimate); store
            # ABSTRACT shapes only — lower() needs avals, and keeping the
            # live pre-training stacks would pin a second copy of the
            # member+optimizer state in HBM for the trainer's lifetime.
            # Under the "map" layout XLA counts the member-loop body
            # once, so byte totals scale by the member count
            self._engine_probe = (run_all, jax.eval_shape(
                lambda *a: a, params_stack, bs_stack, opt_stack, sched,
                mkeys, Xb, yb))
            self._engine_bytes_scale = (
                n_models if self._member_layout() == "map" else 1)
            params_stack, bs_stack, losses = run_all(
                params_stack, bs_stack, opt_stack, sched, mkeys, Xb, yb)
        self.loss_acc["train_loss"].extend(
            np.asarray(losses).mean(axis=1).tolist())
        return params_stack, bs_stack

    def _build_ens_engine(self, n_models, cycles, has_bn, swa, augment_fn,
                          mesh, tx, criterion):
        """Builds the jitted simultaneous-member engines. All arrays enter
        as arguments (no data in the closure) so the compiled program is
        reusable across train_ensemble_* calls with the same config —
        repeated ensemble training (active-learning loops, benchmarking)
        pays XLA compilation once."""
        swa_cycles = min(30, cycles)
        swa_start = cycles - swa_cycles

        def member_step(params, batch_stats, opt_state, swa_sum, swa_sq,
                        bi, key, e, Xb, yb):
            X = Xb[bi]
            y = yb[bi]
            k_aug, k_drop = jax.random.split(key)
            if augment_fn is not None:
                X, y = augment_fn(k_aug, X, y)

            def apply_train(p, bs_in, X_in, k_in):
                variables = {"params": p}
                if has_bn:
                    variables["batch_stats"] = bs_in
                    out, mut = self.net.apply(
                        variables, X_in, True, mutable=["batch_stats"],
                        rngs={"dropout": k_in})
                    return out, mut["batch_stats"]
                out = self.net.apply(variables, X_in, True,
                                     rngs={"dropout": k_in})
                return out, bs_in

            if getattr(self, "remat", False):
                # N members' activations are resident at once — the
                # highest-HBM-pressure path, so honor fit(remat=True) here
                apply_train = jax.checkpoint(apply_train)

            def loss_fn(p):
                out, new_bs = apply_train(p, batch_stats, X, k_drop)
                return criterion(out, y), new_bs

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if swa:
                upd = (e >= swa_start).astype(jnp.float32)
                swa_sum = jax.tree.map(
                    lambda s, p: s + upd * p, swa_sum, params)
                swa_sq = jax.tree.map(
                    lambda s, p: s + upd * p * p, swa_sq, params)
            return params, new_bs, opt_state, swa_sum, swa_sq, loss

        layout = self._member_layout()
        if layout == "map":
            # Sequential members inside the one jitted program: each
            # member's convolutions lower to ordinary (non-grouped) convs.
            # Measured on TPU at config-D shapes (4x UNet-16, batch 8,
            # 512^2): 16% faster than the grouped-conv vmap lowering and
            # ~86% HBM utilization vs 66%
            # (scripts/ensemble_layout_experiment.py). The chip executes
            # one program serially either way, so nothing is lost to the
            # serialization; members still shard across devices via the
            # shard_map below, which maps over the LOCAL member slice.
            if has_bn:
                def vstep(params, bs, opt, ssum, ssq, bis, keys, e, Xb,
                          yb):
                    return jax.lax.map(
                        lambda s: member_step(*s, e, Xb, yb),
                        (params, bs, opt, ssum, ssq, bis, keys))
            else:
                def vstep(params, bs, opt, ssum, ssq, bis, keys, e, Xb,
                          yb):
                    return jax.lax.map(
                        lambda s: member_step(s[0], bs, *s[1:], e, Xb,
                                              yb),
                        (params, opt, ssum, ssq, bis, keys))
        else:
            vstep = jax.vmap(member_step,
                             in_axes=(0, 0 if has_bn else None, 0, 0, 0,
                                      0, 0, None, None, None))

        if mesh is not None:
            # Explicit SPMD over the member axis: each device trains its
            # local members; batches replicate. (GSPMD auto-partitioning is
            # avoided — it cannot split the vmapped grouped convolutions.)
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            M, R = P(MODEL_AXIS), P()
            bspec = M if has_bn else R
            vstep = shard_map(
                vstep, mesh=mesh,
                in_specs=(M, bspec, M, M, M, M, M, R, R, R),
                out_specs=(M, bspec, M, M, M, M),
                check_vma=False)

        @jax.jit
        def run_all(params_stack, bs_stack, opt_stack, sched, mkeys,
                    Xb, yb):
            zeros = jax.tree.map(jnp.zeros_like, params_stack)

            def cycle(carry, xs):
                params_stack, bs_stack, opt_stack, swa_sum, swa_sq = carry
                e, bis = xs
                keys_e = jax.vmap(
                    lambda k: jax.random.fold_in(k, e))(mkeys)
                params_stack, bs_stack, opt_stack, swa_sum, swa_sq, \
                    losses = vstep(params_stack, bs_stack, opt_stack,
                                   swa_sum, swa_sq, bis, keys_e, e,
                                   Xb, yb)
                return ((params_stack, bs_stack, opt_stack, swa_sum,
                         swa_sq), losses)

            (params_stack, bs_stack, opt_stack, swa_sum, swa_sq), losses \
                = jax.lax.scan(
                    cycle,
                    (params_stack, bs_stack, opt_stack, zeros,
                     jax.tree.map(jnp.zeros_like, params_stack)),
                    (jnp.arange(cycles), sched.T))
            if swa:
                params_stack = jax.tree.map(
                    lambda s: s / swa_cycles, swa_sum)
            return params_stack, bs_stack, losses

        return run_all, jax.jit(vstep)

    # -------------------------------------------------------- strategies
    def train_baseline(self, X_train, y_train, X_test=None, y_test=None,
                       seed: int = 1, augment_fn=None):
        """Trains a single baseline model (reference
        `etrainer.py:62-107`)."""
        if self.net is None:
            raise AssertionError("You need to set a model first")
        self._reset_rng(seed)
        self._reset_training_history()
        self.tx = None
        self.opt_state = None
        self.params = None
        # the single-model fit has no member axis: let it data-shard over
        # the auto mesh (unless the user disabled parallelism outright)
        kd = dict(self.kdict)
        kd["mesh"] = False if self.member_mesh is False else None
        self.compile_trainer((X_train, y_train, X_test, y_test), **kd)
        self.data_augmentation(augment_fn)
        self.fit()
        if self.mesh is not None:
            # de-commit trained state and staged batches from the data
            # mesh so the member phase (shard_map over the MEMBER axis)
            # can place them on its own mesh without device conflicts
            self.params = jax.device_get(self.params)
            if self.batch_stats is not None:
                self.batch_stats = jax.device_get(self.batch_stats)
            if getattr(self, "running_weights_stats", None) is not None:
                self.running_weights_stats = jax.device_get(
                    self.running_weights_stats)
            self.Xb_train = jnp.asarray(jax.device_get(self.Xb_train))
            self.yb_train = jnp.asarray(jax.device_get(self.yb_train))
        return self.net

    def train_ensemble_from_scratch(self, X_train, y_train, X_test=None,
                                    y_test=None, n_models: int = 10,
                                    augment_fn=None, **kwargs):
        """All members train simultaneously from distinct inits
        (reference sequential loop `etrainer.py:109-151`)."""
        self.update_training_parameters(kwargs)
        print("Training ensemble models (strategy = 'from_scratch')")
        self._prepare(X_train, y_train, X_test, y_test)
        cycles = self.kdict.get("training_cycles", 1000)
        params_stack, bs_stack = self._vmapped_train(
            n_models, cycles, from_params=None, augment_fn=augment_fn,
            seed_offset=0, swa=self.kdict.get("swa", False))
        self.params_stack = params_stack  # member-axis-sharded on a mesh
        members = self._collect_members(params_stack, bs_stack, n_models)
        last = members[-1]
        self.params = last["params"] if "params" in last else last
        self.save_ensemble_metadict()
        return self.net, self.ensemble_state_dict

    def train_ensemble_from_baseline(self, X_train, y_train, X_test=None,
                                     y_test=None, basemodel=None,
                                     n_models: int = 10,
                                     training_cycles_base: int = 1000,
                                     training_cycles_ensemble: int = 100,
                                     augment_fn=None, **kwargs):
        """Baseline training then simultaneous short fine-tunes
        (reference `etrainer.py:153-232`)."""
        self.update_training_parameters(kwargs)
        if basemodel is None:
            self.kdict["training_cycles"] = training_cycles_base
            print("Training baseline model...")
            self.train_baseline(X_train, y_train, X_test, y_test, 1,
                                augment_fn)
            baseline_params = self.params
        else:
            baseline_params = basemodel.params if hasattr(
                basemodel, "params") else basemodel
            self._prepare(X_train, y_train, X_test, y_test)
            self._maybe_init_model()
        print("\nTraining ensemble models (strategy = 'from_baseline')")
        self.kdict["training_cycles"] = training_cycles_ensemble
        params_stack, bs_stack = self._vmapped_train(
            n_models, training_cycles_ensemble,
            from_params=baseline_params, augment_fn=augment_fn,
            seed_offset=2, swa=self.kdict.get("swa", False))
        self.params_stack = params_stack  # member-axis-sharded on a mesh
        host_params = jax.device_get(params_stack)
        self._collect_members(params_stack, bs_stack, n_models,
                              host_params=host_params)
        # final model carries the ensemble-averaged weights
        self.params = jax.tree.map(lambda x: x.mean(axis=0), host_params)
        self.save_ensemble_metadict()
        return self.net, self.ensemble_state_dict

    def train_swag(self, X_train, y_train, X_test=None, y_test=None,
                   n_models: int = 10, augment_fn=None, **kwargs):
        """SWAG-like weight sampling from SWA running moments
        (reference `etrainer.py:234-271`)."""
        self.update_training_parameters(kwargs)
        self.kdict["swa"] = True
        self.train_baseline(X_train, y_train, X_test, y_test, 1,
                            augment_fn)
        mean, var = self.running_weights_stats
        samples = sample_weights(mean, var, self.keys.next(), n_models)
        if self.batch_stats is not None:
            # weight samples share the baseline's BN running statistics
            # (SWAG samples weights only); full-state members keep the
            # EnsemblePredictor contract uniform
            samples = [{"params": s, "batch_stats": self.batch_stats}
                       for s in samples]
        self.ensemble_state_dict = {i: s for i, s in enumerate(samples)}
        self.save_ensemble_metadict()
        return self.net, self.ensemble_state_dict

    # ------------------------------------------------------------- misc
    def _collect_members(self, params_stack, bs_stack, n_models: int,
                         host_params=None):
        """Unstacks trained members into ``ensemble_state_dict``.

        Members are FULL state dicts ``{"params", "batch_stats"}`` when
        the net carries BatchNorm — the analog of the reference's
        state_dict-per-member (incl. BN buffers, `etrainer.py:128-138`)
        and the exact form ``load_ensemble`` returns, so
        ``EnsemblePredictor(smodel, ensemble)`` works without manually
        threading ``batch_stats``. Bare param trees otherwise."""
        if host_params is None:
            host_params, host_bs = jax.device_get((params_stack, bs_stack))
        else:
            host_bs = jax.device_get(bs_stack) if bs_stack is not None \
                else None
        members = [jax.tree.map(lambda x: x[i], host_params)
                   for i in range(n_models)]
        if host_bs is not None:
            # every member keeps ITS OWN BatchNorm running statistics for
            # prediction (the reference swaps full state_dicts incl. BN
            # buffers, `epredictor.py:142-159`; sharing one member's stats
            # corrupts the others' eval-mode forwards)
            self.ensemble_batch_stats = {
                i: jax.tree.map(lambda x: x[i], host_bs)
                for i in range(n_models)}
            self.batch_stats = self.ensemble_batch_stats[n_models - 1]
            members = [{"params": p,
                        "batch_stats": self.ensemble_batch_stats[i]}
                       for i, p in enumerate(members)]
        self.ensemble_state_dict = {i: m for i, m in enumerate(members)}
        return members

    def _prepare(self, X_train, y_train, X_test, y_test):
        """Stages data + loss + model for MEMBER training (no fit):
        batches must stay off any data mesh — the member engine
        shard_maps over the member axis with replicated batches."""
        kd = {k: v for k, v in self.kdict.items()}
        kd["training_cycles"] = 1
        kd["mesh"] = False
        self.compile_trainer((X_train, y_train, X_test, y_test), **kd)

    def update_training_parameters(self, kwargs) -> None:
        """(reference `etrainer.py:273-281`)"""
        warn_msg = ("Overwriting the initial value '{}' of parameter "
                    "'{}' with new value '{}'")
        for k, v in kwargs.items():
            if k in self.kdict:
                warnings.warn(warn_msg.format(self.kdict[k], k, v),
                              UserWarning)
            self.kdict[k] = v

    def save_ensemble_metadict(self, filename: Optional[str] = None
                               ) -> str:
        """Saves ensemble metadict (reference `etrainer.py:283-298`)."""
        fname = self.filename if filename is None else filename
        meta = {k: v for k, v in self.meta_state_dict.items()
                if k not in ("weights", "optimizer")}
        # on-disk format keeps bare param trees under "ensemble" with BN
        # stats alongside (what load_ensemble reassembles into full-state
        # members)
        arrays = {"params": self.params if self.params is not None else {},
                  "ensemble": {
                      str(k): (v["params"] if isinstance(v, dict)
                               and "params" in v else v)
                      for k, v in self.ensemble_state_dict.items()}}
        if self.ensemble_batch_stats:
            arrays["ensemble_batch_stats"] = {
                str(k): v for k, v in self.ensemble_batch_stats.items()}
        if self.batch_stats is not None:
            arrays["batch_stats"] = self.batch_stats
        return save_checkpoint(fname + "_ensemble_metadict", meta, arrays)


class EnsembleTrainer(BaseEnsembleTrainer):
    """Deep ensemble trainer (reference `etrainer.py:300-427`).

    Example:
        >>> etrainer = aoi.trainers.EnsembleTrainer("Unet", nb_classes=3)
        >>> etrainer.compile_ensemble_trainer(training_cycles=500)
        >>> smodel, ensemble = etrainer.train_ensemble_from_scratch(
        >>>     images, labels, images_test, labels_test, n_models=10)
    """

    def __init__(self, model: Union[str, Any] = None, nb_classes: int = 1,
                 **kwargs):
        super().__init__(**kwargs)
        self.nb_classes = nb_classes
        self.in_dim = self.out_dim = None
        if isinstance(model, str):
            if model in ("Unet", "dilnet", "SegResNet", "ResHedNet"):
                self.net, self.meta_state_dict = init_fcnn_model(
                    model, self.nb_classes, **kwargs)
                self._task = "seg"
            elif model == "imspec":
                missing = [k for k in ("in_dim", "out_dim", "latent_dim")
                           if k not in kwargs]
                if missing:
                    raise AssertionError(
                        "Specify input, output, and latent dimensions "
                        "(Missing dimensions: {})".format(
                            str(missing)[1:-1]))
                self.in_dim = kwargs.pop("in_dim")
                self.out_dim = kwargs.pop("out_dim")
                latent_dim = kwargs.pop("latent_dim")
                self.net, self.meta_state_dict = init_imspec_model(
                    self.in_dim, self.out_dim, latent_dim, **kwargs)
                self._task = "imspec"
            else:
                raise NotImplementedError(
                    "Pass one of 'Unet', 'dilnet', 'SegResNet', "
                    "'ResHedNet', 'imspec' or a custom module")
        else:
            self.net = model
            self._task = "custom"

    def accuracy_fn(self, y, y_prob):
        if self._task == "seg":
            return iou_score(y, y_prob)
        raise NotImplementedError

    def set_data(self, X_train, y_train, X_test=None, y_test=None,
                 **kwargs) -> None:
        """Task-aware data canonicalization (reference set_data_seg /
        set_data_imspec, `etrainer.py:430-500`)."""
        if self._task == "seg":
            nb_classes = preproc.num_classes_from_labels(
                np.asarray(y_train))
            if nb_classes != self.nb_classes:
                raise AssertionError(
                    "Number of specified classes is different from the "
                    "number of classes contained in training data")
            if X_test is None or y_test is None:
                X_train, y_train, X_test, y_test = preproc.data_split(
                    X_train, y_train, kwargs.get("test_size", .15),
                    kwargs.get("seed", 1))
            X_train, y_train, X_test, y_test = preproc.check_image_dims(
                X_train, y_train, X_test, y_test, nb_classes)
            X_train = np.asarray(X_train, np.float32)
            X_test = np.asarray(X_test, np.float32)
            if nb_classes > 1:
                y_train = np.asarray(y_train, np.int32)
                y_test = np.asarray(y_test, np.int32)
            else:
                y_train = np.asarray(y_train, np.float32)
                y_test = np.asarray(y_test, np.float32)
        else:
            if X_test is None or y_test is None:
                X_train, y_train, X_test, y_test = preproc.data_split(
                    X_train, y_train, kwargs.get("test_size", .15),
                    kwargs.get("seed", 1))
            if self._task == "imspec":
                X_train, y_train, X_test, y_test = \
                    preproc.check_signal_dims(X_train, y_train, X_test,
                                              y_test)
            X_train = np.asarray(X_train, np.float32)
            y_train = np.asarray(y_train, np.float32)
            X_test = np.asarray(X_test, np.float32)
            y_test = np.asarray(y_test, np.float32)
        self._stage_batches(X_train, y_train, X_test, y_test)
