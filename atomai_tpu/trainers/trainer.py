"""Functional training engine + task trainers.

Reference behavior ported from `atomai/trainers/trainer.py`:
- BaseTrainer (:42-607): loss selection, Adam(lr=1e-3) default (:539), two
  epoch modes — ``full_epoch`` (all minibatches per cycle, :253) vs
  1-cycle-=-1-random-minibatch with a precomputed shuffled batch-index
  schedule (:233, :545-555) — SWA over the last 5/30 epochs (:418-429),
  time-dependent weight perturbation w <- w + N(0, a/(1+e)^gamma)
  (:403-416), per-epoch LR schedule (:567-571), accuracy hook,
  loss/accuracy history (:98), model save (:344-358), final eval
  (:289-325).
- SegTrainer (:610-737), ImSpecTrainer (:740-857), RegTrainer/clsTrainer
  (:860-1046).

TPU-first redesign: training runs as chunks of ``jax.lax.scan`` over cycles
inside a single jitted program — no per-step Python dispatch, no host sync.
Data lives on device as stacked (n_batches, batch, ...) arrays; on-device
augmentation (`atomai_tpu/transforms/imaug.py`) is fused into the scanned
step. SWA keeps running first/second parameter moments (O(1) memory; the
second moment powers SWAG sampling, `atomai/utils/nn.py:84-117`).
"""

from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import unfreeze

from ..core.checkpoint import save_checkpoint
from ..core.prng import KeySeq
from ..core.state import SwaState
from ..losses_metrics import select_loss, iou_score
from ..nets import (init_fcnn_model, init_imspec_model, init_reg_model,
                    init_cls_model)
from ..utils import preproc


def _shuffled_batch_schedule(n_batches: int, cycles: int, seed: int
                             ) -> np.ndarray:
    """Batch-index schedule with the reference's repeat+shuffle semantics
    (`trainer.py:545-555`)."""
    r = cycles // n_batches
    idx = np.arange(n_batches).repeat(r + 1)[:cycles]
    rng = np.random.RandomState(seed)
    return rng.permutation(idx)


class BaseTrainer:
    """Generic supervised trainer (reference `trainer.py:42-607`)."""

    def __init__(self, seed: int = 1):
        self.keys = KeySeq(seed)
        self.seed = seed
        np.random.seed(seed)
        self.net = None
        self.params = None
        self.batch_stats = None
        self.criterion = None
        self.tx = None
        self.opt_state = None
        self.compute_accuracy = False
        self.full_epoch = True
        self.swa = False
        self.perturb_weights = False
        self.training_cycles = 0
        self.batch_idx_train = None
        self.batch_idx_test = None
        self.batch_size = 1
        self.nb_classes = None
        self.Xb_train = self.yb_train = None
        self.Xb_test = self.yb_test = None
        self.data_is_set = False
        self.augment_fn = None
        self.filename = "model"
        self.print_loss = 1
        self.lr_scheduler = None
        self.meta_state_dict: Dict[str, Any] = {}
        self.loss_acc = {"train_loss": [], "test_loss": [],
                         "train_accuracy": [], "test_accuracy": []}
        self.accuracy_metrics = None
        self.plot_training_history = False
        self._compiled_chunk = None
        self.mesh = None
        # the user's raw mesh preference (None=auto / False=disabled /
        # Mesh) — kept apart from the RESOLVED self.mesh so an explicit
        # mesh=False survives later compile calls that omit the kwarg
        self._mesh_pref = None
        self.remat = False
        self._final_eval_printed = False
        # "auto": python-loop jitted steps on XLA:CPU (scan bodies run
        # single-threaded there), scan-over-cycles on accelerators.
        # "scan"/"loop" force an engine (tests exercise scan on CPU).
        self.engine = "auto"

    def _cpu_loop_engine(self) -> bool:
        eng = getattr(self, "engine", "auto")
        if eng in ("scan", "loop"):
            return eng == "loop"
        return jax.default_backend() == "cpu"

    # -------------------------------------------------------------- rng
    def _reset_rng(self, seed: int) -> None:
        self.keys = KeySeq(seed)
        np.random.seed(seed)

    def _reset_weights(self) -> None:
        """Re-initializes network weights (reference Xavier re-init,
        `trainer.py:107-113`)."""
        variables = self._init_variables(self.keys.next())
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats")
        self.opt_state = None

    def _reset_training_history(self) -> None:
        self.loss_acc = {"train_loss": [], "test_loss": [],
                         "train_accuracy": [], "test_accuracy": []}

    # ------------------------------------------------------------- data
    def _example_input(self):
        if self.Xb_train is None:
            raise RuntimeError("Set data before initializing the model")
        x = np.asarray(self.Xb_train[0])
        return jnp.asarray(x[:1])

    def _init_variables(self, key):
        variables = self.net.init({"params": key, "dropout": key},
                                  self._example_input(), False)
        return unfreeze(variables) if hasattr(variables, "unfreeze") \
            else dict(variables)

    def _maybe_init_model(self):
        if self.params is None:
            variables = self._init_variables(self.keys.next())
            self.params = variables["params"]
            self.batch_stats = variables.get("batch_stats")
            if "weights" in self.meta_state_dict and isinstance(
                    self.meta_state_dict.get("weights"), dict):
                # weights preloaded (e.g. by load_model)
                self.params = self.meta_state_dict["weights"]

    def set_data(self, X_train, y_train, X_test=None, y_test=None,
                 **kwargs) -> None:
        """Generic data staging: canonicalize + stack into
        (n_batches, batch, ...) device arrays. Subclasses override
        preprocessing."""
        if X_test is None or y_test is None:
            X_train, y_train, X_test, y_test = preproc.data_split(
                X_train, y_train, kwargs.get("test_size", .15),
                kwargs.get("seed", 1))
        X_train = np.asarray(X_train, np.float32)
        y_train = np.asarray(y_train)
        X_test = np.asarray(X_test, np.float32)
        y_test = np.asarray(y_test)
        self._stage_batches(X_train, y_train, X_test, y_test)

    def _stage_batches(self, X_train, y_train, X_test, y_test):
        bs = self.batch_size
        self.Xb_train = jnp.asarray(preproc.stack_batches(X_train, bs))
        self.yb_train = jnp.asarray(preproc.stack_batches(y_train, bs))
        self.Xb_test = jnp.asarray(preproc.stack_batches(X_test, bs))
        self.yb_test = jnp.asarray(preproc.stack_batches(y_test, bs))
        if self.mesh is not None:
            self.Xb_train, self.yb_train, self.Xb_test, self.yb_test = (
                self._shard_stacked(a) for a in
                (self.Xb_train, self.yb_train, self.Xb_test,
                 self.yb_test))
        # the compiled cycle closes over the staged batches — a cached
        # chunk would silently keep training on the REPLACED data
        self._compiled_chunk = None
        self.data_is_set = True

    def _shard_stacked(self, a):
        """Shards the per-batch sample axis (axis 1 of the stacked
        (n_batches, batch, ...) array) over the mesh data axis — the DP
        layout under which jit inserts psum gradient collectives."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..core.mesh import DATA_AXIS
        n_data = self.mesh.shape[DATA_AXIS]
        if a.ndim >= 2 and a.shape[1] % n_data == 0:
            spec = P(None, DATA_AXIS, *([None] * (a.ndim - 2)))
        else:
            spec = P()
        return jax.device_put(a, NamedSharding(self.mesh, spec))

    def data_augmentation(self, augment_fn: Callable) -> None:
        """Sets a jittable augment_fn(key, X, y) -> (X, y)
        (`trainer.py:431-439`)."""
        self.augment_fn = augment_fn
        self._compiled_chunk = None

    # ----------------------------------------------------------- compile
    def get_loss_fn(self, loss: Union[str, Callable], nb_classes=None):
        return select_loss(loss, nb_classes)

    def compile_trainer(self, train_data: Optional[Tuple] = None,
                        loss: Union[str, Callable] = "ce",
                        optimizer: Optional[Any] = None,
                        training_cycles: int = 1000,
                        batch_size: int = 32,
                        compute_accuracy: bool = False,
                        full_epoch: bool = False,
                        swa: bool = False,
                        perturb_weights: bool = False,
                        **kwargs) -> None:
        """Compiles the trainer (reference contract `trainer.py:441-565`)."""
        self.full_epoch = full_epoch
        self.training_cycles = training_cycles
        self.batch_size = batch_size
        self.compute_accuracy = compute_accuracy
        self.swa = swa
        self.lr_scheduler = kwargs.get("lr_scheduler")
        # Multi-device data parallelism (SURVEY.md §2.10). Default: on a
        # multi-device host the data mesh auto-builds and batches shard
        # over its "data" axis (XLA inserts the gradient psum). Pass
        # mesh=False to opt out, or a jax.sharding.Mesh to control layout.
        from ..core.mesh import resolve_data_mesh
        self._mesh_pref = kwargs.get(
            "mesh", getattr(self, "_mesh_pref", None))
        self.mesh = resolve_data_mesh(self._mesh_pref, batch_size)

        if self.data_is_set:
            if kwargs.get("overwrite_train_data", True) and \
                    train_data is not None:
                self.set_data(*train_data, **kwargs)
        else:
            if train_data is None:
                raise ValueError("Provide training data")
            self.set_data(*train_data, **kwargs)

        # Gradient rematerialization (jax.checkpoint): recompute forward
        # activations during the backward pass instead of holding them in
        # HBM — trades FLOPs for memory so bigger batches / image sizes fit
        # on one chip. Exact (bit-identical gradients), off by default.
        self.remat = bool(kwargs.get("remat", self.remat))

        self.perturb_weights = perturb_weights
        if self.perturb_weights:
            if self.meta_state_dict.get("batchnorm",
                                        self.meta_state_dict.get(
                                            "batch_norm", False)):
                raise AssertionError(
                    "To use time-dependent weights perturbation, "
                    "turn off the batch normalization layers")
            if isinstance(self.perturb_weights, bool):
                e_p = 1 if self.full_epoch else 50
                self.perturb_weights = {"a": .01, "gamma": 1.5, "e_p": e_p}

        self._maybe_init_model()

        # optimizer: optax transform, string, or None -> Adam(1e-3)
        if self.tx is None:
            schedule = self._build_lr_schedule()
            if optimizer is None:
                self.tx = optax.adam(learning_rate=schedule)
            elif isinstance(optimizer, str):
                self.tx = {"adam": optax.adam,
                           "sgd": optax.sgd,
                           "adamw": optax.adamw}[optimizer](schedule)
            else:
                self.tx = optimizer
        if self.opt_state is None:
            self.opt_state = self.tx.init(self.params)

        if self.criterion is None:
            self.criterion = self.get_loss_fn(loss, self.nb_classes)

        if not self.full_epoch:
            # a constructor-level batch_seed (SegTrainer(..., batch_seed=7))
            # is the default; a compile-time kwarg overrides it
            batch_seed = kwargs.get(
                "batch_seed", getattr(self, "batch_seed", self.seed))
            self.batch_idx_train = _shuffled_batch_schedule(
                self.Xb_train.shape[0], training_cycles, batch_seed)
            self.batch_idx_test = _shuffled_batch_schedule(
                self.Xb_test.shape[0], training_cycles, batch_seed)

        self.print_loss = kwargs.get("print_loss")
        if self.print_loss is None:
            self.print_loss = 100 if not self.full_epoch else 1
        self.accuracy_metrics = kwargs.get("accuracy_metrics")
        # opt-in JSONL metrics stream (core/mlog.py): one object per
        # cycle, flushed per chunk — the reference only prints
        self.metrics_log = kwargs.get("metrics_log")
        self.filename = kwargs.get("filename", "./model")
        self.plot_training_history = kwargs.get("plot_training_history",
                                                False)
        self._compiled_chunk = None

    def _build_lr_schedule(self):
        if self.lr_scheduler is None:
            return 1e-3
        lrs = np.asarray(self.lr_scheduler, np.float32)
        if self.full_epoch:
            nb = max(int(self.Xb_train.shape[0]), 1)
            lrs = np.repeat(lrs, nb)
        lr_arr = jnp.asarray(lrs)

        def schedule(step):
            return lr_arr[jnp.minimum(step, lr_arr.shape[0] - 1)]
        return schedule

    # ------------------------------------------------------------ engine
    def accuracy_fn(self, y, y_prob):
        """Jittable accuracy metric; subclasses override."""
        raise NotImplementedError

    def _has_accuracy(self):
        try:
            self.accuracy_fn
            return self.compute_accuracy and type(self).accuracy_fn is not \
                BaseTrainer.accuracy_fn
        except Exception:
            return False

    def _apply_train(self, params, batch_stats, X, y, key):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            out, mutated = self.net.apply(
                variables, X, True, mutable=["batch_stats"],
                rngs={"dropout": key})
            new_bs = mutated["batch_stats"]
        else:
            out = self.net.apply(variables, X, True,
                                 rngs={"dropout": key})
            new_bs = None
        return out, new_bs

    def _apply_eval(self, params, batch_stats, X):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return self.net.apply(variables, X, False)

    def _make_cycle_fn(self):
        """Builds the jitted scanned cycle for the current config."""
        criterion = self.criterion
        tx = self.tx
        augment_fn = self.augment_fn
        compute_acc = self._has_accuracy()
        acc_fn = self.accuracy_fn if compute_acc else None
        swa_on = bool(self.swa)
        swa_epochs = 5 if self.full_epoch else 30
        swa_start = max(self.training_cycles - swa_epochs, 0)
        perturb = self.perturb_weights if isinstance(
            self.perturb_weights, dict) else None
        full_epoch = self.full_epoch
        has_bn = self.batch_stats is not None

        apply_train = self._apply_train
        if self.remat:
            apply_train = jax.checkpoint(apply_train)

        def loss_and_grads(params, batch_stats, X, y, key):
            def loss_fn(p):
                out, new_bs = apply_train(p, batch_stats, X, y, key)
                return criterion(out, y), (out, new_bs)
            (loss, (out, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return loss, out, new_bs, grads

        def train_one_batch(carry, X, y, key):
            params, batch_stats, opt_state = carry
            k_aug, k_drop = jax.random.split(key)
            if augment_fn is not None:
                X, y = augment_fn(k_aug, X, y)
            loss, out, new_bs, grads = loss_and_grads(
                params, batch_stats, X, y, k_drop)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acc = acc_fn(y, out) if compute_acc else jnp.float32(0)
            return (params, new_bs if has_bn else batch_stats,
                    opt_state), loss, acc

        def eval_one_batch(params, batch_stats, X, y, key):
            # test metrics are measured on CLEAN data — augmentation is a
            # training regularizer; evaluating on noised/warped test
            # batches would skew every model-selection decision (final
            # eval_model and the ensemble engine already evaluate clean)
            del key
            out = self._apply_eval(params, batch_stats, X)
            loss = criterion(out, y)
            acc = acc_fn(y, out) if compute_acc else jnp.float32(0)
            return loss, acc

        Xb_train, yb_train = self.Xb_train, self.yb_train
        Xb_test, yb_test = self.Xb_test, self.yb_test

        if not full_epoch:
            def cycle(carry, xs):
                params, batch_stats, opt_state, swa_state = carry
                e, bi_tr, bi_ts, key = xs
                k_tr, k_ts, k_p = jax.random.split(key, 3)
                X = Xb_train[bi_tr]
                y = yb_train[bi_tr]
                (params, batch_stats, opt_state), tr_loss, tr_acc = \
                    train_one_batch((params, batch_stats, opt_state),
                                    X, y, k_tr)
                ts_loss, ts_acc = eval_one_batch(
                    params, batch_stats, Xb_test[bi_ts], yb_test[bi_ts],
                    k_ts)
                if swa_on:
                    swa_state = jax.lax.cond(
                        e >= swa_start,
                        lambda s: s.update(params), lambda s: s, swa_state)
                if perturb is not None:
                    params = _maybe_perturb(params, e, k_p, perturb)
                return ((params, batch_stats, opt_state, swa_state),
                        (tr_loss, ts_loss, tr_acc, ts_acc))
        else:
            nb_tr = Xb_train.shape[0]
            nb_ts = Xb_test.shape[0]

            def cycle(carry, xs):
                params, batch_stats, opt_state, swa_state = carry
                e, key = xs

                def tr_body(c, i):
                    (params, batch_stats, opt_state, loss_sum,
                     acc_sum) = c
                    k = jax.random.fold_in(key, i)
                    (params, batch_stats, opt_state), loss, acc = \
                        train_one_batch((params, batch_stats, opt_state),
                                        Xb_train[i], yb_train[i], k)
                    return (params, batch_stats, opt_state,
                            loss_sum + loss, acc_sum + acc), None

                (params, batch_stats, opt_state, tr_loss_sum,
                 tr_acc_sum), _ = jax.lax.scan(
                    tr_body,
                    (params, batch_stats, opt_state, jnp.float32(0),
                     jnp.float32(0)), jnp.arange(nb_tr))

                def ts_body(c, i):
                    loss_sum, acc_sum = c
                    k = jax.random.fold_in(key, nb_tr + i)
                    loss, acc = eval_one_batch(
                        params, batch_stats, Xb_test[i], yb_test[i], k)
                    return (loss_sum + loss, acc_sum + acc), None

                (ts_loss_sum, ts_acc_sum), _ = jax.lax.scan(
                    ts_body, (jnp.float32(0), jnp.float32(0)),
                    jnp.arange(nb_ts))

                if swa_on:
                    swa_state = jax.lax.cond(
                        e >= swa_start,
                        lambda s: s.update(params), lambda s: s, swa_state)
                if perturb is not None:
                    params = _maybe_perturb(
                        params, e, jax.random.fold_in(key, -1), perturb)
                return ((params, batch_stats, opt_state, swa_state),
                        (tr_loss_sum / nb_tr, ts_loss_sum / nb_ts,
                         tr_acc_sum / nb_tr, ts_acc_sum / nb_ts))

        # XLA:CPU executes ops inside while/scan single-threaded (a ~30x
        # slowdown for conv workloads); on CPU backends we therefore jit
        # the per-batch steps and drive all loops from Python. On TPU the
        # scan-over-cycles form runs the whole chunk in one dispatch.
        if self._cpu_loop_engine():
            jit_train = jax.jit(train_one_batch)
            jit_eval = jax.jit(eval_one_batch)
            jit_swa = jax.jit(lambda s, p: s.update(p))

            def swa_update(swa_state, params, e):
                if swa_on and int(e) >= swa_start:
                    return jit_swa(swa_state, params)
                return swa_state

            if not full_epoch:
                def cycle_py(carry, xs):
                    params, batch_stats, opt_state, swa_state = carry
                    e, bi_tr, bi_ts, key = xs
                    k_tr, k_ts, k_p = jax.random.split(key, 3)
                    (params, batch_stats, opt_state), tr_loss, tr_acc = \
                        jit_train((params, batch_stats, opt_state),
                                  Xb_train[int(bi_tr)],
                                  yb_train[int(bi_tr)], k_tr)
                    ts_loss, ts_acc = jit_eval(
                        params, batch_stats, Xb_test[int(bi_ts)],
                        yb_test[int(bi_ts)], k_ts)
                    swa_state = swa_update(swa_state, params, e)
                    if perturb is not None:
                        params = _maybe_perturb(params, jnp.int32(e), k_p,
                                                perturb)
                    return ((params, batch_stats, opt_state, swa_state),
                            (tr_loss, ts_loss, tr_acc, ts_acc))
            else:
                nb_tr = int(Xb_train.shape[0])
                nb_ts = int(Xb_test.shape[0])

                def cycle_py(carry, xs):
                    params, batch_stats, opt_state, swa_state = carry
                    e, key = xs
                    tr_loss = tr_acc = 0.0
                    for i in range(nb_tr):
                        k = jax.random.fold_in(key, i)
                        (params, batch_stats, opt_state), loss, acc = \
                            jit_train((params, batch_stats, opt_state),
                                      Xb_train[i], yb_train[i], k)
                        tr_loss += loss
                        tr_acc += acc
                    ts_loss = ts_acc = 0.0
                    for i in range(nb_ts):
                        k = jax.random.fold_in(key, nb_tr + i)
                        loss, acc = jit_eval(params, batch_stats,
                                             Xb_test[i], yb_test[i], k)
                        ts_loss += loss
                        ts_acc += acc
                    swa_state = swa_update(swa_state, params, e)
                    if perturb is not None:
                        params = _maybe_perturb(
                            params, jnp.int32(e),
                            jax.random.fold_in(key, -1), perturb)
                    return ((params, batch_stats, opt_state, swa_state),
                            (tr_loss / nb_tr, ts_loss / nb_ts,
                             tr_acc / nb_tr, ts_acc / nb_ts))
            return cycle_py

        # standalone batch-step probes for byte accounting: in full-epoch
        # mode the chunk's cost analysis conflates the train and eval scan
        # bodies (each counted once), so per-cycle bytes must be rebuilt
        # as train_bytes*nb_train + eval_bytes*nb_test
        self._probe_batch_steps = (train_one_batch, eval_one_batch)

        @jax.jit
        def run_chunk(carry, xs):
            return jax.lax.scan(cycle, carry, xs)

        return run_chunk

    # --------------------------------------------------------------- run
    def run(self):
        """Trains the network (reference `trainer.py:573-605`)."""
        self._maybe_init_model()
        if self._compiled_chunk is None:
            self._compiled_chunk = self._make_cycle_fn()
        run_chunk = self._compiled_chunk
        cycles = self.training_cycles
        chunk = max(1, min(self.print_loss, cycles))
        swa_state = SwaState.init(self.params)
        carry = (self.params, self.batch_stats, self.opt_state, swa_state)
        all_keys = jax.random.split(self.keys.next(), cycles)
        cpu_loop = self._cpu_loop_engine()
        from ..core.mlog import open_metrics_log
        mlog = open_metrics_log(getattr(self, "metrics_log", None))
        try:
            carry = self._run_cycles(carry, cycles, chunk, all_keys,
                                     run_chunk, cpu_loop, mlog)
        finally:
            if mlog is not None:
                mlog.close()
        self.params, self.batch_stats, self.opt_state, swa_state = carry
        if self.swa:
            print("Performing stochastic weight averaging...")
            self.params = swa_state.mean()
            self.running_weights_stats = (swa_state.mean(),
                                          swa_state.variance())
        self.eval_model()
        self.save_model(self.filename + "_metadict_final")
        if self.plot_training_history:
            from ..utils.viz import plot_losses
            plot_losses(self.loss_acc["train_loss"],
                        self.loss_acc["test_loss"],
                        savefig=self.filename + "_losses.png")
        return self.net

    def _run_cycles(self, carry, cycles, chunk, all_keys, run_chunk,
                    cpu_loop, mlog):
        e0 = 0
        while e0 < cycles:
            e1 = min(e0 + chunk, cycles)
            es = jnp.arange(e0, e1)
            keys = all_keys[e0:e1]
            if not self.full_epoch:
                xs = (es, jnp.asarray(self.batch_idx_train[e0:e1]),
                      jnp.asarray(self.batch_idx_test[e0:e1]), keys)
            else:
                xs = (es, keys)
            if cpu_loop:
                mets = []
                for i in range(e1 - e0):
                    xi = jax.tree.map(lambda a: a[i], xs)
                    carry, m = run_chunk(carry, xi)
                    mets.append(m)
                tr_l, ts_l, tr_a, ts_a = (
                    np.asarray([m[j] for m in mets]) for j in range(4))
            else:
                carry, (tr_l, ts_l, tr_a, ts_a) = run_chunk(carry, xs)
            tr_l = np.asarray(tr_l)
            ts_l = np.asarray(ts_l)
            self.loss_acc["train_loss"].extend(tr_l.tolist())
            self.loss_acc["test_loss"].extend(ts_l.tolist())
            if self._has_accuracy():
                self.loss_acc["train_accuracy"].extend(
                    np.asarray(tr_a).tolist())
                self.loss_acc["test_accuracy"].extend(
                    np.asarray(ts_a).tolist())
            if mlog is not None:
                mlog.log_many(
                    e0, train_loss=tr_l, test_loss=ts_l,
                    train_accuracy=(np.asarray(tr_a)
                                    if self._has_accuracy() else None),
                    test_accuracy=(np.asarray(ts_a)
                                   if self._has_accuracy() else None))
            self.print_statistics(e1 - 1)
            e0 = e1
        return carry

    def fit(self):
        self.run()

    def train_bytes_per_cycle(self) -> Optional[float]:
        """Post-fusion HBM bytes accessed per training cycle (XLA cost
        analysis of the compiled chunk; see
        `core.profiling.compiled_bytes_accessed`) — the bandwidth-roofline
        counterpart of :meth:`train_flops_per_cycle`."""
        if self._cpu_loop_engine():
            return None
        self._maybe_init_model()
        if self._compiled_chunk is None:
            self._compiled_chunk = self._make_cycle_fn()
        cycles = self.training_cycles
        chunk = max(1, min(self.print_loss, cycles))
        swa_state = SwaState.init(self.params)
        carry = (self.params, self.batch_stats, self.opt_state, swa_state)
        keys = jax.random.split(jax.random.key(0), chunk)
        es = jnp.arange(chunk)
        if not self.full_epoch:
            xs = (es, jnp.asarray(self.batch_idx_train[:chunk]),
                  jnp.asarray(self.batch_idx_test[:chunk]), keys)
        else:
            xs = (es, keys)
        from ..core.profiling import compiled_bytes_accessed
        # XLA counts a scan body once, not x trip count (see
        # compiled_bytes_accessed). In batch mode the cycle body is
        # exactly one train + one eval batch, so the chunk's own figure
        # approximates ONE cycle. In full-epoch mode the chunk conflates
        # the train and eval scan bodies (each counted once) — rebuild
        # per-cycle bytes from the standalone batch-step probes instead
        # of scaling the conflated sum.
        if self.full_epoch:
            tr_fn, ev_fn = self._probe_batch_steps
            k = jax.random.key(0)
            tb = compiled_bytes_accessed(
                jax.jit(tr_fn), (self.params, self.batch_stats,
                                 self.opt_state),
                self.Xb_train[0], self.yb_train[0], k)
            eb = compiled_bytes_accessed(
                jax.jit(ev_fn), self.params, self.batch_stats,
                self.Xb_test[0], self.yb_test[0], k)
            if tb is None or eb is None:
                return None
            return (tb * int(self.Xb_train.shape[0]) +
                    eb * int(self.Xb_test.shape[0]))
        return compiled_bytes_accessed(self._compiled_chunk, carry, xs)

    def train_flops_per_cycle(self) -> Optional[float]:
        """Analytic MXU FLOPs (convs + dots, fwd+bwd) for ONE training
        cycle, for MFU accounting. Counted by walking the jaxpr of the
        already-built chunk function (`core.profiling.jaxpr_matmul_flops`)
        — XLA's own ``cost_analysis`` reports ~0 FLOPs for the TPU conv
        custom calls and underestimates by orders of magnitude. Returns
        None on the CPU python-loop engine."""
        if self._cpu_loop_engine():
            return None
        self._maybe_init_model()
        if self._compiled_chunk is None:
            self._compiled_chunk = self._make_cycle_fn()
        cycles = self.training_cycles
        chunk = max(1, min(self.print_loss, cycles))
        swa_state = SwaState.init(self.params)
        carry = (self.params, self.batch_stats, self.opt_state, swa_state)
        keys = jax.random.split(jax.random.key(0), chunk)
        es = jnp.arange(chunk)
        if not self.full_epoch:
            xs = (es, jnp.asarray(self.batch_idx_train[:chunk]),
                  jnp.asarray(self.batch_idx_test[:chunk]), keys)
        else:
            xs = (es, keys)
        try:
            from ..core.profiling import jaxpr_matmul_flops
            return jaxpr_matmul_flops(
                self._compiled_chunk, carry, xs) / chunk
        except Exception:
            return None

    # ----------------------------------------------------- one-off steps
    def train_step(self, feat, tar) -> Tuple[float, ...]:
        """Single train step on one batch (reference `trainer.py:189-211`).
        Provided for API parity / custom loops; the fast path is run()."""
        self._maybe_init_model()
        if self.tx is None:
            self.tx = optax.adam(1e-3)
            self.opt_state = self.tx.init(self.params)
        if self.criterion is None:
            self.criterion = select_loss("mse")
        key = self.keys.next()

        def loss_fn(p):
            out, new_bs = self._apply_train(
                p, self.batch_stats, feat, tar, key)
            return self.criterion(out, tar), (out, new_bs)
        (loss, (out, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(self.params)
        updates, self.opt_state = self.tx.update(grads, self.opt_state,
                                                 self.params)
        self.params = optax.apply_updates(self.params, updates)
        if new_bs is not None:
            self.batch_stats = new_bs
        if self._has_accuracy():
            return (float(loss), float(self.accuracy_fn(tar, out)))
        return (float(loss),)

    def test_step(self, feat, tar) -> Tuple[float, ...]:
        """Single eval step (reference `trainer.py:213-231`)."""
        out = self._apply_eval(self.params, self.batch_stats, feat)
        loss = self.criterion(out, tar)
        if self._has_accuracy():
            return (float(loss), float(self.accuracy_fn(tar, out)))
        return (float(loss),)

    def eval_model(self) -> None:
        """Evaluates the model on the full test set
        (reference `trainer.py:289-325`)."""
        jit_eval = getattr(self, "_jit_eval_apply", None)
        if jit_eval is None:
            jit_eval = jax.jit(self._apply_eval)
            self._jit_eval_apply = jit_eval
        # device values are accumulated without per-batch host syncs and
        # pulled once at the end (the float() conversion blocks)
        losses, accs = [], []
        for i in range(self.Xb_test.shape[0]):
            out = jit_eval(self.params, self.batch_stats,
                           self.Xb_test[i])
            losses.append(self.criterion(out, self.yb_test[i]))
            if self._has_accuracy():
                accs.append(self.accuracy_fn(self.yb_test[i], out))
        losses = [float(v) for v in jax.device_get(losses)]
        accs = [float(v) for v in jax.device_get(accs)]
        print("Model (final state) evaluation loss:",
              np.around(np.mean(losses), 4))
        if accs:
            print("Model (final state) accuracy:",
                  np.around(np.mean(accs), 4))

    # ------------------------------------------------------------- utils
    def print_statistics(self, e: int, **kwargs) -> None:
        """Training statistics print (reference `trainer.py:360-395`)."""
        accuracy_metrics = self.accuracy_metrics or "Accuracy"
        msg = "Epoch {}/{} ...".format(e + 1, self.training_cycles)
        msg += " Training loss: {} ...".format(
            np.around(self.loss_acc["train_loss"][-1], 4))
        msg += " Test loss: {}".format(
            np.around(self.loss_acc["test_loss"][-1], 4))
        if self._has_accuracy() and self.loss_acc["train_accuracy"]:
            msg += " ... Train {}: {} ... Test {}: {}".format(
                accuracy_metrics,
                np.around(self.loss_acc["train_accuracy"][-1], 4),
                accuracy_metrics,
                np.around(self.loss_acc["test_accuracy"][-1], 4))
        print(msg)

    def save_model(self, *args: str,
                   include_optimizer: bool = False) -> str:
        """Self-describing checkpoint save (reference `trainer.py:344-358`
        via core.checkpoint). With ``include_optimizer=True`` the optimizer
        state and step counter are stored too, enabling step-level resume
        (absent in the reference — SURVEY.md §5)."""
        filename = args[0] if args else self.filename
        meta = {k: v for k, v in self.meta_state_dict.items()
                if k not in ("weights", "optimizer")}
        arrays = {"params": self.params}
        if self.batch_stats is not None:
            arrays["batch_stats"] = self.batch_stats
        if include_optimizer and self.opt_state is not None:
            from flax import serialization
            arrays["opt_state"] = serialization.to_state_dict(
                self.opt_state)
            meta["completed_cycles"] = len(self.loss_acc["train_loss"])
        return save_checkpoint(filename, meta, arrays)

    def resume_training(self, filepath: str,
                        additional_cycles: Optional[int] = None) -> None:
        """Step-level resume: restores params/batch stats/optimizer state
        from a checkpoint saved with ``include_optimizer=True`` and
        continues training for ``additional_cycles`` (default: the
        originally compiled ``training_cycles``)."""
        from flax import serialization

        from ..core.checkpoint import load_checkpoint
        meta, arrays = load_checkpoint(filepath)
        self._maybe_init_model()
        self.params = arrays["params"]
        self.batch_stats = arrays.get("batch_stats")
        if "opt_state" not in arrays:
            raise ValueError(
                "Checkpoint has no optimizer state; save with "
                "save_model(..., include_optimizer=True) to resume")
        if self.tx is None:
            raise RuntimeError("Compile the trainer before resuming")
        self.opt_state = serialization.from_state_dict(
            self.tx.init(self.params), arrays["opt_state"])
        if additional_cycles is not None:
            self.training_cycles = additional_cycles
            if not self.full_epoch:
                self.batch_idx_train = _shuffled_batch_schedule(
                    self.Xb_train.shape[0], additional_cycles,
                    int(meta.get("completed_cycles", 0)) + 1)
                self.batch_idx_test = _shuffled_batch_schedule(
                    self.Xb_test.shape[0], additional_cycles,
                    int(meta.get("completed_cycles", 0)) + 1)
            self._compiled_chunk = None
        self.run()

    def select_lr(self, e: int) -> None:  # parity no-op (schedule is baked)
        pass


def _maybe_perturb(params, e, key, cfg):
    """Time-dependent weight perturbation (`trainer.py:403-416`)."""
    a, gamma, e_p = cfg["a"], cfg["gamma"], cfg["e_p"]
    sd = jnp.sqrt(a / (1.0 + e.astype(jnp.float32)) ** gamma)

    def do_perturb(p):
        leaves, treedef = jax.tree.flatten(p)
        keys = jax.random.split(key, len(leaves))
        new_leaves = [x + sd * jax.random.normal(k, x.shape, x.dtype)
                      for x, k in zip(leaves, keys)]
        return jax.tree.unflatten(treedef, new_leaves)

    return jax.lax.cond((e + 1) % e_p == 0, do_perturb, lambda p: p, params)


class SegTrainer(BaseTrainer):
    """Semantic segmentation trainer (reference `trainer.py:610-737`)."""

    def __init__(self, model: Union[str, Any] = "Unet",
                 nb_classes: int = 1, **kwargs):
        seed = kwargs.get("seed", 1)
        super().__init__(seed=seed)
        self.batch_seed = kwargs.get("batch_seed", seed)
        self.nb_classes = nb_classes
        self.net, self.meta_state_dict = init_fcnn_model(
            model, self.nb_classes, **kwargs)
        self.downsample_factor = None

    def set_data(self, X_train, y_train, X_test=None, y_test=None,
                 **kwargs) -> None:
        """Canonicalizes seg data; infers/validates nb_classes
        (reference `trainer.py:673-729`)."""
        if X_test is None or y_test is None:
            X_train, y_train, X_test, y_test = preproc.data_split(
                X_train, y_train, kwargs.get("test_size", .15),
                kwargs.get("seed", 1))
        nb_classes = preproc.num_classes_from_labels(np.asarray(y_train))
        X_train, y_train, X_test, y_test = preproc.check_image_dims(
            X_train, y_train, X_test, y_test, nb_classes)
        if self.nb_classes != nb_classes:
            raise AssertionError("Number of classes in initialized model "
                                 "is different from the number of classes "
                                 "contained in training data")
        X_train = np.asarray(X_train, np.float32)
        X_test = np.asarray(X_test, np.float32)
        if nb_classes > 1:
            y_train = np.asarray(y_train, np.int32)
            y_test = np.asarray(y_test, np.int32)
        else:
            y_train = np.asarray(y_train, np.float32)
            y_test = np.asarray(y_test, np.float32)
        self._stage_batches(X_train, y_train, X_test, y_test)

    def accuracy_fn(self, y, y_prob):
        """IoU accuracy (`trainer.py:731-737`)."""
        return iou_score(y, y_prob)


class ImSpecTrainer(BaseTrainer):
    """Image <-> spectrum trainer (reference `trainer.py:740-857`)."""

    def __init__(self, in_dim: Tuple[int, ...], out_dim: Tuple[int, ...],
                 latent_dim: int = 2, **kwargs):
        seed = kwargs.get("seed", 1)
        super().__init__(seed=seed)
        self.batch_seed = kwargs.get("batch_seed", seed)
        self.in_dim, self.out_dim = tuple(in_dim), tuple(out_dim)
        self.net, self.meta_state_dict = init_imspec_model(
            in_dim, out_dim, latent_dim, **kwargs)

    def set_data(self, X_train, y_train, X_test=None, y_test=None,
                 **kwargs) -> None:
        """Canonicalizes (image, spectrum) pairs; checks dims
        (reference `trainer.py:790-857`)."""
        if X_test is None or y_test is None:
            X_train, y_train, X_test, y_test = preproc.data_split(
                X_train, y_train, kwargs.get("test_size", .15),
                kwargs.get("seed", 1))
        X_train, y_train, X_test, y_test = preproc.check_signal_dims(
            X_train, y_train, X_test, y_test)
        if X_train.shape[1:] != ((1,) + self.in_dim) and \
                X_train.shape[1:] != self.in_dim:
            raise AssertionError(
                "The input/output dimensions of the model must match "
                "the height, width and length (for spectra) of training")
        self._stage_batches(
            np.asarray(X_train, np.float32), np.asarray(y_train, np.float32),
            np.asarray(X_test, np.float32), np.asarray(y_test, np.float32))

class RegTrainer(BaseTrainer):
    """Image -> vector regression trainer (reference
    `trainer.py:860-940`)."""

    def __init__(self, out_dim: int = 1, backbone: str = "mobilenet",
                 **kwargs):
        seed = kwargs.get("seed", 1)
        super().__init__(seed=seed)
        self.batch_seed = kwargs.get("batch_seed", seed)
        self.out_dim = out_dim
        input_channels = kwargs.pop("input_channels", 1)
        self.net, self.meta_state_dict = init_reg_model(
            out_dim, backbone, input_channels, **kwargs)

    def set_data(self, X_train, y_train, X_test=None, y_test=None,
                 **kwargs) -> None:
        if X_test is None or y_test is None:
            X_train, y_train, X_test, y_test = preproc.data_split(
                X_train, y_train, kwargs.get("test_size", .15),
                kwargs.get("seed", 1))
        X_train = preproc.as_channel_last_images(np.asarray(X_train,
                                                            np.float32))
        X_test = preproc.as_channel_last_images(np.asarray(X_test,
                                                           np.float32))
        y_train = np.asarray(y_train, np.float32)
        y_test = np.asarray(y_test, np.float32)
        if y_train.ndim == 1:
            y_train = y_train[:, None]
        if y_test.ndim == 1:
            y_test = y_test[:, None]
        self._stage_batches(X_train, y_train, X_test, y_test)

class clsTrainer(BaseTrainer):
    """Image classification trainer (reference `trainer.py:943-1046`)."""

    def __init__(self, nb_classes: int = 1, backbone: str = "mobilenet",
                 **kwargs):
        seed = kwargs.get("seed", 1)
        super().__init__(seed=seed)
        self.batch_seed = kwargs.get("batch_seed", seed)
        self.nb_classes = nb_classes
        input_channels = kwargs.pop("input_channels", 1)
        self.net, self.meta_state_dict = init_cls_model(
            nb_classes, backbone, input_channels, **kwargs)

    def set_data(self, X_train, y_train, X_test=None, y_test=None,
                 **kwargs) -> None:
        if X_test is None or y_test is None:
            X_train, y_train, X_test, y_test = preproc.data_split(
                X_train, y_train, kwargs.get("test_size", .15),
                kwargs.get("seed", 1))
        X_train = preproc.as_channel_last_images(np.asarray(X_train,
                                                            np.float32))
        X_test = preproc.as_channel_last_images(np.asarray(X_test,
                                                           np.float32))
        y_train = np.asarray(y_train, np.int32).reshape(-1)
        y_test = np.asarray(y_test, np.int32).reshape(-1)
        self._stage_batches(X_train, y_train, X_test, y_test)

    def accuracy_fn(self, y, y_prob):
        """Fraction of correct argmax predictions
        (reference `trainer.py:1038-1046`)."""
        correct = jnp.argmax(y_prob, axis=-1) == y.astype(jnp.int32)
        return jnp.mean(correct.astype(jnp.float32))
