"""Functional training state.

Replaces the reference's mutable trainer object state
(`atomai/trainers/trainer.py:68-99`) with an immutable pytree carried through
``jax.lax.scan``. SWA running statistics (reference stores the last-k full
state dicts, `trainer.py:418-429`) are kept as running first/second moments —
O(1) memory instead of O(k) copies, and the second moment additionally powers
SWAG-style weight sampling (`atomai/utils/nn.py:84-117`).
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class SwaState:
    """Running sum / sum-of-squares of params over the SWA window."""
    sum: Any
    sq_sum: Any
    n: jnp.ndarray  # scalar int32

    @classmethod
    def init(cls, params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return cls(sum=zeros, sq_sum=jax.tree.map(jnp.zeros_like, params),
                   n=jnp.zeros((), jnp.int32))

    def update(self, params):
        return SwaState(
            sum=jax.tree.map(lambda s, p: s + p, self.sum, params),
            sq_sum=jax.tree.map(lambda s, p: s + p * p, self.sq_sum, params),
            n=self.n + 1)

    def mean(self):
        n = jnp.maximum(self.n, 1).astype(jnp.float32)
        return jax.tree.map(lambda s: s / n, self.sum)

    def variance(self):
        n = jnp.maximum(self.n, 1).astype(jnp.float32)
        mean = self.mean()
        return jax.tree.map(
            lambda sq, m: jnp.maximum(sq / n - m * m, 0.0),
            self.sq_sum, mean)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    step: jnp.ndarray  # scalar int32
    swa: SwaState

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation):
        return cls(params=params,
                   batch_stats=batch_stats,
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32),
                   swa=SwaState.init(params))
