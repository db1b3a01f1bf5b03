"""Explicit PRNG plumbing.

Replaces the reference's global seeding contract (`atomai/utils/nn.py:136-147`
``set_train_rng`` seeds numpy+torch globally) with explicit, splittable JAX
keys. Determinism tests (reference `test/trainers/test_trainer.py:77-95`) then
hold by construction: same seed -> same key sequence -> identical params.
"""

from typing import Optional

import jax


def key_from_seed(seed: int) -> jax.Array:
    return jax.random.key(seed)


class KeySeq:
    """A stateful convenience wrapper producing a deterministic key stream.

    Used only at the Python orchestration layer (never inside jit): jitted
    code always receives keys as explicit arguments.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self, num: Optional[int] = None):
        if num is None:
            self._key, sub = jax.random.split(self._key)
            return sub
        self._key, *subs = jax.random.split(self._key, num + 1)
        return subs

    @property
    def key(self) -> jax.Array:
        return self._key
