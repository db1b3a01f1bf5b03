"""Pallas CC kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from atomai_tpu.ops.cc_label import label_components
from atomai_tpu.ops.pallas_cc import (label_components_auto,
                                      label_components_pallas)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla(seed):
    rng = np.random.RandomState(seed)
    mask = (rng.rand(128, 128) > 0.9).astype(np.float32)
    ref = np.asarray(label_components(jnp.asarray(mask)))
    got = np.asarray(label_components_pallas(jnp.asarray(mask),
                                             interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_auto_dispatch_cpu_uses_xla():
    mask = np.zeros((64, 64), np.float32)
    mask[10:14, 10:14] = 1
    lab = np.asarray(label_components_auto(jnp.asarray(mask)))
    ref = np.asarray(label_components(jnp.asarray(mask)))
    np.testing.assert_array_equal(lab, ref)
