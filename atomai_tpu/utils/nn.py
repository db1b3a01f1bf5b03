"""NN weight utilities on parameter pytrees.

Parity map into `atomai/utils/nn.py`:
- load_weights (:23-56) -> checkpoint loading lives in core.checkpoint;
  here we keep pytree helpers.
- average_weights (:59-81): SWA/ensemble mean over a dict of param pytrees.
  The reference skips BatchNorm running stats when averaging (:72-73) —
  here batch stats live in a separate "batch_stats" collection, so
  averaging params only reproduces that behavior by construction.
- sample_weights (:84-117): SWAG-style sampling of weights from running
  mean/variance.
- set_train_rng (:136-147) -> explicit key plumbing (core.prng); kept as a
  no-op-style helper returning a key for API familiarity.
- Hook / mock_forward / get_nb_classes / get_downsample_factor (:169-228):
  not needed — architecture facts are static config
  (`atomai_tpu/nets/fcnn.py` DOWNSAMPLE_FACTORS); thin equivalents provided.
- weights_init Xavier / reset_bnorm (:238-249): re-initialization helpers.
- class renumbering/combining (:252-336).
"""

from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


def average_weights(ensemble: Dict[int, Any]) -> Any:
    """Averages a dict of parameter pytrees (`nn.py:59-81`)."""
    trees = list(ensemble.values())
    n = len(trees)
    return jax.tree.map(lambda *xs: sum(xs) / n, *trees)


def sample_weights(mean_tree: Any, var_tree: Any, key,
                   n_samples: int = 1) -> List[Any]:
    """SWAG-style weight sampling w ~ N(mean, var) (`nn.py:84-117`)."""
    samples = []
    for i in range(n_samples):
        key, sub = jax.random.split(key)
        leaves, treedef = jax.tree.flatten(mean_tree)
        var_leaves = jax.tree.leaves(var_tree)
        keys = jax.random.split(sub, len(leaves))
        new_leaves = [
            m + jnp.sqrt(jnp.maximum(v, 0.0)) * jax.random.normal(
                k, m.shape, m.dtype)
            for m, v, k in zip(leaves, var_leaves, keys)]
        samples.append(jax.tree.unflatten(treedef, new_leaves))
    return samples


def set_train_rng(seed: int = 1):
    """Returns a PRNG key; numpy is also seeded for host-side shuffles
    (reference contract `nn.py:136-147`)."""
    np.random.seed(seed)
    return jax.random.key(seed)


def weights_init(key, params: Any) -> Any:
    """Re-initializes conv/dense kernels with Xavier(-uniform) and zeros
    biases (`nn.py:238-243`)."""
    leaves_with_path = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    keys = jax.random.split(key, len(leaves_with_path))
    new_leaves = []
    for (path, leaf), k in zip(leaves_with_path, keys):
        name = str(path[-1]) if path else ""
        if "kernel" in name and leaf.ndim >= 2:
            fan_in = int(np.prod(leaf.shape[:-1]))
            fan_out = int(leaf.shape[-1])
            limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
            new_leaves.append(jax.random.uniform(
                k, leaf.shape, leaf.dtype, -limit, limit))
        elif "bias" in name:
            new_leaves.append(jnp.zeros_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree.unflatten(treedef, new_leaves)


def reset_bnorm(batch_stats: Any) -> Any:
    """Resets BatchNorm running statistics (`nn.py:245-249`)."""
    def reset(path, leaf):
        name = str(path[-1]) if path else ""
        if "mean" in name:
            return jnp.zeros_like(leaf)
        if "var" in name:
            return jnp.ones_like(leaf)
        return leaf
    return jax.tree_util.tree_map_with_path(reset, batch_stats)


def num_params(params: Any) -> int:
    """Total number of parameters in a pytree."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def combine_classes(coord_class_dict: Dict[int, np.ndarray],
                    classes_to_combine: List[List[int]],
                    renumerate: bool = True) -> Dict[int, np.ndarray]:
    """Combines atom classes in coordinate dicts (`nn.py:252-279`)."""
    coord_class_dict_ = {}
    for i, coord in coord_class_dict.items():
        coord_ = coord.copy()
        for comb in classes_to_combine:
            for c in comb[1:]:
                coord_[:, -1][coord_[:, -1] == c] = comb[0]
        coord_class_dict_[i] = coord_
    if renumerate:
        coord_class_dict_ = renumerate_classes(coord_class_dict_)
    return coord_class_dict_


def renumerate_classes_(coord: np.ndarray, start_from_1: bool = True
                        ) -> np.ndarray:
    """Renumerates classes to be in ascending order (`nn.py:282-301`)."""
    coord_ = coord.copy()
    uniq = np.unique(coord[:, -1])
    for i, u in enumerate(uniq):
        coord_[:, -1][coord[:, -1] == u] = i
    if start_from_1:
        coord_[:, -1] = coord_[:, -1] + 1
    return coord_


def renumerate_classes(coord_class_dict: Dict[int, np.ndarray],
                       start_from_1: bool = True
                       ) -> Dict[int, np.ndarray]:
    """Renumerates classes for a dict of coordinates (`nn.py:304-336`)."""
    return {i: renumerate_classes_(coord, start_from_1)
            for i, coord in coord_class_dict.items()}


def mock_forward(net, variables=None, dims: tuple = (32, 32)
                 ) -> np.ndarray:
    """Forward pass with dummy input for shape introspection
    (`nn.py:195-208`). Works with any linen module taking NHWC input."""
    import jax
    x = jnp.zeros((1,) + tuple(dims) + (1,), jnp.float32)
    if variables is None:
        key = jax.random.key(0)
        variables = net.init({"params": key, "dropout": key}, x, False)
    return np.asarray(net.apply(variables, x, False))


def get_nb_classes(net, variables=None) -> int:
    """Number of output classes. Static for built-in nets (``nb_classes``
    attribute); falls back to a mock forward for custom modules
    (`nn.py:211-218`)."""
    nb = getattr(net, "nb_classes", None)
    if nb is not None:
        return int(nb)
    out = mock_forward(net, variables)
    return int(out.shape[-1])


def get_downsample_factor(net, variables=None) -> int:
    """Total spatial downsampling factor. Static for built-in nets
    (`atomai_tpu/nets/fcnn.py` DOWNSAMPLE_FACTORS); mock forward for
    custom modules (`nn.py:221-228`)."""
    from ..nets.fcnn import DOWNSAMPLE_FACTORS
    name = type(net).__name__
    if name in DOWNSAMPLE_FACTORS:
        return DOWNSAMPLE_FACTORS[name]
    # probe: smallest power of two whose input reproduces its own size
    for f in (8, 4, 2, 1):
        try:
            out = mock_forward(net, variables, dims=(f * 8, f * 8))
            if out.shape[1] == f * 8:
                return f
        except Exception:
            continue
    return 1


def gpu_usage_map() -> Dict[str, Any]:
    """Accelerator memory usage (replaces nvidia-smi polling,
    `nn.py:120-133`) — see core.profiling.device_memory_stats."""
    from ..core.profiling import device_memory_stats
    return device_memory_stats()
