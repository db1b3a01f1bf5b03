"""Weight-pytree utility tests (reference model:
`test/utils/test_nn.py`)."""

import jax
import jax.numpy as jnp
import numpy as np

from atomai_tpu.utils import (average_weights, combine_classes,
                              renumerate_classes, sample_weights,
                              get_downsample_factor, get_nb_classes,
                              mock_forward)


def test_average_weights():
    t1 = {"a": jnp.ones((2, 2)), "b": jnp.zeros(3)}
    t2 = {"a": 3 * jnp.ones((2, 2)), "b": 2 * jnp.ones(3)}
    avg = average_weights({0: t1, 1: t2})
    np.testing.assert_allclose(np.asarray(avg["a"]), 2.0)
    np.testing.assert_allclose(np.asarray(avg["b"]), 1.0)


def test_sample_weights_statistics():
    mean = {"w": jnp.full((500,), 2.0)}
    var = {"w": jnp.full((500,), 0.25)}
    samples = sample_weights(mean, var, jax.random.key(0), n_samples=3)
    assert len(samples) == 3
    s = np.asarray(samples[0]["w"])
    assert abs(s.mean() - 2.0) < 0.1
    assert abs(s.std() - 0.5) < 0.1
    # different samples differ
    assert not np.allclose(np.asarray(samples[0]["w"]),
                           np.asarray(samples[1]["w"]))


def test_combine_and_renumerate_classes():
    coords = {0: np.array([[1., 1., 0.], [2., 2., 1.], [3., 3., 2.]])}
    combined = combine_classes(coords, [[1, 2]], renumerate=True)
    assert set(np.unique(combined[0][:, -1])) == {1.0, 2.0}
    renum = renumerate_classes(
        {0: np.array([[1., 1., 3.], [2., 2., 7.]])}, start_from_1=True)
    assert set(np.unique(renum[0][:, -1])) == {1.0, 2.0}


def test_introspection_on_builtin_nets():
    from atomai_tpu.nets import init_fcnn_model
    net, _ = init_fcnn_model("Unet", 3, nb_filters=4)
    assert get_nb_classes(net) == 3
    assert get_downsample_factor(net) == 8
    out = mock_forward(net, dims=(32, 32))
    assert out.shape == (1, 32, 32, 3)
