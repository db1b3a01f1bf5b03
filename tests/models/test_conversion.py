"""Torch-checkpoint conversion parity tests.

Requires the reference package (read-only mount at /root/reference with
import shims); skipped when unavailable.
"""

import sys

import numpy as np
import pytest

import os
REF_PATHS = [os.path.join(os.path.dirname(__file__), "..", "_refshim"),
             "/root/reference"]


def _ref_available():
    for p in REF_PATHS:
        if p not in sys.path:
            sys.path.append(p)
    try:
        import atomai  # noqa: F401
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _ref_available(),
                                reason="reference atomai not importable")


@pytest.mark.parametrize("model,kw", [
    ("Unet", {}),
    ("Unet", {"with_dilation": True}),
    ("dilnet", {}),
    ("SegResNet", {}),
])
def test_converted_net_matches_torch_forward(model, kw):
    import jax.numpy as jnp
    import torch
    from atomai.nets import init_fcnn_model as ref_init

    from atomai_tpu.models.conversion import convert_fcnn_state_dict

    tnet, _ = ref_init(model, 2, nb_filters=8, **kw)
    tnet.eval()
    sd = dict(tnet.state_dict().items())
    net, params, bstats = convert_fcnn_state_dict(sd, model, 2,
                                                  nb_filters=8, **kw)
    x = np.random.RandomState(0).rand(2, 32, 32).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x[:, None])).numpy()
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    j_out = np.asarray(net.apply(variables, jnp.asarray(x[..., None]),
                                 False))
    np.testing.assert_allclose(j_out, t_out.transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_load_torch_checkpoint_roundtrip(tmp_path):
    import torch
    from atomai.nets import init_fcnn_model as ref_init

    from atomai_tpu.models.conversion import load_torch_checkpoint

    tnet, meta = ref_init("Unet", 1, nb_filters=8)
    meta["weights"] = tnet.state_dict()
    path = str(tmp_path / "ref_ckpt.tar")
    torch.save(meta, path)
    smodel = load_torch_checkpoint(path)
    out = smodel.predict(
        np.random.rand(1, 32, 32).astype(np.float32),
        compute_coords=False, verbose=False)
    assert out.shape == (1, 32, 32, 1)
