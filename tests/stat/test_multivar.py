"""imlocal / transitions / unmixer tests (reference model:
`test/stat/test_multivar.py` shape contracts)."""

import numpy as np
import pytest

from atomai_tpu.stat import (imlocal, SpectralUnmixer, SlidingFFTNMF,
                             update_classes, calculate_transition_matrix,
                             sum_transitions)
from atomai_tpu.utils import make_lattice_stack


@pytest.fixture(scope="module")
def imstack_data():
    imgs, masks, coords = make_lattice_stack(4, 64, 12, seed=2)
    nn_out = masks[..., None].astype(np.float32)
    coord_dict = {i: np.concatenate(
        [coords[i], np.zeros((len(coords[i]), 1))], -1)
        for i in range(4)}
    return imgs, nn_out, coord_dict


def test_imlocal_extraction(imstack_data):
    _, nn_out, coord_dict = imstack_data
    s = imlocal(nn_out, coord_dict, window_size=8, coord_class=0)
    assert s.imgstack.ndim == 4
    assert s.imgstack.shape[1:] == (8, 8, 1)
    assert len(s.imgstack_com) == len(s.imgstack)


def test_imlocal_decompositions(imstack_data):
    _, nn_out, coord_dict = imstack_data
    s = imlocal(nn_out, coord_dict, window_size=8, coord_class=0)
    for meth in (s.pca, s.ica, s.nmf):
        comps, Xt, cf = meth(3)
        assert comps.shape == (3, 8, 8, 1)
        assert Xt.shape == (s.d0, 3)
        assert cf.shape == (s.d0, 3)


def test_imlocal_imblock(imstack_data):
    _, nn_out, coord_dict = imstack_data
    s = imlocal(nn_out, coord_dict, window_size=8, coord_class=0)
    comps, Xt, xy = s.imblock_pca(2)
    assert xy.shape == (s.d0, 2)


def test_imlocal_gmm_and_transitions(imstack_data):
    _, nn_out, coord_dict = imstack_data
    s = imlocal(nn_out, coord_dict, window_size=8, coord_class=0)
    cla, cl_all, com_frames = s.gmm(2)
    assert com_frames.shape[1] == 4  # x, y, class, frame
    tm = s.transition_matrix(2, rmax=5, sum_all_transitions=True)
    assert "transitions" in tm and "all_transitions" in tm
    for m in tm["transitions"]:
        rows = m.sum(axis=1)
        valid = rows[rows > 0]
        np.testing.assert_allclose(valid, 1.0, atol=1e-6)


def test_calculate_transition_matrix():
    trace = [0, 0, 1, 1, 0]
    M = calculate_transition_matrix(trace)
    assert M.shape == (2, 2)
    np.testing.assert_allclose(M[0], [0.5, 0.5])
    np.testing.assert_allclose(M[1], [0.5, 0.5])


def test_spectral_unmixer_methods():
    rng = np.random.RandomState(0)
    # cube with two distinct spectral signatures
    s1 = np.exp(-((np.arange(32) - 8) ** 2) / 10.0)
    s2 = np.exp(-((np.arange(32) - 22) ** 2) / 10.0)
    cube = np.zeros((8, 8, 32), np.float32)
    cube[:4] = s1 + 0.01 * rng.rand(4, 8, 32)
    cube[4:] = s2 + 0.01 * rng.rand(4, 8, 32)
    for method in ("nmf", "pca", "ica", "gmm"):
        um = SpectralUnmixer(method, n_components=2)
        c, a = um.fit(cube)
        assert c.shape == (2, 32)
        assert a.shape == (8, 8, 2)


def test_sliding_fft_nmf(imstack_data):
    imgs, _, _ = imstack_data
    an = SlidingFFTNMF(window_size_x=16, window_size_y=16, components=2)
    comps, ab = an.analyze_image(imgs[0], output_path="/tmp/aoi_fftnmf")
    assert comps.shape[0] == 2
    assert ab.shape[0] == 2


def test_update_classes_threshold(imstack_data):
    imgs, _, coord_dict = imstack_data
    upd = update_classes(coord_dict, imgs, method="threshold",
                         thresh=0.3)
    assert set(np.unique(upd[0][:, -1])) <= {0.0, 1.0}


def test_update_classes_kmeans(imstack_data):
    imgs, _, coord_dict = imstack_data
    upd = update_classes(coord_dict, imgs, method="kmeans",
                         n_components=2)
    assert len(np.unique(upd[0][:, -1])) <= 2


def test_trajectory_chaining():
    """Two atoms drifting across frames give two tracks whose positions
    chain to the nearest neighbor within rmax; a frame with no match
    within rmax is skipped (track resumes later)."""
    from atomai_tpu.utils.coords import chain_tracks

    frames = {}
    for k in range(5):
        a = [10.0 + k, 10.0, 0.0]       # drifts +1 px/frame in x
        b = [40.0, 40.0 + 2 * k, 1.0]   # drifts +2 px/frame in y
        rows = [a, b] if k != 2 else [b]  # atom a missing in frame 2
        frames[k] = np.asarray(rows)

    tracks = chain_tracks(frames, np.array([[10.0, 10.0], [40.0, 40.0]]),
                          rmax=5)
    flow_a, frames_a = tracks[0]
    flow_b, frames_b = tracks[1]
    assert list(frames_a) == [0, 1, 3, 4]          # frame 2 skipped
    np.testing.assert_allclose(flow_a[:, 0], [10, 11, 13, 14])
    assert list(frames_b) == [0, 1, 2, 3, 4]
    np.testing.assert_allclose(flow_b[:, 1], [40, 42, 44, 46, 48])
    assert (flow_b[:, 2] == 1.0).all()


def test_subimg_trajectories_crops():
    from atomai_tpu.utils.coords import subimg_trajectories

    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 32, 32).astype(np.float32)
    frames = {k: np.array([[16.0 + k, 16.0, 0.0],
                           [2.0, 2.0, 0.0]])  # near edge: crop rejected
              for k in range(4)}
    st = subimg_trajectories(imgs, frames, window_size=8, rmax=4)
    trajs, fr, subs = st.get_all_trajectories()
    # the edge atom's crops are all rejected -> its empty track is
    # filtered out by min_length; only the interior atom's track remains
    assert len(trajs) == 1
    assert subs[0].shape == (4, 8, 8)
    np.testing.assert_allclose(trajs[0][:, 0], [16, 17, 18, 19])


def test_sliding_fft_nmf_nonsquare_window(imstack_data):
    """Non-square windows must build a separable Hamming window instead
    of crashing on a broadcast of (wx, wy) against its transpose."""
    img = np.random.RandomState(0).rand(32, 64).astype(np.float32)
    an = SlidingFFTNMF(window_size_x=8, window_size_y=16, components=2)
    comps, maps = an.analyze_image(img, output_path="/tmp/aoi_fftnmf_ns")
    assert an.hamming_window.shape == (8, 16)
    assert np.isfinite(comps).all()


def test_update_classes_ten_channel_map():
    """A (H, W, 10) multichannel map must batch as ONE frame — the old
    exclusive <10/>10 heuristic left exactly 10 channels unhandled."""
    from atomai_tpu.stat import update_classes
    rng = np.random.RandomState(0)
    nn_out = rng.rand(24, 24, 10).astype(np.float32)
    coords = np.array([[5.0, 5.0, 0.0], [12.0, 12.0, 0.0]])
    out = update_classes(coords, nn_out, method="threshold", thresh=0.5)
    assert set(out) == {0} and out[0].shape == (2, 3)
