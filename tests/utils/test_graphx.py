"""Graph analysis tests (reference model: ring finding on ideal
lattices)."""

import numpy as np
import pytest

from atomai_tpu.utils import (Graph, find_cycles, find_cycle_clusters,
                              filter_subgraphs, get_interatomic_r)


def _hexagon(a=1.42):
    coords = []
    for i in range(6):
        ang = np.pi / 3 * i
        coords.append([a * np.cos(ang), a * np.sin(ang)])
    coords = np.array(coords)
    return np.concatenate([coords, np.zeros((6, 1))], -1)


def test_interatomic_r():
    r_cc = get_interatomic_r(["C", "C"])
    assert r_cc == pytest.approx(1.52, abs=0.01)
    r_exp = get_interatomic_r(["C", "C"], 1.2)
    assert r_exp == pytest.approx(1.52 * 1.2, abs=0.01)


def test_graph_neighbors():
    cc = _hexagon()
    g = Graph(cc, {0.0: "C"})
    g.find_neighbors(expand=1.2)
    # each atom in a hexagon has exactly 2 bonded neighbors
    assert all(len(v.neighbors) == 2 for v in g.vertices)


def test_find_cycles_hexagon():
    cc = _hexagon()
    rings = find_cycles(cc, 6, {0.0: "C"}, px2ang=1.0)
    assert rings.shape == (6, 3)


def test_find_cycle_clusters():
    cc = _hexagon()
    clusters = find_cycle_clusters(cc, 6, {0.0: "C"}, px2ang=1.0)
    assert len(clusters) == 1
    assert clusters[0].shape == (6, 2)


def test_filter_subgraphs_keeps_largest():
    cc = _hexagon()
    # add a far-away isolated atom (own subgraph)
    cc2 = np.concatenate([cc, [[100.0, 100.0, 0.0]]], axis=0)
    filt = filter_subgraphs(cc2, {0.0: "C"}, px2ang=1.0)
    assert filt[0].shape == (6, 3)


def _hex_patch(nx_=6, ny=6, a=1.42):
    """Graphene-like multi-ring patch."""
    pts = []
    for i in range(nx_):
        for j in range(ny):
            x = 1.5 * a * i
            y = np.sqrt(3) * a * (j + 0.5 * (i % 2))
            pts.append([x, y])
            pts.append([x + a, y])
    pts = np.unique(np.round(np.asarray(pts), 6), axis=0)
    return np.concatenate([pts, np.zeros((len(pts), 1))], -1)


def test_python_ring_search_matches_native():
    """The iterative canonical-DFS fallback must produce the same
    chordless-ring set as the C++ path on a multi-ring lattice."""
    coords = _hex_patch()
    g_native = Graph(coords, {0.0: "C"})
    g_native.find_neighbors(expand=1.2)
    if not g_native.polycount_native(max_depth=8, filter_filled=True):
        pytest.skip("native ring finder unavailable")
    g_py = Graph(coords, {0.0: "C"})
    g_py.find_neighbors(expand=1.2)
    g_py.polycount(max_depth=8)
    g_py.remove_filled_polygons()

    def canon(rings):
        return sorted(tuple(sorted(v.id for v in r)) for r in rings)

    assert len(g_native.rings) > 10  # a real multi-ring case
    assert canon(g_native.rings) == canon(g_py.rings)
