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
