"""Lattice graph analysis (host-side analytics).

Parity: `atomai/utils/graphx.py` — Node/Graph with cKDTree neighbor search
using covalent radii (:22-127), recursive DFS ring finding + shortest-path
filtering (find_rings :128, polycount :164, remove_filled_polygons :177),
NetworkX export (:235-269), find_cycles/find_cycle_clusters defect
identification (:296-403), plot_graph (:406), filter_subgraphs (:451-530).

The ``mendeleev`` dependency is replaced by an embedded covalent-radius
table (pm, Cordero et al. 2008) — `get_interatomic_r` keeps the same
contract (`graphx.py:272-293`).
"""

import itertools
import sys
from copy import copy, deepcopy
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
from scipy import spatial

# covalent radii in picometers (Cordero et al., Dalton Trans. 2008)
COVALENT_RADII_PM = {
    "H": 31, "He": 28, "Li": 128, "Be": 96, "B": 84, "C": 76, "N": 71,
    "O": 66, "F": 57, "Ne": 58, "Na": 166, "Mg": 141, "Al": 121,
    "Si": 111, "P": 107, "S": 105, "Cl": 102, "Ar": 106, "K": 203,
    "Ca": 176, "Sc": 170, "Ti": 160, "V": 153, "Cr": 139, "Mn": 139,
    "Fe": 132, "Co": 126, "Ni": 124, "Cu": 132, "Zn": 122, "Ga": 122,
    "Ge": 120, "As": 119, "Se": 120, "Br": 120, "Kr": 116, "Rb": 220,
    "Sr": 195, "Y": 190, "Zr": 175, "Nb": 164, "Mo": 154, "Tc": 147,
    "Ru": 146, "Rh": 142, "Pd": 139, "Ag": 145, "Cd": 144, "In": 142,
    "Sn": 139, "Sb": 139, "Te": 138, "I": 139, "Xe": 140, "Cs": 244,
    "Ba": 215, "La": 207, "Ce": 204, "Pr": 203, "Nd": 201, "Pm": 199,
    "Sm": 198, "Eu": 198, "Gd": 196, "Tb": 194, "Dy": 192, "Ho": 192,
    "Er": 189, "Tm": 190, "Yb": 187, "Lu": 187, "Hf": 175, "Ta": 170,
    "W": 162, "Re": 151, "Os": 144, "Ir": 141, "Pt": 136, "Au": 136,
    "Hg": 132, "Tl": 145, "Pb": 146, "Bi": 148, "Po": 140, "At": 150,
    "Rn": 150, "Mo2": 154,
}


class Node:
    """A graph node representing an atom (`graphx.py:22-46`)."""

    def __init__(self, idx: int = 0, pos: Optional[List[float]] = None,
                 atom: str = "C") -> None:
        self.neighbors: List["Node"] = []
        self.neighborscopy: List["Node"] = []
        self.nn = 0
        self.id = idx
        self.pos = [] if pos is None else pos
        self.atom = atom
        self.ingraph = True
        self.visited = False


class Graph:
    """Graph construction & ring analysis from atomic coordinates
    (`graphx.py:48-269`)."""

    def __init__(self, coordinates: np.ndarray,
                 map_dict: Dict[float, str]) -> None:
        self.vertices: List[Node] = []
        if coordinates.shape[-1] == 3:
            coordinates = np.concatenate(
                (coordinates[:, :2],
                 np.zeros_like(coordinates)[:, 0:1],
                 coordinates[:, 2:3]), axis=-1)
        for i, coords in enumerate(coordinates):
            self.vertices.append(
                Node(i, coords[:-1].tolist(), map_dict[coords[-1]]))
        self.coordinates = coordinates
        self.map_dict = map_dict
        self.size = len(coordinates)
        self.rings: List[List[Node]] = []
        self.path: List[Node] = []
        self.improper: List[Node] = []

    def find_neighbors(self, **kwargs: float) -> None:
        """Bond construction via cKDTree + covalent radii
        (`graphx.py:83-127`)."""
        for v in self.vertices:
            del v.neighbors[:]
        e = kwargs.get("expand", 1.2)
        tree = spatial.cKDTree(self.coordinates[:, :3])
        uval = np.unique(self.coordinates[:, -1])
        if len(uval) == 1:
            rmax = get_interatomic_r(
                [self.map_dict[uval[0]], self.map_dict[uval[0]]], e)
            neighbors = tree.query_ball_point(
                self.coordinates[:, :3], r=rmax)
            for v, nn in zip(self.vertices, neighbors):
                for n in nn:
                    if self.vertices[n] is not v:
                        v.neighbors.append(self.vertices[n])
                        v.neighborscopy.append(self.vertices[n])
        else:
            uval_el = [self.map_dict[u] for u in uval]
            apairs = [(p[0], p[1])
                      for p in itertools.product(uval_el, repeat=2)]
            rij_v = [get_interatomic_r([a[0], a[1]], e) for a in apairs]
            rmax = np.max(rij_v)
            rij = dict(zip(apairs, rij_v))
            for v, coords in zip(self.vertices, self.coordinates):
                atom1 = self.map_dict[coords[-1]]
                nn = tree.query_ball_point(coords[:3], r=rmax)
                for n in nn:
                    coords2 = self.coordinates[n]
                    if self.vertices[n] is not v:
                        atom2 = self.map_dict[coords2[-1]]
                        eucldist = np.linalg.norm(
                            coords[:3] - coords2[:3])
                        if eucldist <= rij[(atom1, atom2)]:
                            v.neighbors.append(self.vertices[n])
                            v.neighborscopy.append(self.vertices[n])

    def find_rings(self, v: Node, rings: Optional[List] = None,
                   max_depth: Optional[int] = None,
                   visited: Optional[List] = None, depth: int = 0,
                   root: Optional[Node] = None) -> None:
        """Recursive DFS ring search (`graphx.py:128-162`)."""
        if rings is None:
            rings = self.rings
        if visited is None:
            visited = []
        if root is None:
            root = v
            root.ingraph = False
        if max_depth and depth >= max_depth:
            return
        visited.append(v)
        depth += 1
        for n in v.neighbors:
            if depth > 2 and n is root:
                rings.append(copy(visited))
            elif n.ingraph:
                n.ingraph = False
                self.find_rings(n, rings, max_depth, visited, depth, root)
                n.ingraph = True
        if depth == 2 and root in v.neighbors:
            v.neighbors.remove(root)
        visited.pop()

    def polycount(self, max_depth: int) -> None:
        """Ring search from every node (`graphx.py:164-175`)."""
        for i in range(self.size):
            self.find_rings(self.vertices[i], self.rings, max_depth)
        for v in self.vertices:
            v.neighbors = copy(v.neighborscopy)

    def polycount_native(self, max_depth: int,
                         filter_filled: bool = True) -> bool:
        """Native C++ ring search (atomai_tpu/native/graph_rings.cpp):
        same semantics as polycount [+ remove_filled_polygons], orders of
        magnitude faster on large lattices. Returns False if the native
        library is unavailable (caller should fall back)."""
        from ..native import find_rings_native
        adjacency = [[n.id for n in v.neighborscopy]
                     for v in self.vertices]
        rings_ids = find_rings_native(adjacency, max_depth, filter_filled)
        if rings_ids is None:
            return False
        self.rings = [[self.vertices[i] for i in ring]
                      for ring in rings_ids]
        return True

    def remove_filled_polygons(self) -> None:
        """Keeps only shortest-path rings (`graphx.py:177-203`)."""
        for v in self.vertices:
            v.ingraph = True
        to_be_removed = []
        for r in self.rings:
            l = len(r)
            remove = False
            for j in range(l):
                for k in range(j + 2, l):
                    if remove:
                        break
                    v, n = r[j], r[k]
                    djk = abs(j - k)
                    dist_r = min(djk, abs(djk - l)) + 1
                    self.path = []
                    self.shortest_path(v, n, max_depth=dist_r)
                    if len(self.path) and len(self.path) < dist_r:
                        remove = True
            if remove:
                to_be_removed.append(r)
        for r in to_be_removed:
            self.rings.remove(r)

    def shortest_path(self, v: Node, goal: Node, max_depth: int,
                      visited: Optional[List] = None,
                      depth: int = 1) -> None:
        """Bounded-depth shortest path (`graphx.py:205-233`)."""
        if visited is None:
            visited = []
        if depth < max_depth:
            depth += 1
            visited.append(v)
            if v is goal:
                lp = len(self.path)
                if depth < lp or not lp:
                    self.path = copy(visited)
                    max_depth = depth
            else:
                for n in v.neighborscopy:
                    if n.ingraph:
                        n.ingraph = False
                        self.shortest_path(n, goal, max_depth, visited,
                                           depth)
                        n.ingraph = True
            visited.pop()

    def rings_to_nx_graph(self, ring_size: Union[int, List[int]]):
        """Detected rings -> networkx graph (`graphx.py:235-251`)."""
        import networkx as nx
        if isinstance(ring_size, int):
            ring_size = [ring_size]
        g_nx = nx.Graph()
        for ring in self.rings:
            if len(ring) not in ring_size:
                continue
            for v in ring:
                g_nx.add_node(v.id, pos=tuple(v.pos), atom=v.atom)
                for nn in v.neighbors:
                    g_nx.add_node(nn.id, pos=tuple(nn.pos), atom=nn.atom)
                for nn in v.neighbors:
                    g_nx.add_edge(v.id, nn.id)
        nodes_to_remove = [node for node, degree in g_nx.degree()
                           if degree < 2]
        g_nx.remove_nodes_from(nodes_to_remove)
        return g_nx

    def nx_graph(self):
        """Whole graph -> networkx object (`graphx.py:253-269`)."""
        import networkx as nx
        g_nx = nx.Graph()
        planar = bool(np.all(
            self.coordinates[0, 2] == self.coordinates[:, 2]))
        for v in self.vertices:
            g_nx.add_node(v.id, pos=tuple(v.pos[:2] if planar else v.pos),
                          atom=v.atom)
            for nn in v.neighbors:
                g_nx.add_node(
                    nn.id, pos=tuple(nn.pos[:2] if planar else nn.pos),
                    atom=nn.atom)
            for nn in v.neighbors:
                g_nx.add_edge(v.id, nn.id)
        return g_nx


def get_interatomic_r(atoms: Union[Tuple[str, str], List[str]],
                      expand: Optional[float] = None) -> float:
    """Bond length (angstrom) between two elements from the embedded
    covalent-radius table (`graphx.py:272-293`)."""
    atom1, atom2 = atoms
    r12 = (COVALENT_RADII_PM[atom1] + COVALENT_RADII_PM[atom2]) / 100
    if expand:
        r12 = expand * r12
    return r12


def find_cycles(coordinate_data: np.ndarray,
                cycles: Union[int, List[int]],
                map_dict: Dict[float, str], px2ang: float,
                **kwargs: float) -> np.ndarray:
    """Coordinates of rings with specific sizes (`graphx.py:296-341`)."""
    if isinstance(cycles, int):
        cycles = [cycles]
    coordinates = deepcopy(np.asarray(coordinate_data, float))
    coordinates[:, :-1] = coordinates[:, :-1] * px2ang
    e = kwargs.get("expand", 1.2)
    G = Graph(coordinates, map_dict)
    G.find_neighbors(expand=e)
    if not G.polycount_native(max_depth=max(cycles)):
        with _recursion_headroom():
            G.polycount(max_depth=max(cycles))
            G.remove_filled_polygons()
    rl = [sorted(int(v.id) for v in r) for r in G.rings]
    rl = sorted(rl, key=lambda x: (len(x), x[0], x[1], x[2]))
    coordinates_ = [coordinates[r] for r in rl if len(r) in cycles]
    coordinates_ = np.concatenate(coordinates_)
    coordinates_[:, :-1] = coordinates_[:, :-1] * (1 / px2ang)
    return coordinates_


def find_cycle_clusters(coordinate_data: np.ndarray,
                        cycles: Union[int, List[int]],
                        map_dict: Dict[float, str], px2ang: float,
                        **kwargs: float) -> List[np.ndarray]:
    """Clusters of rings with specific sizes (`graphx.py:344-403`)."""
    import networkx as nx
    if isinstance(cycles, int):
        cycles = [cycles]
    coordinates = deepcopy(np.asarray(coordinate_data, float))
    coordinates[:, :-1] = coordinates[:, :-1] * px2ang
    e = kwargs.get("expand", 1.2)
    G = Graph(coordinates, map_dict)
    G.find_neighbors(expand=e)
    if not G.polycount_native(max_depth=max(cycles)):
        with _recursion_headroom():
            G.polycount(max_depth=max(cycles))
            G.remove_filled_polygons()
    g_nx = G.rings_to_nx_graph(cycles)
    sub_graphs = [g_nx.subgraph(c).copy()
                  for c in nx.connected_components(g_nx)]
    out = []
    for sg in sub_graphs:
        atom_idx = list(sg.nodes.keys())
        coords_f = coordinates[atom_idx]
        out.append(coords_f[:, :-1] * (1 / px2ang))
    return out


def plot_graph(G, img: Optional[np.ndarray] = None,
               fsize: Union[int, Tuple[int, int]] = 8,
               show_labels: bool = False, **kwargs) -> None:
    """Graph overlay plot (`graphx.py:406-448`)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    import networkx as nx
    fsize = fsize if isinstance(fsize, tuple) else (fsize, fsize)
    fig, ax = plt.subplots(1, 1, figsize=fsize)
    if isinstance(G, Graph):
        G = G.nx_graph()
    for k, v in nx.get_node_attributes(G, "pos").items():
        G.nodes[k]["pos"] = v[::-1]
    pos = nx.get_node_attributes(G, "pos")
    if img is not None:
        ax.imshow(img, origin="lower", cmap=kwargs.get("cmap", "gray"))
    nx.draw_networkx_nodes(
        G, pos=pos, nodelist=G.nodes(), ax=ax,
        node_size=kwargs.get("node_size", 30),
        node_color=kwargs.get("node_color", "#1f78b4"),
        alpha=kwargs.get("alpha"))
    nx.draw_networkx_edges(
        G, pos, width=1, ax=ax,
        edge_color=kwargs.get("edge_color", "orange"),
        alpha=kwargs.get("alpha"))
    if show_labels:
        atomic_labels = nx.get_node_attributes(G, "atom") \
            if kwargs.get("show_elements") else None
        nx.draw_networkx_labels(
            G, pos, labels=atomic_labels, ax=ax,
            font_size=kwargs.get("label_size", 7),
            font_color=kwargs.get("label_color", "black"))
    if kwargs.get("savefig"):
        fig.savefig(kwargs["savefig"])
    plt.close(fig)


def filter_subgraphs_(coordinate_arr: np.ndarray,
                      map_dict: Dict[float, str], px2ang: float,
                      **kwargs: float) -> np.ndarray:
    """Keeps atoms in the largest connected subgraph
    (`graphx.py:451-497`)."""
    import networkx as nx
    coordinates = deepcopy(np.asarray(coordinate_arr, float))
    coordinates[:, :-1] = coordinates[:, :-1] * px2ang
    e = kwargs.get("expand", 1.2)
    G = Graph(coordinates, map_dict)
    G.find_neighbors(expand=e)
    G_nx = G.nx_graph()
    map_dict_inv = {v: k for (k, v) in map_dict.items()}
    sub_graphs = [G_nx.subgraph(c).copy()
                  for c in nx.connected_components(G_nx)]
    main_graph = sub_graphs[int(np.argmax([len(sg)
                                           for sg in sub_graphs]))]
    pos = nx.get_node_attributes(main_graph, "pos")
    names = nx.get_node_attributes(main_graph, "atom")
    rows = []
    for n, c in zip(names.values(), pos.values()):
        rows.append(np.array([c[0] / px2ang, c[1] / px2ang,
                              map_dict_inv[n]]).reshape(1, -1))
    return np.concatenate(rows)


def filter_subgraphs(coordinates: Union[Dict[int, np.ndarray], np.ndarray],
                     map_dict: Dict[float, str], px2ang: float,
                     **kwargs: float) -> Dict[int, np.ndarray]:
    """Subgraph filtering for coordinate dicts (`graphx.py:500-530`)."""
    if isinstance(coordinates, np.ndarray):
        coordinates = {0: coordinates}
    return {k: filter_subgraphs_(coord, map_dict, px2ang, **kwargs)
            for k, coord in coordinates.items()}


class _recursion_headroom:
    """Raises the recursion limit for deep DFS ring searches."""

    def __enter__(self):
        self._old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(self._old, 100000))
        return self

    def __exit__(self, *a):
        sys.setrecursionlimit(self._old)
        return False
