"""Lattice graph analysis (host-side analytics).

Behavioral parity with `atomai/utils/graphx.py` (Node/Graph neighbor
search with covalent radii :22-127, ring finding :128-233, NetworkX
export :235-269, find_cycles/find_cycle_clusters :296-403, plot_graph
:406, filter_subgraphs :451-530) — with a redesigned core:

- bond construction is vectorized: one native pair-radius sweep
  (`native/neighbors.py`) +
  a species-pair cutoff matrix filter (the reference loops nodes and
  re-queries per atom);
- ring search enumerates each simple cycle exactly once via an
  iterative canonical DFS (cycle root = smallest member id, orientation
  fixed) with an explicit stack — no recursion limits — and filters
  non-chordless ("filled") polygons with bounded BFS distances. The
  reference's recursive DFS needed ``sys.setrecursionlimit(100000)``;
- a C++ fast path (native/graph_rings.cpp) handles large lattices.

The ``mendeleev`` dependency is replaced by an embedded covalent-radius
table (pm, Cordero et al. 2008) — `get_interatomic_r` keeps the same
contract (`graphx.py:272-293`).
"""

from copy import deepcopy
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..native import neighbors

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
    """A graph node view over one atom. ``neighbors`` is the bonded-node
    list; kept as the public per-vertex API (reference `graphx.py:22-46`
    exposes the same attributes)."""

    def __init__(self, idx: int = 0, pos: Optional[List[float]] = None,
                 atom: str = "C") -> None:
        self.neighbors: List["Node"] = []
        self.id = idx
        self.pos = [] if pos is None else pos
        self.atom = atom


def _bond_pairs(coordinates: np.ndarray, species: np.ndarray,
                map_dict: Dict[float, str], expand: float) -> np.ndarray:
    """Bonded index pairs (k, 2), vectorized.

    One KD-tree sweep at the largest species-pair cutoff, then a single
    boolean filter against the per-pair cutoff matrix.
    """
    classes = np.unique(species)
    radii = np.array([COVALENT_RADII_PM[map_dict[c]] for c in classes],
                     float) / 100.0
    cutoff = expand * (radii[:, None] + radii[None, :])  # (c, c) angstrom
    class_idx = np.searchsorted(classes, species)
    pairs = neighbors.query_pairs(coordinates, float(cutoff.max()))
    if pairs.size == 0:
        return pairs.reshape(0, 2)
    d = np.linalg.norm(coordinates[pairs[:, 0]] - coordinates[pairs[:, 1]],
                       axis=1)
    keep = d <= cutoff[class_idx[pairs[:, 0]], class_idx[pairs[:, 1]]]
    return pairs[keep]


def _enumerate_cycles(adj: Sequence[Sequence[int]], max_size: int
                      ) -> List[List[int]]:
    """All simple cycles of length 3..max_size, each reported exactly once.

    Canonical form: the cycle is rooted at its smallest member id (DFS only
    walks vertices with id > root) and the orientation is fixed by
    requiring the second vertex id to be smaller than the last. Iterative
    explicit-stack DFS — no recursion depth limits.
    """
    n = len(adj)
    cycles: List[List[int]] = []
    on_path = np.zeros(n, bool)
    for root in range(n):
        path = [root]
        on_path[root] = True
        stack = [[root, 0]]
        while stack:
            frame = stack[-1]
            v, it = frame
            if it < len(adj[v]):
                frame[1] += 1
                w = adj[v][it]
                if w == root:
                    if len(path) >= 3 and path[1] < path[-1]:
                        cycles.append(path.copy())
                elif w > root and not on_path[w] and len(path) < max_size:
                    path.append(w)
                    on_path[w] = True
                    stack.append([w, 0])
            else:
                stack.pop()
                on_path[path.pop()] = False
    return cycles


def _bfs_distance(adj: Sequence[Sequence[int]], a: int, b: int,
                  max_len: int) -> int:
    """Graph distance between a and b counted in NODES (path length + 1),
    searching only within max_len nodes; 0 if unreachable within bound."""
    if a == b:
        return 1
    dist = {a: 1}
    frontier = [a]
    while frontier:
        nxt = []
        for v in frontier:
            dv = dist[v]
            if dv >= max_len:
                continue
            for w in adj[v]:
                if w not in dist:
                    if w == b:
                        return dv + 1
                    dist[w] = dv + 1
                    nxt.append(w)
        frontier = nxt
    return 0


def _is_chordless(adj: Sequence[Sequence[int]], ring: Sequence[int]
                  ) -> bool:
    """True when no two ring members are closer through the full graph
    than along the ring itself (the "filled polygon" criterion)."""
    l = len(ring)
    for j in range(l):
        for k in range(j + 2, l):
            djk = k - j
            dist_r = min(djk, l - djk) + 1
            dist_g = _bfs_distance(adj, ring[j], ring[k], dist_r)
            if dist_g and dist_g < dist_r:
                return False
    return True


class Graph:
    """Graph construction & ring analysis from atomic coordinates.

    Array-of-structs redesign of the reference class
    (`atomai/utils/graphx.py:48-269`): coordinates/species live in numpy
    arrays, adjacency in an id-indexed list; ``vertices`` offers the same
    per-node view the reference exposes.
    """

    def __init__(self, coordinates: np.ndarray,
                 map_dict: Dict[float, str]) -> None:
        coordinates = np.asarray(coordinates, float)
        if coordinates.shape[-1] == 3:
            coordinates = np.concatenate(
                (coordinates[:, :2],
                 np.zeros_like(coordinates)[:, 0:1],
                 coordinates[:, 2:3]), axis=-1)
        self.coordinates = coordinates
        self.map_dict = map_dict
        self.size = len(coordinates)
        self.vertices: List[Node] = [
            Node(i, coordinates[i, :-1].tolist(),
                 map_dict[coordinates[i, -1]])
            for i in range(self.size)]
        self.adjacency: List[List[int]] = [[] for _ in range(self.size)]
        self.rings: List[List[Node]] = []

    def find_neighbors(self, **kwargs: float) -> None:
        """Vectorized bond construction (covalent radii x ``expand``)."""
        pairs = _bond_pairs(self.coordinates[:, :3],
                            self.coordinates[:, -1], self.map_dict,
                            kwargs.get("expand", 1.2))
        self.adjacency = [[] for _ in range(self.size)]
        for a, b in pairs:
            self.adjacency[a].append(int(b))
            self.adjacency[b].append(int(a))
        for v in self.vertices:
            v.neighbors = [self.vertices[i] for i in self.adjacency[v.id]]

    def find_rings(self, v: Node, max_depth: int) -> List[List[Node]]:
        """Simple cycles through vertex ``v`` (each once), up to
        ``max_depth`` members."""
        return [[self.vertices[i] for i in ring]
                for ring in _enumerate_cycles(self.adjacency, max_depth)
                if v.id in ring]

    def polycount(self, max_depth: int) -> None:
        """Enumerates every simple cycle up to ``max_depth`` members."""
        self.rings = [[self.vertices[i] for i in ring]
                      for ring in _enumerate_cycles(self.adjacency,
                                                    max_depth)]

    def polycount_native(self, max_depth: int,
                         filter_filled: bool = True) -> bool:
        """Native C++ ring search (atomai_tpu/native/graph_rings.cpp):
        same semantics as polycount [+ remove_filled_polygons], orders of
        magnitude faster on large lattices. Returns False if the native
        library is unavailable (caller should fall back)."""
        from ..native import find_rings_native
        rings_ids = find_rings_native(self.adjacency, max_depth,
                                      filter_filled)
        if rings_ids is None:
            return False
        self.rings = [[self.vertices[i] for i in ring]
                      for ring in rings_ids]
        return True

    def remove_filled_polygons(self) -> None:
        """Keeps only chordless rings (no shortcut through the graph
        between any two members)."""
        self.rings = [r for r in self.rings
                      if _is_chordless(self.adjacency,
                                       [v.id for v in r])]

    def _nx_nodes(self, ids, planar: bool):
        for i in ids:
            v = self.vertices[i]
            pos = tuple(v.pos[:2]) if planar else tuple(v.pos)
            yield v.id, {"pos": pos, "atom": v.atom}

    def rings_to_nx_graph(self, ring_size: Union[int, List[int]]):
        """Detected rings of the given size(s) -> networkx graph of the
        ring members plus their bonded neighbors (degree>=2 retained),
        matching reference `graphx.py:235-251` output."""
        import networkx as nx
        sizes = {ring_size} if isinstance(ring_size, int) else set(ring_size)
        members = {v.id for ring in self.rings if len(ring) in sizes
                   for v in ring}
        closure = members | {w for i in members for w in self.adjacency[i]}
        g_nx = nx.Graph()
        g_nx.add_nodes_from(self._nx_nodes(sorted(closure), planar=False))
        g_nx.add_edges_from((i, w) for i in members
                            for w in self.adjacency[i])
        g_nx.remove_nodes_from(
            [node for node, degree in g_nx.degree() if degree < 2])
        return g_nx

    def nx_graph(self):
        """Whole graph -> networkx object (2D positions when the lattice
        is planar, reference `graphx.py:253-269`)."""
        import networkx as nx
        planar = bool(np.all(
            self.coordinates[0, 2] == self.coordinates[:, 2]))
        g_nx = nx.Graph()
        g_nx.add_nodes_from(self._nx_nodes(range(self.size), planar))
        g_nx.add_edges_from((i, w) for i in range(self.size)
                            for w in self.adjacency[i])
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
    coordinates = np.asarray(coordinate_arr, float).copy()
    scaled = coordinates.copy()
    scaled[:, :-1] *= px2ang
    G = Graph(scaled, map_dict)
    G.find_neighbors(expand=kwargs.get("expand", 1.2))
    # node ids are row indices, so the largest component selects rows
    # of the ORIGINAL (pixel-unit) array directly
    main = max(nx.connected_components(G.nx_graph()), key=len)
    return coordinates[sorted(main)]


def filter_subgraphs(coordinates: Union[Dict[int, np.ndarray], np.ndarray],
                     map_dict: Dict[float, str], px2ang: float,
                     **kwargs: float) -> Dict[int, np.ndarray]:
    """Subgraph filtering for coordinate dicts (`graphx.py:500-530`)."""
    if isinstance(coordinates, np.ndarray):
        coordinates = {0: coordinates}
    return {k: filter_subgraphs_(coord, map_dict, px2ang, **kwargs)
            for k, coord in coordinates.items()}


