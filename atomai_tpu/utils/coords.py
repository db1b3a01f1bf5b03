"""Atom/defect/particle coordinate utilities.

Parity map into `atomai/utils/coords.py`:
- find_com (:21-34): device CC-labeling + segment CoM
  (see `atomai_tpu/ops/cc_label.py`); host numpy output.
- grid2xy / imcoordgrid (:37-54), transform_coordinates (:57-83): jnp (the
  rotation grid transform is the rVAE hot path — pure batched matmul).
- gaussian_2d / peak_refinement (:152-231): vmapped LM
  (see `atomai_tpu/ops/peakfit.py`).
- get_nn_distances (:86-149), compare_coordinates (:266-301), cluster_coord
  DBSCAN (:304-347), find_coord_clusters (:350-400), subimg_trajectories
  (:403-472), map_bonds (:475-515), remove_edge_coord (:518-537),
  get_lengthscale_constraints (:540-543), get_intensities (:234-263): host
  analytics (ragged outputs). Where the reference queries scipy cKDTree /
  sklearn DBSCAN, these route through the native grid-hash engine
  (`atomai_tpu/native/neighbors.py`, scipy/sklearn fallback built in).
"""

import warnings
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..native import neighbors
from ..ops.cc_label import blob_centers
from ..ops.peakfit import refine_peaks


def find_com(image_data: np.ndarray, max_blobs: Optional[int] = None
             ) -> np.ndarray:
    """Find atoms via center-of-mass of connected components (:21-34).

    Runs CC labeling + CoM on device; returns (N, 2) numpy array in
    raster-scan blob order (matching scipy.ndimage.label ordering).
    """
    image_data = np.asarray(image_data)
    if max_blobs is None:
        # exact-safe: component count <= foreground pixel count (every blob
        # may be a single pixel under 4-connectivity)
        max_blobs = int(np.count_nonzero(image_data)) + 1
        max_blobs = max(8, min(max_blobs, image_data.size))
        # round up to limit recompiles
        max_blobs = 1 << (max_blobs - 1).bit_length()
    coords, _, valid = blob_centers(jnp.asarray(image_data), max_blobs)
    coords = np.asarray(coords)
    valid = np.asarray(valid)
    return coords[valid]


def grid2xy(X1, X2) -> jnp.ndarray:
    """(M, N) grid -> (M*N, 2) xy coordinates (:37-44)."""
    X = jnp.concatenate([X1[None], X2[None]], axis=0)
    d0, d1 = X.shape[0], X.shape[1] * X.shape[2]
    return X.reshape(d0, d1).T


def imcoordgrid(im_dim: Tuple[int, int]) -> jnp.ndarray:
    """Pixel coordinate grid in [-1, 1] (used by rVAE) (:47-54)."""
    xx = jnp.linspace(-1, 1, im_dim[0])
    yy = jnp.linspace(1, -1, im_dim[1])
    x0, x1 = jnp.meshgrid(xx, yy, indexing="ij")
    return grid2xy(x0, x1)


def transform_coordinates(coord, phi, coord_dx=0):
    """Batched 2D rotation + translation (:57-83).

    Args:
        coord: (B, N, 2) coordinate batch.
        phi: (B,) rotation angles (rad).
        coord_dx: (B, 1or N, 2) translation or 0.
    Returns (B, N, 2).
    """
    coord = jnp.asarray(coord, jnp.float32)
    phi = jnp.asarray(phi, jnp.float32)
    rotmat_r1 = jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=1)
    rotmat_r2 = jnp.stack([-jnp.sin(phi), jnp.cos(phi)], axis=1)
    rotmat = jnp.stack([rotmat_r1, rotmat_r2], axis=1)  # (B, 2, 2)
    coord = jnp.einsum("bnk,bkm->bnm", coord, rotmat)
    return coord + coord_dx


def get_nn_distances_(coordinates: np.ndarray, nn: int = 2,
                      upper_bound: Optional[float] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Nearest-neighbor distances for one frame (:86-112)."""
    d, nn_idx = neighbors.knn(coordinates[:, :2], coordinates[:, :2],
                              nn + 1, upper_bound)
    hit = ~np.isinf(d).any(axis=1)  # atoms with all nn within the bound
    return d[hit, 1:], coordinates[nn_idx[hit]]


def get_nn_distances(coordinates: Union[Dict[int, np.ndarray], np.ndarray],
                     nn: int = 2, upper_bound: Optional[float] = None
                     ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """NN distances for a stack (:115-149)."""
    if isinstance(coordinates, np.ndarray):
        coordinates = {0: coordinates}
    distances_all, atom_pairs_all = [], []
    for coord in coordinates.values():
        distances, atom_pairs = get_nn_distances_(coord, nn, upper_bound)
        distances_all.append(distances)
        atom_pairs_all.append(atom_pairs)
    return distances_all, atom_pairs_all


def gaussian_2d(xy, amp, xo, yo, sigma_x, sigma_y, theta, offset
                ) -> np.ndarray:
    """Rotated anisotropic 2D Gaussian, flattened output (same model as
    `atomai/utils/coords.py:152-176`, expressed in the rotated frame:
    axis-aligned Gaussian over coordinates rotated by ``theta``)."""
    x, y = xy
    dx, dy = x - xo, y - yo
    ct, st = np.cos(theta), np.sin(theta)
    u = dx * ct - dy * st
    v = dx * st + dy * ct
    g = offset + amp * np.exp(
        -0.5 * ((u / sigma_x) ** 2 + (v / sigma_y) ** 2))
    return g.flatten()


def peak_refinement(imgdata: np.ndarray, coordinates: np.ndarray,
                    d: Optional[int] = None) -> np.ndarray:
    """Refine atomic positions by batched 2D-Gaussian fits (:179-231).

    All atoms are fitted simultaneously on device (vmapped LM) instead of
    the reference's sequential scipy.curve_fit loop.
    """
    if d is None:
        warnings.warn(
            "The d-value for bounding box not found. Defaulting to 1/4 of "
            "mean atomic distance.", stacklevel=2)
        dist = get_nn_distances_(coordinates)[0]
        d = int(np.mean(np.concatenate(dist)) * 0.25)
    # pad the atom count to a power-of-two bucket: refine_peaks is jitted
    # on the static shape, and every frame having a distinct atom count
    # would otherwise recompile the whole vmapped LM program per frame
    n = len(coordinates)
    n_pad = 1 << max(4, int(n - 1).bit_length())
    coords2 = np.full((n_pad, 2), -1e6, np.float32)
    coords2[:n] = coordinates[:, :2]
    refined = refine_peaks(jnp.asarray(imgdata, jnp.float32),
                           jnp.asarray(coords2), int(d))
    refined = np.asarray(refined)[:n]
    return np.concatenate([refined, coordinates[:, 2:3]], axis=-1)


def get_intensities_(coordinates: np.ndarray, img: np.ndarray, r: int = 3
                     ) -> np.ndarray:
    """Mean intensity in an r x r window around each position (behavior of
    `atomai/utils/coords.py:234-250`), computed for ALL atoms at once from
    a summed-area table: each window mean is four lookups into the 2D
    cumulative sum instead of a python-loop crop. Windows are clipped to
    the image bounds (off-edge atoms average their in-bounds pixels; the
    reference's raw slicing yields NaN there). A window with NO in-bounds
    pixels yields NaN — fabricating 0.0 would confidently classify an
    invalid (e.g. drift-extrapolated) coordinate as a dim atom."""
    img = np.asarray(img, np.float64)
    if img.ndim == 3:
        img = img.mean(-1)
    H, W = img.shape
    sat = np.zeros((H + 1, W + 1))
    np.cumsum(np.cumsum(img, axis=0), axis=1, out=sat[1:, 1:])
    centers = np.around(np.asarray(coordinates)[:, :2]).astype(np.int64)
    lo = centers - r // 2
    hi = lo + r                       # window spans [lo, lo + r)
    x0 = np.clip(lo[:, 0], 0, H)
    x1 = np.clip(hi[:, 0], 0, H)
    y0 = np.clip(lo[:, 1], 0, W)
    y1 = np.clip(hi[:, 1], 0, W)
    sums = (sat[x1, y1] - sat[x0, y1] - sat[x1, y0] + sat[x0, y0])
    counts = (x1 - x0) * (y1 - y0)
    with np.errstate(invalid="ignore", divide="ignore"):
        means = sums / counts
    return np.where(counts > 0, means, np.nan)


def get_intensities(coordinates_all: Dict[int, np.ndarray],
                    nn_input: np.ndarray, r: int = 3) -> List[np.ndarray]:
    """Intensities for a stack (:253-263)."""
    return [get_intensities_(coord, nn_input[k], r)
            for k, coord in coordinates_all.items()]


def compare_coordinates(coordinates1: np.ndarray, coordinates2: np.ndarray,
                        d_max: float, plot_results: bool = False,
                        **kwargs) -> Tuple[np.ndarray, ...]:
    """Match each coordinate in set 1 to its nearest neighbor in set 2,
    keeping pairs closer than ``d_max`` (behavior of reference
    `coords.py:266-301`, vectorized to one KD-tree query)."""
    coordinates1 = np.asarray(coordinates1, float)
    coordinates2 = np.asarray(coordinates2, float)
    dist, idx = neighbors.knn(coordinates2, coordinates1, 1)
    dist, idx = dist[:, 0], idx[:, 0]
    keep = dist < d_max
    coordinates1_ = coordinates1[keep]
    coordinates2_ = coordinates2[idx[keep]]
    delta_r = dist[keep]
    if plot_results:
        from . import viz  # lazy
        viz.plot_coordinates_comparison(
            coordinates1_, delta_r, kwargs.get("expdata"),
            kwargs.get("fsize", 20))
    return coordinates1_, coordinates2_, delta_r


def chain_tracks(coord_class_dict: Dict[int, np.ndarray],
                 starts: np.ndarray, rmax: float,
                 on_match: Optional[Callable] = None
                 ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Nearest-neighbor chaining of MANY tracks at once over a frame dict
    ``{frame: (N, 3) [x, y, class]}``: one KD-tree per frame, every active
    track queries it simultaneously (the reference rebuilds a tree per
    (track, frame), `atomai/stat/multivar.py:596-631`). A track that finds
    no match within ``rmax`` in a frame holds its position and may resume
    in a later frame.

    ``on_match(track_idx, frame, row) -> bool``: optional acceptance hook
    (e.g. subimage-crop validity); False leaves the track where it was.

    Returns one ``(flow (m, 3), frames (m,))`` pair per start point.
    """
    starts = np.asarray(starts, float)
    n = len(starts)
    flows: List[List[np.ndarray]] = [[] for _ in range(n)]
    frames: List[List[int]] = [[] for _ in range(n)]
    cur = starts.copy()
    width = 3
    for k, c in coord_class_dict.items():
        c = np.asarray(c, float)
        if len(c) == 0:
            continue
        width = c.shape[-1]
        d, idx = neighbors.knn(c[:, :2], cur, 1, rmax)
        d, idx = d[:, 0], idx[:, 0]
        for i in np.nonzero(np.isfinite(d))[0]:
            row = c[idx[i]]
            if on_match is None or on_match(int(i), k, row):
                flows[i].append(row)
                frames[i].append(k)
                cur[i] = row[:2]
    return [(np.asarray(f, float).reshape(len(f), width),
             np.asarray(fr)) for f, fr in zip(flows, frames)]


def cluster_coord(coord_class_dict: Dict[int, np.ndarray], eps: float,
                  min_samples: int = 10) -> Tuple[np.ndarray, ...]:
    """Collapse stack coordinates onto xy plane + DBSCAN (:304-347)."""
    coordinates_all = np.concatenate(
        [coord_class_dict[k] for k in range(len(coord_class_dict))])
    if len(coordinates_all) == 0:
        # no detections anywhere in the stack — empty result instead of
        # crashing DBSCAN on a zero-sample array
        empty2 = np.empty((0, 2), dtype=float)
        return np.array([], dtype=object), empty2, empty2
    labels = neighbors.dbscan(coordinates_all[:, :2], eps, min_samples)
    clusters, clusters_var, clusters_mean = [], [], []
    # deviation from `coords.py:337`: the reference drops the first unique
    # label unconditionally (assuming it is the -1 noise label); when no
    # points are noise that silently discards a real cluster. We exclude
    # only the actual noise label.
    for lbl in np.unique(labels[labels >= 0]):
        coord = coordinates_all[np.where(labels == lbl)]
        clusters.append(coord)
        clusters_mean.append(np.mean(coord[:, :2], axis=0))
        clusters_var.append(np.var(coord[:, :2], axis=0))
    return (np.array(clusters, dtype=object), np.array(clusters_mean),
            np.array(clusters_var))


def find_coord_clusters(coord_class_dict_1: Dict[int, np.ndarray],
                        coord_class_dict_2: Dict[int, np.ndarray],
                        rmax: int) -> Tuple[np.ndarray, np.ndarray, List]:
    """Per-coordinate neighbor clusters across frames (:350-400)."""
    coordinates_all = np.concatenate(
        [coord_class_dict_2[k] for k in range(len(coord_class_dict_2))])
    centers = np.asarray(coord_class_dict_1[0])[:, :2]
    # one vectorized ball query for every center at once (the reference
    # runs a full k-NN query per center, `atomai/utils/coords.py:350-400`)
    neighbor_idx = neighbors.ball_query(coordinates_all[:, :2], centers,
                                        rmax)
    clusters, clusters_mean, clusters_std = [], [], []
    for idx in neighbor_idx:
        cl = coordinates_all[idx]  # ball_query ids are ascending
        clusters_mean.append(cl[:, :2].mean(axis=0))
        clusters_std.append(cl[:, :2].std(axis=0))
        clusters.append(cl)
    return np.array(clusters_mean), np.array(clusters_std), clusters


class subimg_trajectories:
    """Defect/atom trajectories plus a window crop around every tracked
    position (behavior of reference `coords.py:403-472`, built on the
    multi-track :func:`chain_tracks` engine). A match whose window falls
    off the image edge is rejected and the track holds its position."""

    def __init__(self, imgdata: np.ndarray,
                 coord_class_dict: Dict[int, np.ndarray],
                 window_size: int, min_length: int = 0,
                 rmax: int = 10) -> None:
        self.imgdata = imgdata
        self.coord_class_dict = coord_class_dict
        self.r = window_size
        self.min_length = min_length
        self.rmax = rmax

    def _crop(self, frame: int, row: np.ndarray) -> Optional[np.ndarray]:
        half = self.r // 2
        cx, cy = int(np.around(row[0])), int(np.around(row[1]))
        crop = self.imgdata[frame][cx - half:cx + half, cy - half:cy + half]
        return crop if crop.shape[:2] == (self.r, self.r) else None

    def _track(self, starts: np.ndarray
               ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        crops: List[List[np.ndarray]] = [[] for _ in range(len(starts))]

        def accept(i, frame, row):
            crop = self._crop(frame, row)
            if crop is None:
                return False
            crops[i].append(crop)
            return True

        tracks = chain_tracks(self.coord_class_dict, starts, self.rmax,
                              on_match=accept)
        return [(flow, frames, np.asarray(cr))
                for (flow, frames), cr in zip(tracks, crops)]

    def get_trajectory(self, start_coord: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self._track(np.asarray(start_coord, float)[None, :])[0]

    def get_all_trajectories(self
                             ) -> Tuple[List[np.ndarray], List[np.ndarray],
                                        List[np.ndarray]]:
        first = next(iter(self.coord_class_dict.values()))
        out = [t for t in self._track(first[:, :2])
               if len(t[0]) > self.min_length]
        return ([f for f, _, _ in out], [fr for _, fr, _ in out],
                [s for _, _, s in out])


def map_bonds(coordinates: Dict[int, np.ndarray], nn: int = 2,
              upper_bound: Optional[float] = None,
              distance_ideal: Optional[float] = None,
              plot_results: bool = True, **kwargs) -> np.ndarray:
    """Lattice-bond maps color-coded by bond-length deviation (:475-515)."""
    distances_all, atom_pairs_all = get_nn_distances(
        coordinates, nn, upper_bound)
    if distance_ideal is None:
        distance_ideal = np.mean(np.concatenate(distances_all))
    from . import viz  # lazy import (matplotlib)
    for i, (dist, at) in enumerate(zip(distances_all, atom_pairs_all)):
        viz.plot_lattice_bonds(dist, at, distance_ideal, i, plot_results,
                               **kwargs)
    return np.concatenate(distances_all)


def remove_edge_coord(coordinates: np.ndarray, dim: Tuple[int, int],
                      dist_edge: int) -> np.ndarray:
    """Removes coordinates near image edges (:518-537)."""
    h, w = dim
    c = coordinates
    bad = ((c[:, 0] > w - dist_edge) | (c[:, 0] < dist_edge) |
           (c[:, 1] > h - dist_edge) | (c[:, 1] < dist_edge))
    return coordinates[~bad]


def get_lengthscale_constraints(grid: np.ndarray) -> List[List[float]]:
    """GP lengthscale interval constraints from a grid (:540-543)."""
    cmax = np.amax(grid, axis=0) // 2 + 1
    cmin = np.ones(grid.shape[-1])
    return [cmin.tolist(), cmax.tolist()]
