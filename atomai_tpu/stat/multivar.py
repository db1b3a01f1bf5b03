"""Statistical analysis of local image descriptors.

Parity: `atomai/stat/multivar.py` — imlocal: subimage stack around located
atoms -> GMM (:110-172), PCA/ICA/NMF + reshaped components (:174-289),
PCA-on-GMM-classes (:291-342), scree plots (:344-402), imblock_* variants
(:404-528), trajectory extraction via per-frame NN chaining (:595-694),
Markov transition matrices (:707-778), sum_transitions (:781-813),
update_classes (:816-916).

Decompositions run on the TPU-resident JAX implementations
(`atomai_tpu/stat/decomposition.py`) instead of scikit-learn.
"""

import copy
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from ..utils import extract_subimages, get_intensities
from ..utils.coords import chain_tracks
from .decomposition import NMF, PCA, FastICA, GaussianMixture, KMeans


class imlocal:
    """Extraction and statistical analysis of local image descriptors.

    Example:
        >>> imstack = stat.imlocal(nn_output, coordinates,
        >>>                        window_size=32, coord_class=1)
        >>> imstack.pca_scree_plot(plot_results=False)
        >>> pca_results = imstack.imblock_pca(n_components=4)
    """

    def __init__(self, network_output: np.ndarray,
                 coord_class_dict_all: Dict[int, np.ndarray],
                 window_size: Optional[int] = None,
                 coord_class: int = 0) -> None:
        self.network_output = network_output
        self.nb_classes = network_output.shape[-1]
        self.coord_all = coord_class_dict_all
        self.coord_class = float(coord_class)
        self.r = window_size
        (self.imgstack, self.imgstack_com,
         self.imgstack_frames) = self.extract_subimages_()
        self.d0, self.d1, self.d2, self.d3 = self.imgstack.shape

    def extract_subimages_(self) -> Tuple[np.ndarray, ...]:
        """(reference `multivar.py:94-108`)"""
        return extract_subimages(self.network_output, self.coord_all,
                                 self.r, self.coord_class)

    def _X_vec(self) -> np.ndarray:
        return self.imgstack.reshape(self.d0, self.d1 * self.d2 * self.d3)

    # ------------------------------------------------------------- GMM
    def gmm(self, n_components: int, covariance: str = "diag",
            random_state: int = 1, plot_results: bool = False
            ) -> Tuple[np.ndarray, List[np.ndarray], np.ndarray]:
        """Gaussian mixture model of the subimage stack
        (reference `multivar.py:110-172`)."""
        clf = GaussianMixture(n_components=n_components,
                              covariance_type=covariance,
                              random_state=random_state)
        classes = clf.fit_predict(self._X_vec()) + 1
        cla = np.zeros((np.amax(classes), int(self.r), int(self.r),
                        self.nb_classes))
        cl_all = []
        for i in range(np.amax(classes)):
            cl = self.imgstack[classes == i + 1]
            cl_all.append(cl)
            if len(cl) > 0:
                cla[i] = np.mean(cl, axis=0)
        com_frames = np.concatenate(
            (self.imgstack_com, classes[:, None],
             self.imgstack_frames[:, None]), axis=-1)
        if plot_results:
            self._plot_components(cla)
        return cla, cl_all, com_frames

    # --------------------------------------------------- decompositions
    def pca(self, n_components: int, random_state: int = 1,
            plot_results: bool = False):
        """(reference `multivar.py:174-209`)"""
        p = PCA(n_components=n_components, random_state=random_state)
        X_vec_t = p.fit_transform(self._X_vec())
        components = p.components_.reshape(
            n_components, self.d1, self.d2, self.d3)
        com_frames = np.concatenate(
            (self.imgstack_com, self.imgstack_frames[:, None]), axis=-1)
        return components, X_vec_t, com_frames

    def ica(self, n_components: int, random_state: int = 1,
            plot_results: bool = False):
        """(reference `multivar.py:211-246`)"""
        ica = FastICA(n_components=n_components,
                      random_state=random_state)
        X_vec_t = ica.fit_transform(self._X_vec())
        components = ica.components_.reshape(
            n_components, self.d1, self.d2, self.d3)
        com_frames = np.concatenate(
            (self.imgstack_com, self.imgstack_frames[:, None]), axis=-1)
        return components, X_vec_t, com_frames

    def nmf(self, n_components: int, random_state: int = 1,
            plot_results: bool = False, **kwargs: int):
        """(reference `multivar.py:248-289`)"""
        max_iter = kwargs.get("max_iterations", 1000)
        nmf = NMF(n_components=n_components, random_state=random_state,
                  max_iter=max_iter)
        X_vec_t = nmf.fit_transform(self._X_vec())
        components = nmf.components_.reshape(
            n_components, self.d1, self.d2, self.d3)
        com_frames = np.concatenate(
            (self.imgstack_com, self.imgstack_frames[:, None]), axis=-1)
        return components, X_vec_t, com_frames

    def pca_gmm(self, n_components_gmm: int,
                n_components_pca: Union[int, List[int]],
                plot_results: bool = False,
                covariance_type: str = "diag", random_state: int = 1):
        """PCA on GMM-unmixed classes (reference `multivar.py:291-342`)."""
        gmm_components, gmm_imgs, com_class_frames = self.gmm(
            n_components_gmm, covariance_type, random_state, plot_results)
        if isinstance(n_components_pca, (int, np.integer)):
            n_components_pca = [n_components_pca] * n_components_gmm
        pca_components_all, X_vec_t_all = [], []
        for imgs, ncomp in zip(gmm_imgs, n_components_pca):
            if len(imgs) < ncomp:
                pca_components_all.append(np.zeros(
                    (ncomp, self.d1, self.d2, self.d3)))
                X_vec_t_all.append(np.zeros((len(imgs), ncomp)))
                continue
            p = PCA(n_components=ncomp, random_state=random_state)
            X_vec_t = p.fit_transform(
                imgs.reshape(imgs.shape[0],
                             self.d1 * self.d2 * self.d3))
            pca_components_all.append(p.components_.reshape(
                ncomp, self.d1, self.d2, self.d3))
            X_vec_t_all.append(X_vec_t)
        return (gmm_components, pca_components_all, X_vec_t_all,
                com_class_frames)

    def pca_scree_plot(self, plot_results: bool = True) -> np.ndarray:
        """(reference `multivar.py:344-362`)"""
        p = PCA()
        p.fit(self._X_vec())
        explained_var = p.explained_variance_ratio_
        if plot_results:
            self._plot_scree(explained_var)
        return explained_var

    def pca_gmm_scree_plot(self, n_components_gmm: int,
                           covariance_type: str = "diag",
                           random_state: int = 1,
                           plot_results: bool = True) -> List[np.ndarray]:
        """(reference `multivar.py:364-402`)"""
        _, gmm_imgs, _ = self.gmm(n_components_gmm, covariance_type,
                                  random_state, plot_results)
        explained_var_all = []
        for imgs in gmm_imgs:
            if len(imgs) < 2:
                explained_var_all.append(np.array([]))
                continue
            p = PCA()
            p.fit(imgs.reshape(imgs.shape[0],
                               self.d1 * self.d2 * self.d3))
            explained_var_all.append(p.explained_variance_ratio_)
        return explained_var_all

    # --------------------------------------------------------- imblocks
    def imblock_pca(self, n_components: int, random_state: int = 1,
                    plot_results: bool = False, **kwargs: int):
        """(reference `multivar.py:404-443`)"""
        components, X_vec_t, com_frames = self.pca(n_components,
                                                   random_state)
        return components, X_vec_t, com_frames[:, :2]

    def imblock_ica(self, n_components: int, random_state: int = 1,
                    plot_results: bool = False, **kwargs: int):
        """(reference `multivar.py:445-484`)"""
        components, X_vec_t, com_frames = self.ica(n_components,
                                                   random_state)
        return components, X_vec_t, com_frames[:, :2]

    def imblock_nmf(self, n_components: int, random_state: int = 1,
                    plot_results: bool = False, **kwargs: int):
        """(reference `multivar.py:486-528`)"""
        components, X_vec_t, com_frames = self.nmf(n_components,
                                                   random_state)
        return components, X_vec_t, com_frames[:, :2]

    # ------------------------------------------------------------ plots
    @classmethod
    def plot_decomposition_results(cls, components, X_vec_t,
                                   image_hw=None, xy_centers=None,
                                   plot_loading_maps: bool = True,
                                   **kwargs: int) -> None:
        """(reference `multivar.py:531-594`)"""
        import matplotlib
        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
        nc = components.shape[0]
        comp_ = components[..., :-1] if components.shape[-1] > 1 \
            else components
        fig, axes = plt.subplots(1, nc, figsize=(4 * nc, 4))
        for i, ax in enumerate(np.atleast_1d(axes)):
            ax.imshow(np.sum(comp_[i], axis=-1), cmap="seismic")
            ax.axis("off")
        plt.close(fig)

    def _plot_components(self, cla) -> None:
        import matplotlib
        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, len(cla), figsize=(4 * len(cla), 4))
        for i, ax in enumerate(np.atleast_1d(axes)):
            ax.imshow(cla[i, ..., 0], cmap="seismic")
            ax.axis("off")
        plt.close(fig)

    def _plot_scree(self, explained_var) -> None:
        import matplotlib
        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(1, 1, figsize=(6, 6))
        ax.plot(explained_var, "-o")
        ax.set_xlabel("Number of components")
        ax.set_ylabel("Explained variance")
        plt.close(fig)

    # ----------------------------------------------------- trajectories
    @classmethod
    def get_trajectory(cls, coord_class_dict: Dict[int, np.ndarray],
                       start_coord: np.ndarray, rmax: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Single-atom trajectory: nearest-neighbor chaining across frames
        within ``rmax`` (behavior of reference `multivar.py:596-631`)."""
        (flow, frames), = chain_tracks(
            coord_class_dict, np.asarray(start_coord, float)[None, :],
            rmax)
        return flow, frames

    def get_all_trajectories(self, min_length: int = 0,
                             run_gmm: bool = False, rmax: int = 10,
                             **kwargs) -> Dict:
        """Trajectories of all atoms/defects present in the first frame
        (behavior of reference `multivar.py:633-695`); all tracks advance
        together — one KD-tree per frame instead of one per (track,
        frame)."""
        if run_gmm:
            n_components = kwargs.get("n_components", 5)
            covariance = kwargs.get("covariance", "diag")
            random_state = kwargs.get("random_state", 1)
            gmm_comps, _, classes_frames = self.gmm(
                n_components, covariance, random_state)
            classes = classes_frames[:, -2]
        else:
            classes = np.zeros(len(self.imgstack_frames))
        coord_class_dict = {
            i: np.concatenate(
                (self.imgstack_com[self.imgstack_frames == i],
                 classes[self.imgstack_frames == i][..., None]), axis=-1)
            for i in self.imgstack_frames}
        first = next(iter(coord_class_dict.values()))
        tracks = chain_tracks(coord_class_dict, first[:, :2], rmax)
        kept = [(f, fr) for f, fr in tracks if len(f) > min_length]
        return_dict = {"trajectories": [f for f, _ in kept],
                       "frames": [fr for _, fr in kept]}
        if run_gmm:
            return_dict["gmm_components"] = gmm_comps
        return return_dict

    @classmethod
    def renumerate_classes(cls, classes: np.ndarray) -> np.ndarray:
        """(reference `multivar.py:697-705`)"""
        uniq = np.unique(classes)
        diff = uniq - np.arange(len(uniq))
        diff_d = {cl: d for d, cl in zip(diff, uniq)}
        return np.array([cl - diff_d[cl] for cl in classes],
                        dtype=np.int64)

    def transition_matrix(self, n_components: int,
                          covariance: str = "diag",
                          random_state: int = 1, rmax: int = 10,
                          min_length: int = 0,
                          sum_all_transitions: bool = False) -> Dict:
        """GMM + trajectories + Markov transition matrices
        (reference `multivar.py:707-756`)."""
        dict_to_return = self.get_all_trajectories(
            min_length, run_gmm=True, n_components=n_components,
            rmax=rmax, covariance=covariance, random_state=random_state)
        transitions_all = []
        for traj in dict_to_return["trajectories"]:
            classes = self.renumerate_classes(traj[:, -1])
            transitions_all.append(calculate_transition_matrix(classes))
        dict_to_return["transitions"] = transitions_all
        if sum_all_transitions:
            dict_to_return["all_transitions"] = sum_transitions(
                dict_to_return, n_components)
        return dict_to_return


def calculate_transition_matrix(trace: Union[List, np.ndarray]
                                ) -> np.ndarray:
    """Markov transition matrix from a state sequence
    (reference `multivar.py:758-778`)."""
    trace = np.asarray(trace, dtype=np.int64)
    n = 1 + int(trace.max())
    M = np.zeros((n, n))
    np.add.at(M, (trace[:-1], trace[1:]), 1)   # all transitions at once
    row_sums = M.sum(axis=1, keepdims=True)
    np.divide(M, row_sums, out=M, where=row_sums > 0)
    return M


def sum_transitions(trans_dict: Dict, msize: int,
                    plot_results: bool = False, **kwargs: int
                    ) -> np.ndarray:
    """Sums and normalizes per-trajectory transitions
    (reference `multivar.py:781-813`)."""
    transmat_all = np.zeros((msize, msize))
    for traj, trans in zip(trans_dict["trajectories"],
                           trans_dict["transitions"]):
        # each per-trajectory matrix is indexed by that trajectory's
        # renumerated (dense) states; scatter-add it back into the global
        # (state_i, state_j) block in one vectorized call
        states = np.unique(traj[:, -1]).astype(np.int64) - 1
        transmat_all[np.ix_(states, states)] += trans
    sums = transmat_all.sum(axis=1, keepdims=True)
    np.divide(transmat_all, sums, out=transmat_all, where=sums > 0)
    if plot_results:
        from ..utils.viz import plot_transitions
        plot_transitions(transmat_all,
                         gmm_components=trans_dict.get("gmm_components"),
                         **kwargs)
    return transmat_all


def update_classes(coordinates: Union[Dict[int, np.ndarray], np.ndarray],
                   nn_input: np.ndarray, method: str = "threshold",
                   **kwargs) -> Dict[int, np.ndarray]:
    """Re-labels located atoms by local intensity
    (reference `multivar.py:816-916`)."""
    if isinstance(coordinates, np.ndarray):
        coordinates = {0: coordinates}
    if np.ndim(nn_input) == 2:
        nn_input = nn_input[None, ..., None]
    elif np.ndim(nn_input) == 3:
        # 3D is ambiguous: (N, H, W) stack vs (H, W, C) single multi-
        # channel map. Keep the reference's cutoff (small last dim ->
        # channels) but PARTITION at it: the exclusive <10/>10 pair left
        # shape[-1] == 10 unhandled (silently wrong intensities)
        if nn_input.shape[-1] <= 10:
            nn_input = nn_input[None, ...]
        else:
            nn_input = nn_input[..., None]
    coordinates_ = copy.deepcopy(coordinates)

    if method == "gmm_local":
        n_components = kwargs.get("n_components")
        window_size = kwargs.get("window_size")
        if None in (n_components, window_size):
            raise AttributeError(
                "Specify number of components ('n_components') and "
                "window size ('window_size')")
        s = imlocal(nn_input, coordinates_, window_size,
                    kwargs.get("coord_class", 0))
        _, _, com_frames = s.gmm(n_components)
        for i in coordinates_.keys():
            coordinates_[i] = com_frames[
                com_frames[:, -1] == float(i)][:, :3]
            coordinates_[i][:, -1] = coordinates_[i][:, -1] - 1
        return coordinates_

    # intensity-based methods share one pipeline: window-mean intensities
    # per atom -> a fitted scalar labeler -> per-frame class columns
    if method == "threshold":
        thresh = kwargs.get("thresh")
        if thresh is None:
            raise AttributeError(
                "Specify intensity threshold value ('thresh'), "
                "e.g. thresh=.5")

        def fit_labeler(values):
            return lambda v: (v[:, 0] >= thresh).astype(float)
    elif method == "kmeans":
        n_components = kwargs.get("n_components")
        if n_components is None:
            raise AttributeError(
                "Specify number of components ('n_components')")

        def fit_labeler(values):
            return KMeans(n_clusters=n_components,
                          random_state=42).fit(values).predict
    elif method == "meanshift":
        def fit_labeler(values):
            from sklearn import cluster as _c
            bandwidth = _c.estimate_bandwidth(
                values, quantile=kwargs.get("quantile", .25))
            return _c.MeanShift(bandwidth=bandwidth,
                                bin_seeding=True).fit(values).predict
    else:
        raise NotImplementedError(
            "Choose between 'threshold', 'kmeans', 'meanshift' and "
            "'gmm_local' methods")

    intensities = get_intensities(coordinates_, nn_input,
                                  kwargs.get("window_size", 3))
    labeler = fit_labeler(np.concatenate(intensities)[:, None])
    for i, iarray in enumerate(intensities):
        coordinates_[i][:, -1] = labeler(iarray[:, None])
    return coordinates_
