"""Visualization helpers (host-side matplotlib).

Parity map into `atomai/utils/viz.py`: plot_losses (:21-33), plot_coord
(:36-47), draw_boxes (:50-65), trajectory/transition plots (:68-218),
plot_lattice_bonds (:221-282), animation_from_png (:285-301),
visualize_unmixing_results (:304-363). All imports of matplotlib are
function-local so headless/compute-only environments never pay for them.
"""

from typing import Dict, List, Optional, Union

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def plot_losses(train_loss: Union[List[float], np.ndarray],
                test_loss: Union[List[float], np.ndarray],
                savefig: Optional[str] = None) -> None:
    """Train/test loss curves (:21-33)."""
    plt = _plt()
    fig, ax = plt.subplots(1, 1, figsize=(6, 6))
    ax.plot(train_loss, label="Train")
    ax.plot(test_loss, label="Test")
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Loss")
    ax.legend()
    if savefig:
        fig.savefig(savefig)
    plt.close(fig)


def plot_coord(img: np.ndarray, coord: np.ndarray, fsize: int = 6,
               savefig: Optional[str] = None) -> None:
    """Image with predicted atomic coordinates (:36-47)."""
    plt = _plt()
    y, x, c = coord[:, 0], coord[:, 1], coord[:, -1]
    fig, ax = plt.subplots(1, 1, figsize=(fsize, fsize))
    ax.imshow(img, cmap="gray")
    ax.scatter(x, y, c=c, cmap="RdYlGn", s=8)
    if savefig:
        fig.savefig(savefig)
    plt.close(fig)


def draw_boxes(imgdata: np.ndarray, defcoord: np.ndarray, bbox: int = 16,
               fsize: int = 6, savefig: Optional[str] = None) -> None:
    """Bounding boxes around detected defects (:50-65)."""
    plt = _plt()
    fig, ax = plt.subplots(1, 1, figsize=(fsize, fsize))
    ax.imshow(imgdata, cmap="gray")
    for point in defcoord:
        startx = int(round(point[0] - bbox))
        starty = int(round(point[1] - bbox))
        p = plt.Rectangle((starty, startx), bbox * 2, bbox * 2,
                          fill=False, edgecolor="orange", lw=2)
        ax.add_patch(p)
    ax.grid(False)
    if savefig:
        fig.savefig(savefig)
    plt.close(fig)


def plot_trajectories(traj: np.ndarray, frames: np.ndarray,
                      **kwargs: Union[int, str]) -> None:
    """Trajectory plot (:68-109)."""
    plt = _plt()
    fsize = kwargs.get("fsize", 6)
    fig, ax = plt.subplots(1, 1, figsize=(fsize, fsize))
    ax.plot(traj[:, 1], traj[:, 0], "-o", ms=4)
    ax.invert_yaxis()
    if kwargs.get("savefig"):
        fig.savefig(kwargs["savefig"])
    plt.close(fig)


def plot_trajectories_transitions(trans_dict: Dict, k: int,
                                  **kwargs) -> None:
    """Trajectory + transition plot (:112-181)."""
    traj = trans_dict["trajectories"][k]
    frames = trans_dict["frames"][k]
    plot_trajectories(traj, frames, **kwargs)


def plot_transitions(m: np.ndarray, gmm_components: Optional[np.ndarray]
                     = None, plot_values: bool = False, **kwargs) -> None:
    """Transition-matrix heatmap (:184-218)."""
    plt = _plt()
    fsize = kwargs.get("fsize", 6)
    cmap = kwargs.get("cmap", "Reds")
    fig, ax = plt.subplots(1, 1, figsize=(fsize, fsize))
    im = ax.imshow(m, cmap=cmap)
    if plot_values:
        for (j, i), v in np.ndenumerate(m):
            ax.text(i, j, "{:0.2f}".format(v), ha="center", va="center")
    fig.colorbar(im)
    ax.set_xlabel("Transition class")
    ax.set_ylabel("Starting class")
    if kwargs.get("savefig"):
        fig.savefig(kwargs["savefig"])
    plt.close(fig)


def plot_lattice_bonds(distances: np.ndarray, atom_pairs: np.ndarray,
                       distance_ideal: Optional[float] = None,
                       frame: int = 0, display_results: bool = True,
                       **kwargs: Union[str, int]) -> None:
    """Color-coded lattice bonds (:221-282)."""
    import os
    plt = _plt()
    savedir = kwargs.get("savedir", "./")
    h, w = kwargs.get("h", 512), kwargs.get("w", 512)
    if distance_ideal is None:
        distance_ideal = np.mean(distances)
    fig, ax = plt.subplots(1, 1, figsize=(8, 8))
    for d, pairs in zip(distances, atom_pairs):
        for dd, p in zip(np.atleast_1d(d), pairs[1:]):
            dev = abs(dd - distance_ideal)
            ax.plot([pairs[0][1], p[1]], [pairs[0][0], p[0]],
                    c=plt.cm.jet(min(dev / max(distance_ideal, 1e-9), 1.0)))
    ax.set_xlim(0, w)
    ax.set_ylim(h, 0)
    if not display_results or kwargs.get("savedir"):
        os.makedirs(savedir, exist_ok=True)
        fig.savefig(os.path.join(savedir, f"frame_{frame}.png"))
    plt.close(fig)


def plot_coordinates_comparison(coordinates: np.ndarray,
                                delta_r: List[float],
                                expdata: Optional[np.ndarray],
                                fsize: int = 20) -> None:
    """Deviation scatter used by compare_coordinates
    (`atomai/utils/coords.py:287-300`)."""
    if expdata is None:
        raise AssertionError(
            "For plotting, provide 2D image via 'expdata' keyword")
    plt = _plt()
    fig = plt.figure(figsize=(int(fsize * 1.25), fsize))
    plt.imshow(expdata, cmap="gray")
    im = plt.scatter(coordinates[:, 1], coordinates[:, 0],
                     c=np.array(delta_r), cmap="jet", s=5)
    clrbar = plt.colorbar(im)
    clrbar.set_label("Position deviation (px)")
    plt.close(fig)


def animation_from_png(png_dir: str, moviename: str = "anim",
                       duration: float = 1, savedir: str = "./",
                       remove_dir: bool = True) -> None:
    """Gif animation from a directory of pngs (:285-301)."""
    import os
    import shutil
    from PIL import Image
    images = []
    for f in sorted(os.listdir(png_dir)):
        if f.endswith(".png"):
            images.append(Image.open(os.path.join(png_dir, f)).copy())
    if images:
        os.makedirs(savedir, exist_ok=True)
        images[0].save(
            os.path.join(savedir, moviename + ".gif"), save_all=True,
            append_images=images[1:], duration=int(duration * 1000), loop=0)
    if remove_dir:
        shutil.rmtree(png_dir, ignore_errors=True)


def visualize_unmixing_results(components: np.ndarray, abundances: np.ndarray,
                               figsize: int = 4,
                               savefig: Optional[str] = None) -> None:
    """Spectral-unmixing component/abundance panels (:304-363)."""
    plt = _plt()
    components = np.atleast_2d(components)
    n = components.shape[0]
    fig, axes = plt.subplots(2, n, figsize=(figsize * n, 2 * figsize))
    # n=1 gives a shape-(2,) axes vector; atleast_2d would orient it
    # (1, 2) and break the [1, i] indexing below
    axes = np.asarray(axes).reshape(2, n)
    for i in range(n):
        axes[0, i].plot(components[i])
        axes[0, i].set_title(f"Component {i + 1}")
        axes[1, i].imshow(abundances[..., i], cmap="viridis")
        axes[1, i].set_title(f"Abundance {i + 1}")
    if savefig:
        fig.savefig(savefig)
    plt.close(fig)
