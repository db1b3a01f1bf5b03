"""BaseVAE + standard VAE.

Parity: `atomai/models/dgm/vae.py` — BaseVAE public API (:28-591):
encode/decode/reconstruct with batching (:105-271), per-pixel image
encoding via sliding sub-windows (:273-344), trajectory encoding
(:346-385), 2D manifold rendering (:387-463), continuous+discrete manifold
traversal (:465-521), input validation (:543-578); VAE (:594-748):
class-conditional via one-hot concat to z (:661-687), capacity annealing
kwarg (:716-719), model saved every epoch (:742).
"""

import os
from copy import deepcopy as dc
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...losses_metrics.vi_losses import vae_loss
from ...nets.ed import init_VAE_nets
from ...trainers.vitrainer import viBaseTrainer
from ...utils.coords import imcoordgrid
from ...utils.img import crop_borders, extract_subimages, get_coord_grid
from ...utils.coords import subimg_trajectories
from ...utils.preproc import to_onehot


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2
              ) -> np.ndarray:
    """Tiles (N, C, H, W) images into one grid image (torchvision
    ``make_grid`` equivalent used at `vae.py:505`)."""
    n, c, h, w = images.shape
    ncol = int(np.ceil(n / nrow))
    grid = np.zeros((c, ncol * (h + padding) + padding,
                     nrow * (w + padding) + padding), images.dtype)
    for idx in range(n):
        i, j = divmod(idx, nrow)
        y0 = i * (h + padding) + padding
        x0 = j * (w + padding) + padding
        grid[:, y0:y0 + h, x0:x0 + w] = images[idx]
    return grid


def norm_ppf(q: np.ndarray) -> np.ndarray:
    """Standard normal percent-point function (scipy.stats.norm.ppf)."""
    from scipy.stats import norm
    return norm.ppf(q)


class BaseVAE(viBaseTrainer):
    """General class for VAE models (reference `vae.py:28-591`)."""

    def __init__(self, in_dim: Tuple[int, ...] = None, latent_dim: int = 2,
                 nb_classes: int = 0, coord: int = 0,
                 discrete_dim: Optional[List[int]] = None, seed: int = 0,
                 **kwargs) -> None:
        super().__init__(seed=max(seed, 0) + 1)
        bad_in_dim = (
            "in_dim must be a tuple of ints: (height, width[, channels]) "
            "for images or (length,) for spectra")
        if not isinstance(in_dim, (tuple, list)) or len(in_dim) == 0 \
                or not isinstance(in_dim[0], int):
            raise AssertionError(bad_in_dim)

        self.in_dim = tuple(in_dim)
        self.z_dim = latent_dim
        if isinstance(discrete_dim, list):
            self.z_dim = self.z_dim + sum(discrete_dim)
        self.discrete_dim = discrete_dim
        self.coord = coord
        if coord:
            if len(in_dim) not in (2, 3):
                raise NotImplementedError(
                    "VAE with rotation and translational invariance are "
                    "available only for 2D image data")
            self.z_dim = self.z_dim + coord
            self.x_coord = imcoordgrid(self.in_dim[:2])
        self.nb_classes = nb_classes

        encoder_net, decoder_net, self.metadict = init_VAE_nets(
            self.in_dim, latent_dim, coord, discrete_dim, nb_classes,
            **kwargs)
        self.metadict["vae_type"] = type(self).__name__
        self.set_model(encoder_net, decoder_net)
        self.sigmoid_out = self.metadict["sigmoid_out"]
        self.loss = "mse"

    # --------------------------------------------------------- inference
    def _encode_apply(self, x):
        if not hasattr(self, "_jit_enc") or self._jit_enc is None:
            enc = self.encoder_net
            self._jit_enc = jax.jit(
                lambda p, x: enc.apply({"params": p}, x, False))
        return self._jit_enc(self.params["encoder"], x)

    def _decode_apply(self, z, x_coord=None):
        if not hasattr(self, "_jit_dec") or self._jit_dec is None:
            dec = self.decoder_net
            if self.coord:
                self._jit_dec = jax.jit(
                    lambda p, xc, z: dec.apply({"params": p}, xc, z,
                                               False))
            else:
                self._jit_dec = jax.jit(
                    lambda p, z: dec.apply({"params": p}, z, False))
        if self.coord:
            return self._jit_dec(self.params["decoder"], x_coord, z)
        return self._jit_dec(self.params["decoder"], z)

    def encode_(self, x_new, **kwargs) -> np.ndarray:
        """Encodes data; returns concatenated encoder outputs
        (reference `vae.py:105-142`)."""
        x_new = np.asarray(x_new, np.float32)
        if x_new.ndim == len(self.in_dim):
            x_new = x_new[None]
        x_new = jnp.asarray(x_new)
        num_batches = kwargs.get("num_batches", 10)
        batch_size = max(len(x_new) // num_batches, 1)
        # dispatch all chunks, then one overlapped device->host fetch
        # (fetching per chunk would serialize on tunnel latency)
        futures = [self._encode_apply(x_new[i:i + batch_size])
                   for i in range(0, len(x_new), batch_size)]
        return np.concatenate([
            np.concatenate([np.asarray(o) for o in out], axis=-1)
            for out in jax.device_get(futures)])

    def encode(self, x_new, **kwargs):
        """Returns (z_mean, z_logsd[, alphas]) (reference
        `vae.py:144-180`)."""
        z = self.encode_(x_new, **kwargs)
        if not self.discrete_dim:
            z_mean = z[:, :self.z_dim]
            z_logsd = z[:, self.z_dim:]
            return z_mean, z_logsd
        cont_dim = self.z_dim - sum(self.discrete_dim)
        z_mean = z[:, :cont_dim]
        z_logsd = z[:, cont_dim:2 * cont_dim]
        alphas = z[:, 2 * cont_dim:]
        return z_mean, z_logsd, alphas

    def decode(self, z_sample, y: Optional[Union[int, np.ndarray]] = None
               ) -> np.ndarray:
        """Latent space -> data space (reference `vae.py:182-225`)."""
        z_sample = np.asarray(z_sample, np.float32)
        if z_sample.ndim == 1:
            z_sample = z_sample[None]
        if y is not None:
            if isinstance(y, int):
                y = np.array([y])
            y = np.asarray(y).reshape(-1)
            targets = to_onehot(y, self.nb_classes)
            if len(targets) == 1 and len(z_sample) > 1:
                targets = np.repeat(targets, len(z_sample), axis=0)
            z_sample = np.concatenate([z_sample, targets], axis=-1)
        z_sample = jnp.asarray(z_sample)
        if self.coord:
            xc = jnp.broadcast_to(
                self.x_coord, (z_sample.shape[0],) + self.x_coord.shape)
            x_decoded = self._decode_apply(z_sample, xc)
        else:
            x_decoded = self._decode_apply(z_sample)
        if self.sigmoid_out:
            x_decoded = jax.nn.sigmoid(x_decoded)
        return np.asarray(x_decoded)

    def reconstruct(self, x_new, **kwargs) -> np.ndarray:
        """Prediction with uncertainty by sampling from the encoded
        distribution (reference `vae.py:227-271`)."""
        num_samples = kwargs.get("num_samples", 32)
        label = kwargs.get("label")
        encoded = self.encode(x_new, num_batches=kwargs.get(
            "num_batches", 10))
        if len(encoded) == 2:
            z_mean, z_logsd = encoded
            alphas = None
        else:
            z_mean, z_logsd, alphas = encoded
        z_mean = z_mean[:, self.coord:]
        z_logsd = z_logsd[:, self.coord:]
        if label is not None:
            n = self.nb_classes if self.discrete_dim is None \
                else sum(self.discrete_dim)
            alphas = to_onehot(np.array([label]), n)
        z_sd = np.exp(z_logsd)
        rng = np.random.RandomState(0)
        # all samples for all inputs drawn at once and decoded in a single
        # batched device call (the reference loops decode() per sample);
        # sample-major layout keeps the reference's output ordering
        eps = rng.randn(num_samples, *z_mean.shape)
        z_samples = (z_mean[None] + z_sd[None] * eps).reshape(
            -1, z_mean.shape[-1])
        if alphas is not None:
            per_input = np.broadcast_to(
                alphas, (z_mean.shape[0], alphas.shape[-1]))
            z_samples = np.concatenate(
                [z_samples, np.tile(per_input, (num_samples, 1))], axis=1)
        return self.decode(z_samples)

    def encode_images(self, imgdata, **kwargs
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Encodes every pixel of every image (reference
        `vae.py:273-298`)."""
        if imgdata.ndim == len(self.in_dim):
            imgdata = imgdata[None]
        cropped, encoded = [], []
        n = imgdata.shape[0]
        for i, img in enumerate(imgdata):
            print(f"\rImage {i + 1}/{n}", end="")
            c, e = self.encode_image_(img, **kwargs)
            cropped.append(c)
            encoded.append(e)
        return np.array(cropped), np.array(encoded)

    def encode_image_(self, img, **kwargs
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Encodes a subimage around each pixel (reference
        `vae.py:300-344`)."""
        num_batches = kwargs.get("num_batches", 10)
        marker = -float(1e5)
        img_out = img.copy()
        coordinates = get_coord_grid(img_out, 1, return_dict=False)
        chunk = max(coordinates.shape[0] // num_batches, 1)
        # buffer width = the encoder's continuous-mean width (z_mean);
        # the reference sizes it z_dim and crashes for joint VAEs
        zw = self.z_dim - (sum(self.discrete_dim)
                           if self.discrete_dim else 0)
        encoded_img = np.full((*img_out.shape, zw), marker, np.float32)
        # chunked window extraction bounds host memory; within a chunk the
        # windows are encoded in one batched call and written back with a
        # vectorized scatter
        for i in range(0, coordinates.shape[0], chunk):
            windows, centers, _ = extract_subimages(
                img_out, coordinates[i:i + chunk], self.in_dim[0])
            if len(windows) == 0:
                continue
            z_mean = self.encode(windows.squeeze(-1), num_batches=1)[0]
            ij = centers.astype(np.int64)
            encoded_img[ij[:, 0], ij[:, 1]] = z_mean
        img_out[encoded_img[..., 0] == marker] = 0
        img_out = crop_borders(img_out[..., None], 0)
        encoded_img = crop_borders(encoded_img, marker)
        return img_out[..., 0], encoded_img

    def encode_trajectories(self, imgdata, coord_class_dict,
                            window_size: int, min_length: int, rmax: int,
                            **kwargs):
        """Trajectories + latent values (reference `vae.py:346-385`)."""
        t = subimg_trajectories(imgdata, coord_class_dict, window_size,
                                min_length, rmax)
        trajectories, frames, subimgs_all = t.get_all_trajectories()
        trajectories_enc_all = []
        for traj, subimgs in zip(trajectories, subimgs_all):
            z_mean = self.encode(
                subimgs, num_batches=kwargs.get("num_batches", 10))[0]
            traj_enc = np.concatenate((traj[:, :2], z_mean), axis=-1)
            trajectories_enc_all.append(traj_enc)
        return trajectories_enc_all, frames, subimgs_all

    def manifold2d(self, **kwargs) -> np.ndarray:
        """Renders the learned 2D manifold (reference `vae.py:387-463`).
        All d^2 grid points are decoded in a single batched call."""
        y = kwargs.get("label")
        if y is None and self.nb_classes != 0:
            y = 0
        elif y is not None and self.nb_classes == 0:
            y = None
        l1, l2 = kwargs.get("l1"), kwargs.get("l2")
        d = kwargs.get("d", 9)
        if l1 and l2:
            grid_x = np.linspace(l1[1], l1[0], d)
            grid_y = np.linspace(l2[0], l2[1], d)
        else:
            grid_x = norm_ppf(np.linspace(0.95, 0.05, d))
            grid_y = norm_ppf(np.linspace(0.05, 0.95, d))
        gx, gy = np.meshgrid(grid_x, grid_y, indexing="ij")
        z = np.stack([gx.ravel(), gy.ravel()], axis=-1)
        if self.discrete_dim:
            z_disc = np.zeros((len(z), sum(self.discrete_dim)))
            z_disc[:, kwargs.get("disc_idx", 0)] = 1
            z = np.concatenate([z, z_disc], axis=-1)
        if y is not None:
            imdec = self.decode(z, np.full(len(z), y, dtype=int))
        else:
            imdec = self.decode(z)
        h, w = self.in_dim[:2]
        # (d*d, h, w[, c]) -> (d*h, d*w[, c]) tile layout via reshape
        tiles = imdec.reshape((d, d, h, w) + imdec.shape[3:])
        figure = tiles.transpose(
            (0, 2, 1, 3) + tuple(range(4, tiles.ndim)))
        figure = figure.reshape((d * h, d * w) + imdec.shape[3:])
        if figure.min() < 0:
            figure = (figure - figure.min()) / np.ptp(figure)
        if kwargs.get("savefig"):
            import matplotlib
            matplotlib.use("Agg", force=False)
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(10, 10))
            ax.imshow(figure, cmap=kwargs.get("cmap", "gnuplot"),
                      origin=kwargs.get("origin", "lower"))
            savedir = kwargs.get("savedir", "./vae_learning/")
            os.makedirs(savedir, exist_ok=True)
            fname = kwargs.get("filename", "manifold_2d")
            fig.savefig(os.path.join(savedir, f"{fname}.png"))
            plt.close(fig)
        return figure

    def manifold_traversal(self, cont_idx: int, d: int = 10,
                           cont_idx_fixed: int = 0, plot: bool = False,
                           **kwargs) -> np.ndarray:
        """Joint cont+disc latent traversal (reference `vae.py:465-521`)."""
        if self.discrete_dim is None:
            raise TypeError(
                "Traversal of latent space is implemented only for joint "
                "continuous and discrete latent distributions")
        cont_dim = self.z_dim - sum(self.discrete_dim) - self.coord
        disc_dim = self.discrete_dim[0]
        # rows sweep the discrete one-hot (cycled), columns sweep the
        # chosen continuous latent through normal quantiles
        cont_traversal = norm_ppf(np.linspace(0.05, 0.95, d))
        samples_cont = np.full((d * d, cont_dim), float(cont_idx_fixed))
        samples_cont[:, cont_idx] = np.tile(cont_traversal, d)
        row_categories = np.resize(np.arange(disc_dim), d)
        onehot_rows = np.eye(disc_dim)[row_categories]      # (d, disc)
        samples_disc = np.repeat(onehot_rows, d, axis=0)    # (d*d, disc)
        samples = np.concatenate((samples_cont, samples_disc), -1)
        decoded = self.decode(samples)
        decoded = decoded.transpose(0, 3, 1, 2) if decoded.ndim == 4 \
            else decoded[:, None]
        grid = make_grid(decoded, nrow=d, padding=kwargs.get("pad", 2))
        grid = grid.transpose(1, 2, 0) if len(self.in_dim) == 3 \
            else grid[0]
        grid = (grid - grid.min()) / max(np.ptp(grid), 1e-12)
        if not kwargs.get("keep_square", False) and disc_dim != d:
            grid = grid[:(self.in_dim[0] + kwargs.get("pad", 2)) * disc_dim]
        return grid

    @classmethod
    def visualize_manifold_learning(cls, frames_dir: str, **kwargs
                                    ) -> None:
        """Gif of manifold evolution (reference `vae.py:523-541`)."""
        from ...utils.viz import animation_from_png
        movie_name = kwargs.get("moviename", "manifold_learning")
        duration = kwargs.get("frame_duration", 1)
        animation_from_png(frames_dir, movie_name, duration,
                           remove_dir=False)

    def _check_inputs(self, X_train, y_train=None, X_test=None,
                      y_test=None) -> None:
        """Input validation (reference behavior: `vae.py:543-578`)."""
        for name, arr in (("train", X_train), ("test", X_test)):
            if arr is not None and tuple(arr.shape[1:]) != self.in_dim:
                raise RuntimeError(
                    f"{name} data shape {tuple(arr.shape[1:])} does not "
                    f"match in_dim={self.in_dim}")
        if y_train is not None:
            if self.nb_classes == 0:
                raise RuntimeError(
                    "labels were passed but the model was constructed "
                    "with nb_classes=0")
            n_lbl = {len(np.unique(y_train))}
            if y_test is not None:
                n_lbl.add(len(np.unique(y_test)))
            if n_lbl != {self.nb_classes}:
                raise RuntimeError(
                    f"nb_classes={self.nb_classes} does not match the "
                    f"number of distinct labels {sorted(n_lbl)}")

    def _fit_loop(self, X_train, y_train, X_test, y_test, loss, **kwargs):
        """Common epoch loop shared by all VAE flavors
        (reference per-class fit loops, e.g. `vae.py:731-744`)."""
        self.compile_trainer((X_train, y_train), (X_test, y_test),
                             **kwargs)
        self.loss = loss
        if self.loss == "ce":
            self.sigmoid_out = True
            self.metadict["sigmoid_out"] = True
        self.recording = kwargs.get("recording", False)
        verbose = kwargs.get("verbose", True)
        from ...core.checkpoint import flush_async_checkpoints
        from ...core.mlog import open_metrics_log
        mlog = open_metrics_log(kwargs.get("metrics_log"))
        # ELBOs stay DEVICE scalars inside the loop: a per-epoch float()
        # costs a host round trip that dominates small-model epochs on a
        # remote accelerator (round-4 experiment: 205 -> 911 steps/s).
        # They are fetched where a value is genuinely needed (verbose
        # printing, metrics log) and converted in one overlapped
        # device_get at the end.
        # epochs_per_dispatch=n (opt-in) additionally scans n epochs in
        # ONE device dispatch (measured 1346 vs 911 steps/s on config C)
        # with identical RNG stream / annealing / per-epoch history;
        # checkpoints then land per chunk instead of per epoch.
        epd = max(1, int(kwargs.get("epochs_per_dispatch", 1)))
        if self.recording and self.z_dim in (3, 5):
            epd = 1  # per-epoch manifold snapshots need the epoch loop
        try:
            e = 0
            while e < self.training_cycles:
                k = min(epd, self.training_cycles - e)
                self.current_epoch = e + k - 1
                if k == 1:
                    elbo_epoch = self.train_epoch_lazy()
                    self.loss_history["train_loss"].append(elbo_epoch)
                    elbo_epoch_test = None
                    if self.X_test is not None:
                        elbo_epoch_test = self.evaluate_model_lazy()
                        self.loss_history["test_loss"].append(
                            elbo_epoch_test)
                    if mlog is not None:
                        mlog.log(e, train_elbo=float(elbo_epoch),
                                 test_elbo=None if elbo_epoch_test is None
                                 else float(elbo_epoch_test))
                    if verbose:
                        self.print_statistics(e)
                    if getattr(self, "recording", False) and \
                            self.z_dim in (3, 5):
                        self.manifold2d(savefig=True, filename=str(e))
                else:
                    elbos, elbos_t = self.train_epochs_lazy(k)
                    self.loss_history["train_loss"].extend(list(elbos))
                    if elbos_t is not None:
                        self.loss_history["test_loss"].extend(
                            list(elbos_t))
                    if mlog is not None:
                        mlog.log_many(
                            e, train_elbo=np.asarray(elbos),
                            test_elbo=None if elbos_t is None
                            else np.asarray(elbos_t))
                    if verbose:
                        tr = np.asarray(elbos)
                        ts = None if elbos_t is None else \
                            np.asarray(elbos_t)
                        for i in range(k):
                            if ts is not None:
                                print("Epoch: {}/{}, Training loss: "
                                      "{:.4f}, Test loss: {:.4f}".format(
                                          e + i + 1, self.training_cycles,
                                          -tr[i], -ts[i]))
                            else:
                                print("Epoch: {}/{}, Training loss: "
                                      "{:.4f}".format(
                                          e + i + 1, self.training_cycles,
                                          -tr[i]))
                self.update_metadict()
                # per-epoch checkpoint (reference parity, `vae.py:742`):
                # fully async (fetch + serialize + write off-thread) so
                # the epoch never stalls on host I/O or the transfer
                self.save_model(self.filename, async_write=True)
                e += k
        finally:
            self._finalize_loss_history()
            flush_async_checkpoints()
            if mlog is not None:
                mlog.close()
        self.save_model(self.filename)   # final, synchronous
        if getattr(self, "recording", False) and self.z_dim in (3, 5):
            self.visualize_manifold_learning("./vae_learning")

    def update_metadict(self):
        self.metadict["num_epochs"] = self.current_epoch
        self.metadict["num_iter"] = self.num_iter


class VAE(BaseVAE):
    """Standard Variational Autoencoder (reference `vae.py:594-748`).

    Example:
        >>> vae = aoi.models.VAE((28, 28))
        >>> vae.fit(imstack_train, training_cycles=100, batch_size=100)
        >>> vae.manifold2d()
    """

    def __init__(self, in_dim: Tuple[int, ...] = None, latent_dim: int = 2,
                 nb_classes: int = 0, seed: int = 0, **kwargs) -> None:
        super().__init__(in_dim, latent_dim, nb_classes, 0, seed=seed,
                         **kwargs)
        self.kdict_ = dc(kwargs)

    def elbo_fn(self, x, x_reconstr, *args, **kwargs):
        return vae_loss(self.loss, self.in_dim, x, x_reconstr, *args,
                        **kwargs)

    def forward_compute_elbo_fn(self, params, x, y, key, num_iter,
                                train: bool):
        """Jittable forward + ELBO (reference `forward_compute_elbo`,
        `vae.py:661-687`)."""
        z_mean, z_logsd = self.encoder_net.apply(
            {"params": params["encoder"]}, x, train)
        z_sd = jnp.exp(z_logsd)
        z = self.reparameterize(key, z_mean, z_sd)
        if y is not None:
            targets = jax.nn.one_hot(y.astype(jnp.int32), self.nb_classes)
            z = jnp.concatenate([z, targets], axis=-1)
        x_reconstr = self.decoder_net.apply(
            {"params": params["decoder"]}, z, train)
        kw = {k: v for k, v in self.kdict_.items() if k == "capacity"}
        return self.elbo_fn(x, x_reconstr, z_mean, z_logsd,
                            num_iter=num_iter, **kw)

    def fit(self, X_train, y_train=None, X_test=None, y_test=None,
            loss: str = "mse", **kwargs) -> None:
        """Trains the VAE (reference `vae.py:689-744`)."""
        X_train = np.asarray(X_train, np.float32)
        self._check_inputs(X_train, y_train, X_test, y_test)
        for k, v in kwargs.items():
            if k in ("capacity",):
                self.kdict_[k] = v
        self._fit_loop(X_train, y_train, X_test, y_test, loss, **kwargs)
