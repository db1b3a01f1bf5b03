"""Inference + post-processing to atomic coordinates.

Parity map into `atomai/predictors/predictor.py`:
- BasePredictor (:23-121): eval-mode jitted forward, chunked
  ``batch_predict`` streaming results to host to bound device memory.
- SegPredictor (:124-298): preprocess (channel fixups, optional resize, pad
  to divisible-by-2^n), forward + softmax/sigmoid fused under jit,
  channel-last output, auto batch-count heuristic for >=256 px images,
  ``run()`` = predict + Locator + timing print. nb_classes/downsample
  factor come from static model config (replacing hook-based mock forwards,
  `atomai/utils/nn.py:211-228`).
- ImSpecPredictor / RegPredictor / clsPredictor (:301-528).
- Locator (:531-639): background channel for 1-class output, per-class
  threshold -> device CC labeling -> CoM (`atomai_tpu/ops/cc_label.py`),
  edge-coordinate removal, optional batched 2D-Gaussian refinement
  (`atomai_tpu/ops/peakfit.py`). Output: {frame: N x 3 [x, y, class]}.
"""

import time
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..nets.fcnn import DOWNSAMPLE_FACTORS
from ..ops.cc_label import blob_centers_stack, blob_centers_tiled
from ..utils.coords import peak_refinement
from ..utils.img import img_pad, img_resize
from ..utils.preproc import format_image, format_spectra

# jitted-forward cache: linen modules are frozen dataclasses (hashable), so
# re-creating a predictor for the same net reuses the compiled executable
_FWD_CACHE: dict = {}


def _cached_forward(key, builder):
    fn = _FWD_CACHE.get(key)
    if fn is None:
        fn = builder()
        _FWD_CACHE[key] = fn
    return fn


def _cast_to_wire(y, fetch_dtype):
    """Applied INSIDE the jitted forward: casts the output to the wire
    dtype so the device->host transfer ships fewer bytes. Module-level
    (captures nothing) so closures stored in ``_FWD_CACHE`` never pin a
    predictor instance — and its params — for process lifetime."""
    if fetch_dtype is None:
        return y
    if fetch_dtype == "uint8":
        return jnp.clip(jnp.round(y * 255.0), 0, 255).astype(jnp.uint8)
    return y.astype(fetch_dtype)


class BasePredictor:
    """Base predictor: jitted forward + chunked batch prediction
    (reference `predictor.py:23-121`). Accepts ``fetch_dtype``
    (reduced-precision output wire for remote TPUs), ``mesh``
    (shard the frame axis), and ``verbose`` keyword args — details
    below.

    Keyword args (also accepted through every model's ``predict``):
    ``fetch_dtype`` — output wire dtype for the device->host fetch:
    ``None`` (default, exact float32), ``'bfloat16'`` (half the wire
    bytes, full f32 range), or — on predictors with bounded outputs,
    e.g. :class:`SegPredictor` probability maps — ``'float16'`` /
    ``'uint8'`` (half / quarter). The returned array is always decoded
    back to float32 on the host; choose it at construction (it is baked
    into the compiled forward). ``mesh`` — a ``jax.sharding.Mesh`` to
    shard the frame/tile axis over (``None`` auto-builds a data mesh on
    multi-device hosts, ``False`` disables). ``verbose`` — progress
    prints."""

    def __init__(self, model=None, params=None, batch_stats=None,
                 **kwargs):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.verbose = kwargs.get("verbose", False)
        self._jit_forward = None
        # Reduced-precision output fetch: on a tunneled TPU the
        # device->host transfer of full-resolution maps can dominate
        # predict wall time (config A ships 16.8 MB of f32 probability
        # maps). 'bfloat16' halves the wire cost at full f32 range;
        # 'float16'/'uint8' (SegPredictor only — bounded probability
        # semantics) halve/quarter it. The public API still returns
        # float32 (decoded on host); default None keeps exact f32 end
        # to end. Baked into the compiled forward at construction —
        # set it via the constructor, not by attribute mutation.
        self.fetch_dtype = kwargs.get("fetch_dtype")
        if self.fetch_dtype is not None:
            allowed = self._allowed_fetch_dtypes()
            if self.fetch_dtype not in allowed:
                raise ValueError(
                    f"fetch_dtype must be one of {allowed}, got "
                    f"{self.fetch_dtype!r}")
        # Sharded tiled inference (the domain's "context parallelism",
        # SURVEY.md §5): the frame/tile axis shards over the mesh data
        # axis so large stacks use every chip. mesh=None auto-builds a
        # pure-DP mesh on multi-device hosts; mesh=False disables; or
        # pass a jax.sharding.Mesh. The reference chunks on one device
        # (`predictor.py:82-106`).
        from ..core.mesh import resolve_data_mesh
        self.mesh = resolve_data_mesh(kwargs.get("mesh", None))
        if self.mesh is not None and self.params is not None:
            # re-place variables onto THIS mesh: params trained under a
            # different mesh (e.g. an auto-DP mesh sized to the training
            # batch) arrive committed to that device subset, and mixing
            # commitments in one jit is an error
            from ..core.mesh import replicate
            rep = replicate(self.mesh)
            self.params = jax.device_put(self.params, rep)
            if self.batch_stats is not None:
                self.batch_stats = jax.device_put(self.batch_stats, rep)

    def _shard_input(self, x):
        """Pads the leading (frame/tile) axis to the mesh data size and
        shards it; returns (sharded_x, original_length)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..core.mesh import DATA_AXIS
        n = x.shape[0]
        n_data = self.mesh.shape[DATA_AXIS]
        pad = (-n) % n_data
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec)), n

    @staticmethod
    def _allowed_fetch_dtypes():
        # generic predictor outputs are arbitrary-scale: only bfloat16
        # keeps the full float32 RANGE (float16 overflows to inf past
        # |y| > 65504, uint8 quantization needs [0, 1] probability
        # semantics — SegPredictor, whose outputs are bounded
        # probabilities, widens this to both)
        return (None, "bfloat16")

    def _decode_fetch(self, arr: np.ndarray) -> np.ndarray:
        """Host-side inverse of :func:`_cast_to_wire` (back to float32).

        Keyed on the ACTUAL wire dtype of the fetched array — not the
        live ``fetch_dtype`` attribute — so a post-construction mutation
        of the attribute (which cannot re-trace the cached forward)
        can never mis-scale the output."""
        if arr.dtype == np.uint8:
            return arr.astype(np.float32) / 255.0
        if arr.dtype != np.float32:
            return arr.astype(np.float32)
        return arr

    def preprocess(self, data):
        return jnp.asarray(np.asarray(data, np.float32))

    def _variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v

    def _make_forward(self):
        model = self.model
        fetch = self.fetch_dtype  # baked at first trace (see _cache_key)

        @jax.jit
        def fwd(variables, x):
            return _cast_to_wire(model.apply(variables, x, False), fetch)
        return fwd

    def forward_(self, xnew) -> jnp.ndarray:
        """Single forward pass (eval mode); shards the batch axis over the
        mesh when one is configured."""
        if self._jit_forward is None:
            self._jit_forward = _cached_forward(
                self._cache_key(), self._make_forward)
        if self.mesh is not None:
            xnew, n = self._shard_input(jnp.asarray(xnew))
            return self._jit_forward(self._variables(), xnew)[:n]
        return self._jit_forward(self._variables(), xnew)

    def _cache_key(self):
        # hash() probes the key NOW — building the tuple never hashes it,
        # so without the probe the TypeError would fire later inside the
        # cache lookup instead of hitting this fallback
        key = (type(self).__name__, self.model, self.fetch_dtype)
        try:
            hash(key)
            return key
        except TypeError:  # unhashable custom module
            return (type(self).__name__, id(self.model), self.fetch_dtype)

    def batch_predict(self, data, out_shape: Tuple[int, ...],
                      num_batches: int) -> np.ndarray:
        """Chunked prediction, streaming each chunk to the host
        (reference `predictor.py:82-106`)."""
        batch_size = len(data) // num_batches
        if batch_size < 1:
            # fewer items than requested chunks: ONE full-size chunk
            # (1 + (n-1) split would trace/compile two shapes for nothing)
            num_batches = 1
            batch_size = len(data)
        # dispatch every chunk asynchronously, then fetch them in one
        # overlapped device->host transfer — fetching inside the loop
        # would serialize compute and pay tunnel latency per chunk
        futures = []
        for i in range(num_batches):
            if self.verbose:
                print("\rBatch {}/{}".format(i + 1, num_batches), end="")
            data_i = data[i * batch_size:(i + 1) * batch_size]
            futures.append(self.forward_(data_i))
        data_i = data[num_batches * batch_size:]
        if len(data_i) > 0:
            futures.append(self.forward_(data_i))
        out = np.concatenate(
            [np.asarray(f) for f in jax.device_get(futures)]
        ).reshape(out_shape)
        return self._decode_fetch(out)

    def predict(self, data, out_shape=None, num_batches: int = 1
                ) -> np.ndarray:
        if out_shape is None:
            out_shape = data.shape
        else:
            out_shape = (data.shape[0], *out_shape)
        data = self.preprocess(data)
        return self.batch_predict(data, out_shape, num_batches)


@jax.jit
def _norm_minmax(x):
    lo = jnp.min(x)
    return (x - lo) / jnp.maximum(jnp.max(x) - lo, 1e-12)


class SegPredictor(BasePredictor):
    """Segmentation predictor (reference `predictor.py:124-298`)."""

    def __init__(self, model, params, batch_stats=None,
                 refine: bool = False, resize=None, logits: bool = True,
                 **kwargs):
        super().__init__(model, params, batch_stats, **kwargs)
        self.nb_classes = kwargs.get("nb_classes")
        if self.nb_classes is None:
            self.nb_classes = getattr(model, "nb_classes", 1)
        self.downsampling = kwargs.get("downsampling")
        if self.downsampling is None:
            self.downsampling = DOWNSAMPLE_FACTORS.get(
                type(model).__name__, 8)
        self.resize = resize
        self.logits = logits
        self.refine = refine
        self.d = kwargs.get("d")
        self.thresh = kwargs.get("thresh", .5)
        self.verbose = kwargs.get("verbose", True)

    @staticmethod
    def _allowed_fetch_dtypes():
        # segmentation outputs are probabilities in [0, 1]: float16
        # (overflow-prone on arbitrary-scale outputs, trivially in range
        # here) and uint8 x255 quantization (granularity 1/255, far
        # below the 0.5 locator threshold's sensitivity) are
        # additionally safe
        return (None, "float16", "bfloat16", "uint8")

    def _cache_key(self):
        key = ("SegPredictor", self.model, self.logits, self.nb_classes,
               self.fetch_dtype)
        try:
            hash(key)
            return key
        except TypeError:  # unhashable custom module
            return ("SegPredictor", id(self.model), self.logits,
                    self.nb_classes, self.fetch_dtype)

    def preprocess(self, image_data: np.ndarray, norm: bool = True):
        """(N?, H, W) -> padded, normalized NHWC
        (reference `predictor.py:190-207`). Min-max normalization runs on
        device (one fused pass) instead of several host numpy passes over
        the full stack."""
        image_data = np.asarray(image_data)
        if image_data.ndim == 2:
            image_data = image_data[None, ...]
        elif image_data.ndim == 4:
            if image_data.shape[-1] == 1:
                image_data = image_data[..., 0]
            elif image_data.shape[1] == 1:
                image_data = image_data[:, 0, ...]
        if self.resize is not None:
            image_data = img_resize(image_data, self.resize)
        image_data = img_pad(image_data, self.downsampling)
        x = jnp.asarray(format_image(image_data, norm=False))
        return _norm_minmax(x) if norm else x

    def _make_forward(self):
        model = self.model
        logits = self.logits
        nb = self.nb_classes
        fetch = self.fetch_dtype

        @jax.jit
        def fwd(variables, x):
            prob = model.apply(variables, x, False)
            if logits:
                prob = jax.nn.softmax(prob, axis=-1) if nb > 1 \
                    else jax.nn.sigmoid(prob)
            else:
                prob = jnp.exp(prob) if nb > 1 else prob
            return _cast_to_wire(prob, fetch)
        return fwd

    def predict(self, image_data, return_image: bool = False, **kwargs):
        """Probability maps, NHWC (reference `predictor.py:233-262`)."""
        image_data = self.preprocess(image_data, kwargs.get("norm", True))
        n, w, h = image_data.shape[:3]
        num_batches = kwargs.get("num_batches")
        if num_batches is None:
            # size chunks to ~256 MB of activations (the reference's
            # per-image chunking for >=256 px, `predictor.py:250-256`, is
            # a GPU-memory heuristic that would serialize tiny dispatches
            # on TPU)
            bytes_total = n * w * h * 4 * max(self.nb_classes, 16)
            num_batches = max(1, int(np.ceil(bytes_total / (256 * 2**20))))
            # never collapse to one giant batch because frames outnumber
            # the chunk budget (batch_size = n // num_batches floors to 0)
            num_batches = min(num_batches, n)
        segmented_imgs = self.batch_predict(
            image_data, (n, w, h, self.nb_classes), num_batches)
        if return_image:
            return np.asarray(image_data), segmented_imgs
        return segmented_imgs

    def run(self, image_data, compute_coords: bool = True, **kwargs):
        """Predict + locate coordinates (reference
        `predictor.py:264-298`)."""
        start_time = time.time()
        if not compute_coords:
            return self.predict(image_data, **kwargs)
        images, decoded_imgs = self.predict(
            image_data, return_image=True, **kwargs)
        thresh = kwargs.get("thresh", self.thresh)
        loc = Locator(thresh, refine=self.refine, d=self.d)
        coordinates = loc.run(decoded_imgs, images)
        if self.verbose:
            n_images_str = " image was " if decoded_imgs.shape[0] == 1 \
                else " images were "
            print("\n" + str(decoded_imgs.shape[0]) + n_images_str +
                  "decoded in approximately " +
                  str(np.around(time.time() - start_time, decimals=4)) +
                  " seconds")
        return decoded_imgs, coordinates


class ImSpecPredictor(BasePredictor):
    """im2spec/spec2im predictor (reference `predictor.py:300-394`)."""

    def __init__(self, model, params, output_dim, batch_stats=None,
                 **kwargs):
        super().__init__(model, params, batch_stats, **kwargs)
        if isinstance(output_dim, int):
            output_dim = (output_dim,)
        if len(output_dim) not in (1, 2):
            raise ValueError("output_dim must be a two-value tuple for "
                             "images and a single-value tuple for spectra")
        self.output_dim = tuple(output_dim)
        self.verbose = kwargs.get("verbose", True)

    def preprocess(self, signal: np.ndarray, norm: bool = True):
        signal = np.asarray(signal)
        if len(self.output_dim) == 1:  # image -> spectrum
            if signal.ndim == 2:
                signal = signal[None, ...]
            signal = format_image(signal, norm)[..., 0]
        else:  # spectrum -> image
            if signal.ndim == 1:
                signal = signal[None, ...]
            signal = format_spectra(signal, norm)
        return jnp.asarray(signal)

    def predict(self, signal, **kwargs) -> np.ndarray:
        signal = self.preprocess(signal, kwargs.get("norm", True))
        num_batches = kwargs.get("num_batches", 10)
        return self.batch_predict(
            signal, (len(signal), *self.output_dim), num_batches)

    def run(self, signal, **kwargs) -> np.ndarray:
        start_time = time.time()
        prediction = self.predict(signal, **kwargs)
        if self.verbose:
            if len(self.output_dim) == 1:
                str_ = " image was " if prediction.shape[0] == 1 \
                    else " images were "
            else:
                str_ = " spectrum was " if prediction.shape[0] == 1 \
                    else " spectra were "
            print("\n" + str(prediction.shape[0]) + str_ +
                  "decoded in approximately " +
                  str(np.around(time.time() - start_time, decimals=4)) +
                  " seconds")
        return prediction


class RegPredictor(BasePredictor):
    """Regression predictor (reference `predictor.py:397-478`)."""

    def __init__(self, model, params, output_dim: int, batch_stats=None,
                 **kwargs):
        super().__init__(model, params, batch_stats, **kwargs)
        self.output_dim = output_dim
        self.verbose = kwargs.get("verbose", True)

    def preprocess(self, image_data: np.ndarray, norm: bool = True):
        image_data = np.asarray(image_data)
        if image_data.ndim == 2:
            image_data = image_data[None, ...]
        return jnp.asarray(format_image(image_data, norm))

    def predict(self, image_data, **kwargs) -> np.ndarray:
        num_batches = kwargs.get("num_batches", 10)
        image_data = self.preprocess(image_data, kwargs.get("norm", True))
        output = self.batch_predict(
            image_data, (len(image_data), self.output_dim), num_batches)
        return output.squeeze()

    def run(self, image_data, **kwargs) -> np.ndarray:
        start_time = time.time()
        prediction = self.predict(image_data, **kwargs)
        if self.verbose:
            n_images = 1 if prediction.ndim == 0 else prediction.shape[0]
            n_images_str = " image was " if n_images == 1 \
                else " images were "
            print("\n" + str(n_images) + n_images_str +
                  "decoded in approximately " +
                  str(np.around(time.time() - start_time, decimals=4)) +
                  " seconds")
        return prediction


class clsPredictor(RegPredictor):
    """Classification predictor (reference `predictor.py:481-528`)."""

    def __init__(self, model, params, nb_classes: int, batch_stats=None,
                 **kwargs):
        super().__init__(model, params, nb_classes, batch_stats, **kwargs)

    def predict(self, image_data, **kwargs) -> np.ndarray:
        num_batches = kwargs.get("num_batches", 10)
        image_data = self.preprocess(image_data, kwargs.get("norm", True))
        output = self.batch_predict(
            image_data, (len(image_data), self.output_dim), num_batches)
        return np.argmax(output, 1).squeeze()


class Locator:
    """NN output -> atomic coordinates (reference `predictor.py:531-639`).

    The per-image, per-class host loop over cv2 threshold +
    scipy.ndimage.label becomes one batched device program: all
    (frame, class) masks are labeled and reduced to centers of mass in a
    single vmapped CC/segment-sum call.
    """

    def __init__(self, threshold: float = 0.5, dist_edge: int = 5,
                 dim_order: str = "channel_last", **kwargs):
        self.dim_order = dim_order
        self.threshold = threshold
        self.dist_edge = dist_edge
        self.refine = kwargs.get("refine")
        self.d = kwargs.get("d")

    def preprocess(self, nn_output: np.ndarray) -> np.ndarray:
        """Adds background channel for 1-class output
        (reference `predictor.py:564-580`)."""
        if nn_output.shape[-1] == 1:
            nn_output_b = 1 - nn_output
            nn_output = np.concatenate((nn_output, nn_output_b), axis=3)
        if self.dim_order == "channel_first":
            nn_output = np.transpose(nn_output, (0, 2, 3, 1))
        elif self.dim_order != "channel_last":
            raise NotImplementedError(
                'For dim_order, use "channel_first" or "channel_last"')
        return nn_output

    def run(self, nn_output: np.ndarray, *args: np.ndarray
            ) -> Dict[int, np.ndarray]:
        """Coordinates for every frame (reference
        `predictor.py:582-619`)."""
        nn_output = self.preprocess(nn_output)
        n, h, w, c = nn_output.shape
        n_cls = c - 1  # last channel is background
        # (N * n_cls, H, W) binary masks, all frames/classes at once
        masks = (nn_output[..., :n_cls] > self.threshold).astype(np.float32)
        masks = np.transpose(masks, (0, 3, 1, 2)).reshape(n * n_cls, h, w)
        # exact-safe static bound: under 4-connectivity the component count
        # can equal the foreground pixel count (all-1px blobs), so bound by
        # it — never silently drops atoms (reference `coords.py:21-34`
        # semantics: scipy.ndimage.label never drops)
        n_masks = n * n_cls
        if n_masks > 8:
            # many-frame path: the whole stack labels in ONE device
            # program (frames tiled with background separators) instead of
            # one dispatch chain per frame — per-dispatch tunnel latency
            # would otherwise dominate on long movies
            total = int(masks.sum()) + 1
            max_total = 1 << (max(8, min(total, n_masks * h * w))
                              - 1).bit_length()
            coords_t, frames_t, _, valid_t = blob_centers_tiled(
                jnp.asarray(masks), max_total)
            # valid blobs are a PREFIX of the nonzero-extracted arrays
            # (fill indices go last), so fetch the count then slice on
            # device: the exact-safe max_total bound is sized by total
            # foreground pixels (megabytes), the real blob set is tiny —
            # never ship the padding over the tunnel
            n_blobs = int(valid_t.sum())
            coords_t = np.asarray(coords_t[:n_blobs])
            frames_t = np.asarray(frames_t[:n_blobs])
            per_mask = [coords_t[frames_t == k] for k in range(n_masks)]
        else:
            max_count = int(masks.sum(axis=(1, 2)).max()) + 1
            max_blobs = 1 << (max(8, min(max_count, h * w))
                              - 1).bit_length()
            coords, _, valid = blob_centers_stack(jnp.asarray(masks),
                                                  max_blobs)
            coords = np.asarray(coords)
            valid = np.asarray(valid)
            per_mask = [coords[k][valid[k]] for k in range(n_masks)]
        d_coord = {}
        for i in range(n):
            coordinates = np.empty((0, 2))
            category = np.empty((0, 1))
            for ch in range(n_cls):
                coord_ch = self.rem_edge_coord(per_mask[i * n_cls + ch],
                                               h, w)
                category_ch = np.zeros((coord_ch.shape[0], 1)) + ch
                coordinates = np.append(coordinates, coord_ch, axis=0)
                category = np.append(category, category_ch, axis=0)
            d_coord[i] = np.concatenate((coordinates, category), axis=1)
        if self.refine:
            if len(args) == 0:
                raise AssertionError(
                    "Pass input image(s) for coordinates refinement")
            imgdata = args[0]
            print("\n\rRefining atomic positions... ", end="")
            d_coord_r = {}
            for i, (img, coord) in enumerate(zip(imgdata,
                                                 d_coord.values())):
                img2d = img[..., 0] if img.ndim == 3 else img
                d_coord_r[i] = peak_refinement(img2d, coord, self.d)
            print("Done")
            return d_coord_r
        return d_coord

    def rem_edge_coord(self, coordinates: np.ndarray, h: int, w: int
                       ) -> np.ndarray:
        """Removes coordinates near the edges
        (reference `predictor.py:622-639`)."""
        c = coordinates
        if len(c) == 0:
            return c
        bad = ((c[:, 0] > h - self.dist_edge) | (c[:, 0] < self.dist_edge) |
               (c[:, 1] > w - self.dist_edge) | (c[:, 1] < self.dist_edge))
        return c[~bad]
