"""Sliding-window FFT + NMF unmixing.

Parity: `atomai/stat/fft_nmf.py:12-320` — auto window sizing (:44-102),
strided window extraction (:104-152), hamming-filtered log-magnitude FFT
with center zoom + interpolation (:154-216), NMF unmixing into components +
abundance maps (:218-266), full pipeline ``analyze_image`` (:268-320).

TPU-first redesign: the reference's per-window host loop over
``fftpack.fft2`` becomes one batched ``jnp.fft.fft2`` over the whole window
stack; zoom/interpolation are ``jax.image.resize``; NMF runs on device
(`atomai_tpu/stat/decomposition.py`).
"""

import os
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .decomposition import NMF


class SlidingFFTNMF:
    """Sliding-window FFT transform unmixed with NMF.

    Example:
        >>> analyzer = stat.SlidingFFTNMF(components=4)
        >>> components, abundances = analyzer.analyze_image(image)
    """

    def __init__(self, window_size_x: Optional[int] = None,
                 window_size_y: Optional[int] = None,
                 window_step_x: Optional[int] = None,
                 window_step_y: Optional[int] = None,
                 interpolation_factor: int = 2, zoom_factor: int = 2,
                 hamming_filter: bool = True, components: int = 4):
        self._user_window_size_x = window_size_x
        self._user_window_size_y = window_size_y
        self._user_window_step_x = window_step_x
        self._user_window_step_y = window_step_y
        self.interpol_factor = interpolation_factor
        self.zoom_factor = zoom_factor
        self.hamming_filter = hamming_filter
        self.components = components
        self.hamming_window = None

    def _calculate_window_params(self, image_shape) -> None:
        """Auto window/step sizing (reference `fft_nmf.py:44-102`)."""
        height, width = image_shape[:2]
        if self._user_window_size_x is None:
            self.window_size_x = max(32, min(128, height // 8))
            self.window_size_x = 2 ** int(np.log2(self.window_size_x))
        else:
            self.window_size_x = self._user_window_size_x
        if self._user_window_size_y is None:
            self.window_size_y = max(32, min(128, width // 8))
            self.window_size_y = 2 ** int(np.log2(self.window_size_y))
        else:
            self.window_size_y = self._user_window_size_y
        self.window_step_x = self._user_window_step_x or \
            max(1, self.window_size_x // 4)
        self.window_step_y = self._user_window_step_y or \
            max(1, self.window_size_y // 4)
        if self.window_size_x > height:
            self.window_size_x = min(64, height)
            self.window_step_x = max(1, self.window_size_x // 4)
        if self.window_size_y > width:
            self.window_size_y = min(64, width)
            self.window_step_y = max(1, self.window_size_y // 4)
        # separable 2D Hamming: outer product of the two 1D windows —
        # bw2d * bw2d.T only works for square windows
        self.hamming_window = np.sqrt(np.outer(
            np.hamming(self.window_size_x),
            np.hamming(self.window_size_y)))

    def make_windows(self, image: np.ndarray) -> np.ndarray:
        """Strided sliding windows (reference `fft_nmf.py:104-152`)."""
        image = np.asarray(image)
        if image.ndim > 2:
            image = np.mean(image[..., :3], axis=2)
        self._calculate_window_params(image.shape)
        image = image.astype(float)
        if np.max(image) > 0:
            image = (image - np.min(image)) / (np.max(image) -
                                               np.min(image))
        if image.shape[0] < self.window_size_x or \
                image.shape[1] < self.window_size_y:
            raise ValueError(
                f"Image dimensions {image.shape} are smaller than window "
                f"size ({self.window_size_x}, {self.window_size_y})")
        sx, sy = self.window_step_x, self.window_step_y
        wx, wy = self.window_size_x, self.window_size_y
        nx = (image.shape[0] - wx) // sx + 1
        ny = (image.shape[1] - wy) // sy + 1
        shape = (nx, ny, wx, wy)
        strides = (image.strides[0] * sx, image.strides[1] * sy,
                   image.strides[0], image.strides[1])
        windows = np.lib.stride_tricks.as_strided(image, shape, strides)
        self.windows_shape = (nx, ny)
        x_positions = np.arange(0, ny * sy, sy)
        y_positions = np.arange(0, nx * sx, sx)
        xx, yy = np.meshgrid(x_positions, y_positions)
        self.pos_vec = np.column_stack((yy.flatten(), xx.flatten()))
        return windows.reshape(-1, wx, wy)

    def process_fft(self, windows: np.ndarray) -> np.ndarray:
        """Batched FFT magnitude + zoom (reference
        `fft_nmf.py:154-216`) — one device program over all windows."""
        w = jnp.asarray(windows, jnp.float32)
        if self.hamming_filter:
            w = w * jnp.asarray(self.hamming_window, jnp.float32)[None]
        fft = jnp.fft.fftshift(jnp.fft.fft2(w), axes=(-2, -1))
        fft_mag = jnp.log1p(jnp.abs(fft))
        cx, cy = self.window_size_x // 2, self.window_size_y // 2
        zoom = max(1, self.window_size_x // (2 * self.zoom_factor))
        x0, x1 = max(0, cx - zoom), min(fft_mag.shape[1], cx + zoom)
        y0, y1 = max(0, cy - zoom), min(fft_mag.shape[2], cy + zoom)
        zoomed = fft_mag[:, x0:x1, y0:y1]
        if self.interpol_factor > 1:
            n, h, wd = zoomed.shape
            zoomed = jax.image.resize(
                zoomed, (n, h * self.interpol_factor,
                         wd * self.interpol_factor), method="linear")
        self.fft_size = zoomed.shape[1:]
        return np.nan_to_num(np.asarray(zoomed))

    def run_nmf(self, fft_results: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
        """NMF unmixing (reference `fft_nmf.py:218-266`)."""
        fft_flat = fft_results.reshape(fft_results.shape[0], -1)
        fft_flat = np.maximum(0, fft_flat)
        if np.all(fft_flat == 0) or np.isnan(fft_flat).any() or \
                np.isinf(fft_flat).any():
            raise ValueError(
                "Invalid data for NMF: contains zeros, NaNs or Infs")
        if fft_flat.shape[0] < self.components:
            self.components = min(fft_flat.shape[0], 3)
        nmf = NMF(n_components=self.components, random_state=42,
                  max_iter=1000)
        abundances = nmf.fit_transform(fft_flat)
        components = nmf.components_.reshape(
            self.components, self.fft_size[0], self.fft_size[1])
        abundances = abundances.reshape(
            self.windows_shape[0], self.windows_shape[1],
            self.components)
        return components, abundances

    def analyze_image(self, image_input: Union[str, np.ndarray],
                      output_path: Optional[str] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Full pipeline (reference `fft_nmf.py:268-320`)."""
        if isinstance(image_input, str):
            from ..utils.img import load_image
            image = load_image(image_input)
            if output_path is None:
                base_dir = os.path.dirname(image_input)
                base_name = os.path.splitext(
                    os.path.basename(image_input))[0]
                output_path = os.path.join(base_dir,
                                           f"{base_name}_analysis")
        elif isinstance(image_input, np.ndarray):
            image = image_input.copy()
            if output_path is None:
                output_path = "array_analysis"
        else:
            raise TypeError("image_input must be either a file path "
                            "(string) or numpy array")
        windows = self.make_windows(image)
        fft_results = self.process_fft(windows)
        components, abundances = self.run_nmf(fft_results)
        abundances = abundances.transpose(-1, 0, 1)
        if output_path:
            np.save(f"{output_path}_components.npy", components)
            np.save(f"{output_path}_abundances.npy", abundances)
        return components, abundances
