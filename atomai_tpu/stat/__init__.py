"""Multivariate statistics layer (reference surface:
`atomai/stat/__init__.py:1-7`)."""

from .multivar import (imlocal, update_classes, calculate_transition_matrix,
                       sum_transitions)
from .fft_nmf import SlidingFFTNMF
from .unmixer import SpectralUnmixer
from .decomposition import PCA, FastICA, NMF, GaussianMixture, KMeans

__all__ = ["imlocal", "update_classes", "calculate_transition_matrix",
           "sum_transitions", "SlidingFFTNMF", "SpectralUnmixer", "PCA",
           "FastICA", "NMF", "GaussianMixture", "KMeans"]
