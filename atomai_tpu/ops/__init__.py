"""TPU-native ops: XLA/Pallas programs replacing the reference's native
binary dependencies (SURVEY.md §2.9 checklist)."""

from .cc_label import (label_components, blob_centers, blob_centers_stack,
                       blob_centers_tiled, find_com_device)
from .pallas_mlp import spatial_mlp, spatial_mlp_reference
from .peakfit import refine_peaks, gaussian_2d_jax

__all__ = ["label_components", "blob_centers", "blob_centers_stack",
           "blob_centers_tiled", "find_com_device", "refine_peaks",
           "gaussian_2d_jax", "spatial_mlp", "spatial_mlp_reference"]
