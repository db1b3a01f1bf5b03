"""Reconstructor — sparse-image GP reconstruction.

Parity: `atomai/models/dklgp/gpr.py:11-114` — nonzero pixels -> (index,
value) training set (`atomai/utils/preproc.py:938-947`), GP fit with
auto lengthscale constraints (`atomai/utils/coords.py:540-543`), full-grid
predict, reshape to image. The reference's KISS-GP kernel is replaced by
exact GP inference (dense batched Cholesky on the MXU) with optional
subsampling for very large pixel counts (SURVEY.md §7 hard-part #4).
"""

from typing import List, Optional, Tuple

import numpy as np

from ...trainers.gptrainer import GPTrainer, posterior
from ...utils.coords import get_lengthscale_constraints
from ...utils.preproc import create_batches, prepare_gp_input

import jax.numpy as jnp


class Reconstructor(GPTrainer):
    """Sparse image reconstructor.

    Example:
        >>> rec = aoi.models.Reconstructor()
        >>> img = rec.reconstruct(sparse_img, training_cycles=200)
    """

    MAX_EXACT_POINTS = 10000

    def __init__(self, **kwargs):
        super().__init__(**kwargs)

    def fit(self, X, y, training_cycles: int, **kwargs) -> None:
        """Trains the GP on measured pixels (reference `gpr.py:30-50`)."""
        self.run(X, y, training_cycles, **kwargs)

    def predict(self, X_new, **kwargs) -> np.ndarray:
        """Predictive mean on new inputs (reference `gpr.py:52-80`)."""
        batch_size = kwargs.get("batch_size", len(X_new))
        out = []
        for x in create_batches(np.asarray(X_new), batch_size):
            m, _ = super().predict(x)
            out.append(np.asarray(m).reshape(-1))
        return np.concatenate(out)

    def reconstruct(self, sparse_image: np.ndarray,
                    training_cycles: int = 100,
                    lengthscale_constraints: Optional[Tuple] = None,
                    grid_points_ratio: float = 1.0, **kwargs
                    ) -> np.ndarray:
        """Trains on sparse pixels and reconstructs the full image
        (reference `gpr.py:82-114`)."""
        X_train, y_train, X_full = prepare_gp_input(sparse_image)
        if not lengthscale_constraints:
            lengthscale_constraints = get_lengthscale_constraints(X_full)
        if "kernel_type" not in kwargs:
            # exact Cholesky up to ~10k measured pixels; inducing-grid
            # SGPR ('kissgp' analog) beyond that
            kwargs["kernel_type"] = "exact" \
                if len(X_train) <= self.MAX_EXACT_POINTS else "kissgp"
            kwargs.setdefault("grid_points_ratio", grid_points_ratio)
        print("Model training ...\n")
        self.fit(np.asarray(X_train, np.float32), y_train,
                 training_cycles,
                 lengthscale_constraints=lengthscale_constraints,
                 **kwargs)
        print("\n\rPerforming reconstruction... ", end="")
        reconstruction = self.predict(
            np.asarray(X_full, np.float32),
            batch_size=kwargs.get("batch_size", 4096))
        print("Done")
        return reconstruction.reshape(sparse_image.shape)
