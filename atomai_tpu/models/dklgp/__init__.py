"""Deep kernel learning / GP models (reference surface:
`atomai/models/dklgp/__init__.py`)."""

from .dklgpr import dklGPR
from .gpr import Reconstructor

__all__ = ["dklGPR", "Reconstructor"]
