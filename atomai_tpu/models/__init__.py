"""User-facing models (reference surface:
`atomai/models/__init__.py:1-16`)."""

from .segmentor import Segmentor
from .loaders import load_model, load_ensemble

__all__ = ["Segmentor", "load_model", "load_ensemble"]
