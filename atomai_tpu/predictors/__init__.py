"""Predictors (reference surface: `atomai/predictors/__init__.py:1-6`)."""

from .predictor import (BasePredictor, SegPredictor, ImSpecPredictor,
                        RegPredictor, clsPredictor, Locator)
from .epredictor import EnsemblePredictor, ensemble_locate

__all__ = ["BasePredictor", "SegPredictor", "ImSpecPredictor",
           "RegPredictor", "clsPredictor", "Locator",
           "EnsemblePredictor", "ensemble_locate"]
