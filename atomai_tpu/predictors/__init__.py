"""Predictors (reference surface: `atomai/predictors/__init__.py:1-6`)."""

from .predictor import (BasePredictor, SegPredictor, ImSpecPredictor,
                        RegPredictor, clsPredictor, Locator)

__all__ = ["BasePredictor", "SegPredictor", "ImSpecPredictor",
           "RegPredictor", "clsPredictor", "Locator"]
