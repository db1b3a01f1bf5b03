"""Trainers (reference surface: `atomai/trainers/__init__.py:1-8`)."""

from .trainer import (BaseTrainer, SegTrainer, ImSpecTrainer, RegTrainer,
                      clsTrainer)
from .vitrainer import viBaseTrainer
from .etrainer import BaseEnsembleTrainer, EnsembleTrainer
from .gptrainer import GPTrainer, dklGPTrainer

__all__ = ["BaseTrainer", "SegTrainer", "ImSpecTrainer", "RegTrainer",
           "clsTrainer", "viBaseTrainer", "BaseEnsembleTrainer",
           "EnsembleTrainer", "GPTrainer", "dklGPTrainer"]
