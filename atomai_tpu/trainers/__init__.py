"""Trainers (reference surface: `atomai/trainers/__init__.py:1-8`)."""

from .trainer import (BaseTrainer, SegTrainer, ImSpecTrainer, RegTrainer,
                      clsTrainer)

__all__ = ["BaseTrainer", "SegTrainer", "ImSpecTrainer", "RegTrainer",
           "clsTrainer"]
