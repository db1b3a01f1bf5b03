"""Minimal skimage shim for running the reference in this environment."""
from . import exposure, util
from . import color, io
