"""Utilities: mesh IO, timing/profiling (reference: utils/mesh_utils.py
OBJ helpers, utils/timing.py)."""

from .objio import save_obj, load_obj
from .timing import Timer, TimingRegistry

__all__ = ["save_obj", "load_obj", "Timer", "TimingRegistry"]
