"""Utility subsystems: serializable decode state (checkpoint/resume)."""

from .state import DecoderCheckpoint, state_from_numpy, state_to_numpy

__all__ = ["DecoderCheckpoint", "state_from_numpy", "state_to_numpy"]
