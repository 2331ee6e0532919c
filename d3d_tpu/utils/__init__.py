from .edict import EDict

__all__ = ["EDict"]
