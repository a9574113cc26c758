"""Checkpoint store, per-partition lineage + metrics, skew handling."""

from .checkpoint import CheckpointStore, checkpointed_write
from .skew import detect_hot_keys, add_salted_key

__all__ = ["CheckpointStore", "checkpointed_write", "detect_hot_keys", "add_salted_key"]
