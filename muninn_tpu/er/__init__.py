"""Entity-resolution cascade (ANN blocking + string sim + Leiden)."""

from muninn_tpu.er.metrics import bcubed_f1, pairwise_f1
from muninn_tpu.er.resolve import Entity, resolve_entities

__all__ = ["Entity", "resolve_entities", "bcubed_f1", "pairwise_f1"]
