"""Execution-plan helpers: session tuning, skew handling, lineage/resume."""

from .session import build_session
from .skew import (
    adaptive_salted_repartition,
    length_bucketed,
    salted_repartition,
    skew_profile,
)
from .manifest import RunManifest
from .topk import two_phase_topk

__all__ = [
    "two_phase_topk",
    "RunManifest",
    "adaptive_salted_repartition",
    "build_session",
    "length_bucketed",
    "salted_repartition",
    "skew_profile",
]
