"""Execution-plan helpers: session tuning, skew handling, lineage/resume."""

from .session import build_session
from .skew import salted_repartition, length_bucketed
from .manifest import RunManifest

__all__ = ["build_session", "salted_repartition", "length_bucketed", "RunManifest"]
