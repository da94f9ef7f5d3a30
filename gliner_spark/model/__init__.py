"""Model layer: span/label scoring backends + the inference pipeline.

Two backends:

* ``DeterministicEncoder`` — a pure-numpy, hash-seeded stand-in for the
  transformer encoder. Deterministic across processes/executors (no
  Python ``hash()``), so distributed runs are reproducible and parity
  tests are exact. This is the backend used in this sandbox (torch /
  onnxruntime are not installed here).
* ``OnnxEncoder`` — the production path: an executor-singleton
  onnxruntime session over an exported GLiNER graph (reference:
  gliner/model.py:670-685). Import-gated; raises a clear error when
  onnxruntime is absent.

Both produce (span_logits, ...) consumed by the same decode kernels, so
swapping backends never changes decode semantics.
"""

from .api import SparkGLiNER
from .encoder import DeterministicEncoder, OnnxEncoder, get_encoder
from .pipeline import GLiNERPipeline, PipelineConfig

__all__ = [
    "DeterministicEncoder",
    "OnnxEncoder",
    "get_encoder",
    "GLiNERPipeline",
    "PipelineConfig",
    "SparkGLiNER",
]
