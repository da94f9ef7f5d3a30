"""Model layer: span/label scoring backends + the inference pipeline.

Backends:

* ``DeterministicEncoder`` — a pure-numpy, hash-seeded stand-in for the
  transformer encoder. Deterministic across processes/executors (no
  Python ``hash()``), so distributed runs are reproducible and parity
  tests are exact. This is the default backend in this sandbox (torch /
  onnxruntime are not installed here).
* ``OnnxSpanEncoder`` / ``OnnxRelexEncoder`` — the production path:
  full ONNX inference contract (prompt prepend → subword tokenize →
  word masks → span grid → session.run → logits into the shared decode
  kernel), over an executor-singleton onnxruntime session (reference:
  gliner/model.py:670-685, input specs 1875-1901 / 2825-2865). Works
  against any session-shaped object — ``ort_testing.FakeSpanSession``
  provides a contract-faithful numpy fake for environments without
  onnxruntime. ``OnnxEncoder`` remains as a back-compat alias.

All backends produce tensors consumed by the same decode kernels, so
swapping backends never changes decode semantics.
"""

from .api import SparkGLiNER
from .encoder import DeterministicEncoder, get_encoder
from .generative import (
    GenerativeLabelDecoder,
    LabelTokenizer,
    build_labels_trie,
)
from .onnx_backend import OnnxRelexEncoder, OnnxSpanEncoder, build_span_feed
from .pipeline import GLiNERPipeline, PipelineConfig
from .subword import DeterministicSubwordTokenizer, HFSubwordTokenizer

OnnxEncoder = OnnxSpanEncoder  # back-compat alias (pre-round-2 name)

__all__ = [
    "GenerativeLabelDecoder",
    "LabelTokenizer",
    "build_labels_trie",
    "DeterministicEncoder",
    "DeterministicSubwordTokenizer",
    "HFSubwordTokenizer",
    "OnnxEncoder",
    "OnnxRelexEncoder",
    "OnnxSpanEncoder",
    "build_span_feed",
    "get_encoder",
    "GLiNERPipeline",
    "PipelineConfig",
    "SparkGLiNER",
]
