"""Deployment/serving subsystem — the production story the reference
lacks (its "serving" is re-running training scripts; the north star
names large-scale deployment and serving explicitly).

Two pieces:
  * export.py — compile a trained checkpoint into a SELF-CONTAINED
    StableHLO artifact (`jax.export`, params baked in as constants,
    decision threshold from the `.threshold.json` sidecar recorded in
    the manifest). The artifact needs only jax to run — no model code,
    no flax, no checkpoint tree.
  * server.py — a micro-batching segmentation server over an artifact:
    letterbox -> device batch -> threshold -> inverse-letterbox, with
    a Python API, a directory batch mode, and a stdlib-only HTTP
    endpoint (POST /segment, PNG in -> PNG mask out).
"""

from cartseg_tpu.serve.export import (
    export_segmenter, load_segmenter, ServedSegmenter, validate_manifest,
)
from cartseg_tpu.serve.server import MicroBatcher, SegmentationService

__all__ = [
    "export_segmenter", "load_segmenter", "ServedSegmenter",
    "validate_manifest", "MicroBatcher", "SegmentationService",
]
