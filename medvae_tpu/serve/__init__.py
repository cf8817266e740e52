"""Serving subsystem: batched inference engine, micro-batcher, AOT export.

New capability beyond the reference (which stops at one-shot generate/
evaluate scripts): a production inference path with static-shape bucketing,
request coalescing, an HTTP front end (cli/serve.py), and self-contained
StableHLO deployment artifacts.
"""

from medvae_tpu.serve.engine import (
    DEFAULT_BUCKETS,
    InferenceEngine,
    MicroBatcher,
    to_uint8,
)
from medvae_tpu.serve.export import export_model, load_exported

__all__ = [
    "DEFAULT_BUCKETS",
    "InferenceEngine",
    "MicroBatcher",
    "to_uint8",
    "export_model",
    "load_exported",
]
