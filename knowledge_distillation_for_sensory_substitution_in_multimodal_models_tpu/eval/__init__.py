"""Evaluation layer: jit-compiled autoregressive decoding, reference-parity
metrics, predictions CSV writing and results aggregation."""

from .decode import GenerateConfig, Generator

__all__ = ["GenerateConfig", "Generator"]
