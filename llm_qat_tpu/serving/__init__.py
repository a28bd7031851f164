"""Serving layer: continuous-batching decode engine."""

from .engine import ContinuousBatchingEngine, Request

__all__ = ["ContinuousBatchingEngine", "Request"]
