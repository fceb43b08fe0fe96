"""Serving runtime: compiled-executable caching and microbatched solves."""

from totsu_tpu.runtime.batcher import BatchRunner

__all__ = ["BatchRunner"]
