"""Compute primitives: packed-symmetric storage, PSD projection, Pallas kernels."""

from totsu_tpu.ops import sympack
