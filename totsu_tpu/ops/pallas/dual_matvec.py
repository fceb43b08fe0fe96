"""Fused dual matvec Pallas kernel: one pass over A computes both
``A @ u`` and ``A^T @ v``.

Why: every application of the HSDE embedding K (and its transpose, and the
convergence criteria) needs exactly one {A u', A^T v'} *pair*
(SelfDualEmbed::op/trans_op, ref solver.rs:109-157). Two separate GEMVs
read the (m, n) matrix twice from HBM/VMEM; dense matvecs are purely
memory-bound, so fusing the pair into a single sweep halves the dominant
traffic — the main single-chip lever beyond XLA's own fusion.

Kernel shape: 1-D grid over row tiles of A. Per step i:

    p_i = A_i @ u          (row tile of the forward product, MXU)
    q  += v_i^T @ A_i      (accumulated transpose product; the q output
                            block index is constant, so Pallas keeps it
                            resident in VMEM across steps)

Inputs are zero-padded to TPU tiling — (8, 128) for f32 A, (16, 128) for
bf16 A; padding contributes zeros to both products. A may be stored
bfloat16 (``SolverParam.matvec_dtype``): tiles stream from HBM at half
the bytes and are widened to f32 in-register, so products accumulate in
full f32 — the memory-bound GEMV pair then runs close to 2x faster.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(a_ref, u_ref, v_ref, p_ref, q_ref):
    # GEMV is the wrong shape for the MXU (1-wide operand wastes 127/128
    # of the systolic array, and f32 needs multi-pass precision there);
    # the VPU formulation reads each A element once and does 4 flops on it:
    #   p_i = sum_j a_ij * u_j   (lane reduction)
    #   q_j = sum_i a_ij * v_i   (sublane reduction, accumulated over tiles)
    i = pl.program_id(0)
    a = a_ref[...].astype(jnp.float32)  # widen bf16 in-register (free)
    p_ref[...] = jnp.sum(a * u_ref[...], axis=1, keepdims=True)

    @pl.when(i == 0)
    def _():
        q_ref[...] = jnp.zeros_like(q_ref)

    q_ref[...] += jnp.sum(a * v_ref[...], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def dual_matvec_f32(a, u, v, block_m: int = 256, interpret: bool = False):
    """(A @ u, A^T @ v) in one fused pass; f32 math, A may be bf16."""
    m, n = a.shape
    a_dtype = a.dtype if a.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    mp = _round_up(max(m, 8), block_m)
    np_ = _round_up(max(n, 128), 128)
    if (mp, np_) == (m, n):
        a_p = a.astype(a_dtype)  # aligned: no padding copy per call
    else:
        a_p = jnp.zeros((mp, np_), a_dtype).at[:m, :n].set(a.astype(a_dtype))
    u_p = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(u)
    v_p = jnp.zeros((mp, 1), jnp.float32).at[:m, 0].set(v)

    a_bytes = 2 if a_dtype == jnp.bfloat16 else 4
    grid = (mp // block_m,)
    p, q = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, np_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * np_, transcendentals=0,
            bytes_accessed=a_bytes * mp * np_ + 8 * (mp + np_)),
        interpret=interpret,
    )(a_p, u_p, v_p)
    return p[:m, 0], q[0, :n]


def dual_matvec_reference(a, u, v):
    """Unfused XLA fallback (identical math, two sweeps)."""
    af = a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a
    return af @ u, v @ af
