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


def _group_max(cone: ConeLayout, r):
    """Uniform block scaling keeps the cone invariant (the max-flavored
    twin of the preconditioner's group_min; one shared walk)."""
    return cone.group_reduce(r, jnp.max)


def ruiz_equilibrate(a, b, c, cone: ConeLayout, iters: int = 10,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                jnp.ndarray, jnp.ndarray]:
    """Return (a_s, b_s, c_s, d, e) with a_s = diag(d) @ a @ diag(e)."""
    m, n = a.shape
    dtype = a.dtype
    d = jnp.ones((m,), dtype=dtype)
    e = jnp.ones((n,), dtype=dtype)
    a_s = a
    for _ in range(iters):
        row = jnp.max(jnp.abs(a_s), axis=1)
        row = _group_max(cone, row)
        dr = 1.0 / jnp.sqrt(jnp.maximum(row, 1e-8))
        col = jnp.max(jnp.abs(a_s), axis=0)
        de = 1.0 / jnp.sqrt(jnp.maximum(col, 1e-8))
        a_s = a_s * dr[:, None] * de[None, :]
        d = d * dr
        e = e * de
    return a_s, b * d, c * e, d, e
