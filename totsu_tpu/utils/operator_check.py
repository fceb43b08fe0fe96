"""Consistency oracle for user-defined operators.

The public analogue of the reference's utils2 brute-force oracles
(examples/utils2/src/operator_ref.rs:5-70), which every custom operator in
imgnr_udef is tested against: adjoint consistency of ``rmatvec`` vs
``matvec`` and correctness of the absolute row/col sums that feed the
diagonal preconditioner. A wrong ``col_abssum`` silently degrades
convergence, so matrix-free operators should be checked once at build time.
"""

import numpy as np
import jax.numpy as jnp

from totsu_tpu.solver.operator import LinOp


def check_operator(op: LinOp, n_probes: int = 3, rtol: float = 1e-4,
                   seed: int = 0) -> None:
    """Raise AssertionError if the operator's methods are inconsistent.

    * adjoint identity  <A u, v> == <u, A^T v>  on random probes
    * ``col_abssum`` / ``row_abssum`` vs the materialized operator
      (materialization is O(m n) — intended for build-time checks and
      moderate sizes, like the reference's test-only oracles)
    """
    m, n = op.shape
    rng = np.random.default_rng(seed)
    for _ in range(n_probes):
        u = jnp.asarray(rng.normal(size=n))
        v = jnp.asarray(rng.normal(size=m))
        lhs = float(jnp.vdot(op.matvec(u), v))
        rhs = float(jnp.vdot(u, op.rmatvec(v)))
        scale = max(abs(lhs), abs(rhs), 1.0)
        assert abs(lhs - rhs) <= rtol * scale, (
            f"adjoint inconsistency: <Au,v>={lhs} != <u,A'v>={rhs}")

    dense = np.asarray(op.to_dense())
    np.testing.assert_allclose(np.asarray(op.col_abssum()),
                               np.abs(dense).sum(axis=0), rtol=rtol,
                               err_msg="col_abssum mismatch")
    np.testing.assert_allclose(np.asarray(op.row_abssum()),
                               np.abs(dense).sum(axis=1), rtol=rtol,
                               err_msg="row_abssum mismatch")
