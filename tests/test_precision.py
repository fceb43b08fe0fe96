"""Every dot in the compiled solve must run at HIGHEST precision.

On TPU MXUs the DEFAULT matmul precision rounds f32 *operands* to bf16.
For single-instance solves the matvec is a GEMV and stays exact, but
under vmap (BatchRunner, parallel.batch, consensus_admm subsolves) every
matvec and c^T x / b^T y inner product becomes a batched `dot_general`
on the MXU — and the ~1e-3 relative error stalls eps_acc=1e-3
convergence: measured on hardware, batched halpern LPs ran to max_iter
(200k) while the identical single-instance solve converged in 42,660
iterations. The fix pins precision=HIGHEST on DenseOp/BlockedEllOp
matvecs and the solver-path dots (conic._hidot, direct).

CPU tests cannot reproduce the numeric failure (CPU dots are exact f32
at any precision setting), but the precision ATTRIBUTE is visible in the
lowered StableHLO on every backend — so this pins the compiled artifact.
"""

import numpy as np
import jax
import jax.numpy as jnp

import totsu_tpu as tt


def _default_dots(lowered_text):
    return [l.strip()[:160] for l in lowered_text.splitlines()
            if "dot_general" in l and "DEFAULT" in l]


def _lower_vmapped(param, lay, a, b):
    n = a.shape[1]
    f = jax.jit(jax.vmap(
        lambda ci: tt.solve_jit(ci, jnp.asarray(a), jnp.asarray(b), lay,
                                param)))
    return f.lower(jnp.ones((4, n), jnp.float32)).as_text()


def test_no_default_precision_dots_in_batched_pdhg():
    n = 8
    a = np.eye(n, dtype=np.float32)
    b = np.ones(n, np.float32)
    lay = tt.ConeLayout([tt.rpos(n)])
    txt = _lower_vmapped(
        tt.SolverParam(max_iter=10, check_period=5, accel="halpern"),
        lay, a, b)
    assert _default_dots(txt) == []


def test_no_default_precision_dots_in_batched_direct():
    n = 8
    a = np.eye(n, dtype=np.float32)
    b = np.ones(n, np.float32)
    lay = tt.ConeLayout([tt.rpos(n)])
    txt = _lower_vmapped(
        tt.SolverParam(max_iter=10, check_period=5, method="direct"),
        lay, a, b)
    assert _default_dots(txt) == []


def test_no_default_precision_dots_in_blocked_ell_solve():
    from totsu_tpu.solver.operator import BlockedEllOp

    bs = 8
    a = np.concatenate([np.eye(bs), -np.eye(bs)]).astype(np.float32)
    op = BlockedEllOp.from_dense(a, block=(bs, bs))
    lay = tt.ConeLayout([tt.rpos(2 * bs)])
    b = np.ones(2 * bs, np.float32)
    param = tt.SolverParam(max_iter=10, check_period=5)
    f = jax.jit(lambda ci: tt.solve_jit(ci, op, jnp.asarray(b), lay, param))
    txt = f.lower(jnp.ones((bs,), jnp.float32)).as_text()
    assert _default_dots(txt) == []
