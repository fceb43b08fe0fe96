"""Operator adjoint/abssum consistency tests.

The reference checks every custom operator against brute-force oracles built
from unit-vector probes of the forward map (utils2/src/operator_ref.rs:5-70).
Here the oracle is dense materialization via jax.vmap of matvec.
"""

import numpy as np
import jax
import jax.numpy as jnp

from totsu_tpu.solver.operator import (
    DenseOp, ZeroOp, CustomOp, VStackOp, HStackOp, BlockOp, ScaledOp,
)


def check_against_dense(op, dense):
    dense = np.asarray(dense)
    m, n = dense.shape
    assert op.shape == (m, n)
    rng = np.random.default_rng(42)
    x = rng.normal(size=n)
    y = rng.normal(size=m)
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))),
                               dense @ x, atol=1e-10)
    np.testing.assert_allclose(np.asarray(op.rmatvec(jnp.asarray(y))),
                               dense.T @ y, atol=1e-10)
    np.testing.assert_allclose(np.asarray(op.col_abssum()),
                               np.abs(dense).sum(axis=0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(op.row_abssum()),
                               np.abs(dense).sum(axis=1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(op.to_dense()), dense, atol=1e-10)


def test_dense_op():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 3))
    check_against_dense(DenseOp(jnp.asarray(a)), a)


def test_zero_op():
    check_against_dense(ZeroOp(3, 2), np.zeros((3, 2)))


def test_vstack():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2, 3))
    b = rng.normal(size=(4, 3))
    op = VStackOp((DenseOp(jnp.asarray(a)), DenseOp(jnp.asarray(b))))
    check_against_dense(op, np.vstack([a, b]))


def test_hstack():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(3, 2))
    b = rng.normal(size=(3, 4))
    op = HStackOp((DenseOp(jnp.asarray(a)), DenseOp(jnp.asarray(b))))
    check_against_dense(op, np.hstack([a, b]))


def test_block_with_zero():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(2, 3))
    op = BlockOp([
        [DenseOp(jnp.asarray(a)), ZeroOp(2, 1)],
        [ZeroOp(1, 3), DenseOp(jnp.asarray(np.array([[2.0]])))],
    ])
    dense = np.block([[a, np.zeros((2, 1))],
                      [np.zeros((1, 3)), np.array([[2.0]])]])
    check_against_dense(op, dense)


def test_scaled():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(3, 3))
    check_against_dense(ScaledOp(-2.5, DenseOp(jnp.asarray(a))), -2.5 * a)


def test_custom_op_default_adjoint():
    # matrix-free operator: adjoint derived by jax.linear_transpose,
    # abssums by materialization (the operator_ref oracle pattern)
    rng = np.random.default_rng(5)
    a = rng.normal(size=(5, 4))
    op = CustomOp(
        params=jnp.asarray(a), m=5, n=4,
        matvec_fn=lambda p, x: p @ x,
    )
    check_against_dense(op, a)


def test_custom_op_stencil():
    # 1-D Laplacian stencil as conv (the imgnr_udef pattern): compare
    # against its dense form
    n = 8
    def lap(params, x):
        del params
        return x - 0.5 * (jnp.roll(x, 1) + jnp.roll(x, -1))
    op = CustomOp(params=None, m=n, n=n, matvec_fn=lap)
    dense = np.asarray(jax.vmap(lambda e: lap(None, e), in_axes=1,
                                out_axes=1)(jnp.eye(n)))
    check_against_dense(op, dense)


def test_ops_are_pytrees():
    rng = np.random.default_rng(6)
    a = rng.normal(size=(3, 3))
    op = VStackOp((DenseOp(jnp.asarray(a)), ZeroOp(2, 3)))
    leaves = jax.tree_util.tree_leaves(op)
    assert len(leaves) == 1  # only the dense matrix
    # jit through the pytree
    f = jax.jit(lambda o, x: o.matvec(x))
    x = jnp.ones((3,))
    np.testing.assert_allclose(np.asarray(f(op, x)),
                               np.asarray(op.matvec(x)), atol=1e-12)


def test_diag_op():
    d = np.array([1.0, -2.0, 0.5])
    from totsu_tpu.solver.operator import DiagOp
    check_against_dense(DiagOp(jnp.asarray(d)), np.diag(d))


def test_sparse_op():
    from totsu_tpu.solver.operator import SparseOp
    rng = np.random.default_rng(11)
    a = rng.normal(size=(9, 6)) * (rng.random((9, 6)) < 0.3)
    op = SparseOp.from_dense(a)
    check_against_dense(op, a)


def test_sparse_op_end_to_end_solve():
    # sparse LP through the full pdhg solve (matrix-free engine)
    import totsu_tpu as tt
    from totsu_tpu.solver.operator import SparseOp
    n = 6
    eye = np.eye(n)
    g = np.concatenate([eye, -eye])
    h = np.ones(2 * n)
    c = np.linspace(-1.0, 1.0, n) + 0.1
    op = SparseOp.from_dense(jnp.asarray(g))
    lay = tt.ConeLayout([tt.rpos(2 * n)])
    res = tt.solve(jnp.asarray(c), op, jnp.asarray(h), lay,
                   tt.SolverParam(max_iter=50_000))
    np.testing.assert_allclose(np.asarray(res.x), -np.sign(c), atol=1e-3)


def test_sparse_op_ruiz_trio_and_sqsum():
    """r5: SparseOp grows the absmax/diag_scale/col_sqsum set, making it
    eligible for Ruiz equilibration, Jacobi PCG, and solve()'s
    auto-equilibration — the same surface the other structured ops have."""
    from totsu_tpu.solver.operator import SparseOp
    rng = np.random.default_rng(11)
    a = rng.normal(size=(9, 6)) * (rng.random((9, 6)) < 0.4)
    a[3] = 0.0                                     # an empty row
    op = SparseOp.from_dense(a)
    np.testing.assert_allclose(np.asarray(op.row_absmax()),
                               np.abs(a).max(axis=1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.col_absmax()),
                               np.abs(a).max(axis=0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.col_sqsum()),
                               (a * a).sum(axis=0), rtol=1e-12)
    d = rng.random(9) + 0.5
    e = rng.random(6) + 0.5
    scaled = op.diag_scale(jnp.asarray(d), jnp.asarray(e))
    np.testing.assert_allclose(np.asarray(scaled.to_dense()),
                               d[:, None] * a * e[None, :], atol=1e-12)
    assert np.asarray(op.astype(jnp.float32).matvec(
        jnp.ones(6, jnp.float32))).dtype == np.float32


def test_sparse_op_indirect_engine_with_equil():
    """SparseOp now runs the full structured fast path: indirect direct
    engine + Jacobi PCG + Ruiz — same solution as the dense solve."""
    import totsu_tpu as tt
    from totsu_tpu.solver.operator import SparseOp
    rng = np.random.default_rng(5)
    n = 48
    band = np.zeros((n, n))
    for i in range(n):
        lo, hi = max(0, i - 3), min(n, i + 4)
        band[i, lo:hi] = rng.normal(size=hi - lo)
    a = np.concatenate([band, np.eye(n), -np.eye(n)])
    h = np.concatenate([band @ rng.normal(size=n) + rng.random(n) + 0.1,
                        np.full(2 * n, 5.0)])
    c = rng.normal(size=n)
    lay = tt.ConeLayout([tt.rpos(3 * n)])
    op = SparseOp.from_dense(jnp.asarray(a))
    r = tt.solve_jit(jnp.asarray(c), op, jnp.asarray(h), lay,
                     tt.SolverParam(max_iter=100_000, method="direct",
                                    accel="halpern", check_period=10,
                                    cg_precond="jacobi", equil_iters=10))
    assert int(r.status) == tt.SolverStatus.CONVERGED
    r_ref = tt.solve_jit(jnp.asarray(c), jnp.asarray(a), jnp.asarray(h),
                         lay, tt.SolverParam(max_iter=100_000,
                                             method="direct",
                                             accel="halpern",
                                             check_period=10))
    np.testing.assert_allclose(float(jnp.dot(jnp.asarray(c), r.x)),
                               float(jnp.dot(jnp.asarray(c), r_ref.x)),
                               rtol=1e-3, atol=1e-3)


def test_sparse_op_duplicate_indices_guard():
    """col_sqsum on duplicate BCOO coordinates would overstate
    diag(A^T A) ((a+b)^2 != a^2+b^2) and mis-precondition the Jacobi
    PCG — it must refuse; diag_scale/astype preserve the structure
    flags so a scaled operator keeps its fast matvec path."""
    from jax.experimental import sparse
    from totsu_tpu.solver.operator import SparseOp
    dup = sparse.BCOO((jnp.asarray([3.0, -3.0]),
                       jnp.asarray([[0, 0], [0, 0]])), shape=(2, 2))
    with np.testing.assert_raises(NotImplementedError):
        SparseOp(dup).col_sqsum()
    uni = sparse.BCOO.fromdense(jnp.asarray(np.eye(3)))
    scaled = SparseOp(uni).diag_scale(jnp.ones(3), jnp.ones(3))
    assert scaled.mat.unique_indices and scaled.mat.indices_sorted
