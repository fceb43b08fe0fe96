"""Blocked-ELL structured-sparse operator (VERDICT r1 #8): the TPU-native
large-problem path — gather + batched matmul both directions, no scatter."""

import numpy as np
import jax.numpy as jnp

import totsu_tpu as tt
from totsu_tpu.utils import check_operator


def block_banded(m, n, bm, bn, band=1, seed=0, dtype=np.float64):
    """Dense matrix that is block-banded at tile granularity."""
    rng = np.random.default_rng(seed)
    a = np.zeros((m, n), dtype=dtype)
    nbr, nbc = -(-m // bm), -(-n // bn)
    for i in range(nbr):
        for j in range(nbc):
            if abs(i * nbc // nbr - j) <= band:
                r0, c0 = i * bm, j * bn
                a[r0:min(r0 + bm, m), c0:min(c0 + bn, n)] = rng.normal(
                    size=(min(bm, m - r0), min(bn, n - c0)))
    return a


def test_blocked_ell_matches_dense():
    a = block_banded(70, 50, bm=16, bn=8)   # non-multiple dims -> padding
    op = tt.BlockedEllOp.from_dense(a, block=(16, 8))
    dense = tt.DenseOp(jnp.asarray(a))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=50))
    y = jnp.asarray(rng.normal(size=70))
    np.testing.assert_allclose(np.asarray(op.matvec(x)),
                               np.asarray(dense.matvec(x)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.rmatvec(y)),
                               np.asarray(dense.rmatvec(y)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.col_abssum()),
                               np.asarray(dense.col_abssum()), atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.row_abssum()),
                               np.asarray(dense.row_abssum()), atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.to_dense()), a, atol=1e-12)


def test_blocked_ell_operator_contract():
    # the reference's operator-oracle discipline (utils2/operator_ref.rs)
    a = block_banded(48, 32, bm=8, bn=8, seed=2)
    op = tt.BlockedEllOp.from_dense(a, block=(8, 8))
    check_operator(op)


def test_blocked_ell_solve_matches_dense_solve():
    # end-to-end: a block-banded LP through the pdhg engine on both
    # operators must follow the identical iterate path
    rng = np.random.default_rng(3)
    n, m = 32, 64
    a = block_banded(m, n, bm=8, bn=8, band=1, seed=3)
    # box rows to make it bounded and feasible
    x0 = rng.normal(size=n)
    h = a @ x0 + rng.random(m) + 0.1
    c = rng.normal(size=n) * 0.1
    lay = tt.ConeLayout([tt.rpos(m)])
    p = tt.SolverParam(max_iter=200_000, eps_acc=1e-6, check_period=10)
    rd = tt.solve_jit(jnp.asarray(c), jnp.asarray(a), jnp.asarray(h), lay, p)
    rs = tt.solve_jit(jnp.asarray(c),
                      tt.BlockedEllOp.from_dense(a, block=(8, 8)),
                      jnp.asarray(h), lay, p)
    assert int(rs.status) == int(rd.status)
    assert int(rs.iters) == int(rd.iters)
    np.testing.assert_allclose(np.asarray(rs.x), np.asarray(rd.x),
                               atol=1e-8)


def test_blocked_ell_tile_density():
    a = block_banded(64, 64, bm=8, bn=8, band=1, seed=4)
    op = tt.BlockedEllOp.from_dense(a, block=(8, 8))
    assert op.tile_density < 0.5   # banded: ~3/8 of the grid
