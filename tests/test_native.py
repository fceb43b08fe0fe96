"""Native C++ engine: build, solve, and cross-check against the JAX solver.

The "same test, multiple backends" parity contract the reference uses
across FloatGeneric / LAPACK / CUDA (SURVEY.md section 4) — here the
backends are the JAX (XLA) path and the native C++ engine.
"""

import numpy as np
import jax.numpy as jnp

import totsu_tpu as tt
from totsu_tpu.native import solve_native


PARAM = tt.SolverParam(max_iter=100_000)


def test_native_nostd_lp_golden():
    # must hit the same committed golden log values as the JAX path
    c = np.array([-1.0, 0.0])
    a = np.array([[4.0, -1.0], [-1.0, 4.0], [-1.0, -1.0]])
    b = np.array([6.0, 6.0, 1.0])
    lay = tt.ConeLayout([tt.rpos(3)])
    x, y, status, iters = solve_native(c, a, b, lay, PARAM)
    assert status == tt.SolverStatus.CONVERGED
    assert iters == 160
    np.testing.assert_allclose(
        x, [1.9999994251590176, 2.0000004472430635], atol=1e-9)


def test_native_matches_jax_iterates():
    # identical problem -> identical iterate path (both f64): iteration
    # counts and solutions must agree tightly
    rng = np.random.default_rng(3)
    n = 8
    eye = np.eye(n)
    g = np.concatenate([eye, -eye, rng.normal(size=(5, n))])
    h = np.concatenate([np.ones(2 * n),
                        np.abs(g[2 * n:]).sum(1) + 1.0])
    c = rng.normal(size=n)
    lay = tt.ConeLayout([tt.rpos(len(h))])
    xn, yn, status, iters_n = solve_native(c, g, h, lay, PARAM)
    res = tt.solve(jnp.asarray(c), jnp.asarray(g), jnp.asarray(h), lay,
                   PARAM)
    assert status == tt.SolverStatus.CONVERGED
    assert iters_n == int(res.iters)
    np.testing.assert_allclose(xn, np.asarray(res.x), atol=1e-9)
    np.testing.assert_allclose(yn, np.asarray(res.y), atol=1e-9)


def test_native_soc():
    # reference test_socp1 conic form: ||x|| <= sqrt(2) -> (-1, -1)
    c = np.array([1.0, 1.0])
    a = np.array([[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]])
    b = np.array([np.sqrt(2.0), 0.0, 0.0])
    lay = tt.ConeLayout([tt.soc(3)])
    x, _, status, _ = solve_native(c, a, b, lay, tt.SolverParam())
    assert status == tt.SolverStatus.CONVERGED
    np.testing.assert_allclose(x, [-1.0, -1.0], atol=1e-3)


def test_native_psd():
    # the 1-var SDP from totsu_core/tests/solver.rs -> x0 = -2
    c = np.array([1.0])
    a = np.array([[0.0], [-np.sqrt(2.0)], [-3.0]])
    b = np.array([1.0, 0.0, 10.0])
    lay = tt.ConeLayout([tt.psd(2)])
    x, _, status, iters = solve_native(c, a, b, lay, PARAM)
    assert status == tt.SolverStatus.CONVERGED
    np.testing.assert_allclose(x[0], -2.0, atol=1e-3)
    # cross-check iteration count with the JAX path
    res = tt.solve(jnp.asarray(c), jnp.asarray(a), jnp.asarray(b), lay,
                   PARAM)
    assert abs(iters - int(res.iters)) <= 2


def test_native_infeasible_unbounded():
    lay = tt.ConeLayout([tt.rpos(2)])
    _, _, status, _ = solve_native(
        [1.0], [[1.0], [-1.0]], [-5.0, -10.0], lay, PARAM)
    assert status == tt.SolverStatus.INFEASIBLE
    _, _, status, _ = solve_native(
        [1.0], [[1.0], [1.0]], [5.0, 10.0], lay, PARAM)
    assert status == tt.SolverStatus.UNBOUNDED


def test_native_rsoc_qp():
    # QP via the problem builder, solved on the native engine
    prob = tt.problems.qp(np.eye(2), [1.0, 2.0],
                          g=[[-0.5, -1.0 / 3.0]], h=[-1.0])
    x, _, status, _ = solve_native(
        np.asarray(prob.c), np.asarray(prob.a.a), np.asarray(prob.b),
        prob.cone, PARAM)
    assert status == tt.SolverStatus.CONVERGED
    np.testing.assert_allclose(x[:2], [2.0, 0.0], atol=1e-3)
