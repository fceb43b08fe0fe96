"""Problem-class regression tests.

Direct ports of the reference's analytic-solution tests
(totsu/tests/{lp,qp,qcqp,socp,sdp}.rs), including the deliberately
Infeasible and Unbounded LP instances asserting the error certificates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import totsu_tpu as tt
from totsu_tpu.problems import lp, qp, qcqp, socp, sdp  # functional builders

PARAM = tt.SolverParam(max_iter=100_000)


def test_lp1_infeasible():
    # ref totsu/tests/lp.rs test_lp1: x <= -5 and x >= 10 -> Infeasible
    prob = lp(c=[1.0],
                 g=[[1.0], [-1.0]], h=[-5.0, -10.0])
    with pytest.raises(tt.SolverError) as ei:
        prob.solve(PARAM)
    assert ei.value.status == tt.SolverStatus.INFEASIBLE
    # pure API reports the same status without raising
    res = prob.solve_jit(PARAM)
    assert int(res.status) == tt.SolverStatus.INFEASIBLE


def test_lp2_unbounded():
    # ref totsu/tests/lp.rs test_lp2: min x s.t. x <= 5, x <= 10 -> Unbounded
    prob = lp(c=[1.0], g=[[1.0], [1.0]], h=[5.0, 10.0])
    with pytest.raises(tt.SolverError) as ei:
        prob.solve(PARAM)
    assert ei.value.status == tt.SolverStatus.UNBOUNDED


def test_qp1():
    # ref totsu/tests/qp.rs test_qp1: projection onto halfplane -> (2, 0)
    prob = qp(
        p_mat=np.eye(2), q=[1.0, 2.0],
        g=[[-1.0 / 2.0, -1.0 / 3.0]], h=[-1.0])
    res = prob.solve(PARAM)
    np.testing.assert_allclose(np.asarray(res.x)[:2], [2.0, 0.0], atol=1e-3)


def test_qp_class_wrapper_with_matbuild():
    sym_p = tt.MatBuild.sympack(2)
    sym_p[0, 0] = 1.0
    sym_p[1, 1] = 1.0
    vec_q = tt.MatBuild.general(2, 1)
    vec_q[0, 0] = 1.0
    vec_q[1, 0] = 2.0
    mat_g = tt.MatBuild.general(1, 2)
    mat_g[0, 0] = -1.0 / 2.0
    mat_g[0, 1] = -1.0 / 3.0
    vec_h = tt.MatBuild.general(1, 1)
    vec_h[0, 0] = -1.0
    res = tt.ProbQP(sym_p, vec_q, mat_g, vec_h).solve(PARAM)
    np.testing.assert_allclose(np.asarray(res.x)[:2], [2.0, 0.0], atol=1e-3)


def test_qcqp1():
    # ref totsu/tests/qcqp.rs test_qcqp1 -> (5, 4)
    p0 = np.eye(2)
    p1 = np.zeros((2, 2))
    q0 = [-5.0, -4.0]
    q1 = [-1.0 / 2.0, -1.0 / 3.0]
    r = [0.0, 1.0]
    prob = qcqp(np.stack([p0, p1]), np.stack([q0, q1]), r)
    res = prob.solve(PARAM)
    np.testing.assert_allclose(np.asarray(res.x)[:2], [5.0, 4.0], atol=1e-3)


def test_socp1():
    # ref totsu/tests/socp.rs test_socp1 -> (-1, -1)
    prob = socp(
        f=[1.0, 1.0],
        g_list=[np.eye(2)], h_list=[np.zeros(2)],
        c_list=[np.zeros(2)], d_list=[np.sqrt(2.0)])
    res = tt.solve(prob.c, prob.a, prob.b, prob.cone, tt.SolverParam())
    np.testing.assert_allclose(np.asarray(res.x), [-1.0, -1.0], atol=1e-3)


def test_socp2_degenerate_blocks():
    # ref totsu/tests/socp.rs test_socp2: ni=0 SOC block -> (2, 0)
    prob = socp(
        f=[0.0, 1.0],
        g_list=[np.zeros((0, 2)), np.array([[-1.0, 0.0]])],
        h_list=[np.zeros(0), np.array([2.0])],
        c_list=[np.array([0.0, -1.0]), np.array([0.0, 1.0])],
        d_list=[50.0, 0.0])
    res = prob.solve(PARAM)
    np.testing.assert_allclose(np.asarray(res.x), [2.0, 0.0], atol=1e-3)


def test_sdp1():
    # ref totsu/tests/sdp.rs test_sdp1: diag LMI -> (3, 4)
    f0 = np.diag([-1.0, 0.0])
    f1 = np.diag([0.0, -1.0])
    f2 = np.diag([3.0, 4.0])
    prob = sdp(c=[1.0, 1.0], f_mats=np.stack([f0, f1, f2]))
    res = prob.solve(PARAM)
    np.testing.assert_allclose(np.asarray(res.x), [3.0, 4.0], atol=1e-3)


def test_sdp_class_wrapper_matbuild():
    mb = tt.MatBuild
    syms_f = [mb.sympack(2).set_iter_rowmaj([-1.0, 0.0, 0.0, 0.0]),
              mb.sympack(2).set_iter_rowmaj([0.0, 0.0, 0.0, -1.0]),
              mb.sympack(2).set_iter_rowmaj([3.0, 0.0, 0.0, 4.0])]
    vec_c = mb.general(2, 1).set_iter_colmaj([1.0, 1.0])
    res = tt.ProbSDP(vec_c, syms_f).solve(PARAM)
    np.testing.assert_allclose(np.asarray(res.x), [3.0, 4.0], atol=1e-3)


def test_builders_are_traceable():
    # build + solve end-to-end under jit: the whole reduction is traceable
    # (BASELINE.json north star: "JAX-traceable problem builders")
    @jax.jit
    def build_and_solve(q):
        prob = qp(jnp.eye(2), q, g=[[-0.5, -1.0 / 3.0]], h=[-1.0])
        return prob.solve_jit(tt.SolverParam(max_iter=50_000))

    res = build_and_solve(jnp.array([1.0, 2.0]))
    assert int(res.status) == tt.SolverStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x)[:2], [2.0, 0.0], atol=1e-3)
    # re-solve with different data, no retrace needed
    res2 = build_and_solve(jnp.array([-10.0, -8.0]))
    assert int(res2.status) == tt.SolverStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(res2.x)[:2], [10.0, 8.0], atol=1e-3)


def test_builders_vmap_batch():
    # batch QP instances through vmapped build+solve (SURVEY 2.8 item 3)
    def one(q):
        prob = qp(jnp.eye(2), q, g=[[-0.5, -1.0 / 3.0]], h=[-1.0])
        return prob.solve_jit(tt.SolverParam(max_iter=50_000))

    qs = jnp.array([[1.0, 2.0], [-3.0, -4.0], [0.5, 0.5]])
    res = jax.vmap(one)(qs)
    assert np.all(np.asarray(res.status) == tt.SolverStatus.CONVERGED)


def test_qp_matches_cvx_oracle():
    # random strongly-convex QP against a KKT oracle (equality-only):
    # min 1/2 x'Px + q'x s.t. Ax = b -> [[P A'],[A 0]] [x; nu] = [-q; b]
    rng = np.random.default_rng(7)
    n, p = 6, 2
    root = rng.normal(size=(n, n))
    pm = root @ root.T + np.eye(n)
    q = rng.normal(size=n)
    a = rng.normal(size=(p, n))
    b = rng.normal(size=p)
    kkt = np.block([[pm, a.T], [a, np.zeros((p, p))]])
    sol = np.linalg.solve(kkt, np.concatenate([-q, b]))
    prob = qp(pm, q, a=a, b=b)
    res = prob.solve(PARAM)
    np.testing.assert_allclose(np.asarray(res.x)[:n], sol[:n], atol=1e-3)


def test_gp_simple_analytic():
    """min 1/(xy) s.t. x + y <= 1  ->  x = y = 1/2, f* = 4 (GP via exp
    cones; beyond the reference surface, problems/gp.py)."""
    from totsu_tpu.problems.gp import gp as gp_build
    prob, meta = gp_build(
        term_c=[[1.0], [1.0, 1.0]],
        term_a=[[[-1.0, -1.0]], [[1.0, 0.0], [0.0, 1.0]]])
    res = prob.solve(tt.SolverParam(max_iter=300_000, eps_acc=1e-7))
    x = np.exp(np.asarray(res.x)[:2])
    f = float(np.exp(np.asarray(res.x)[meta["t"]]))
    np.testing.assert_allclose(x, [0.5, 0.5], atol=1e-3)
    assert abs(f - 4.0) < 1e-2


def test_gp_with_monomial_equality():
    """Three-variable GP with two posynomial constraints and the monomial
    equality z = 2y; optimum cross-checked offline against scipy SLSQP on
    the log-form NLP (x* ~ (2.582, 0.6455, 1.291), both inequality
    constraints active)."""
    from totsu_tpu.problems.gp import gp as gp_build
    prob, _ = gp_build(
        term_c=[[1.0], [0.2, 0.4], [0.125]],
        term_a=[[[-1.0, -1.0, -1.0]],
                [[1.0, 0.0, 1.0], [0.0, 1.0, 1.0]],
                [[1.0, 1.0, 0.0]]],
        eq_c=[0.5], eq_a=[[0.0, -1.0, 1.0]])
    res = prob.solve(tt.SolverParam(max_iter=500_000, eps_acc=1e-7))
    x = np.exp(np.asarray(res.x)[:3])
    np.testing.assert_allclose(x, [2.58199, 0.64550, 1.29099], rtol=2e-3)
    # feasibility + activity of both posynomial constraints
    assert 0.2 * x[0] * x[2] + 0.4 * x[1] * x[2] <= 1.0 + 1e-3
    assert abs(x[2] / (2.0 * x[1]) - 1.0) < 1e-3


def test_gp_rejects_nonpositive_coefficients():
    from totsu_tpu.problems.gp import gp as gp_build
    with pytest.raises(ValueError):
        gp_build(term_c=[[-1.0]], term_a=[[[1.0]]])


def test_gp_validates_shapes():
    """Silent-truncation guards (round-2 review): mismatched eq lists and
    wrong exponent column counts must raise, not build a misaligned cone
    layout / silently drop exponents."""
    from totsu_tpu.problems.gp import gp as gp_build
    with pytest.raises(ValueError):
        gp_build(term_c=[[1.0]], term_a=[[[-1.0, -1.0]]],
                 eq_c=[0.5, 2.0], eq_a=[[0.0, 1.0]])
    with pytest.raises(ValueError):
        gp_build(term_c=[[1.0], [1.0]],
                 term_a=[[[-1.0, -1.0]], [[1.0, 0.0, 5.0]]])
    with pytest.raises(ValueError):
        gp_build(term_c=[[1.0]], term_a=[[[-1.0, -1.0]]],
                 eq_c=[0.5], eq_a=[[0.0, 1.0, 2.0]])
