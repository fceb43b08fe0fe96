"""f32 robustness: certificates and convergence in the dtype the TPU
leads with (VERDICT r1 #4; SURVEY section 7 flags criteria_inf's division
by small quantities, ref solver.rs:642-653, as an f32 risk).

The suite's conftest enables x64, but dtype follows the input arrays —
float32 data runs the whole solve in f32.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import totsu_tpu as tt

F32 = np.float32


def _solve32(c, g, h, lay, **kw):
    p = tt.SolverParam(max_iter=500_000, check_period=10, **kw)
    return tt.solve_jit(jnp.asarray(np.asarray(c, F32)),
                        jnp.asarray(np.asarray(g, F32)),
                        jnp.asarray(np.asarray(h, F32)), lay, p)


INFEAS = ([1.0], [[1.0], [-1.0]], [-5.0, -10.0])   # ref totsu/tests/lp.rs:44
UNBDD = ([1.0], [[1.0], [1.0]], [5.0, 10.0])       # ref totsu/tests/lp.rs:81


@pytest.mark.parametrize("method", ["pdhg", "direct"])
@pytest.mark.parametrize("accel", ["", "halpern"])
def test_f32_infeasible_certificate(method, accel):
    lay = tt.ConeLayout([tt.rpos(2)])
    r = _solve32(*INFEAS, lay, method=method, accel=accel)
    assert r.x.dtype == jnp.float32
    assert int(r.status) == tt.SolverStatus.INFEASIBLE


@pytest.mark.parametrize("method", ["pdhg", "direct"])
@pytest.mark.parametrize("accel", ["", "halpern"])
def test_f32_unbounded_certificate(method, accel):
    lay = tt.ConeLayout([tt.rpos(2)])
    r = _solve32(*UNBDD, lay, method=method, accel=accel)
    assert int(r.status) == tt.SolverStatus.UNBOUNDED


def test_f32_certificates_under_normalize_and_equil():
    lay = tt.ConeLayout([tt.rpos(2)])
    for data, want in ((INFEAS, tt.SolverStatus.INFEASIBLE),
                       (UNBDD, tt.SolverStatus.UNBOUNDED)):
        r = _solve32(*data, lay, normalize=True, equil_iters=10)
        assert int(r.status) == want


def test_f32_random_lp_converges_to_1e3():
    # the f32cuda backend's contract: eps_acc = 1e-3 converges in f32
    # (benchmark_lp/src/main.rs:13-92)
    rng = np.random.default_rng(0)
    n = 50
    g = rng.normal(size=(2 * n, n))
    h = g @ rng.normal(size=n) + rng.random(2 * n) + 0.1
    c = rng.normal(size=n)
    lay = tt.ConeLayout([tt.rpos(2 * n)])
    r = _solve32(c, g, h, lay, eps_acc=1e-3)
    assert int(r.status) == tt.SolverStatus.CONVERGED
    # cross-check the residual in f64 against the f32 solution
    x = np.asarray(r.x, dtype=np.float64)
    res = np.asarray(g) @ x - np.asarray(h)
    cri = np.linalg.norm(np.maximum(res, 0)) / (1 + np.linalg.norm(h))
    assert cri <= 2e-3


def test_f32_fast_profile_converges():
    rng = np.random.default_rng(1)
    n = 60
    g = rng.normal(size=(2 * n, n))
    h = g @ rng.normal(size=n) + rng.random(2 * n) + 0.1
    eye = np.eye(n)
    g = np.concatenate([g, eye, -eye])       # box rows: bounded for sure
    h = np.concatenate([h, np.full(2 * n, 10.0)])
    c = rng.normal(size=n)
    lay = tt.ConeLayout([tt.rpos(4 * n)])
    r = _solve32(c, g, h, lay, eps_acc=1e-3, profile="fast")
    assert int(r.status) == tt.SolverStatus.CONVERGED
    assert r.x.dtype == jnp.float32


@pytest.mark.parametrize("method", ["pdhg", "direct"])
def test_f32_unbounded_socp_certificate(method):
    """Regression (round-2): an unbounded SOCP whose f32 ray residual
    floors at ~8e-6 — above the default eps_inf=1e-6 — must still certify
    UNBOUNDED via the dtype floor on eps_inf (100 eps_mach), not spin to
    max_iter. f64 certifies the same instance at the unfloored 1e-6."""
    rng = np.random.default_rng(5)
    n = 60
    gs = [rng.normal(size=(20, n)) for _ in range(3)]
    hs = [rng.normal(size=20) for _ in range(3)]
    cs = [rng.normal(size=n) * 0.1 for _ in range(3)]
    sp = tt.problems.socp(rng.normal(size=n), gs, hs, cs, [5.0] * 3)
    c = np.asarray(sp.c); g = np.asarray(sp.a.a); h = np.asarray(sp.b)
    p = tt.SolverParam(max_iter=100_000, check_period=20, method=method)
    r32 = tt.solve_jit(jnp.asarray(c, jnp.float32),
                       jnp.asarray(g, jnp.float32),
                       jnp.asarray(h, jnp.float32), sp.cone, p)
    assert int(r32.status) == tt.SolverStatus.UNBOUNDED, int(r32.iters)
    r64 = tt.solve_jit(jnp.asarray(c), jnp.asarray(g), jnp.asarray(h),
                       sp.cone, p)
    assert int(r64.status) == tt.SolverStatus.UNBOUNDED
