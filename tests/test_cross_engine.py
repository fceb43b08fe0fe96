"""Cross-engine consistency fuzz: pdhg (reference iteration) vs direct
(SCS-style DR) on random feasible bounded instances over every cone type.

The two engines share nothing but the problem embedding and the cone
projections, so agreement within tolerance on random instances is a
strong mutual oracle (the same role the reference's "same test, three
backends" pattern plays, totsu_f64lapack/tests/solver.rs:15-56 — here it
is "same random problem, two algorithms").

Instances are built feasible-by-construction (b = A x0 + s0 with s0
strictly interior to K) and bounded via box rows on every variable.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import totsu_tpu as tt
from totsu_tpu.ops import sympack
from totsu_tpu.solver import cone as cones


def _interior(f):
    """A strictly interior point of one block of factor ``f``."""
    if f.kind == cones.RPOS:
        return np.ones(f.dim)
    if f.kind == cones.ZERO:
        return np.zeros(f.dim)
    if f.kind == cones.SOC:
        p = np.zeros(f.dim)
        p[0] = 2.0
        p[1:] = 0.3
        return p
    if f.kind == cones.RSOC:
        p = np.full(f.dim, 0.3)
        p[0] = p[1] = 2.0
        return p
    if f.kind == cones.EXP:
        return np.array([0.0, 1.0, 2.0])     # 1*e^0 = 1 < 2
    if f.kind == cones.POW:
        return np.array([2.0, 2.0, 1.0])     # 2^a 2^(1-a) = 2 > 1
    if f.kind == cones.PSD:
        k = sympack.order_from_len(f.dim)
        return np.asarray(sympack.pack(2.0 * jnp.eye(k), scaled=True))
    raise AssertionError(f.kind)


def _instance(factors, n, seed):
    rng = np.random.default_rng(seed)
    lay = cones.ConeLayout(list(factors) + [cones.rpos(2 * n)])
    m = lay.dim
    a = np.concatenate([rng.normal(size=(m - 2 * n, n)) / np.sqrt(n),
                        np.eye(n), -np.eye(n)])
    s0 = np.concatenate([np.tile(_interior(f), f.count) for f in factors]
                        + [np.ones(2 * n)])
    x0 = rng.normal(size=n) * 0.5
    b = a @ x0 + s0
    c = rng.normal(size=n)
    return c, a, b, lay


CASES = [
    ("lp", [cones.rpos(6)]),
    ("eq+lp", [cones.zero(2), cones.rpos(5)]),
    ("soc", [cones.soc(4, count=2), cones.rpos(3)]),
    ("rsoc", [cones.rsoc(5), cones.zero(1)]),
    ("exp", [cones.expc(count=3), cones.rpos(2)]),
    ("pow", [cones.powc(0.3, count=2), cones.rpos(2)]),
    ("psd", [cones.psd(3), cones.rpos(2)]),
    ("mixed", [cones.zero(1), cones.soc(3), cones.expc(count=2),
               cones.powc(0.6), cones.psd(2)]),
]


@pytest.mark.parametrize("name,factors", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pdhg_vs_direct_agree(name, factors, seed):
    n = 5
    c, a, b, lay = _instance(factors, n, seed)
    cj, aj, bj = jnp.asarray(c), jnp.asarray(a), jnp.asarray(b)
    r1 = tt.solve_jit(cj, aj, bj, lay,
                      tt.SolverParam(max_iter=400_000, eps_acc=1e-7,
                                     check_period=20))
    r2 = tt.solve_jit(cj, aj, bj, lay,
                      tt.SolverParam(max_iter=400_000, eps_acc=1e-7,
                                     method="direct", check_period=20))
    assert int(r1.status) == tt.SolverStatus.CONVERGED, name
    assert int(r2.status) == tt.SolverStatus.CONVERGED, name
    o1 = float(c @ np.asarray(r1.x))
    o2 = float(c @ np.asarray(r2.x))
    scale = 1.0 + abs(o1) + abs(o2)
    assert abs(o1 - o2) <= 5e-5 * scale, (name, o1, o2)
    # independent f64 primal-feasibility check of BOTH solutions
    for r in (r1, r2):
        s = b - a @ np.asarray(r.x, dtype=np.float64)
        proj = np.asarray(lay.project(jnp.asarray(s), dual=False))
        assert np.linalg.norm(s - proj) <= 1e-5 * (1 + np.linalg.norm(b))