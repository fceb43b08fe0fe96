"""Property tests: random conic programs with *constructed* optima.

Build (x*, s*, y*) satisfying the KKT conditions first, then derive the
problem data: pick A and a complementary primal-dual pair (s* in K,
y* in K*, <s*, y*> = 0), set b = A x* + s*, c = -A' y*. Strong duality
then certifies x* as optimal with objective c'x*. The solver must
reproduce that objective for every cone mix — a test surface the
reference does not have (its tests are hand-picked instances)."""

import zlib

import numpy as np
import jax.numpy as jnp
import pytest

import totsu_tpu as tt

PARAM = tt.SolverParam(max_iter=300_000)
DIRECT = tt.SolverParam(max_iter=300_000, method="direct")


def complementary_pair(kind, dim, rng):
    """Random (s, y) with s in K, y in K*, <s, y> = 0 for one block."""
    if kind == "zero":
        # s = 0, y free
        return np.zeros(dim), rng.normal(size=dim)
    if kind == "rpos":
        # complementary supports
        s = np.maximum(rng.normal(size=dim), 0.0)
        y = np.where(s > 0, 0.0, np.abs(rng.normal(size=dim)))
        return s, y
    if kind == "soc":
        # either on the boundary with antipodal dual, or interior/zero
        case = rng.integers(3)
        if case == 0:          # s interior, y = 0
            v = rng.normal(size=dim - 1)
            s = np.concatenate([[np.linalg.norm(v) + 1.0], v])
            return s, np.zeros(dim)
        if case == 1:          # s = 0, y interior
            v = rng.normal(size=dim - 1)
            y = np.concatenate([[np.linalg.norm(v) + 1.0], v])
            return np.zeros(dim), y
        # boundary pair: s = (|v|, v), y = t(|v|, -v) -> <s,y> = 0
        v = rng.normal(size=dim - 1)
        nv = np.linalg.norm(v)
        t = abs(rng.normal()) + 0.5
        return (np.concatenate([[nv], v]),
                t * np.concatenate([[nv], -v]))
    if kind == "psd":
        # dim is the packed length; recover matrix order k
        from totsu_tpu.ops import sympack
        k = sympack.order_from_len(dim)
        q, _ = np.linalg.qr(rng.normal(size=(k, k)))
        npos = rng.integers(0, k + 1)
        wpos = np.zeros(k)
        wneg = np.zeros(k)
        wpos[:npos] = np.abs(rng.normal(size=npos)) + 0.1
        wneg[npos:] = np.abs(rng.normal(size=k - npos)) + 0.1
        s_mat = (q * wpos) @ q.T        # PSD, range = first npos vecs
        y_mat = (q * wneg) @ q.T        # PSD, orthogonal range -> <S,Y>=0
        import jax.numpy as _jnp
        return (np.asarray(sympack.pack(_jnp.asarray(s_mat), scaled=True)),
                np.asarray(sympack.pack(_jnp.asarray(y_mat), scaled=True)))
    raise ValueError(kind)


def build_problem(factors, n, rng):
    m = sum(d for _, d in factors)
    a = rng.normal(size=(m, n))
    x_star = rng.normal(size=n)
    s_parts, y_parts = [], []
    for kind, dim in factors:
        s, y = complementary_pair(kind, dim, rng)
        s_parts.append(s)
        y_parts.append(y)
    s_star = np.concatenate(s_parts)
    y_star = np.concatenate(y_parts)
    b = a @ x_star + s_star
    c = -a.T @ y_star
    def mk(kind, d):
        if kind == "psd":
            from totsu_tpu.ops import sympack
            return tt.psd(sympack.order_from_len(d))
        return getattr(tt, kind)(d)
    layout = tt.ConeLayout([mk(k, d) for k, d in factors])
    return c, a, b, layout, float(c @ x_star)


CASES = [
    [("rpos", 8)],
    [("rpos", 5), ("zero", 3)],
    [("soc", 4)],
    [("soc", 3), ("rpos", 4), ("zero", 2)],
    [("soc", 5), ("soc", 3)],
    [("psd", 6)],
    [("psd", 10), ("rpos", 3)],
]


@pytest.mark.parametrize("factors", CASES)
@pytest.mark.parametrize("engine", [PARAM, DIRECT])
def test_constructed_optimum(factors, engine):
    rng = np.random.default_rng(zlib.crc32(str(factors).encode()))
    n = 6
    c, a, b, layout, obj_star = build_problem(factors, n, rng)
    res = tt.solve_jit(jnp.asarray(c), jnp.asarray(a), jnp.asarray(b),
                       layout, engine)
    assert int(res.status) == tt.SolverStatus.CONVERGED, int(res.status)
    obj = float(np.asarray(c) @ np.asarray(res.x))
    scale = 1.0 + abs(obj_star)
    assert abs(obj - obj_star) / scale < 1e-4, (obj, obj_star)
    # primal feasibility
    slack = np.asarray(b) - np.asarray(a) @ np.asarray(res.x)
    proj = np.asarray(layout.project(jnp.asarray(slack), False))
    assert np.linalg.norm(slack - proj) < 1e-3 * (1 + np.linalg.norm(b))
