"""Active-set polishing: f32-accuracy solves refined to ~machine precision."""

import numpy as np
import jax.numpy as jnp

import totsu_tpu as tt
from totsu_tpu.solver.polish import polish


def test_polish_recovers_exact_lp_solution():
    # nostd LP solved loosely (eps 1e-3), then polished
    c = jnp.array([-1.0, 0.0])
    a = jnp.array([[4.0, -1.0], [-1.0, 4.0], [-1.0, -1.0]])
    b = jnp.array([6.0, 6.0, 1.0])
    lay = tt.ConeLayout([tt.rpos(3)])
    res = tt.solve(c, a, b, lay,
                   tt.SolverParam(max_iter=100_000, eps_acc=1e-3))
    loose_err = abs(float(res.x[0]) - 2.0)
    p = polish(res, c, a, b, lay)
    assert p.polished
    np.testing.assert_allclose(p.x, [2.0, 2.0], atol=1e-12)
    assert abs(p.x[0] - 2.0) < loose_err
    assert p.pri_res < 1e-12 and p.dual_res < 1e-12


def test_polish_f32_random_lp():
    rng = np.random.default_rng(0)
    n = 20
    eye = np.eye(n, dtype=np.float32)
    g = np.concatenate([eye, -eye])
    h = np.ones(2 * n, dtype=np.float32)
    c = (rng.normal(size=n) + np.where(rng.random(n) > 0.5, 0.5, -0.5)
         ).astype(np.float32)
    lay = tt.ConeLayout([tt.rpos(2 * n)])
    res = tt.solve(jnp.asarray(c), jnp.asarray(g), jnp.asarray(h), lay,
                   tt.SolverParam(max_iter=100_000, eps_acc=1e-3))
    p = polish(res, c, g, h, lay)
    assert p.polished
    np.testing.assert_allclose(p.x, -np.sign(np.float64(c)), atol=1e-10)


def test_polish_noop_on_unsupported_cone():
    c = jnp.array([1.0, 1.0])
    a = jnp.array([[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]])
    b = jnp.array([np.sqrt(2.0), 0.0, 0.0])
    lay = tt.ConeLayout([tt.soc(3)])
    res = tt.solve(c, a, b, lay, tt.SolverParam())
    p = polish(res, c, a, b, lay)
    assert not p.polished
    np.testing.assert_allclose(p.x, np.asarray(res.x))
