"""BatchRunner: bucketed, padded, lockstep microbatched solves."""

import numpy as np
import jax.numpy as jnp

import totsu_tpu as tt
from totsu_tpu.runtime import BatchRunner


def box_lp(c):
    n = len(c)
    eye = np.eye(n)
    g = np.concatenate([eye, -eye])
    h = np.ones(2 * n)
    return (np.asarray(c, dtype=float), g, h,
            tt.ConeLayout([tt.rpos(2 * n)]))


def test_batch_runner_mixed_shapes():
    runner = BatchRunner(tt.SolverParam(max_iter=50_000))
    # two signatures interleaved: n=3 and n=5 box LPs
    problems = []
    expected = []
    rng = np.random.default_rng(0)
    for i in range(7):
        n = 3 if i % 2 == 0 else 5
        c = rng.normal(size=n) + np.where(rng.random(n) > 0.5, 0.6, -0.6)
        problems.append(box_lp(c))
        expected.append(-np.sign(c))
    results = runner.map(problems)
    assert len(results) == 7
    for res, exp in zip(results, expected):
        assert int(res.status) == tt.SolverStatus.CONVERGED
        np.testing.assert_allclose(np.asarray(res.x), exp, atol=1e-3)
    # 2 signatures x (tiers used) compiled
    assert runner.compiled_signatures >= 2


def test_batch_runner_reuses_executables():
    runner = BatchRunner(tt.SolverParam(max_iter=50_000))
    p1 = [box_lp([1.0, -2.0, 0.5]) for _ in range(4)]
    runner.map(p1)
    n_compiled = runner.compiled_signatures
    # same signature + same tier -> no new compiles
    runner.map(p1)
    assert runner.compiled_signatures == n_compiled


def test_batch_runner_accepts_conic_problems():
    runner = BatchRunner(tt.SolverParam(max_iter=50_000))
    prob = tt.problems.lp([1.0, 1.0],
                          g=[[-1.0, 0.0], [0.0, -1.0]], h=[-1.0, -2.0])
    (res,) = runner.map([prob])
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 2.0], atol=1e-3)
