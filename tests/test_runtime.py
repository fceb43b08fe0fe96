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


def test_batch_runner_warm_starts():
    # warm-starting map() from previous solutions must converge faster
    # and to the same answer; None entries and padding fall back to the
    # cold init (zero seeds == solver.rs:483-494 init)
    runner = BatchRunner(tt.SolverParam(max_iter=50_000, check_period=10))
    rng = np.random.default_rng(4)
    problems = [box_lp(rng.normal(size=4) * 2.0) for _ in range(3)]
    cold = runner.map(problems)
    assert all(int(r.status) == tt.SolverStatus.CONVERGED for r in cold)
    seeds = [(np.asarray(r.x), np.asarray(r.y)) for r in cold]
    seeds[1] = None                     # mixed warm/cold batch
    warm = runner.map(problems, warm_starts=seeds)
    for i, (rc, rw) in enumerate(zip(cold, warm)):
        assert int(rw.status) == tt.SolverStatus.CONVERGED
        np.testing.assert_allclose(np.asarray(rw.x), np.asarray(rc.x),
                                   atol=1e-3)
        if i != 1:  # re-solving from the optimum terminates immediately
            assert int(rw.iters) <= int(rc.iters)
    assert int(warm[0].iters) == 0
    # length mismatch is rejected
    try:
        runner.map(problems, warm_starts=seeds[:1])
    except ValueError:
        pass
    else:
        raise AssertionError("warm_starts length mismatch not caught")


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


def test_tier_decomposition_bounded_padding():
    """Tier decomposition covers exactly the request count with at most
    two chunks per 256-block and padding confined to the final small
    chunk (the round-1 version padded the WHOLE batch to the next tier:
    ~2x wasted device work just below a boundary; a full binary split
    would instead pay up to 9 compiles per signature)."""
    from totsu_tpu.runtime.batcher import _tier_chunks
    tiers = (1, 2, 4, 8, 16, 32, 64, 128, 256)
    for count in (1, 2, 3, 7, 19, 255, 256, 300, 777):
        chunks = _tier_chunks(count)
        assert sum(used for _, used in chunks) == count
        assert all(t in tiers and 0 < used <= t for t, used in chunks)
        # at most 2 non-256 chunks, and only the last one is padded
        tail = [(t, u) for t, u in chunks if t != 256 or u != 256]
        assert len(tail) <= 2
        assert all(t == u for t, u in chunks[:-1])
    assert _tier_chunks(19) == [(16, 16), (4, 3)]
    assert _tier_chunks(255) == [(128, 128), (128, 127)]


def test_batch_runner_lru_eviction():
    runner = BatchRunner(tt.SolverParam(max_iter=20_000), max_cached=2)
    for n in (2, 3, 4):
        runner.map([box_lp([1.0] * n)])
    assert runner.compiled_signatures == 2  # capped, oldest evicted


def test_batch_runner_async_submit():
    """submit() coalesces concurrent requests into one lockstep batch and
    resolves per-request futures with the right answers."""
    runner = BatchRunner(tt.SolverParam(max_iter=50_000))
    rng = np.random.default_rng(3)
    futs, expected = [], []
    for _ in range(9):
        c = rng.normal(size=3) + np.where(rng.random(3) > 0.5, 0.6, -0.6)
        futs.append(runner.submit(box_lp(c), flush_ms=20.0))
        expected.append(-np.sign(c))
    for fut, exp in zip(futs, expected):
        res = fut.result(timeout=120)
        assert int(res.status) == tt.SolverStatus.CONVERGED
        np.testing.assert_allclose(np.asarray(res.x), exp, atol=1e-3)


def test_batch_runner_cancelled_future_does_not_poison_batch():
    """A future cancelled while queued must be dropped by the collector,
    not poison the whole drain batch with InvalidStateError (the
    collector claims futures via set_running_or_notify_cancel)."""
    runner = BatchRunner(tt.SolverParam(max_iter=50_000))
    futs = [runner.submit(box_lp([1.0, -1.0, 0.5]), flush_ms=300.0)
            for _ in range(3)]
    cancelled = futs[0].cancel()  # False if the collector already claimed it
    for f in futs[1:]:
        res = f.result(timeout=120)
        assert int(res.status) == tt.SolverStatus.CONVERGED
        np.testing.assert_allclose(np.asarray(res.x), [-1.0, 1.0, -1.0],
                                   atol=1e-3)
    if cancelled:
        assert futs[0].cancelled()
