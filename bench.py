"""Headline benchmark: prints ONE JSON line.

Problem set follows the reference's experimental/benchmark_lp AND
benchmark_qp (random dense LP / diag-P QP, f32, eps_acc = 1e-3;
benchmark_lp/src/main.rs:13-92, benchmark_qp/src/main.rs:13-88) scaled up
to TPU-relevant size. The baselines run the *same* reference iteration on
the host: vectorized-f32 numpy (the F64LAPACK-equivalent) and the native
C++ -O3 engine (the FloatGeneric-equivalent) — the Rust reference
publishes no numbers (BASELINE.md).

Headline: TIME-TO-SOLUTION. metric = wall-clock seconds of the
fast-profile solve of the n=1000 benchmark LP to eps_acc=1e-3;
vs_baseline = estimated host-baseline wall-clock / ours.

Harness layout (r5; VERDICT r4 #1 — the r4 single-process bench forfeited
EVERY TPU row to one early tunnel stall): the parent process never
touches JAX. It runs each row GROUP in its own child process with its
own timeout, strictly one at a time (two concurrent TPU clients wedge
both — CLAUDE.md), merging each child's incrementally-written row file.
A stalled group gets one retry after a cooldown; a still-stalled group
is recorded as failed WITHOUT discarding the other groups' rows. Long
parity rows run via ``solve(chunk_iters=...)`` so no single dispatch can
exceed this host's ~1.5-minute tunnel execution window. CPU fallback is
reserved for the case where the headline group itself never produces a
row.
"""

import json
import os
import time

import numpy as np

#: group execution order — the per-round hardware guards (batch-conv,
#: SDP, megaexp) come right after the headline so an eventual budget
#: exhaustion costs the least-critical rows first
GROUPS = [
    ("lp1000", 420),
    ("batch", 360),
    ("sdp48", 300),
    ("small", 330),
    ("qp1000", 390),
    ("ell", 450),
    ("megaexp", 300),
]
COOLDOWN_S = 45.0


def make_lp(n, seed=0):
    rng = np.random.default_rng(seed)
    m = 2 * n
    g = rng.normal(size=(m, n))
    x0 = rng.normal(size=n)
    h = g @ x0 + rng.random(m) + 0.1
    eye = np.eye(n)
    g = np.concatenate([g, eye, -eye], axis=0).astype(np.float32)
    h = np.concatenate([h, np.full(n, 10.0), np.full(n, 10.0)]).astype(
        np.float32)
    c = rng.normal(size=n).astype(np.float32)
    return c, g, h


def make_qp(n, seed=0):
    """Reference benchmark_qp shape (benchmark_qp/src/main.rs:13-55):
    diag-P QP (uniform(0,1) diagonal), uniform q, G = -uniform (m = n),
    h = -uniform, no equalities, f32, eps_acc = 1e-3."""
    rng = np.random.default_rng(seed)
    p_diag = rng.random(n).astype(np.float32) + 0.01
    q = rng.random(n).astype(np.float32)
    g = -rng.random((n, n)).astype(np.float32)
    h = -rng.random(n).astype(np.float32)
    return np.diag(p_diag), q, g, h


def _sync(r):
    """Block on a result AND force a host fetch: through the axon tunnel
    ``block_until_ready`` alone can ack without the computation having
    actually run (observed 2026-08-18: 2000-iteration solves "completing"
    in 0.2 ms, then ABORTED on the first real fetch). Pulling one scalar
    to the host is the only trustworthy barrier."""
    import jax
    jax.block_until_ready(r)
    leaf = r.x if hasattr(r, "x") else jax.tree_util.tree_leaves(r)[0]
    return float(np.asarray(leaf).ravel()[0])


def numpy_solver_iters_per_s(c, a, b, iters=200):
    """The reference iteration (solver.rs:526-571) in vectorized numpy:
    R+^m cone, criteria check every iteration, f32."""
    eps_zero = np.float32(1e-12)
    m, n = a.shape
    col_a = np.abs(a).sum(0)
    row_a = np.abs(a).sum(1)
    abs_c, abs_b = np.abs(c), np.abs(b)
    sum_cb = abs_c.sum() + abs_b.sum()
    dp_tau = 1.0 / np.maximum(np.concatenate(
        [col_a + abs_c, row_a + abs_b, np.ones(m, np.float32),
         [sum_cb]]), eps_zero)
    dp_sigma = 1.0 / np.maximum(np.concatenate(
        [col_a + abs_c, row_a + abs_b + 1.0, [sum_cb]]), eps_zero)
    norm_b, norm_c = np.linalg.norm(b), np.linalg.norm(c)

    u = np.zeros(n + 2 * m + 1, np.float32)
    u[-1] = 1.0
    v = np.zeros(n + m + 1, np.float32)

    def kt(vv):
        vn, vm, v1 = vv[:n], vv[n:n + m], vv[-1]
        return np.concatenate([
            -(vm @ a) - c * v1, a @ vn - b * v1, -vm,
            [c @ vn + b @ vm]])

    def k(uu):
        ux, uy, us, ut = uu[:n], uu[n:n + m], uu[n + m:n + 2 * m], uu[-1]
        return np.concatenate([
            uy @ a + c * ut, -(a @ ux) - us + b * ut,
            [-(c @ ux) - b @ uy]])

    t0 = time.perf_counter()
    done = 0
    for i in range(iters):
        u_old = u
        u = u - dp_tau * kt(v)
        u[n:n + 2 * m] = np.maximum(u[n:n + 2 * m], 0.0)
        u[-1] = max(u[-1], 0.0)
        ru = u_old - 2.0 * u
        v = v - dp_sigma * k(ru)
        v[-1] = min(v[-1], 0.0)
        # criteria (2 extra matvecs, as the reference does every iteration)
        ux, uy, us = u[:n], u[n:n + m], u[n + m:n + 2 * m]
        ax, aty = a @ ux, uy @ a
        tau = u[-1]
        inv = 1.0 / max(tau, 1e-12)
        crit_p = np.linalg.norm(ax * inv + us * inv - b) / (1 + norm_b)
        crit_d = np.linalg.norm(c + aty * inv) / (1 + norm_c)
        done = i + 1
    dt = time.perf_counter() - t0
    return done / dt, (float(crit_p), float(crit_d))


# --------------------------------------------------------------------------
# child-side: one row group per process
# --------------------------------------------------------------------------

class _Ctx:
    """Per-child context: jax handles, the warmed device, the measured
    tunnel round trip, and an incrementally-flushed row dict."""

    def __init__(self, rows_path):
        t0 = time.perf_counter()
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/totsu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        import jax.numpy as jnp
        import totsu_tpu as tt
        self.jax, self.jnp, self.tt = jax, jnp, tt
        self.dev = jax.devices()[0]
        self.rows_path = rows_path
        self.rows = {"device": str(self.dev)}
        self.t0 = t0
        self.verbose = os.environ.get("TOTSU_BENCH_VERBOSE", "0") == "1"
        # absorb the tunnel's first-contact stall (observed up to ~2 min)
        # on a trivial op so it cannot be attributed to any timed section
        self.mark("tunnel warmup")
        _sync(jax.jit(lambda a_: a_ @ a_)(jnp.ones((8, 8), jnp.float32)))
        self.mark("tunnel warm")
        # fixed transport cost of this environment: a NULL jitted op +
        # host scalar fetch measures the tunnel round trip (~52 ms here; a
        # local chip dispatches in ~0.1 ms). Raw times include it; *_net
        # rows subtract it — the honest estimator for the north-star
        # "wall-clock on 1 x v5p" metric, where no tunnel exists.
        fnull = jax.jit(lambda x_: x_ * 2.0)
        xnull = jnp.ones((8,), jnp.float32)
        _sync(fnull(xnull))
        rts = []
        for t in range(5):
            t1 = time.perf_counter()
            _sync(fnull(xnull * (1.0 + 1e-6 * (t + 1))))
            rts.append(time.perf_counter() - t1)
        self.rt = float(np.median(rts))
        self.put("tunnel_roundtrip_ms", round(self.rt * 1e3, 1))

    def mark(self, label):
        if self.verbose:
            import sys
            print(f"[bench {time.perf_counter() - self.t0:7.1f}s] {label}",
                  file=sys.stderr, flush=True)

    def put(self, key, value):
        """Record a row and flush the file — a later stall in this child
        then costs only the rows not yet landed."""
        self.rows[key] = value
        tmp = self.rows_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.rows, f)
        os.replace(tmp, self.rows_path)

    def net(self, t):
        return round(max(t - self.rt, 0.0), 4)

    def timed_solve(self, cj, aj, bj, layout, param, perturb="c"):
        """Compile, then time ONE fresh solve (perturbed input so no layer
        can memoize; _sync forces a real host fetch — see module docs)."""
        jax, tt = self.jax, self.tt
        fn = jax.jit(lambda a_, b_, c_: tt.solve_jit(c_, a_, b_, layout,
                                                     param))
        _sync(fn(aj, bj, cj))
        if perturb == "c":
            cj2, bj2 = cj * (1.0 + 1e-6), bj
        else:
            cj2, bj2 = cj, bj * (1.0 + 1e-6)
        t0 = time.perf_counter()
        r = fn(aj, bj2, cj2)
        _sync(r)
        return time.perf_counter() - t0, r

    def timed_chunked(self, c, a, b, layout, param, chunk_iters,
                      perturb="c"):
        """Chunk-dispatched solve timing (solve(chunk_iters=N)): keeps
        every dispatch inside the tunnel's ~1.5-min execution window
        (CLAUDE.md single-dispatch limit). Warm-up call compiles; the
        timed call perturbs. Returns (dt, iters, converged)."""
        import dataclasses
        jnp, tt = self.jnp, self.tt
        from totsu_tpu.solver.conic import _solve_chunked
        from totsu_tpu.solver.params import SolverError

        def run(cc, bb):
            from totsu_tpu.solver.params import SolverStatus as _SS
            try:
                res = _solve_chunked(cc, a, bb, layout, param, None, None,
                                     False, chunk_iters)
                return int(res.iters), True
            except SolverError as e:
                if int(getattr(e, "status", _SS.EXCESS_ITER))                         == int(_SS.EXCESS_ITER):
                    # capped: iters == the cap by construction
                    return param.bounded_max_iter, False
                # UNBOUNDED/INFEASIBLE certificate: the solve stopped
                # EARLY — reporting the cap here would inflate the
                # parity-derived baseline estimate ~the cap/actual
                # ratio. -1 marks "no parity count" loudly downstream.
                return -1, False

        run(c, b)
        if perturb == "c":
            c2, b2 = c * (1.0 + 1e-6), b
        else:
            c2, b2 = c, b * (1.0 + 1e-6)
        t0 = time.perf_counter()
        iters, conv = run(c2, b2)
        return time.perf_counter() - t0, iters, conv


def grp_lp1000(ctx):
    """Headline: benchmark LP n=1000 time-to-solution + host baselines +
    the fixed-iteration continuity row."""
    jax, jnp, tt = ctx.jax, ctx.jnp, ctx.tt
    from totsu_tpu.native import solve_native
    n = 1000
    c, g, h = make_lp(n)
    layout = tt.ConeLayout([tt.rpos(g.shape[0])])
    cj, gj, hj = (jax.device_put(jnp.asarray(x), ctx.dev)
                  for x in (c, g, h))

    ctx.mark("lp1000 fast")
    fast = tt.SolverParam(max_iter=400_000, eps_acc=1e-3, profile="fast")
    t_fast, r = ctx.timed_solve(cj, gj, hj, layout, fast)
    ctx.put("lp_n1000_fast_time_s", round(t_fast, 4))
    ctx.put("lp_n1000_fast_net_time_s", ctx.net(t_fast))
    ctx.put("lp_n1000_fast_iters", int(r.iters))
    ctx.put("lp_n1000_fast_converged", int(r.status) == 1)

    # reference-parity iteration count on the same contract, CHUNKED so
    # no dispatch exceeds the tunnel window (capped: a cap makes the
    # baseline estimate a LOWER bound, so vs_baseline is ">=")
    ctx.mark("lp1000 parity (chunked)")
    par = tt.SolverParam(max_iter=300_000, eps_acc=1e-3, check_period=20)
    t_par, parity_iters, conv = ctx.timed_chunked(
        cj, gj, hj, layout, par, chunk_iters=100_000)
    ctx.put("lp_n1000_parity_iters", parity_iters)
    ctx.put("lp_n1000_parity_capped", not conv)
    ctx.put("lp_n1000_parity_tpu_time_s", round(t_par, 3))

    # host baselines: the SAME reference iteration, measured rate.
    # numpy/BLAS ~ the reference's F64LAPACK backend; C++ -O3 single core
    # ~ its FloatGeneric. The reference publishes no numbers (BASELINE.md).
    ctx.mark("host baselines")
    base_np_ips, _ = numpy_solver_iters_per_s(c, g, h, iters=200)
    t0 = time.perf_counter()
    _, _, _, it_nat = solve_native(
        c, g, h, layout,
        tt.SolverParam(max_iter=200, eps_acc=1e-9, check_period=20))
    base_cpp_ips = it_nat / (time.perf_counter() - t0)
    best_base = max(base_np_ips, base_cpp_ips)
    ctx.put("numpy_baseline_iters_per_s", round(base_np_ips, 1))
    ctx.put("native_cpp_baseline_iters_per_s", round(base_cpp_ips, 1))
    base_est = parity_iters / best_base
    ctx.put("lp_n1000_baseline_est_s", round(base_est, 2))
    ctx.put("lp_n1000_time_to_sol_speedup", round(base_est / t_fast, 1))

    # fixed-iteration iters/s: the clean hot-path throughput number
    # (each trial perturbs c; median of trials 2-4)
    ctx.mark("continuity ips")
    iters_fixed = 20_000
    pf = tt.SolverParam(max_iter=iters_fixed, eps_acc=1e-9,
                        check_period=20)
    fn = jax.jit(lambda a_, b_, c_: tt.solve_jit(c_, a_, b_, layout, pf))
    _sync(fn(gj, hj, cj))
    rates = []
    for trial in range(4):
        cj2 = cj * (1.0 + 1e-6 * (trial + 1))
        t0 = time.perf_counter()
        rr = fn(gj, hj, cj2)
        _sync(rr)
        rates.append(int(rr.iters) / (time.perf_counter() - t0))
    ours_ips = float(np.median(rates[1:]))
    ctx.put("lp_n1000_fixed_iters_per_s", round(ours_ips, 1))
    ctx.put("lp_n1000_iters_per_s_vs_best_host",
            round(ours_ips / best_base, 2))


def grp_batch(ctx):
    """Batched lockstep throughput + the per-round batched-CONVERGENCE
    guard (BASELINE "Batched-solve MXU precision fix": CPU tests cannot
    see MXU default-precision rounding; this row re-proves per-instance
    convergence on the real chip every round)."""
    jax, jnp, tt = ctx.jax, ctx.jnp, ctx.tt
    ctx.mark("batchconv")
    bc = 8
    rngb = np.random.default_rng(1)
    c1, g1, h1 = make_lp(100)
    cbc = jnp.asarray(np.stack(
        [c1 * (1.0 + 0.1 * rngb.random(100)) for _ in range(bc)]),
        jnp.float32)
    layc = tt.ConeLayout([tt.rpos(g1.shape[0])])
    pc = tt.SolverParam(max_iter=200_000, eps_acc=1e-3, check_period=20,
                        accel="halpern")
    g1j = jax.device_put(jnp.asarray(g1, jnp.float32), ctx.dev)
    h1j = jax.device_put(jnp.asarray(h1, jnp.float32), ctx.dev)
    # A/b as ARGUMENTS, not closure constants (CLAUDE.md gotcha: a
    # captured-constant A measured 3.5x slower if this row is timed)
    fnc = jax.jit(jax.vmap(
        lambda ci, aj, bj: tt.solve_jit(ci, aj, bj, layc, pc),
        in_axes=(0, None, None)))
    rc_ = fnc(cbc, g1j, h1j)
    _sync(rc_)
    stc = np.asarray(rc_.status)
    itc = np.asarray(rc_.iters)
    ctx.put("batch8_lp_n100_all_converged", bool((stc == 1).all()))
    ctx.put("batch8_lp_n100_iters_med_max",
            [int(np.median(itc)), int(itc.max())])

    ctx.mark("batch64")
    bsz = 64
    cb = np.stack([make_lp(100, seed=100 + i)[0] for i in range(bsz)])
    gb = np.stack([make_lp(100, seed=100 + i)[1] for i in range(bsz)])
    hb = np.stack([make_lp(100, seed=100 + i)[2] for i in range(bsz)])
    layb = tt.ConeLayout([tt.rpos(gb.shape[1])])
    pb = tt.SolverParam(max_iter=8000, eps_acc=1e-9, check_period=20)
    fnb = jax.jit(jax.vmap(
        lambda ci, ai, bi: tt.solve_jit(ci, ai, bi, layb, pb)))
    cbj, gbj, hbj = (jax.device_put(jnp.asarray(x), ctx.dev)
                     for x in (cb, gb, hb))
    _sync(fnb(cbj, gbj, hbj))
    t0 = time.perf_counter()
    rb = fnb(cbj * (1.0 + 1e-6), gbj, hbj)
    _sync(rb)
    ctx.put("batch64_lp_n100_instance_iters_per_s",
            round(bsz * 8000 / (time.perf_counter() - t0), 0))


def grp_sdp48(ctx):
    """Partitioning SDP k=48 (ref examples/partitioning_sdp shape),
    structured-operator build, PSD method via psd(method='auto')."""
    jax, tt = ctx.jax, ctx.tt
    import sys
    bdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks")
    if bdir not in sys.path:
        sys.path.insert(0, bdir)
    from benchmark_sdp import build_partitioning
    ctx.mark("sdp48")
    sc, sa, sb, _w = build_partitioning(48)
    slay = tt.ConeLayout([tt.psd(48), tt.zero(48)])
    sp = tt.SolverParam(max_iter=200_000, eps_acc=1e-3, profile="fast")
    fns = jax.jit(lambda c_, a_, b_: tt.solve_jit(c_, a_, b_, slay, sp))
    _sync(fns(sc, sa, sb))
    best = None
    for trial in range(2):  # min of 2: tunnel variance is real
        t0 = time.perf_counter()
        rs = fns(sc * (1.0 + 1e-6 * (trial + 1)), sa, sb)
        _sync(rs)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ctx.put("sdp_k48_fast_time_s", round(best, 4))
    ctx.put("sdp_k48_fast_net_time_s", ctx.net(best))
    ctx.put("sdp_k48_fast_iters", int(rs.iters))
    ctx.put("sdp_k48_fast_converged", int(rs.status) == 1)


def grp_small(ctx):
    """benchmark LP n=100 and QP n=100 — the reference's own default
    shapes (its A/B harness contract)."""
    jax, jnp, tt = ctx.jax, ctx.jnp, ctx.tt
    from totsu_tpu.native import solve_native
    ctx.mark("lp100")
    c1, g1, h1 = make_lp(100, seed=1)
    lay1 = tt.ConeLayout([tt.rpos(g1.shape[0])])
    c1j, g1j, h1j = (jax.device_put(jnp.asarray(x), ctx.dev)
                     for x in (c1, g1, h1))
    t_par, r2 = ctx.timed_solve(
        c1j, g1j, h1j, lay1,
        tt.SolverParam(max_iter=200_000, eps_acc=1e-3, check_period=20))
    t_fast, rf = ctx.timed_solve(
        c1j, g1j, h1j, lay1,
        tt.SolverParam(max_iter=200_000, eps_acc=1e-3, profile="fast"))
    base100_np, _ = numpy_solver_iters_per_s(c1, g1, h1, iters=400)
    t0 = time.perf_counter()
    _, _, _, it_nat1 = solve_native(
        c1, g1, h1, lay1,
        tt.SolverParam(max_iter=2000, eps_acc=1e-9, check_period=20))
    base100_cpp = it_nat1 / (time.perf_counter() - t0)
    base100 = max(base100_np, base100_cpp)
    ctx.put("lp_n100_parity_time_s", round(t_par, 3))
    ctx.put("lp_n100_parity_iters", int(r2.iters))
    ctx.put("lp_n100_parity_converged", int(r2.status) == 1)
    ctx.put("lp_n100_fast_time_s", round(t_fast, 4))
    ctx.put("lp_n100_fast_net_time_s", ctx.net(t_fast))
    ctx.put("lp_n100_fast_iters", int(rf.iters))
    ctx.put("lp_n100_fast_converged", int(rf.status) == 1)
    ctx.put("lp_n100_baseline_est_s", round(int(r2.iters) / base100, 2))
    ctx.put("lp_n100_time_to_sol_speedup",
            round(int(r2.iters) / base100 / t_fast, 1))
    ctx.put("lp_n100_time_to_sol_speedup_net",
            round(int(r2.iters) / base100 / max(t_fast - ctx.rt, 2e-3), 1))

    ctx.mark("qp100")
    pm, q, gq, hq = make_qp(100, seed=2)
    qp = tt.problems.qp(pm, q, g=gq, h=hq)
    qc = np.asarray(qp.c, dtype=np.float32)
    qa = np.asarray(qp.a.a if hasattr(qp.a, "a") else qp.a,
                    dtype=np.float32)
    qb = np.asarray(qp.b, dtype=np.float32)
    qcj, qaj, qbj = (jax.device_put(jnp.asarray(x), ctx.dev)
                     for x in (qc, qa, qb))
    t_qp_par, rqp = ctx.timed_solve(
        qcj, qaj, qbj, qp.cone,
        tt.SolverParam(max_iter=300_000, eps_acc=1e-3, check_period=20),
        perturb="b")
    t_qp_fast, rqf = ctx.timed_solve(
        qcj, qaj, qbj, qp.cone,
        tt.SolverParam(max_iter=300_000, eps_acc=1e-3, profile="fast"),
        perturb="b")
    from totsu_tpu.native import solve_native as sn
    t0 = time.perf_counter()
    _, _, _, it_natq = sn(
        qc, qa, qb, qp.cone,
        tt.SolverParam(max_iter=2000, eps_acc=1e-9, check_period=20))
    baseq_cpp = it_natq / (time.perf_counter() - t0)
    ctx.put("qp_n100_parity_time_s", round(t_qp_par, 3))
    ctx.put("qp_n100_parity_iters", int(rqp.iters))
    ctx.put("qp_n100_parity_capped", int(rqp.status) != 1)
    ctx.put("qp_n100_fast_time_s", round(t_qp_fast, 4))
    ctx.put("qp_n100_fast_net_time_s", ctx.net(t_qp_fast))
    ctx.put("qp_n100_fast_iters", int(rqf.iters))
    ctx.put("qp_n100_fast_converged", int(rqf.status) == 1)
    ctx.put("qp_n100_native_baseline_iters_per_s", round(baseq_cpp, 1))
    ctx.put("qp_n100_baseline_est_s",
            round(int(rqp.iters) / baseq_cpp, 2))
    ctx.put("qp_n100_time_to_sol_speedup",
            round(int(rqp.iters) / baseq_cpp / t_qp_fast, 1))
    # 2e-3 floor = measured device-time upper bound for this contract
    # (max_iter=1 vs 360 wall times indistinguishable, BASELINE.md)
    ctx.put("qp_n100_time_to_sol_speedup_net",
            round(int(rqp.iters) / baseq_cpp
                  / max(t_qp_fast - ctx.rt, 2e-3), 1))


def grp_qp1000(ctx):
    """QP n=1000, dense P (north-star row): device time dominates
    transport, so the raw speedup needs no "net" asterisk."""
    jax, jnp, tt = ctx.jax, ctx.jnp, ctx.tt
    from totsu_tpu.native import solve_native
    ctx.mark("qp1000")
    nq = 1000
    rngq = np.random.default_rng(7)
    pf = rngq.normal(size=(nq, nq)).astype(np.float32) / np.sqrt(nq)
    pmat = pf.T @ pf + 0.1 * np.eye(nq, dtype=np.float32)
    qv = rngq.random(nq).astype(np.float32)
    # standard-normal G, feasible by construction (the reference's
    # -uniform G turns rank-1-dominated at this scale and NO first-order
    # engine converges on it — BASELINE.md "QP n=1000 north-star row")
    gq2 = rngq.normal(size=(nq, nq)).astype(np.float32)
    xq0 = rngq.normal(size=nq)
    hq2 = (gq2 @ xq0 + rngq.random(nq) + 0.1).astype(np.float32)
    qp2 = tt.problems.qp(pmat, qv, g=gq2, h=hq2)
    q2c = jnp.asarray(np.asarray(qp2.c, np.float32))
    q2a = jnp.asarray(np.asarray(
        qp2.a.a if hasattr(qp2.a, "a") else qp2.a, np.float32))
    q2b = jnp.asarray(np.asarray(qp2.b, np.float32))
    q2c, q2a, q2b = (jax.device_put(x, ctx.dev) for x in (q2c, q2a, q2b))
    # parity run CHUNKED: 300k PDHG iterations on the 2002 x 1001
    # embedding can breach the dispatch window in one call
    t_par, parity_iters, conv = ctx.timed_chunked(
        q2c, tt.DenseOp(q2a), q2b, qp2.cone,
        tt.SolverParam(max_iter=300_000, eps_acc=1e-3, check_period=20),
        chunk_iters=100_000, perturb="b")
    t_fast, rq2f = ctx.timed_solve(
        q2c, q2a, q2b, qp2.cone,
        tt.SolverParam(max_iter=300_000, eps_acc=1e-3, profile="fast"),
        perturb="b")
    t0 = time.perf_counter()
    _, _, _, it_natq2 = solve_native(
        np.asarray(q2c), np.asarray(q2a), np.asarray(q2b), qp2.cone,
        tt.SolverParam(max_iter=60, eps_acc=1e-9, check_period=20))
    baseq2_cpp = it_natq2 / (time.perf_counter() - t0)
    ctx.put("qp_n1000_parity_time_s", round(t_par, 3))
    ctx.put("qp_n1000_parity_iters", parity_iters)
    ctx.put("qp_n1000_parity_capped", not conv)
    ctx.put("qp_n1000_fast_time_s", round(t_fast, 4))
    ctx.put("qp_n1000_fast_net_time_s", ctx.net(t_fast))
    ctx.put("qp_n1000_fast_iters", int(rq2f.iters))
    ctx.put("qp_n1000_fast_converged", int(rq2f.status) == 1)
    ctx.put("qp_n1000_native_baseline_iters_per_s", round(baseq2_cpp, 1))
    # if the parity run hit the cap, native needs MORE than parity_iters
    # to converge, so the speedup is a LOWER bound — still honest
    ctx.put("qp_n1000_baseline_est_s", round(parity_iters / baseq2_cpp, 2))
    ctx.put("qp_n1000_baseline_is_lower_bound", not conv)
    ctx.put("qp_n1000_time_to_sol_speedup",
            round(parity_iters / baseq2_cpp / t_fast, 1))


def grp_ell(ctx):
    """Structured-sparse rows: blocked-ELL n=8192 throughput, the n=4096
    routed fast-profile convergence re-proof, and the r5 n=65,536
    from_tiles row (dense A would be 16 GB — the operator is built from
    its band tiles only; VERDICT r4 #4)."""
    jax, jnp, tt = ctx.jax, ctx.jnp, ctx.tt
    import sys
    bdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks")
    if bdir not in sys.path:
        sys.path.insert(0, bdir)
    import benchmark_sparse as _bs
    ctx.mark("ell8192")
    ec, ea, eb = _bs.make_banded_lp(8192, k_tiles=2)
    ell_op = tt.BlockedEllOp.from_dense(ea, block=(128, 128))
    elay = tt.ConeLayout([tt.rpos(8192)])
    ep = tt.SolverParam(max_iter=2000, eps_acc=1e-12, check_period=100)
    fne = jax.jit(lambda c_, a_, b_: tt.solve_jit(c_, a_, b_, elay, ep))
    ecj, ebj = jnp.asarray(ec), jnp.asarray(eb)
    _sync(fne(ecj, ell_op, ebj))
    beste = np.inf
    for trial in range(3):
        t0 = time.perf_counter()
        _sync(fne(ecj * (1.0 + 1e-6 * (trial + 1)), ell_op, ebj))
        beste = min(beste, time.perf_counter() - t0)
    ctx.put("ell_n8192_banded_iters_per_s", round(2000 / beste, 0))

    # fast-profile time-to-solution on a bounded structured instance
    # (banded+box, n=4096): re-proves the routed indirect-engine config
    # converges on the real chip every round
    ctx.mark("ell4096 fast")
    from benchmark_indirect import make_banded_box_lp
    fc, fa, fb = make_banded_box_lp(4096)
    fell = tt.BlockedEllOp.from_dense(fa, block=(128, 128))
    del fa
    flay = tt.ConeLayout([tt.rpos(3 * 4096)])
    epf = tt.SolverParam(max_iter=400_000, eps_acc=1e-3, profile="fast")
    fnf = jax.jit(lambda c_, a_, b_: tt.solve_jit(c_, a_, b_, flay, epf))
    fcj, fbj = jnp.asarray(fc), jnp.asarray(fb)
    _sync(fnf(fcj, fell, fbj))
    bestf = np.inf
    for trial in range(2):
        t0 = time.perf_counter()
        rff = fnf(fcj * (1.0 + 1e-6 * (trial + 1)), fell, fbj)
        _sync(rff)
        bestf = min(bestf, time.perf_counter() - t0)
    ctx.put("ell_n4096_fast_time_s", round(bestf, 4))
    ctx.put("ell_n4096_fast_iters", int(rff.iters))
    ctx.put("ell_n4096_fast_converged", int(rff.status) == 1)

    # n=65,536 banded LP from tiles (never dense): block-tridiagonal A
    # (128x128 tiles, ~300 MB of tiles vs 16 GB dense), solved through
    # the routed indirect engine with chunked dispatches
    ctx.mark("ell65536 from_tiles")
    n_big = 65_536
    bm = 128
    nb = n_big // bm
    rngl = np.random.default_rng(11)
    tiles = {}
    x_feas = rngl.normal(size=n_big).astype(np.float32)
    ax = np.zeros(n_big, np.float32)
    for i in range(nb):
        for j in (i - 1, i, i + 1):
            if 0 <= j < nb:
                t = (rngl.normal(size=(bm, bm)) / np.sqrt(3 * bm)
                     ).astype(np.float32)
                tiles[(i, j)] = t
                ax[i * bm:(i + 1) * bm] += t @ x_feas[j * bm:(j + 1) * bm]
    big = tt.BlockedEllOp.from_tiles(tiles, m=n_big, n=n_big,
                                     block=(bm, bm))
    del tiles
    from totsu_tpu.solver.operator import VStackOp, DiagOp
    ones = jnp.ones((n_big,), jnp.float32)
    a_big = VStackOp((big, DiagOp(ones), DiagOp(-ones)))
    b_big = jnp.asarray(np.concatenate([
        ax + rngl.random(n_big).astype(np.float32) + 0.1,
        np.full(n_big, 10.0, np.float32),
        np.full(n_big, 10.0, np.float32)]))
    c_big = jnp.asarray(rngl.normal(size=n_big).astype(np.float32))
    blay = tt.ConeLayout([tt.rpos(3 * n_big)])
    bparam = tt.SolverParam(max_iter=8_000, eps_acc=1e-3,
                            check_period=20, method="direct",
                            accel="halpern")
    # chunk at 1,000 iterations: the first dispatch also carries the
    # one-time Sherman-Morrison CG setup, and no dispatch may exceed the
    # tunnel's ~1.5-min execution window (CLAUDE.md)
    t_big, big_iters, big_conv = ctx.timed_chunked(
        c_big, a_big, b_big, blay, bparam, chunk_iters=1_000)
    ctx.put("ell_n65536_tiles_time_s", round(t_big, 3))
    ctx.put("ell_n65536_tiles_iters", big_iters)
    ctx.put("ell_n65536_tiles_converged", big_conv)


def grp_megaexp(ctx):
    """exp-cone megakernel guard — the MXU default-precision bug class is
    invisible to CPU/interpret parity tests; this row re-proves the
    in-kernel exp projection converges on hardware with the XLA engine's
    iteration count (BASELINE "Megakernel exp/pow")."""
    jax, jnp, tt = ctx.jax, ctx.jnp, ctx.tt
    ctx.mark("megaexp")
    rngm = np.random.default_rng(9)
    nm_ = 64
    blocks = nm_ // 2
    laym = tt.ConeLayout([tt.expc(count=blocks), tt.rpos(2 * nm_)])
    am = np.concatenate([
        rngm.normal(size=(3 * blocks, nm_)) / np.sqrt(nm_),
        np.eye(nm_), -np.eye(nm_)]).astype(np.float32)
    s0m = np.concatenate([np.tile([0.0, 1.0, 2.0], blocks),
                          np.ones(2 * nm_)])
    bm_ = (am @ (rngm.normal(size=nm_) * 0.5) + s0m).astype(np.float32)
    cm_ = rngm.normal(size=nm_).astype(np.float32)
    kwm = dict(max_iter=200_000, eps_acc=1e-4, check_period=20,
               accel="halpern", normalize=True)
    cmj, amj, bmj = (jax.device_put(jnp.asarray(x), ctx.dev)
                     for x in (cm_, am, bm_))
    fx = jax.jit(lambda c_, a_, b_: tt.solve_jit(
        c_, a_, b_, laym, tt.SolverParam(**kwm)))
    fm = jax.jit(lambda c_, a_, b_: tt.solve_jit(
        c_, a_, b_, laym, tt.SolverParam(kernel="mega", **kwm)))
    rx_ = fx(cmj, amj, bmj)
    rm_ = fm(cmj, amj, bmj)
    _sync(rx_)
    _sync(rm_)
    ctx.put("megaexp_n64_converged", int(rm_.status) == 1)
    ctx.put("megaexp_n64_iter_parity", int(rm_.iters) == int(rx_.iters))


GROUP_FNS = {
    "lp1000": grp_lp1000,
    "batch": grp_batch,
    "sdp48": grp_sdp48,
    "small": grp_small,
    "qp1000": grp_qp1000,
    "ell": grp_ell,
    "megaexp": grp_megaexp,
}


def run_group(name, rows_path):
    ctx = _Ctx(rows_path)
    GROUP_FNS[name](ctx)


# --------------------------------------------------------------------------
# CPU fallback (headline only — used when the lp1000 group never lands)
# --------------------------------------------------------------------------

def _cpu_fallback(reason: str):
    """Emit an honest CPU-only headline rather than hanging the driver
    (the TPU tunnel on this host occasionally stalls indefinitely)."""
    import jax
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp
    import totsu_tpu as tt

    n = 1000
    c, g, h = make_lp(n)
    layout = tt.ConeLayout([tt.rpos(g.shape[0])])
    param = tt.SolverParam(max_iter=2000, eps_acc=1e-9, check_period=20)
    fn = jax.jit(lambda a_, b_, c_: tt.solve_jit(c_, a_, b_, layout, param))
    cj, gj, hj = map(jnp.asarray, (c, g, h))
    jax.block_until_ready(fn(gj, hj, cj))
    t0 = time.perf_counter()
    r = fn(gj, hj, cj * (1 + 1e-6))
    _sync(r)
    ours = int(r.iters) / (time.perf_counter() - t0)
    base, _ = numpy_solver_iters_per_s(c, g, h, iters=100)
    return {
        "metric": "benchmark_lp_n1000_iters_per_s",
        "value": round(ours, 1),
        "unit": "iters/s",
        "vs_baseline": round(ours / base, 2),
        "detail": {"device": "cpu-fallback", "reason": reason,
                   "numpy_baseline_iters_per_s": round(base, 1)},
    }


# --------------------------------------------------------------------------
# parent-side orchestration
# --------------------------------------------------------------------------

def _parent():
    """Run each group in its own child with its own timeout; merge the
    incrementally-written row files; one cooldown+retry per stalled
    group; print the single JSON line. signal.alarm alone cannot watchdog
    the observed failure mode — a tunnel stall blocks inside the device
    call's C extension and never returns to the interpreter — so each
    group is a separate subprocess the parent can kill by exact PID."""
    import subprocess
    import sys
    import tempfile

    budget = float(os.environ.get("TOTSU_BENCH_BUDGET_S", "1500"))
    t_start = time.perf_counter()
    detail = {}
    failed = {}
    tmpdir = tempfile.mkdtemp(prefix="totsu_bench_")

    def remaining():
        return budget - (time.perf_counter() - t_start)

    for name, tmo in GROUPS:
        got = {}
        for attempt in (0, 1):
            if remaining() < 30.0:
                failed.setdefault(name, "budget exhausted")
                break
            # per-attempt rows file: a retry must not overwrite rows the
            # first attempt already landed (merge below, retry wins
            # per-key)
            rows_path = os.path.join(tmpdir, f"{name}.{attempt}.json")
            eff_tmo = min(tmo, max(30.0, remaining() - 10.0))
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--group", name, "--rows-out", rows_path],
                    capture_output=True, text=True, timeout=eff_tmo)
                rc = proc.returncode
            except subprocess.TimeoutExpired:
                rc = "timeout"
            try:
                with open(rows_path) as f:
                    got.update(json.load(f))
            except (OSError, json.JSONDecodeError):
                pass
            if rc == 0:
                failed.pop(name, None)
                break
            failed[name] = (f"child {rc}"
                            + ("" if rc == "timeout" else " (error)"))
            if attempt == 0 and remaining() > COOLDOWN_S + 60.0:
                time.sleep(COOLDOWN_S)   # let a wedged tunnel recover
        # partial rows land even when the child stalled mid-group
        for k, v in got.items():
            if k == "device":
                detail.setdefault("device", v)
            else:
                detail[k] = v

    if failed:
        detail["groups_failed"] = failed

    if "lp_n1000_fast_time_s" in detail:
        out = {
            "metric": "benchmark_lp_n1000_fast_time_to_solution_s",
            "value": detail["lp_n1000_fast_time_s"],
            "unit": "s",
            "vs_baseline": detail.get("lp_n1000_time_to_sol_speedup", 0),
            "detail": detail,
        }
    else:
        # the headline group never landed: CPU fallback for the metric,
        # but KEEP every TPU row the other groups produced
        reason = ("tpu lp1000 group failed: "
                  + str(failed.get("lp1000", "unknown")))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--cpu-fallback", reason],
                capture_output=True, text=True, timeout=360)
            out = json.loads(
                [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")][-1])
        except Exception:
            out = {"metric": "benchmark_lp_n1000_iters_per_s", "value": 0,
                   "unit": "iters/s", "vs_baseline": 0,
                   "detail": {"error": reason}}
        out["detail"].update(
            {k: v for k, v in detail.items() if k != "device"})
        if "device" in detail:
            out["detail"]["tpu_partial_device"] = detail["device"]
    print(json.dumps(out))


if __name__ == "__main__":
    import sys
    if "--group" in sys.argv:
        name = sys.argv[sys.argv.index("--group") + 1]
        rows_path = sys.argv[sys.argv.index("--rows-out") + 1]
        run_group(name, rows_path)
        os._exit(0)
    if "--cpu-fallback" in sys.argv:
        i = sys.argv.index("--cpu-fallback")
        reason = (sys.argv[i + 1] if len(sys.argv) > i + 1
                  else "tpu bench failed")
        print(json.dumps(_cpu_fallback(reason)))
        os._exit(0)
    _parent()
    os._exit(0)
