"""Headline benchmark: prints ONE JSON line.

Problem set follows the reference's experimental/benchmark_lp AND
benchmark_qp (random dense LP / diag-P QP, f32, eps_acc = 1e-3;
benchmark_lp/src/main.rs:13-92, benchmark_qp/src/main.rs:13-88) scaled up
to TPU-relevant size. The baselines run the *same* reference iteration on
the host: vectorized-f32 numpy (the F64LAPACK-equivalent) and the native
C++ -O3 engine (the FloatGeneric-equivalent) — the Rust reference
publishes no numbers (BASELINE.md).

Headline (round 2+): TIME-TO-SOLUTION. metric = wall-clock seconds of the
fast-profile solve of the n=1000 benchmark LP to eps_acc=1e-3;
vs_baseline = estimated host-baseline wall-clock / ours, where the
baseline estimate = (reference-parity iteration count measured on device,
possibly capped -> lower bound) / (measured host iterations-per-second).
Detail carries the LP n=100 reference contract, the QP n=100 contract,
and the round-1 iterations/s continuity rows.
"""

import json
import os
import signal
import time

import numpy as np


class _Watchdog(Exception):
    pass


#: sections of main() deposit results here as they land, so the watchdog
#: can emit an honest partial JSON instead of discarding everything when
#: the accelerator tunnel stalls mid-bench
_PROGRESS = {}


def _alarm(_sig, _frm):
    raise _Watchdog()


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


def main():
    t_main0 = time.perf_counter()
    import jax
    # persistent compile cache: repeat bench runs (and driver invocations)
    # skip the ~minutes of XLA compilation
    jax.config.update("jax_compilation_cache_dir", "/tmp/totsu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import totsu_tpu as tt
    from totsu_tpu.native import solve_native

    dev = jax.devices()[0]
    detail = {"device": str(dev)}
    _PROGRESS["detail"] = detail
    verbose = os.environ.get("TOTSU_BENCH_VERBOSE", "0") == "1"

    def elapsed():
        return time.perf_counter() - t_main0

    def mark(label):
        if verbose:
            import sys as _sys
            print(f"[bench {elapsed():7.1f}s] {label}", file=_sys.stderr,
                  flush=True)

    def timed_solve(cj, aj, bj, layout, param, perturb="c"):
        """Compile, then time ONE fresh solve (perturbed input so no layer
        can memoize; _sync forces a real host fetch — see module docs)."""
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

    # absorb the tunnel's first-contact stall (observed up to ~2 min) on a
    # trivial op so it cannot be attributed to any timed section
    mark("tunnel warmup")
    _sync(jax.jit(lambda a_: a_ @ a_)(jnp.ones((8, 8), jnp.float32)))
    mark("tunnel warm")

    # fixed transport cost of this environment: a NULL jitted op + host
    # scalar fetch measures the tunnel round trip (~52 ms here; a local
    # chip dispatches in ~0.1 ms). Raw times below include it; *_net rows
    # subtract it — the honest estimator for the north-star "wall-clock
    # on 1 x v5p" metric, where no tunnel exists. Measured 2026-08-19:
    # the QP n=100 solve is < 2 ms of device time inside a ~53 ms fetch.
    fnull = jax.jit(lambda x_: x_ * 2.0)
    xnull = jnp.ones((8,), jnp.float32)
    _sync(fnull(xnull))
    rts = []
    for t in range(5):
        t0 = time.perf_counter()
        _sync(fnull(xnull * (1.0 + 1e-6 * (t + 1))))
        rts.append(time.perf_counter() - t0)
    rt = float(np.median(rts))
    detail["tunnel_roundtrip_ms"] = round(rt * 1e3, 1)

    def net(t):
        return round(max(t - rt, 0.0), 4)

    # ---------- headline: benchmark LP n=1000, time-to-solution ----------
    n = 1000
    c, g, h = make_lp(n)
    layout = tt.ConeLayout([tt.rpos(g.shape[0])])
    cj, gj, hj = (jax.device_put(jnp.asarray(x), dev) for x in (c, g, h))

    mark("lp1000 fast")
    fast = tt.SolverParam(max_iter=400_000, eps_acc=1e-3, profile="fast")
    t_lp1000_fast, r = timed_solve(cj, gj, hj, layout, fast)
    detail["lp_n1000_fast_time_s"] = round(t_lp1000_fast, 4)
    detail["lp_n1000_fast_net_time_s"] = net(t_lp1000_fast)
    detail["lp_n1000_fast_iters"] = int(r.iters)
    detail["lp_n1000_fast_converged"] = int(r.status) == 1

    # reference-parity iteration count on the same contract (capped: a cap
    # makes the baseline estimate a LOWER bound, so vs_baseline is ">=")
    mark("lp1000 parity")
    par = tt.SolverParam(max_iter=300_000, eps_acc=1e-3, check_period=20)
    t_par, rp = timed_solve(cj, gj, hj, layout, par)
    parity_iters_1000 = int(rp.iters)
    detail["lp_n1000_parity_iters"] = parity_iters_1000
    detail["lp_n1000_parity_capped"] = int(rp.status) != 1
    detail["lp_n1000_parity_tpu_time_s"] = round(t_par, 3)

    # host baselines: the SAME reference iteration, measured rate.
    # numpy/BLAS ~ the reference's F64LAPACK backend; C++ -O3 single core
    # ~ its FloatGeneric. The reference publishes no numbers (BASELINE.md).
    mark("host baselines")
    base_np_ips, _ = numpy_solver_iters_per_s(c, g, h, iters=200)
    t0 = time.perf_counter()
    _, _, _, it_nat = solve_native(
        c, g, h, layout,
        tt.SolverParam(max_iter=200, eps_acc=1e-9, check_period=20))
    base_cpp_ips = it_nat / (time.perf_counter() - t0)
    best_base = max(base_np_ips, base_cpp_ips)
    detail["numpy_baseline_iters_per_s"] = round(base_np_ips, 1)
    detail["native_cpp_baseline_iters_per_s"] = round(base_cpp_ips, 1)
    base_est_1000 = parity_iters_1000 / best_base
    detail["lp_n1000_baseline_est_s"] = round(base_est_1000, 2)
    speedup_1000 = base_est_1000 / t_lp1000_fast
    detail["lp_n1000_time_to_sol_speedup"] = round(speedup_1000, 1)
    _PROGRESS["value"] = round(t_lp1000_fast, 4)
    _PROGRESS["vs_baseline"] = round(speedup_1000, 1)

    # ---------- benchmark LP n=100 (the reference's own default) ----------
    mark("lp100")
    c1, g1, h1 = make_lp(100, seed=1)
    lay1 = tt.ConeLayout([tt.rpos(g1.shape[0])])
    c1j, g1j, h1j = (jax.device_put(jnp.asarray(x), dev)
                     for x in (c1, g1, h1))
    t_lp100_par, r2 = timed_solve(
        c1j, g1j, h1j, lay1,
        tt.SolverParam(max_iter=200_000, eps_acc=1e-3, check_period=20))
    t_lp100_fast, rf = timed_solve(
        c1j, g1j, h1j, lay1,
        tt.SolverParam(max_iter=200_000, eps_acc=1e-3, profile="fast"))
    base100_np, _ = numpy_solver_iters_per_s(c1, g1, h1, iters=400)
    t0 = time.perf_counter()
    _, _, _, it_nat1 = solve_native(
        c1, g1, h1, lay1,
        tt.SolverParam(max_iter=2000, eps_acc=1e-9, check_period=20))
    base100_cpp = it_nat1 / (time.perf_counter() - t0)
    base100 = max(base100_np, base100_cpp)
    detail["lp_n100_parity_time_s"] = round(t_lp100_par, 3)
    detail["lp_n100_parity_iters"] = int(r2.iters)
    detail["lp_n100_parity_converged"] = int(r2.status) == 1
    detail["lp_n100_fast_time_s"] = round(t_lp100_fast, 4)
    detail["lp_n100_fast_net_time_s"] = net(t_lp100_fast)
    detail["lp_n100_fast_iters"] = int(rf.iters)
    detail["lp_n100_fast_converged"] = int(rf.status) == 1
    detail["lp_n100_baseline_est_s"] = round(int(r2.iters) / base100, 2)
    detail["lp_n100_time_to_sol_speedup"] = round(
        int(r2.iters) / base100 / t_lp100_fast, 1)
    detail["lp_n100_time_to_sol_speedup_net"] = round(
        int(r2.iters) / base100 / max(t_lp100_fast - rt, 2e-3), 1)

    # ---------- benchmark QP n=100 (reference benchmark_qp scaled) -------
    mark("qp100")
    pm, q, gq, hq = make_qp(100, seed=2)
    qp = tt.problems.qp(pm, q, g=gq, h=hq)
    qc = np.asarray(qp.c, dtype=np.float32)
    qa = np.asarray(qp.a.a if hasattr(qp.a, "a") else qp.a,
                    dtype=np.float32)
    qb = np.asarray(qp.b, dtype=np.float32)
    qcj, qaj, qbj = (jax.device_put(jnp.asarray(x), dev)
                     for x in (qc, qa, qb))
    t_qp_par, rqp = timed_solve(
        qcj, qaj, qbj, qp.cone,
        tt.SolverParam(max_iter=300_000, eps_acc=1e-3, check_period=20),
        perturb="b")
    t_qp_fast, rqf = timed_solve(
        qcj, qaj, qbj, qp.cone,
        tt.SolverParam(max_iter=300_000, eps_acc=1e-3, profile="fast"),
        perturb="b")
    # host baseline rate on the identical conic embedding (native engine
    # supports the RSOC block)
    t0 = time.perf_counter()
    _, _, _, it_natq = solve_native(
        qc, qa, qb, qp.cone,
        tt.SolverParam(max_iter=2000, eps_acc=1e-9, check_period=20))
    baseq_cpp = it_natq / (time.perf_counter() - t0)
    detail["qp_n100_parity_time_s"] = round(t_qp_par, 3)
    detail["qp_n100_parity_iters"] = int(rqp.iters)
    detail["qp_n100_parity_capped"] = int(rqp.status) != 1
    detail["qp_n100_fast_time_s"] = round(t_qp_fast, 4)
    detail["qp_n100_fast_net_time_s"] = net(t_qp_fast)
    detail["qp_n100_fast_iters"] = int(rqf.iters)
    detail["qp_n100_fast_converged"] = int(rqf.status) == 1
    detail["qp_n100_native_baseline_iters_per_s"] = round(baseq_cpp, 1)
    detail["qp_n100_baseline_est_s"] = round(int(rqp.iters) / baseq_cpp, 2)
    detail["qp_n100_time_to_sol_speedup"] = round(
        int(rqp.iters) / baseq_cpp / t_qp_fast, 1)
    # 2e-3 floor = measured device-time upper bound for this contract
    # (max_iter=1 vs 360 wall times indistinguishable, BASELINE.md):
    # when the raw time is entirely transport, the net speedup is quoted
    # against that bound rather than an arbitrary epsilon
    detail["qp_n100_time_to_sol_speedup_net"] = round(
        int(rqp.iters) / baseq_cpp / max(t_qp_fast - rt, 2e-3), 1)

    # ---------- benchmark QP n=1000, dense P (north-star row) ------------
    # VERDICT r2 #8: an n >= 1000 QP where device time dominates transport,
    # so the raw (no "net" asterisk) time-to-solution speedup is the
    # honest headline. Dense random PSD P via the RSOC epigraph reduction
    # (ref benchmark_qp/src/main.rs:13-88 scaled up, diag -> dense P).
    mark("qp1000")
    if elapsed() < 270.0:
        nq = 1000
        rngq = np.random.default_rng(7)
        pf = rngq.normal(size=(nq, nq)).astype(np.float32) / np.sqrt(nq)
        pmat = pf.T @ pf + 0.1 * np.eye(nq, dtype=np.float32)
        qv = rngq.random(nq).astype(np.float32)
        # standard-normal G, feasible by construction. (The n=100 row
        # keeps the reference's exact -uniform(0,1) G; scaled to n=1000
        # that shape turns rank-1-dominated — one G singular value ~n/2
        # vs ~sqrt(n/12) for the rest — and NO first-order engine
        # converges on it in 300k iterations: measured here, pdhg AND the
        # direct engine both stall at cri_dual ~2e-2, equilibration
        # included, and the reference's own PDHG would do the same. A
        # converged row needs a non-degenerate instance.)
        gq2 = rngq.normal(size=(nq, nq)).astype(np.float32)
        xq0 = rngq.normal(size=nq)
        hq2 = (gq2 @ xq0 + rngq.random(nq) + 0.1).astype(np.float32)
        qp2 = tt.problems.qp(pmat, qv, g=gq2, h=hq2)
        q2c = jnp.asarray(np.asarray(qp2.c, np.float32))
        q2a = jnp.asarray(np.asarray(
            qp2.a.a if hasattr(qp2.a, "a") else qp2.a, np.float32))
        q2b = jnp.asarray(np.asarray(qp2.b, np.float32))
        q2c, q2a, q2b = (jax.device_put(x, dev) for x in (q2c, q2a, q2b))
        t_qp2_par, rq2 = timed_solve(
            q2c, q2a, q2b, qp2.cone,
            tt.SolverParam(max_iter=300_000, eps_acc=1e-3, check_period=20),
            perturb="b")
        t_qp2_fast, rq2f = timed_solve(
            q2c, q2a, q2b, qp2.cone,
            tt.SolverParam(max_iter=300_000, eps_acc=1e-3, profile="fast"),
            perturb="b")
        # host baseline rate on the identical conic embedding
        t0 = time.perf_counter()
        _, _, _, it_natq2 = solve_native(
            np.asarray(q2c), np.asarray(q2a), np.asarray(q2b), qp2.cone,
            tt.SolverParam(max_iter=60, eps_acc=1e-9, check_period=20))
        baseq2_cpp = it_natq2 / (time.perf_counter() - t0)
        detail["qp_n1000_parity_time_s"] = round(t_qp2_par, 3)
        detail["qp_n1000_parity_iters"] = int(rq2.iters)
        detail["qp_n1000_parity_capped"] = int(rq2.status) != 1
        detail["qp_n1000_fast_time_s"] = round(t_qp2_fast, 4)
        detail["qp_n1000_fast_net_time_s"] = net(t_qp2_fast)
        detail["qp_n1000_fast_iters"] = int(rq2f.iters)
        detail["qp_n1000_fast_converged"] = int(rq2f.status) == 1
        detail["qp_n1000_native_baseline_iters_per_s"] = round(baseq2_cpp, 1)
        # if the parity run hit the cap, native needs MORE than
        # parity_iters to converge, so baseline_est (and hence the
        # speedup) is a LOWER bound — still honest
        detail["qp_n1000_baseline_est_s"] = round(
            int(rq2.iters) / baseq2_cpp, 2)
        detail["qp_n1000_baseline_is_lower_bound"] = int(rq2.status) != 1
        detail["qp_n1000_time_to_sol_speedup"] = round(
            int(rq2.iters) / baseq2_cpp / t_qp2_fast, 1)

    # ---------- SDP k=48 partitioning (ref examples/partitioning_sdp) ----
    # the reference's SDP example shape, structured-operator build, PSD
    # method resolved by psd(method='auto') (fast+1e-3 -> Newton-Schulz);
    # sweep detail in BASELINE.md "SDP projection/method sweep"
    mark("sdp48")
    if elapsed() < 330.0:
        import sys as _sys
        _sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        from benchmark_sdp import build_partitioning
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
        detail["sdp_k48_fast_time_s"] = round(best, 4)
        detail["sdp_k48_fast_net_time_s"] = net(best)
        detail["sdp_k48_fast_iters"] = int(rs.iters)
        detail["sdp_k48_fast_converged"] = int(rs.status) == 1

    # ---------- structured-sparse scale row (blocked-ELL, n=8192) --------
    # block-banded LP through BlockedEllOp: the large-problem path
    # (A = 8.4 MB vs 268 MB dense; full sweep in BASELINE.md /
    # benchmarks/benchmark_sparse.py)
    mark("ell8192")
    if elapsed() < 300.0:
        import sys as _sys2
        _bdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks")
        if _bdir not in _sys2.path:
            _sys2.path.insert(0, _bdir)
        import benchmark_sparse as _bs
        ec, ea, eb = _bs.make_banded_lp(8192, k_tiles=2)
        ell_op = tt.BlockedEllOp.from_dense(ea, block=(128, 128))
        elay = tt.ConeLayout([tt.rpos(8192)])
        ep = tt.SolverParam(max_iter=2000, eps_acc=1e-12, check_period=100)
        fne = jax.jit(lambda c_, a_, b_: tt.solve_jit(c_, a_, b_, elay, ep))
        ecj, ebj = jnp.asarray(ec), jnp.asarray(eb)
        _sync(fne(ecj, ell_op, ebj))
        beste = np.inf
        for trial in range(3):  # min of 3: tunnel variance is real
            t0 = time.perf_counter()
            _sync(fne(ecj * (1.0 + 1e-6 * (trial + 1)), ell_op, ebj))
            beste = min(beste, time.perf_counter() - t0)
        detail["ell_n8192_banded_iters_per_s"] = round(2000 / beste, 0)

        # fast-profile time-to-solution on a bounded structured instance
        # (banded+box, n=4096): r4 routes non-dense operators to the
        # indirect direct engine (BASELINE "Indirect engine at n=8192") —
        # this row re-proves the routed configuration converges on the
        # real chip every round
        from benchmark_indirect import make_banded_box_lp
        fc, fa, fb = make_banded_box_lp(4096)
        fell = tt.BlockedEllOp.from_dense(fa, block=(128, 128))
        del fa
        flay = tt.ConeLayout([tt.rpos(3 * 4096)])
        epf = tt.SolverParam(max_iter=400_000, eps_acc=1e-3,
                             profile="fast")
        fnf = jax.jit(lambda c_, a_, b_: tt.solve_jit(c_, a_, b_, flay,
                                                      epf))
        fcj, fbj = jnp.asarray(fc), jnp.asarray(fb)
        _sync(fnf(fcj, fell, fbj))
        bestf = np.inf
        for trial in range(2):
            t0 = time.perf_counter()
            rff = fnf(fcj * (1.0 + 1e-6 * (trial + 1)), fell, fbj)
            _sync(rff)
            bestf = min(bestf, time.perf_counter() - t0)
        detail["ell_n4096_fast_time_s"] = round(bestf, 4)
        detail["ell_n4096_fast_iters"] = int(rff.iters)
        detail["ell_n4096_fast_converged"] = int(rff.status) == 1

    # ---------- continuity rows (round-1 iters/s metrics) ----------------
    # fixed-iteration iters/s on the n=1000 LP: the clean hot-path
    # throughput number (each trial perturbs c; median of trials 2-4)
    mark("continuity ips")
    if elapsed() < 360.0:
        iters_fixed = 20_000
        param_fixed = tt.SolverParam(max_iter=iters_fixed, eps_acc=1e-9,
                                     check_period=20)
        fn = jax.jit(lambda a_, b_, c_: tt.solve_jit(c_, a_, b_, layout,
                                                     param_fixed))
        _sync(fn(gj, hj, cj))
        rates = []
        for trial in range(4):
            cj2 = cj * (1.0 + 1e-6 * (trial + 1))
            t0 = time.perf_counter()
            r = fn(gj, hj, cj2)
            _sync(r)
            rates.append(int(r.iters) / (time.perf_counter() - t0))
        ours_ips = float(np.median(rates[1:]))
        detail["lp_n1000_fixed_iters_per_s"] = round(ours_ips, 1)
        detail["lp_n1000_iters_per_s_vs_best_host"] = round(
            ours_ips / best_base, 2)

    # batched lockstep throughput: 64 x n=100 instances in one while_loop
    mark("batch")
    if elapsed() < 420.0:
        bsz = 64
        cb = np.stack([make_lp(100, seed=100 + i)[0] for i in range(bsz)])
        gb = np.stack([make_lp(100, seed=100 + i)[1] for i in range(bsz)])
        hb = np.stack([make_lp(100, seed=100 + i)[2] for i in range(bsz)])
        layb = tt.ConeLayout([tt.rpos(gb.shape[1])])
        pb = tt.SolverParam(max_iter=8000, eps_acc=1e-9, check_period=20)
        fnb = jax.jit(jax.vmap(
            lambda ci, ai, bi: tt.solve_jit(ci, ai, bi, layb, pb)))
        cbj, gbj, hbj = (jax.device_put(jnp.asarray(x), dev)
                         for x in (cb, gb, hb))
        _sync(fnb(cbj, gbj, hbj))
        t0 = time.perf_counter()
        rb = fnb(cbj * (1.0 + 1e-6), gbj, hbj)
        _sync(rb)
        detail["batch64_lp_n100_instance_iters_per_s"] = round(
            bsz * 8000 / (time.perf_counter() - t0), 0)

    # batched CONVERGENCE guard — run every round on the real chip.
    # CPU tests cannot see MXU default-precision rounding; before the
    # round-3 HIGHEST pin, batched solves silently ran to max_iter on
    # hardware while single instances converged (BASELINE "Batched-solve
    # MXU precision fix"). This row re-proves per-instance convergence.
    mark("batchconv")
    if elapsed() < 480.0:
        bc = 8
        rngb = np.random.default_rng(1)
        c1, g1, h1 = make_lp(100)
        cbc = jnp.asarray(np.stack(
            [c1 * (1.0 + 0.1 * rngb.random(100)) for _ in range(bc)]),
            jnp.float32)
        layc = tt.ConeLayout([tt.rpos(g1.shape[0])])
        pc = tt.SolverParam(max_iter=200_000, eps_acc=1e-3, check_period=20,
                            accel="halpern")
        g1j = jax.device_put(jnp.asarray(g1, jnp.float32), dev)
        h1j = jax.device_put(jnp.asarray(h1, jnp.float32), dev)
        # A/b as ARGUMENTS, not closure constants (CLAUDE.md gotcha: a
        # captured-constant A measured 3.5x slower if this row is timed)
        fnc = jax.jit(jax.vmap(
            lambda ci, aj, bj: tt.solve_jit(ci, aj, bj, layc, pc),
            in_axes=(0, None, None)))
        rc_ = fnc(cbc, g1j, h1j)
        _sync(rc_)
        stc = np.asarray(rc_.status)
        itc = np.asarray(rc_.iters)
        detail["batch8_lp_n100_all_converged"] = bool((stc == 1).all())
        detail["batch8_lp_n100_iters_med_max"] = [
            int(np.median(itc)), int(itc.max())]

    # exp-cone megakernel guard — run every round on the real chip. The
    # MXU default-precision bug class (BASELINE "Batched-solve MXU
    # precision fix") is invisible to the CPU/interpret parity tests;
    # this row re-proves the in-kernel exp projection converges on
    # hardware with the XLA engine's iteration count (r4, BASELINE
    # "Megakernel exp/pow").
    mark("megaexp")
    if elapsed() < 360.0:
        rngm = np.random.default_rng(9)
        nm_ = 64
        blocks = nm_ // 2
        laym = tt.ConeLayout([tt.expc(count=blocks), tt.rpos(2 * nm_)])
        mm_ = laym.dim
        am = np.concatenate([
            rngm.normal(size=(3 * blocks, nm_)) / np.sqrt(nm_),
            np.eye(nm_), -np.eye(nm_)]).astype(np.float32)
        s0m = np.concatenate([np.tile([0.0, 1.0, 2.0], blocks),
                              np.ones(2 * nm_)])
        bm_ = (am @ (rngm.normal(size=nm_) * 0.5) + s0m).astype(np.float32)
        cm_ = rngm.normal(size=nm_).astype(np.float32)
        kwm = dict(max_iter=200_000, eps_acc=1e-4, check_period=20,
                   accel="halpern", normalize=True)
        cmj, amj, bmj = (jax.device_put(jnp.asarray(x), dev)
                         for x in (cm_, am, bm_))
        fx = jax.jit(lambda c_, a_, b_: tt.solve_jit(
            c_, a_, b_, laym, tt.SolverParam(**kwm)))
        fm = jax.jit(lambda c_, a_, b_: tt.solve_jit(
            c_, a_, b_, laym, tt.SolverParam(kernel="mega", **kwm)))
        rx_ = fx(cmj, amj, bmj)
        rm_ = fm(cmj, amj, bmj)
        _sync(rx_)
        _sync(rm_)
        detail["megaexp_n64_converged"] = int(rm_.status) == 1
        detail["megaexp_n64_iter_parity"] = int(rm_.iters) == int(rx_.iters)

    mark("done")
    print(json.dumps({
        "metric": "benchmark_lp_n1000_fast_time_to_solution_s",
        "value": round(t_lp1000_fast, 4),
        "unit": "s",
        "vs_baseline": round(speedup_1000, 1),
        "detail": detail,
    }))


def _cpu_fallback(reason: str):
    """The TPU tunnel on this host occasionally stalls indefinitely; emit
    an honest CPU-only measurement rather than hanging the driver."""
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
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
    print(json.dumps({
        "metric": "benchmark_lp_n1000_iters_per_s",
        "value": round(ours, 1),
        "unit": "iters/s",
        "vs_baseline": round(ours / base, 2),
        "detail": {"device": "cpu-fallback", "reason": reason,
                   "numpy_baseline_iters_per_s": round(base, 1)},
    }))


def _emit_cpu_fallback_via_subprocess(reason: str):
    import subprocess
    import sys
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-fallback"],
            capture_output=True, text=True, timeout=360)
        txt = out.stdout.strip()
    except subprocess.TimeoutExpired:
        txt = ""
    print(txt.splitlines()[-1] if txt
          else json.dumps({"metric": "benchmark_lp_n1000_iters_per_s",
                           "value": 0, "unit": "iters/s",
                           "vs_baseline": 0,
                           "detail": {"error": reason}}))


if __name__ == "__main__":
    import subprocess
    import sys
    if "--cpu-fallback" in sys.argv:
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(300)
        _cpu_fallback("tpu bench exceeded watchdog")
        os._exit(0)
    if "--tpu-main" in sys.argv:
        # in-process watchdog: catches mid-run stalls where Python regains
        # control between device calls, emitting the partial rows honestly
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(540)
        try:
            main()
            signal.alarm(0)
        except _Watchdog:
            if "value" in _PROGRESS:
                d = _PROGRESS.get("detail", {})
                d["watchdog_partial"] = True
                print(json.dumps({
                    "metric": "benchmark_lp_n1000_fast_time_to_solution_s",
                    "value": _PROGRESS["value"], "unit": "s",
                    "vs_baseline": _PROGRESS["vs_baseline"], "detail": d}))
                os._exit(0)
            os._exit(3)
        os._exit(0)
    # Parent: run the TPU bench in a CHILD process with a hard timeout.
    # signal.alarm alone cannot watchdog the observed failure mode — a
    # first-contact tunnel stall blocks inside the device call's C
    # extension and never returns to the interpreter, so SIGALRM is never
    # handled and the process (and the driver above it) hangs forever.
    # A parent-side subprocess timeout kills the exact child PID instead.
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--tpu-main"],
            capture_output=True, text=True, timeout=720)
        txt = out.stdout.strip()
        lines = [ln for ln in txt.splitlines() if ln.startswith("{")]
        if lines:
            print(lines[-1])
            os._exit(0)
    except subprocess.TimeoutExpired:
        pass
    _emit_cpu_fallback_via_subprocess("tpu bench stalled (hung device call)")
    os._exit(0)
