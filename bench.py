"""Headline benchmark: prints ONE JSON line.

Problem set follows the reference's experimental/benchmark_lp
(random dense LP, f32, eps_acc = 1e-3; main.rs:13-92) scaled up to
TPU-relevant size. The baseline is a NumPy implementation of the *same*
iteration (the FloatGeneric-equivalent CPU path, f64 loops in the Rust
reference; vectorized f32 numpy here — a strictly faster stand-in since
the Rust reference publishes no numbers, BASELINE.md).

metric  = solver iterations per second on the n=1000 benchmark LP
vs_baseline = our iters/s divided by the numpy-baseline iters/s
              (>= 10 is the BASELINE.json target)
"""

import json
import os
import signal
import time

import numpy as np


class _Watchdog(Exception):
    pass


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


def main():
    t_main0 = time.perf_counter()
    import jax
    # persistent compile cache: repeat bench runs (and driver invocations)
    # skip the ~minutes of XLA compilation
    jax.config.update("jax_compilation_cache_dir", "/tmp/totsu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import totsu_tpu as tt

    n = 1000
    c, g, h = make_lp(n)
    m = g.shape[0]
    layout = tt.ConeLayout([tt.rpos(m)])

    dev = jax.devices()[0]
    cj, gj, hj = (jax.device_put(jnp.asarray(x), dev) for x in (c, g, h))

    # --- our solver: fixed-iteration runs for a clean iters/s measurement.
    # Each timed call perturbs c so no layer (including remote-execution
    # caches) can return a memoized result; first trial dropped as warm-up;
    # median of the rest.
    iters_fixed = 20_000
    param_fixed = tt.SolverParam(max_iter=iters_fixed, eps_acc=1e-9,
                                 check_period=20)
    fn = jax.jit(lambda a_, b_, c_: tt.solve_jit(c_, a_, b_, layout,
                                                 param_fixed))
    _sync(fn(gj, hj, cj))  # compile (trustworthy barrier)
    rates = []
    for trial in range(4):
        cj2 = cj * (1.0 + 1e-6 * (trial + 1))
        t0 = time.perf_counter()
        r = fn(gj, hj, cj2)
        _sync(r)
        dt = time.perf_counter() - t0
        rates.append(int(r.iters) / dt)
    ours_ips = float(np.median(rates[1:]))

    # --- same shape through the mixed-precision update path
    # (matvec_dtype='bfloat16': half the A bytes per update sweep,
    # exact-A criteria — BASELINE.md; 1.88x measured at n=4000).
    # Skipped when the headline sections already ate most of the 540 s
    # watchdog budget (e.g. a cold compile cache): a missing detail metric
    # beats tripping the watchdog and degrading the headline to the CPU
    # fallback.
    bf16_ips = None
    if time.perf_counter() - t_main0 < 240.0:
        param_bf = tt.SolverParam(max_iter=iters_fixed, eps_acc=1e-9,
                                  check_period=20, matvec_dtype="bfloat16")
        fn_bf = jax.jit(lambda a_, b_, c_: tt.solve_jit(c_, a_, b_, layout,
                                                        param_bf))
        _sync(fn_bf(gj, hj, cj))  # compile+warm with a trustworthy barrier
        rates_bf = []
        for trial in range(4):
            cj2 = cj * (1.0 + 1e-6 * (trial + 1))
            t0 = time.perf_counter()
            r = fn_bf(gj, hj, cj2)
            _sync(r)
            rates_bf.append(int(r.iters) / (time.perf_counter() - t0))
        bf16_ips = float(np.median(rates_bf[1:]))  # drop warm-up trial

    # --- convergence contract at the reference's benchmark shape
    # (n=100, eps_acc=1e-3 f32, experimental/benchmark_lp defaults)
    c1, g1, h1 = make_lp(100, seed=1)
    lay1 = tt.ConeLayout([tt.rpos(g1.shape[0])])
    param_acc = tt.SolverParam(max_iter=200_000, eps_acc=1e-3,
                               check_period=20)
    fn2 = jax.jit(lambda a_, b_, c_: tt.solve_jit(c_, a_, b_, lay1,
                                                  param_acc))
    c1j, g1j, h1j = (jax.device_put(jnp.asarray(x), dev)
                     for x in (c1, g1, h1))
    _sync(fn2(g1j, h1j, c1j))
    t0 = time.perf_counter()
    r2 = fn2(g1j, h1j, c1j * (1.0 + 1e-6))
    _sync(r2)
    t_solve = time.perf_counter() - t0
    converged = int(r2.status) == 1

    # --- same contract, tuned first-order config (reflected-Halpern
    # acceleration + Ruiz equilibration + b/c normalization): ~57x fewer
    # iterations than the parity-faithful default on this shape
    # (measured 2620 vs 148640; criteria stay in the un-normalized space)
    param_hal = tt.SolverParam(max_iter=200_000, eps_acc=1e-3,
                               check_period=20, accel="halpern",
                               equil_iters=10, normalize=True)
    fnh = jax.jit(lambda a_, b_, c_: tt.solve_jit(c_, a_, b_, lay1,
                                                  param_hal))
    _sync(fnh(g1j, h1j, c1j))
    t0 = time.perf_counter()
    rh = fnh(g1j, h1j, c1j * (1.0 + 1e-6))
    _sync(rh)
    t_hal = time.perf_counter() - t0

    # --- same contract on the direct (SCS-style ADMM) engine with
    # Halpern-accelerated DR (b/c normalization is the engine default;
    # measured 560 iters vs 20020 for round-1's un-normalized plain DR)
    param_dir = tt.SolverParam(max_iter=200_000, eps_acc=1e-3,
                               check_period=20, method="direct",
                               equil_iters=10, accel="halpern")
    fn3 = jax.jit(lambda a_, b_, c_: tt.solve_jit(c_, a_, b_, lay1,
                                                  param_dir))
    _sync(fn3(g1j, h1j, c1j))
    t0 = time.perf_counter()
    r3 = fn3(g1j, h1j, c1j * (1.0 + 1e-6))
    _sync(r3)
    t_direct = time.perf_counter() - t0

    # --- batched lockstep throughput: 64 instances of the n=100 shape,
    # vmapped into one while_loop (the scenario-batch mode of the north
    # star); fixed 8000 iterations
    bsz = 64
    rngb = np.random.default_rng(7)
    cb = np.stack([make_lp(100, seed=100 + i)[0] for i in range(bsz)])
    gb = np.stack([make_lp(100, seed=100 + i)[1] for i in range(bsz)])
    hb = np.stack([make_lp(100, seed=100 + i)[2] for i in range(bsz)])
    del rngb
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
    dtb = time.perf_counter() - t0
    batch_ips = bsz * 8000 / dtb

    # --- numpy baseline (vectorized python), few hundred iterations
    base_np_ips, _ = numpy_solver_iters_per_s(c, g, h, iters=200)

    # --- native C++ baseline (the FloatGeneric/LAPACK-equivalent single-core
    # engine, same algorithm, -O3): the honest stand-in for the Rust
    # reference, which publishes no numbers (BASELINE.md)
    from totsu_tpu.native import solve_native
    t0 = time.perf_counter()
    _, _, _, it_nat = solve_native(
        c, g, h, layout,
        tt.SolverParam(max_iter=200, eps_acc=1e-9, check_period=20))
    base_cpp_ips = it_nat / (time.perf_counter() - t0)

    # vs_baseline uses the faster host baseline: numpy/BLAS corresponds to
    # the reference's F64LAPACK backend, naive C++ to its FloatGeneric
    best_base = max(base_np_ips, base_cpp_ips)
    print(json.dumps({
        "metric": "benchmark_lp_n1000_iters_per_s",
        "value": round(ours_ips, 1),
        "unit": "iters/s",
        "vs_baseline": round(ours_ips / best_base, 2),
        "detail": {
            "device": str(dev),
            "native_cpp_baseline_iters_per_s": round(base_cpp_ips, 1),
            "numpy_baseline_iters_per_s": round(base_np_ips, 1),
            "lp_n100_time_to_eps1e-3_s": round(t_solve, 3),
            "lp_n100_iters_to_eps1e-3": int(r2.iters),
            "lp_n100_converged": converged,
            "lp_n100_halpern_equil_time_s": round(t_hal, 3),
            "lp_n100_halpern_equil_iters": int(rh.iters),
            "lp_n100_halpern_equil_converged": int(rh.status) == 1,
            "lp_n100_direct_time_s": round(t_direct, 3),
            "lp_n100_direct_iters": int(r3.iters),
            "lp_n100_direct_converged": int(r3.status) == 1,
            "batch64_lp_n100_instance_iters_per_s": round(batch_ips, 0),
            "bf16_matvec_n1000_iters_per_s":
                None if bf16_ips is None else round(bf16_ips, 1),
        },
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


if __name__ == "__main__":
    import sys
    if "--cpu-fallback" in sys.argv:
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(300)
        _cpu_fallback("tpu bench exceeded watchdog")
        os._exit(0)
    # watchdog: the whole bench must finish inside 9 minutes or we assume
    # the accelerator tunnel is stalled and fall back to a fresh CPU-pinned
    # process
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(540)
    try:
        main()
        signal.alarm(0)
    except _Watchdog:
        import subprocess
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-fallback"],
            capture_output=True, text=True, timeout=360)
        print(out.stdout.strip().splitlines()[-1] if out.stdout.strip()
              else json.dumps({"metric": "benchmark_lp_n1000_iters_per_s",
                               "value": 0, "unit": "iters/s",
                               "vs_baseline": 0,
                               "detail": {"error": "bench stalled"}}))
        os._exit(0)
