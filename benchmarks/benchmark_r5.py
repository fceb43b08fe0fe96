"""Round-5 TPU measurement sweeps (VERDICT r4 #5/#6/#7).

Three independent sections, each meant to run in its OWN process (this
host wedges when two clients contact the chip concurrently — CLAUDE.md):

* ``--frontier [n]`` — dense frontier past 4096: time-to-1e-3 of the
  chunked dense-NS direct engine vs chunked pdhg(+equil) at n = 6144 /
  8192 (both only runnable chunked here: the tunnel kills any dispatch
  past ~1.5 min of device time). r5's exact+cheap chunked resume carries
  the Halpern epoch AND the cached O(n^3) inverse across dispatches, so
  this comparison is finally apples-to-apples. Ref shape:
  experimental/benchmark_lp/src/main.rs:13-92 (m = 4n incl. box rows).

* ``--illscaled [span]`` — indirect engine on badly column-scaled
  banded data (n=4096): A/B of {plain CG, +jacobi, +equil,
  +equil+jacobi} — fixed-iteration time + the surfaced
  SolveResult.diag CG health + convergence at eps 1e-3.

* ``--psdsmall`` — the megakernel-PSD k<=16 question: many small PSD
  blocks on a dense mega-eligible shape; measures the XLA loop's
  fixed-iteration rate with the PSD layout vs the SAME shape with rpos
  rows instead (isolating the projection's in-loop share), plus
  time-to-solution of the measured engines. The projection share bounds
  what ANY in-kernel PSD projection could save (Amdahl) — the number
  behind docs/ARCHITECTURE.md section 6's close-out.

* ``--giant [n]`` — from-tiles scale row (default n=524,288): banded+box
  LP whose dense A could not exist (3.3 TB at the default n) built
  directly from ~1.6 GB of band tiles, solved chunked through the
  routed indirect engine (BASELINE "Giant structured programs").

* ``--batchchunk`` — chunked lockstep batch on the chip: 8 instances,
  ``solve_batch(chunk_iters=500)`` vs unchunked; per-instance iteration
  parity is the r5 terminal-checkpoint contract.

Usage: python benchmarks/benchmark_r5.py --frontier 6144
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/totsu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import totsu_tpu as tt                                     # noqa: E402
from totsu_tpu.solver.conic import _solve_chunked          # noqa: E402
from totsu_tpu.solver.params import SolverError            # noqa: E402


def _sync(r):
    jax.block_until_ready(r)
    leaf = r.x if hasattr(r, "x") else jax.tree_util.tree_leaves(r)[0]
    return float(np.asarray(leaf).ravel()[0])


def _warm():
    _sync(jax.jit(lambda a: a @ a)(jnp.ones((8, 8), jnp.float32)))
    print("tunnel warm", flush=True)


def make_lp(n, seed=0):
    rng = np.random.default_rng(seed)
    m = 2 * n
    g = rng.normal(size=(m, n))
    h = g @ rng.normal(size=n) + rng.random(m) + 0.1
    eye = np.eye(n)
    g = np.concatenate([g, eye, -eye], axis=0).astype(np.float32)
    h = np.concatenate([h, np.full(n, 10.0), np.full(n, 10.0)]).astype(
        np.float32)
    c = rng.normal(size=n).astype(np.float32)
    return c, g, h


def chunked(c, a, b, lay, param, chunk_iters, label):
    """One timed chunked solve with progress markers (a stall must be
    distinguishable from compute — CLAUDE.md)."""
    t0 = time.perf_counter()
    try:
        res = _solve_chunked(jnp.asarray(c), a, jnp.asarray(b), lay,
                             param, None, None, False, chunk_iters)
        iters, st = int(res.iters), int(res.status)
    except SolverError as e:
        iters, st = -1, int(e.status)
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f} s, iters {iters}, status {st}",
          flush=True)
    return dt, iters, st


def frontier(n):
    print(f"== dense frontier n={n} (time-to-1e-3, chunked) ==",
          flush=True)
    _warm()
    c, g, h = make_lp(n)
    lay = tt.ConeLayout([tt.rpos(g.shape[0])])
    gj = jax.device_put(jnp.asarray(g))
    # chunk sizes sized to the tunnel window from r4 bracketing: pdhg
    # n=8192 runs 10k iters in 66 s -> 8k chunks; the direct engine's
    # warm chunks are GEMV-bound after the cached-inverse reuse (r5), but
    # its FIRST chunk still builds the n^2/n^3 caches -> small first cap
    # handled by chunk_iters uniformly (2k ≈ 25 s warm at n=6144 r4).
    direct_p = tt.SolverParam(max_iter=40_000, eps_acc=1e-3,
                              check_period=20, method="direct",
                              accel="halpern")
    pdhg_p = tt.SolverParam(max_iter=120_000, eps_acc=1e-3,
                            check_period=20, accel="halpern",
                            normalize=True)
    pdhg_eq = tt.SolverParam(max_iter=120_000, eps_acc=1e-3,
                             check_period=20, accel="halpern",
                             normalize=True, equil_iters=10)
    print("direct dense-NS halpern (chunk 1000):", flush=True)
    chunked(c, gj, h, lay, direct_p, 1000, "warmup+timed")
    print("pdhg halpern norm (chunk 8000):", flush=True)
    chunked(c, gj, h, lay, pdhg_p, 8000, "timed")
    print("pdhg halpern norm equil (chunk 8000):", flush=True)
    chunked(c, gj, h, lay, pdhg_eq, 8000, "timed")


def make_ill(n=4096, span=1e4, seed=13, tile=128):
    rng = np.random.default_rng(seed)
    nb = n // tile
    a = np.zeros((n, n), dtype=np.float32)
    for i in range(nb):
        for d in (-1, 0, 1):
            j = i + d
            if 0 <= j < nb:
                a[i * tile:(i + 1) * tile, j * tile:(j + 1) * tile] = \
                    (rng.normal(size=(tile, tile)) / np.sqrt(3 * tile)
                     ).astype(np.float32)
    scales = np.exp(np.log(span) * rng.random(n)
                    - 0.5 * np.log(span)).astype(np.float32)
    a = a * scales[None, :]
    x0 = rng.normal(size=n).astype(np.float32) / scales
    box = (10.0 / scales).astype(np.float32)
    b = np.concatenate([a @ x0 + rng.random(n).astype(np.float32) + 0.1,
                        box, box])
    c = (rng.normal(size=n) * scales).astype(np.float32)
    a_full = np.concatenate([a, np.eye(n, dtype=np.float32),
                             -np.eye(n, dtype=np.float32)])
    return c, a_full, b


def illscaled(span):
    print(f"== ill-scaled banded n=4096 span={span:g} (indirect A/B) ==",
          flush=True)
    _warm()
    c, af, b = make_ill(span=span)
    n = c.shape[0]
    ell = tt.BlockedEllOp.from_dense(af, block=(128, 128))
    del af
    lay = tt.ConeLayout([tt.rpos(3 * n)])
    cj, bj = jnp.asarray(c), jnp.asarray(b)
    cfgs = [
        ("plain", dict(cg_precond="none")),
        ("jacobi", dict(cg_precond="jacobi")),
        ("equil", dict(cg_precond="none", equil_iters=10)),
        ("equil+jacobi", dict(cg_precond="jacobi", equil_iters=10)),
    ]
    for name, kw in cfgs:
        # fixed 2,000 iterations: per-iteration cost + CG health
        p = tt.SolverParam(max_iter=2_000, eps_acc=1e-9, check_period=20,
                           method="direct", accel="halpern", **kw)
        fn = jax.jit(lambda c_, a_, b_, p_=p: tt.solve_jit(
            c_, a_, b_, lay, p_))
        _sync(fn(cj, ell, bj))
        t0 = time.perf_counter()
        r = fn(cj * (1.0 + 1e-6), ell, bj)
        _sync(r)
        dt = time.perf_counter() - t0
        print(f"  {name:13s} fixed2k: {dt:6.2f} s "
              f"({2000 / dt:7.0f} iters/s), cg_worst_rel "
              f"{float(r.diag['cg_worst_rel']):.1e}", flush=True)
        # convergence at eps 1e-3, CHUNKED: an unconverged 20k-iteration
        # run at ~450 iters/s breaches the tunnel's dispatch window in
        # one call (measured: UNAVAILABLE fault on the unchunked row)
        p2 = tt.SolverParam(max_iter=20_000, eps_acc=1e-3,
                            check_period=20, method="direct",
                            accel="halpern", **kw)
        chunked(cj, ell, bj, lay, p2, 2_000, f"{name} to-1e-3")


def psdsmall():
    print("== small-k PSD in-loop share (mega-eligible shape) ==",
          flush=True)
    _warm()
    rng = np.random.default_rng(3)
    kpsd, nblk = 8, 40                   # 40 blocks of k=8: dim 36 each
    pdim = kpsd * (kpsd + 1) // 2
    n = 200
    m = nblk * pdim + 2 * n              # + box rows
    a = np.concatenate([
        (rng.normal(size=(nblk * pdim, n)) / np.sqrt(n)).astype(np.float32),
        np.eye(n, dtype=np.float32), -np.eye(n, dtype=np.float32)])
    x0 = rng.normal(size=n)
    # feasible rhs: identity-matrix slack on each PSD block
    eye_pack = np.zeros(pdim, np.float32)
    off = 0
    for j in range(kpsd):
        off += j
        eye_pack[off] = 1.0
        off += 1
    s_feas = np.concatenate([np.tile(eye_pack, nblk),
                             np.ones(2 * n, np.float32)])
    b = (a @ x0 + s_feas).astype(np.float32)
    c = rng.normal(size=n).astype(np.float32)
    lay_psd = tt.ConeLayout([tt.psd(kpsd, count=nblk, method="jacobi"),
                             tt.rpos(2 * n)])
    lay_rpos = tt.ConeLayout([tt.rpos(m)])
    cj, aj, bj = (jnp.asarray(x) for x in (c, a, b))
    for name, lay in (("psd(jacobi)", lay_psd), ("rpos-swap", lay_rpos)):
        p = tt.SolverParam(max_iter=4_000, eps_acc=1e-9, check_period=20,
                           accel="halpern", normalize=True)
        fn = jax.jit(lambda c_, a_, b_, l_=lay, p_=p: tt.solve_jit(
            c_, a_, b_, l_, p_))
        _sync(fn(cj, aj, bj))
        best = np.inf
        for t in range(3):
            t0 = time.perf_counter()
            _sync(fn(cj * (1.0 + 1e-6 * (t + 1)), aj, bj))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:12s}: {4000 / best:9.0f} iters/s "
              f"({best:.3f} s / 4000)", flush=True)
    # eigh variant for the projection-policy cross-check
    lay_eigh = tt.ConeLayout([tt.psd(kpsd, count=nblk, method="eigh"),
                              tt.rpos(2 * n)])
    p = tt.SolverParam(max_iter=4_000, eps_acc=1e-9, check_period=20,
                       accel="halpern", normalize=True)
    fn = jax.jit(lambda c_, a_, b_: tt.solve_jit(c_, a_, b_, lay_eigh, p))
    _sync(fn(cj, aj, bj))
    best = np.inf
    for t in range(3):
        t0 = time.perf_counter()
        _sync(fn(cj * (1.0 + 1e-6 * (t + 1)), aj, bj))
        best = min(best, time.perf_counter() - t0)
    print(f"  psd(eigh)   : {4000 / best:9.0f} iters/s", flush=True)
    # time-to-solution on the measured engines
    for name, kw in (("pdhg+halpern", dict(accel="halpern",
                                           normalize=True)),
                     ("direct+halpern", dict(method="direct",
                                             accel="halpern"))):
        p = tt.SolverParam(max_iter=200_000, eps_acc=1e-3,
                           check_period=20, **kw)
        fn = jax.jit(lambda c_, a_, b_, p_=p: tt.solve_jit(
            c_, a_, b_, lay_psd, p_))
        _sync(fn(cj, aj, bj))
        t0 = time.perf_counter()
        r = fn(cj * (1.0 + 1e-6), aj, bj)
        _sync(r)
        print(f"  {name:14s} to-1e-3: {time.perf_counter() - t0:.3f} s, "
              f"iters {int(r.iters)}, status {int(r.status)}", flush=True)


def giant(n):
    """--giant [n]: block-tridiagonal banded+box LP built via
    BlockedEllOp.from_tiles (dense A never materialized anywhere),
    solved through the routed indirect engine with chunk_iters=1000 —
    the scale table behind BASELINE "Giant structured programs from
    tiles". n=524,288: tiles ~1.6 GB fwd+T, dense-A equivalent 3.3 TB."""
    _warm()
    bm = 128
    nb = n // bm
    rngl = np.random.default_rng(11)
    tiles = {}
    x_feas = rngl.normal(size=n).astype(np.float32)
    ax = np.zeros(n, np.float32)
    for i in range(nb):
        for j in (i - 1, i, i + 1):
            if 0 <= j < nb:
                t = (rngl.normal(size=(bm, bm)) / np.sqrt(3 * bm)
                     ).astype(np.float32)
                tiles[(i, j)] = t
                ax[i * bm:(i + 1) * bm] += t @ x_feas[j * bm:(j + 1) * bm]
    big = tt.BlockedEllOp.from_tiles(tiles, m=n, n=n, block=(bm, bm))
    del tiles
    from totsu_tpu.solver.operator import VStackOp, DiagOp
    ones = jnp.ones((n,), jnp.float32)
    a_big = VStackOp((big, DiagOp(ones), DiagOp(-ones)))
    b_big = jnp.asarray(np.concatenate([
        ax + rngl.random(n).astype(np.float32) + 0.1,
        np.full(n, 10.0, np.float32), np.full(n, 10.0, np.float32)]))
    c_big = jnp.asarray(rngl.normal(size=n).astype(np.float32))
    lay = tt.ConeLayout([tt.rpos(3 * n)])
    param = tt.SolverParam(max_iter=8_000, eps_acc=1e-3, check_period=20,
                           method="direct", accel="halpern")
    tile_mb = (2 * 3 * nb * bm * bm * 4) / 1e6
    dense_gb = (3 * n) * n * 4 / 1e9
    print(f"n={n} m={3*n} tiles ~{tile_mb:.0f} MB "
          f"(dense-A equivalent {dense_gb:.0f} GB)", flush=True)
    t0 = time.perf_counter()
    r = _solve_chunked(c_big, a_big, b_big, lay, param, None, None,
                       False, 1_000)
    t_cold = time.perf_counter() - t0
    print(f"  cold (incl. compile): {t_cold:.2f} s, iters {int(r.iters)}, "
          f"status {int(r.status)}", flush=True)
    t0 = time.perf_counter()
    r = _solve_chunked(c_big * (1.0 + 1e-6), a_big, b_big, lay, param,
                       None, None, False, 1_000)
    dt = time.perf_counter() - t0
    print(f"  warm solve: {dt:.2f} s, iters {int(r.iters)}, "
          f"status {int(r.status)}, cri_pri {float(r.cri_pri):.1e}, "
          f"cri_dual {float(r.cri_dual):.1e}", flush=True)


def batchchunk():
    """--batchchunk: chunked lockstep batch on the chip — 8 perturbed
    LP instances, solve_batch(chunk_iters=500) vs the unchunked batch;
    asserts identical per-instance iteration counts (the r5 terminal-
    checkpoint contract, tests/test_parallel.py) on real hardware."""
    _warm()
    from totsu_tpu.parallel import solve_batch
    rng = np.random.default_rng(7)
    B, n = 8, 100
    g = rng.normal(size=(2 * n, n)).astype(np.float32)
    eye = np.eye(n, dtype=np.float32)
    a1 = np.concatenate([g, eye, -eye])
    h = np.concatenate([g @ rng.normal(size=n).astype(np.float32)
                        + rng.random(2 * n).astype(np.float32) + 0.1,
                        np.full(2 * n, 10.0, np.float32)])
    cs = rng.normal(size=(B, n)).astype(np.float32)
    a_b = jnp.broadcast_to(jnp.asarray(a1), (B,) + a1.shape)
    b_b = jnp.broadcast_to(jnp.asarray(h), (B, h.shape[0]))
    lay = tt.ConeLayout([tt.rpos(4 * n)])
    param = tt.SolverParam(max_iter=20_000, eps_acc=1e-3,
                           check_period=20, accel="halpern",
                           normalize=True)
    t0 = time.perf_counter()
    r0 = solve_batch(jnp.asarray(cs), a_b, b_b, lay, param)
    i0 = np.asarray(jax.block_until_ready(r0).iters)
    t_un = time.perf_counter() - t0
    t0 = time.perf_counter()
    rc = solve_batch(jnp.asarray(cs), a_b, b_b, lay, param,
                     chunk_iters=500)
    ic = np.asarray(jax.block_until_ready(rc).iters)
    t_ch = time.perf_counter() - t0
    print(f"unchunked: statuses {np.asarray(r0.status).tolist()} "
          f"iters {i0.tolist()} ({t_un:.2f} s cold)", flush=True)
    print(f"chunk=500: statuses {np.asarray(rc.status).tolist()} "
          f"iters {ic.tolist()} ({t_ch:.2f} s cold)", flush=True)
    parity = bool((i0 == ic).all())
    print("per-instance iteration parity:", parity, flush=True)
    if not parity or not (np.asarray(rc.status) == 1).all():
        raise SystemExit("batchchunk FAILED: terminal-checkpoint contract "
                         "violated on hardware")


if __name__ == "__main__":
    if "--frontier" in sys.argv:
        i = sys.argv.index("--frontier")
        frontier(int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 6144)
    elif "--illscaled" in sys.argv:
        i = sys.argv.index("--illscaled")
        illscaled(float(sys.argv[i + 1])
                  if len(sys.argv) > i + 1 else 1e4)
    elif "--psdsmall" in sys.argv:
        psdsmall()
    elif "--giant" in sys.argv:
        i = sys.argv.index("--giant")
        giant(int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 524_288)
    elif "--batchchunk" in sys.argv:
        batchchunk()
    else:
        print(__doc__)
