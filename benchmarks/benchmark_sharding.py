"""Sharding scaling proxy on the virtual CPU mesh (VERDICT r1 #3).

Real multi-chip hardware is not available in this environment, so this
measures what CAN be measured honestly on N virtual CPU devices sharing
the host cores:

* row-shard sweep — per-iteration wall time of the SAME fixed-iteration
  LP solve with A row-sharded over row in {1, 2, 4, 8}: the sharding
  machinery + one fused all-reduce per iteration must not blow up the
  iteration cost (the devices share silicon, so no speedup is expected
  here — overhead is the signal);
* batch-shard sweep — lockstep vmapped instances sharded over the batch
  axis vs the same batch on one device: batch sharding emits ZERO
  collectives (each device iterates its instances independently — see
  tests/test_parallel.py::test_batch_sharded_zero_collectives), so on
  real chips its scaling efficiency is 100% by construction minus any
  dispatch overhead, which is exactly the ratio printed here.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/benchmark_sharding.py
"""

import os
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import totsu_tpu as tt
from totsu_tpu.parallel import make_mesh, shard_dense_problem
from jax.sharding import NamedSharding, PartitionSpec as P


def make_lp(n, m, seed=0, batch=None):
    rng = np.random.default_rng(seed)
    shape = (m, n) if batch is None else (batch, m, n)
    g = rng.normal(size=shape).astype(np.float32)
    x0 = rng.normal(size=(n,) if batch is None else (batch, n))
    h = (np.einsum("...mn,...n->...m", g, x0)
         + rng.random((m,) if batch is None else (batch, m)) + 0.1)
    c = rng.normal(size=(n,) if batch is None else (batch, n))
    return (c.astype(np.float32), g, h.astype(np.float32))


def timeit(fn, *args, trials=3):
    r = jax.block_until_ready(fn(*args))  # compile
    best = np.inf
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    devs = jax.devices("cpu")
    n, m, iters = 256, 2048, 2000
    c, g, h = make_lp(n, m)
    lay = tt.ConeLayout([tt.rpos(m)])
    param = tt.SolverParam(max_iter=iters, eps_acc=1e-12, check_period=100)

    print(f"# row-shard sweep: n={n} m={m}, {iters} fixed iterations, "
          f"{len(devs)} virtual cpu devices on shared cores")
    base_dt = None
    for row in (1, 2, 4, 8):
        mesh = make_mesh(batch=1, row=row, devices=devs[:row])
        prob = shard_dense_problem(
            tt.ConicProblem(jnp.asarray(c), tt.DenseOp(jnp.asarray(g)),
                            jnp.asarray(h), lay), mesh)
        fn = jax.jit(lambda c_, a_, b_, rs=prob.row_sharding:
                     tt.solve_jit(c_, a_, b_, lay, param, row_sharding=rs))
        dt, r = timeit(fn, prob.c, prob.a, prob.b)
        if base_dt is None:
            base_dt = dt
        print(f"row={row}: {dt / iters * 1e6:8.1f} us/iter  "
              f"(x{dt / base_dt:.2f} vs row=1)  iters={int(r.iters)}")

    print(f"\n# batch-shard sweep: lockstep n=64 m=192 instances, "
          f"{iters} fixed iterations")
    nb, mb = 64, 192
    layb = tt.ConeLayout([tt.rpos(mb)])
    pb = tt.SolverParam(max_iter=iters, eps_acc=1e-12, check_period=100)
    cb, gb, hb = make_lp(nb, mb, seed=1, batch=8)
    vfn = jax.jit(jax.vmap(
        lambda ci, ai, bi: tt.solve_jit(ci, ai, bi, layb, pb)))

    # batch=8 on ONE device (the shared-core reference point)
    one = jax.devices("cpu")[0]
    args1 = tuple(jax.device_put(jnp.asarray(x), one) for x in (cb, gb, hb))
    dt_one, _ = timeit(vfn, *args1)

    # batch=8 sharded over 8 devices (zero collectives)
    mesh = make_mesh(batch=8, row=1, devices=devs[:8])
    sh = NamedSharding(mesh, P("batch"))
    args8 = (jax.device_put(jnp.asarray(cb), NamedSharding(mesh, P("batch", None))),
             jax.device_put(jnp.asarray(gb), NamedSharding(mesh, P("batch", None, None))),
             jax.device_put(jnp.asarray(hb), NamedSharding(mesh, P("batch", None))))
    dt_sh, _ = timeit(vfn, *args8)

    tput_one = 8 * iters / dt_one
    tput_sh = 8 * iters / dt_sh
    print(f"batch=8 single device : {tput_one:10.0f} instance-iters/s")
    print(f"batch=8 sharded over 8: {tput_sh:10.0f} instance-iters/s")
    print(f"sharding overhead factor (same silicon): "
          f"{tput_sh / tput_one:.2f}x  -> real-chip scaling efficiency "
          f"proxy {min(1.0, tput_sh / tput_one) * 100:.0f}% "
          f"(zero collectives on the batch axis)")


if __name__ == "__main__":
    main()
