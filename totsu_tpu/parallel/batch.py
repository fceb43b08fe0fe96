"""Batched lockstep solves: vmap over problem instances, optionally sharded
over a mesh 'batch' axis (embarrassingly parallel — the scaling-efficiency
workhorse of BASELINE.json's north star).

Instances iterate in lockstep inside one ``lax.while_loop``; each carries
its own status, and the loop runs until every instance terminates (the
masking semantics fall out of ``vmap``-of-``while_loop``, which XLA lowers
to a single fused loop with per-instance predicates).
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from totsu_tpu.solver.cone import ConeLayout
from totsu_tpu.solver.conic import solve_jit, SolveResult
from totsu_tpu.solver.params import SolverParam


def shard_batch(tree, mesh: Mesh, axis: str = "batch"):
    """Place a batch-leading pytree so its leading dim shards over
    ``axis`` (replicated over the other mesh axes)."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def solve_batch(
    c,
    a,
    b,
    cone: ConeLayout,
    param: SolverParam = SolverParam(),
    mesh: Optional[Mesh] = None,
    warm_start: Optional[Tuple[Any, Any]] = None,
) -> SolveResult:
    """Solve a batch of conic programs in lockstep.

    * ``c``: (B, n), ``a``: (B, m, n) array or batch-leading LinOp pytree,
      ``b``: (B, m); the cone layout is shared.
    * With ``mesh``, inputs are sharded over its ``batch`` axis first;
      XLA keeps every per-instance computation local to its device
      (pure data parallelism, zero collectives in the iteration).
    """
    if mesh is not None:
        c, a, b = shard_batch((jnp.asarray(c), a, jnp.asarray(b)), mesh)
        if warm_start is not None:
            warm_start = shard_batch(warm_start, mesh)

    def one(ci, ai, bi, ws):
        return solve_jit(ci, ai, bi, cone, param, warm_start=ws)

    if warm_start is None:
        fn = jax.vmap(lambda ci, ai, bi: one(ci, ai, bi, None))
        return jax.jit(fn)(c, a, b)
    fn = jax.vmap(one)
    return jax.jit(fn)(c, a, b, warm_start)
