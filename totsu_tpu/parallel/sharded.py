"""Row-sharded dense operators: the constraint matrix A partitioned over a
mesh axis, with XLA inserting the collectives.

The HSDE iteration's per-step work is two {A u, A^T v} pairs
(SURVEY.md section 3.1). With A row-sharded over mesh axis ``row``:

* ``A @ u``   — u replicated, result row-sharded: **no communication**;
* ``A.T @ v`` — v row-sharded, partial products psum-reduced over ``row``
  (one all-reduce of an (n,)-vector per application, riding ICI).

This follows the scaling-book recipe: annotate shardings on the jitted
computation's inputs and let the XLA SPMD partitioner insert the
all-reduces — no hand-written collectives in the solver core, which stays
completely unchanged (the sharding is carried by the DenseOp leaf).
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from totsu_tpu.problems.base import ConicProblem
from totsu_tpu.solver.operator import DenseOp


def shard_dense_problem(prob: ConicProblem, mesh: Mesh,
                        row_axis: str = "row") -> ConicProblem:
    """Place a dense ConicProblem so A and b shard by constraint rows.

    Row blocks align with cone factors only coincidentally (XLA re-shards
    projections as needed); the matvec/reduction sharding is what matters
    for the O(m n) work. c stays replicated.
    """
    if not isinstance(prob.a, DenseOp):
        raise TypeError("shard_dense_problem requires a DenseOp problem")
    row = NamedSharding(mesh, P(row_axis))
    a = jax.device_put(prob.a.a, NamedSharding(mesh, P(row_axis, None)))
    b = jax.device_put(prob.b, row)
    c = jax.device_put(prob.c, NamedSharding(mesh, P()))
    # row_sharding makes the solver pin its y/s/vm iterate segments to the
    # same row placement (x/tau replicated): the update then costs exactly
    # one (n,)-all-reduce per A^T apply and no communication on A applies
    # (asserted by the HLO collective-count test in tests/test_parallel.py)
    return ConicProblem(c=c, a=DenseOp(a), b=b, cone=prob.cone,
                        row_sharding=row)
