"""Microbatched solve runtime for serving workloads.

Production deployments solve large numbers of small/medium conic programs
(pricing, allocation, MPC ticks). Dispatching them one-by-one wastes the
accelerator: each solve is latency-bound, and every new (shape, cone,
param) signature pays an XLA compile. :class:`BatchRunner` is the serving
pattern around the pure solver:

* requests are **bucketed by signature** (m, n, cone layout, params);
* each bucket keeps ONE compiled vmapped executable, built lazily and
  padded to fixed batch tiers (so a bucket re-serves any request count
  without recompiling);
* a bucket's requests are solved **in lockstep** on-device and results
  are scattered back in order.

No reference counterpart (the reference is a library call); this is the
"runtime around the compute path" layer of a deployable framework.
"""

import bisect
import dataclasses
import threading
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from totsu_tpu.solver.cone import ConeLayout
from totsu_tpu.solver.conic import solve_jit, SolveResult
from totsu_tpu.solver.params import SolverParam

#: padded batch tiers — one compile per tier that a bucket actually uses
_TIERS = (1, 2, 4, 8, 16, 32, 64, 128, 256)


@dataclasses.dataclass(frozen=True)
class _Signature:
    m: int
    n: int
    cone: ConeLayout
    param: SolverParam


class BatchRunner:
    """Compiled-solver cache + lockstep microbatcher.

    >>> runner = BatchRunner()
    >>> results = runner.map([(c1, a1, b1, cone), (c2, a2, b2, cone), ...])

    Thread-safe; executables are shared across calls. For asynchronous
    serving put a queue in front and call :meth:`map` per drain.
    """

    def __init__(self, param: SolverParam = SolverParam(max_iter=100_000)):
        self._param = param
        self._compiled: Dict[Tuple[_Signature, int], object] = {}
        self._lock = threading.Lock()

    def _executable(self, sig: _Signature, tier: int):
        key = (sig, tier)
        with self._lock:
            fn = self._compiled.get(key)
        if fn is not None:
            return fn

        def batched(cb, ab, bb):
            return jax.vmap(
                lambda ci, ai, bi: solve_jit(ci, ai, bi, sig.cone,
                                             sig.param))(cb, ab, bb)

        fn = jax.jit(batched)
        with self._lock:
            self._compiled[key] = fn
        return fn

    def map(self, problems: Sequence) -> List[SolveResult]:
        """Solve a sequence of (c, a, b, cone) tuples (or ConicProblems).
        Dense operators only (vmap needs homogeneous structure). Returns
        per-problem SolveResults in input order."""
        parsed = []
        for p in problems:
            if hasattr(p, "cone"):
                c, a, b, cone = p.c, p.a, p.b, p.cone
            else:
                c, a, b, cone = p
            a = a.a if hasattr(a, "a") else a
            c = np.asarray(c)
            a = np.asarray(a)
            b = np.asarray(b)
            parsed.append((c, a, b, cone))

        buckets: Dict[_Signature, List[int]] = {}
        for i, (c, a, b, cone) in enumerate(parsed):
            sig = _Signature(m=b.shape[0], n=c.shape[0], cone=cone,
                             param=self._param)
            buckets.setdefault(sig, []).append(i)

        results: List[SolveResult] = [None] * len(parsed)
        for sig, idxs in buckets.items():
            tier = _TIERS[bisect.bisect_left(_TIERS, min(len(idxs),
                                                         _TIERS[-1]))]
            fn = self._executable(sig, tier)
            for start in range(0, len(idxs), tier):
                chunk = idxs[start:start + tier]
                cb = np.zeros((tier, sig.n))
                ab = np.zeros((tier, sig.m, sig.n))
                bb = np.zeros((tier, sig.m))
                for j, i in enumerate(chunk):
                    cb[j], ab[j], bb[j] = parsed[i][0], parsed[i][1], \
                        parsed[i][2]
                # pad rows replicate the first problem (cheap, convergent)
                for j in range(len(chunk), tier):
                    cb[j], ab[j], bb[j] = cb[0], ab[0], bb[0]
                out = fn(jnp.asarray(cb), jnp.asarray(ab), jnp.asarray(bb))
                for j, i in enumerate(chunk):
                    results[i] = jax.tree_util.tree_map(
                        lambda leaf, jj=j: leaf[jj]
                        if leaf is not None else None, out)
        return results

    @property
    def compiled_signatures(self) -> int:
        return len(self._compiled)
