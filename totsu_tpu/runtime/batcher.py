"""Microbatched solve runtime for serving workloads.

Production deployments solve large numbers of small/medium conic programs
(pricing, allocation, MPC ticks). Dispatching them one-by-one wastes the
accelerator: each solve is latency-bound, and every new (shape, cone,
param) signature pays an XLA compile. :class:`BatchRunner` is the serving
pattern around the pure solver:

* requests are **bucketed by signature** (m, n, cone layout, params);
* each bucket is solved through power-of-two batch tiers: full 256-chunks,
  the largest tier fitting the remainder, then ONE padded tier for what's
  left (19 -> 16 + a 4-tier carrying 3) — padding is confined to the
  final small chunk and a <= 256 batch costs at most two executables;
  each tier a bucket actually uses compiles once and is reused forever;
* compiled executables live in an LRU cache (``max_cached``) so a
  long-running server with churning signatures cannot grow without bound;
* a bucket's requests are solved **in lockstep** on-device and results
  are scattered back in order;
* :meth:`submit` is the asynchronous front: requests enqueue from any
  thread, a background collector drains the queue every ``flush_ms``
  (or when ``max_pending`` accumulate) and resolves per-request futures.

No reference counterpart (the reference is a library call); this is the
"runtime around the compute path" layer of a deployable framework.
"""

import bisect
import collections
import dataclasses
import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from totsu_tpu.solver.cone import ConeLayout
from totsu_tpu.solver.conic import solve_jit, SolveResult
from totsu_tpu.solver.params import SolverParam

#: power-of-two batch tiers — any request count decomposes into a sum of
#: tiers (binary representation), so partial batches never pad
_TIERS = (1, 2, 4, 8, 16, 32, 64, 128, 256)


@dataclasses.dataclass(frozen=True)
class _Signature:
    m: int
    n: int
    cone: ConeLayout
    param: SolverParam


def _tier_chunks(count: int) -> List[Tuple[int, int]]:
    """Decompose ``count`` into at most two tiers per 256-block:
    full 256-chunks, then the largest tier <= remainder, then ONE padded
    tier covering what's left. Returns (tier, n_used) pairs with
    sum(n_used) == count.

    This bounds BOTH costs the naive strategies pay: pad-to-next-tier
    wastes up to ~2x device work just below a boundary (round-1), while a
    full binary decomposition (19 -> 16+2+1) pays up to 9 compiles and
    dispatches per signature. Here 19 -> (16, 16) + (4, 3): padding is
    confined to the final small chunk (< half of the remainder's next
    tier) and a <= 256 batch costs at most 2 executables."""
    out = []
    rem = count
    while rem >= _TIERS[-1]:
        out.append((_TIERS[-1], _TIERS[-1]))
        rem -= _TIERS[-1]
    if rem > 0:
        t = _TIERS[bisect.bisect_right(_TIERS, rem) - 1]
        out.append((t, t))
        rem -= t
        if rem > 0:
            t2 = _TIERS[bisect.bisect_left(_TIERS, rem)]
            out.append((t2, rem))
    return out


class BatchRunner:
    """Compiled-solver cache + lockstep microbatcher.

    >>> runner = BatchRunner()
    >>> results = runner.map([(c1, a1, b1, cone), (c2, a2, b2, cone), ...])

    Thread-safe; executables are shared across calls (LRU-capped at
    ``max_cached`` (signature, tier) entries). For asynchronous serving
    use :meth:`submit`, which returns a ``concurrent.futures.Future``.
    """

    def __init__(self, param: SolverParam = SolverParam(max_iter=100_000),
                 max_cached: int = 64):
        self._param = param
        self._max_cached = max_cached
        self._compiled = collections.OrderedDict()  # (sig, tier) -> fn, LRU
        self._lock = threading.Lock()
        self._queue = None
        self._collector = None

    def _executable(self, sig: _Signature, tier: int, warm: bool = False):
        key = (sig, tier, warm)
        with self._lock:
            fn = self._compiled.get(key)
            if fn is not None:
                self._compiled.move_to_end(key)  # LRU touch
                return fn

        if warm:
            def batched(cb, ab, bb, wx, wy):
                return jax.vmap(
                    lambda ci, ai, bi, xi, yi: solve_jit(
                        ci, ai, bi, sig.cone, sig.param,
                        warm_start=(xi, yi)))(cb, ab, bb, wx, wy)
        else:
            def batched(cb, ab, bb):
                return jax.vmap(
                    lambda ci, ai, bi: solve_jit(ci, ai, bi, sig.cone,
                                                 sig.param))(cb, ab, bb)

        fn = jax.jit(batched)
        with self._lock:
            self._compiled[key] = fn
            self._compiled.move_to_end(key)
            while len(self._compiled) > self._max_cached:
                self._compiled.popitem(last=False)  # evict least recent
        return fn

    def map(self, problems: Sequence,
            warm_starts: Optional[Sequence] = None) -> List[SolveResult]:
        """Solve a sequence of (c, a, b, cone) tuples (or ConicProblems).
        Dense operators only (vmap needs homogeneous structure). Returns
        per-problem SolveResults in input order.

        ``warm_starts``: optional per-problem ``(x0, y0)`` seeds (or None
        entries), e.g. the previous tick's solutions in a receding-horizon
        loop (examples/mpc_qp.py). A zero seed equals the cold init
        (solver.rs:483-494: x=0, tau=1, y=0), so absent/padded entries
        solve identically to a cold start; warm executables are cached
        separately per (signature, tier)."""
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
        if warm_starts is not None and len(warm_starts) != len(parsed):
            raise ValueError("warm_starts must pair up with problems")

        buckets: Dict[_Signature, List[int]] = {}
        for i, (c, a, b, cone) in enumerate(parsed):
            sig = _Signature(m=b.shape[0], n=c.shape[0], cone=cone,
                             param=self._param)
            buckets.setdefault(sig, []).append(i)

        warm = warm_starts is not None
        results: List[SolveResult] = [None] * len(parsed)
        for sig, idxs in buckets.items():
            start = 0
            for tier, used in _tier_chunks(len(idxs)):
                chunk = idxs[start:start + used]
                start += used
                fn = self._executable(sig, tier, warm=warm)
                # pad slots (tier > used, final chunk only) replicate the
                # chunk's first problem — cheap and convergent
                pad = [chunk[0]] * (tier - used)
                cb = np.stack([parsed[i][0] for i in chunk + pad])
                ab = np.stack([parsed[i][1] for i in chunk + pad])
                bb = np.stack([parsed[i][2] for i in chunk + pad])
                args = [jnp.asarray(cb), jnp.asarray(ab), jnp.asarray(bb)]
                if warm:
                    def seed(i):
                        ws = warm_starts[i]
                        if ws is None:
                            ws = (None, None)
                        # cast to the batch dtype: a seed from e.g. a prior
                        # x64 run would otherwise promote the np.stack and
                        # change the solve dtype inside the jitted vmap
                        return (np.zeros(sig.n, cb.dtype) if ws[0] is None
                                else np.asarray(ws[0], dtype=cb.dtype),
                                np.zeros(sig.m, cb.dtype) if ws[1] is None
                                else np.asarray(ws[1], dtype=bb.dtype))
                    seeds = [seed(i) for i in chunk] \
                        + [(np.zeros(sig.n, cb.dtype),
                            np.zeros(sig.m, cb.dtype))] * (tier - used)
                    args.append(jnp.asarray(np.stack([s[0] for s in seeds])))
                    args.append(jnp.asarray(np.stack([s[1] for s in seeds])))
                out = fn(*args)
                for j, i in enumerate(chunk):
                    results[i] = jax.tree_util.tree_map(
                        lambda leaf, jj=j: leaf[jj]
                        if leaf is not None else None, out)
        return results

    # ---------------------------------------------------------------- async

    def submit(self, problem, flush_ms: float = 5.0,
               max_pending: int = 256) -> Future:
        """Enqueue one (c, a, b, cone) problem (or ConicProblem); returns a
        Future resolving to its :class:`SolveResult`.

        A lazy daemon collector drains everything pending every
        ``flush_ms`` milliseconds (or as soon as ``max_pending``
        accumulate) and dispatches one :meth:`map` per drain — so bursts
        coalesce into large lockstep batches while a lone request still
        completes within one flush interval.

        ``flush_ms``/``max_pending`` configure the collector ONCE, on the
        first :meth:`submit` of this runner's lifetime; later calls reuse
        the running collector and their values are ignored."""
        fut = Future()
        with self._lock:
            if self._queue is None:
                self._queue = queue.SimpleQueue()
                self._collector = threading.Thread(
                    target=self._collect, args=(flush_ms / 1e3, max_pending),
                    daemon=True, name="totsu-batch-collector")
                self._collector.start()
        self._queue.put((problem, fut))
        return fut

    def _collect(self, flush_s: float, max_pending: int):
        while True:
            item = self._queue.get()  # block for the first request
            pending = [item]
            # coalesce: keep draining until one flush interval passes with
            # the queue empty, or the batch is large enough to dispatch
            while len(pending) < max_pending:
                try:
                    pending.append(self._queue.get(timeout=flush_s))
                except queue.Empty:
                    break
            # claim each future; drop ones cancelled while queued (a
            # cancelled future raises InvalidStateError on set_result,
            # which would otherwise poison the whole drain batch)
            live = [(p, f) for p, f in pending
                    if f.set_running_or_notify_cancel()]
            if not live:
                continue
            try:
                res = self.map([p for p, _ in live])
                for (_, fut), r in zip(live, res):
                    fut.set_result(r)
            except Exception as exc:  # noqa: BLE001 - propagate per-future
                for _, fut in live:
                    if not fut.done():
                        fut.set_exception(exc)

    @property
    def compiled_signatures(self) -> int:
        return len(self._compiled)
