"""Solver parameters, status codes and errors.

Mirrors ``SolverParam`` / ``SolverError``
(ref: totsu_core/src/solver/solver.rs:13-41, solver_error.rs:3-18).
"""

import dataclasses
import enum
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SolverParam:
    """First-order solver parameters (static: baked into the jitted solve).

    Defaults match the reference (solver.rs:27-41) except ``max_iter``,
    which the reference leaves unbounded (``None``): a jitted
    ``lax.while_loop`` needs *some* bound for the excess-iteration status
    to be well-defined, so ``None`` maps to 10**7.
    """
    max_iter: Optional[int] = None
    eps_acc: float = 1e-6
    #: Certificate tolerance. ``None`` (the unset sentinel) resolves to the
    #: reference default 1e-6 *with* the dtype floor of
    #: :func:`effective_eps_inf` applied (f32 ray residuals bottom out at
    #: ~100 eps_mach). An explicitly passed float — including 1e-6 itself —
    #: is honored verbatim, never floored (ADVICE r2: value-equality with
    #: the default was a discontinuous sentinel).
    eps_inf: Optional[float] = None
    eps_zero: float = 1e-12
    #: Iterations between progress logs (``jax.debug.print`` inside the
    #: jitted loop). The reference defaults to 10^4 (solver.rs:27-41) with
    #: logging OFF unless a logger is installed; since JAX has no logger
    #: registry, the equivalent quiet-by-default is 0 = off. Set 10_000
    #: for reference-matching output cadence.
    log_period: int = 0
    #: Run the termination test every this many iterations. The reference
    #: checks every iteration, paying 2 extra operator applications per
    #: iteration (solver.rs:592-597); raising this amortizes that cost
    #: (the solve may overshoot by < check_period iterations).
    check_period: int = 1
    #: Over-relaxation factor rho in (0, 2) for the primal-dual step
    #: (relaxed PDHG, Condat 2013 Alg. 3.1). 1.0 reproduces the reference
    #: iteration exactly; ~1.6-1.9 typically cuts iteration counts 30-45%.
    #: No reference counterpart (the reference has no acceleration).
    relax: float = 1.0
    #: Ruiz-equilibration sweeps applied to dense problem data before
    #: solving (``None`` = unset/off — reference behavior; ``0`` =
    #: EXPLICITLY off). SCS-style data scaling; tolerances then apply
    #: to the scaled problem. Typically 10. Under ``profile='fast'``,
    #: the host-facing :func:`solve` switches this on AUTOMATICALLY
    #: (10 sweeps) for structured operators whose measured column-norm
    #: spread exceeds 10 — the regime where the r5 ill-scaled A/B
    #: showed equilibration is the only converging configuration; any
    #: explicit value wins, including 0 (the opt-out that pins the
    #: unequilibrated iterate path — conic.py ``_maybe_auto_equil``).
    equil_iters: Optional[int] = None
    #: Iteration engine: 'pdhg' = the reference's matrix-free
    #: Pock-Chambolle method (works with any LinOp); 'direct' = SCS-style
    #: ADMM with a cached dense factorization (dense A only, typically
    #: 100-1000x fewer iterations). See solver/direct.py.
    method: str = "pdhg"
    #: Acceleration: '' = off (reference iterate path). For the pdhg
    #: engine: 'restart' = PDLP-style adaptive restarts to the running
    #: iterate average (Applegate et al. 2021); 'halpern' = restarted
    #: reflected-Halpern PDHG (rHPDHG, Lu & Yang 2024). For the direct
    #: engine: 'halpern' = restarted Halpern on the Douglas-Rachford map
    #: (requires relax=1.0 — the reflection of the *unrelaxed* DR map is
    #: the nonexpansive one). Averaged/projected points are used for all
    #: termination tests, so certificates keep their meaning; on LPs these
    #: cut iteration counts by one to two orders of magnitude. Evaluated
    #: every ``check_period`` iterations. No reference counterpart.
    accel: str = ""
    #: SCS-style b/c norm normalization: the iteration runs on
    #: b/max(||b||,eps_zero), c/max(||c||,eps_zero) (applied after Ruiz
    #: equilibration), which balances the tau/kappa homogenizing row of the
    #: embedding against the data rows. Termination criteria, certificates
    #: and the returned solution are all evaluated on the UN-normalized
    #: data, so a CONVERGED status certifies exactly the same problem as
    #: with normalization off. ``None`` = engine default: off for 'pdhg'
    #: (preserves the reference iterate path, solver.rs:364-457), on for
    #: 'direct' (no reference counterpart). Measured on the benchmark LP
    #: contract (n=100, eps 1e-3): 12-25x fewer iterations for both
    #: engines (BASELINE.md).
    normalize: Optional[bool] = None
    #: Return the raw iteration state in SolveResult.state for exact
    #: checkpoint/resume via the ``resume_state`` argument.
    return_state: bool = False
    #: Storage dtype for the operator A inside the *update* matvecs
    #: (e.g. 'bfloat16'); None = iterate dtype (reference behavior).
    #: Dense operators only. The update loop then streams A from HBM at
    #: half the bytes — the hot path is HBM-bound, so this approaches a
    #: 2x iterations/s gain on large problems — while the termination
    #: criteria, preconditioner and certificates keep the full-precision
    #: A. The iteration converges to the solution of the bf16-rounded
    #: problem (a static relative data perturbation of ~4e-3); because
    #: the criteria are exact, a CONVERGED status still certifies an
    #: eps_acc-accurate solution of the *original* problem — if the
    #: rounding perturbation alone exceeds what eps_acc tolerates, the
    #: solve reports EXCESS_ITER rather than mis-certifying. In practice
    #: this fits coarse tolerances (eps_acc >= ~1e-2 on generic dense
    #: data; tighter when A is exactly representable, e.g. integer or
    #: sparse stencil data) and fixed-iteration throughput runs; see
    #: docs/ARCHITECTURE.md section 6 for why it is NOT auto-switched.
    #: Only use when A is HBM-bound (larger than VMEM): measured 1.88x at
    #: n=4000 but 0.8x at n=1000, where A is VMEM-resident and the
    #: in-flight widening just adds VPU work (BASELINE.md).
    matvec_dtype: Optional[str] = None
    #: Parameter profile. 'reference' (default) leaves every knob at its
    #: reference-parity value: ``solve()`` then reproduces the reference
    #: iterate path exactly. 'fast' fills in the measured-fastest settings
    #: for every knob the caller left at its default — it never overrides
    #: an explicitly set field:
    #:
    #: * small mega-eligible f32 problems on TPU (n <= 300, or n <= 200
    #:   when the layout has RSOC blocks — measured crossovers, BASELINE
    #:   "Megakernel A/B"): pdhg + ``accel='halpern'`` + ``kernel='auto'``
    #:   (the Pallas whole-solve kernel beats the direct engine there);
    #: * else dense A and n <= 8192 (r5 measured bound): ``method=
    #:   'direct'`` + ``accel='halpern'`` (a cached factorization/inverse
    #:   turns 10^4-10^5 first-order iterations into ~10^4 DR
    #:   iterations; measured n=2000: 0.571 s vs 0.813 pdhg, n=4000:
    #:   16.6 s vs 39.9, n=6144: 80 s vs 148, n=8192: 138 s vs a 120k-
    #:   iteration pdhg cap UNCONVERGED — BASELINE "Dense direct-engine
    #:   bound" + "Dense frontier (r5)");
    #: * else structured/matrix-free A without PSD factors: the INDIRECT
    #:   direct engine (warm-started CG — r4 measured winner at n=1024
    #:   and n=8192, BASELINE "Indirect engine at n=8192"); PSD layouts
    #:   and exp/pow-with-dense-A keep their measured winners (pdhg and
    #:   direct respectively — see BASELINE); the host-facing
    #:   :func:`solve` additionally probes the data's column-norm spread
    #:   and switches on ``equil_iters=10`` past spread 10 (the r5
    #:   ill-scaled A/B: equilibration is the only converging config
    #:   there, while it HURTS well-scaled structured data);
    #: * otherwise: ``accel='halpern'`` + ``normalize=True`` +
    #:   ``equil_iters=10`` (dense A) on the pdhg engine;
    #: * ``check_period=20`` either way (amortizes the 2 extra operator
    #:   applications of the termination test).
    #:
    #: Measured on the reference benchmark-LP contract (n=100, f32,
    #: eps 1e-3): 148,640 iterations / 1.9 s (reference profile, TPU)
    #: vs a few hundred iterations / ~10 ms (fast). See BASELINE.md.
    profile: str = "reference"
    #: Linear-system preconditioner for the INDIRECT direct engine (CG on
    #: I + A^T A for structured/matrix-free operators). 'auto' (default)
    #: = Jacobi (diagonal 1 + diag(A^T A), via LinOp.col_sqsum) whenever
    #: the operator supports it, plain CG otherwise; 'jacobi' = require
    #: it (raises if the operator lacks col_sqsum); 'none' = plain CG.
    #: The Jacobi scaling is free on well-scaled data (the diagonal is
    #: then near-constant, so M-solve is a no-op rescale) and is what
    #: keeps the CG iteration count bounded on badly row-scaled
    #: instances — measured A/B in BASELINE.md (r5). No reference
    #: counterpart (the reference has no iterative linear mode at all).
    cg_precond: str = "auto"
    #: Iteration-loop backend for the pdhg engine. '' (default) = the XLA
    #: ``lax.while_loop`` path. 'mega' = force the Pallas whole-solve
    #: megakernel (ops/pallas/megakernel.py): the ENTIRE loop — matvec
    #: pairs, projections, criteria, early exit — runs inside one Pallas
    #: call with A^T VMEM-resident, eliminating the per-op overhead that
    #: dominates small/mid problems (raises if the problem is outside its
    #: envelope: dense f32 A fitting VMEM, zero/R+/SOC/RSOC cones,
    #: accel in ('', 'halpern')). 'auto' = use the megakernel on TPU when
    #: supported and inside the measured-win envelope, else the XLA loop;
    #: ``profile='fast'`` resolves '' to 'auto'. Both backends run the
    #: same algorithm; iterates agree to reduction-order roundoff
    #: (tests/test_megakernel.py). ``log_period`` is ignored in-kernel.
    kernel: str = ""

    @property
    def bounded_max_iter(self) -> int:
        return 10_000_000 if self.max_iter is None else self.max_iter


def effective_eps_inf(param: "SolverParam", dtype) -> float:
    """Certificate tolerance the engines actually use.

    The infeasibility/unboundedness ray residuals typically bottom out at
    ~O(100 eps_mach) relative (measured f32 floor ~8e-6 on an unbounded
    SOCP; SURVEY sec. 7 risk — though the floor is not universal: a ray
    whose slack bitwise cancels A@x yields an *exactly zero* f32 residual,
    VERDICT r2 weak #1): below the floor a tolerance is usually
    unattainable and the solve spins to max_iter instead of certifying.
    The dtype floor is applied ONLY while ``eps_inf`` is unset (``None``,
    resolving to the reference default 1e-6) — an explicitly set value is
    honored verbatim (e.g. a deliberately tiny eps_inf to make
    certification require an essentially exact ray) — and the floor is
    capped at 1e-4 so low-precision iterate dtypes (bf16: 100 eps = 0.78)
    can never certify arbitrary tau ~ 0 iterates. No effect in f64
    (floor ~2e-14).
    """
    import jax.numpy as jnp
    if param.eps_inf is not None:
        return param.eps_inf
    return max(1e-6, min(100.0 * float(jnp.finfo(dtype).eps), 1e-4))


class SolverStatus(enum.IntEnum):
    """On-device status code carried through the solve loop."""
    RUNNING = 0
    CONVERGED = 1
    EXCESS_ITER = 2
    UNBOUNDED = 3
    INFEASIBLE = 4


class SolverError(Exception):
    """Raised by the host-facing ``solve`` wrapper for non-converged results.

    The pure ``solve_jit`` never raises — it returns a status code
    (vmap/pjit friendly). Mirrors ref SolverError (solver_error.rs:3-18);
    InvalidOp/WorkShortage become plain Python ``ValueError`` at build time
    and ConeFailure cannot occur (projections are total functions).
    """

    def __init__(self, status: SolverStatus):
        self.status = SolverStatus(status)
        super().__init__(self.status.name)


def status_name(code: int) -> str:
    return SolverStatus(int(code)).name
