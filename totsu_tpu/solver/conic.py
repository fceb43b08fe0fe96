"""The solver core: homogeneous self-dual embedding + first-order iteration.

Solves the conic linear program

    minimize    c^T x
    subject to  A x + s = b,   s in K

via the homogeneous self-dual embedding matrix (never materialized)

    K_emb = [[ 0,    A^T, 0,  c ],
             [-A,    0,  -I,  b ],
             [-c^T, -b^T, 0,  0 ]]   in R^{(n+m+1) x (n+2m+1)}

iterated with the diagonally preconditioned Pock-Chambolle primal-dual
method. This mirrors the reference's SelfDualEmbed + SolverCore
(ref: totsu_core/src/solver/solver.rs:45-184, 326-657) but is TPU-native:
the *entire* solve — matvecs, preconditioning, cone projections, convergence
criteria, termination predicate — is one jitted ``lax.while_loop`` with no
host round-trips (contrast the CUDA backend's per-iteration host syncs,
f32cuda_slice.rs:267-285).

The iteration variable ``u`` (called ``x`` in the reference) has layout
``[x (n) | y_dual (m) | s (m) | tau (1)]`` and the dual variable ``v``
(reference ``y``) has layout ``[vn (n) | vm (m) | kappa (1)]``.
"""

import dataclasses
import os
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from totsu_tpu.solver.cone import ConeLayout, resolve_auto_methods
from totsu_tpu.solver.operator import (
    LinOp, DenseOp, PallasDenseOp, as_linop,
)
from totsu_tpu.solver.params import (SolverParam, SolverStatus, SolverError,
                                     effective_eps_inf)

# opt-in: auto-wrap dense operators with the fused Pallas dual-matvec kernel
_PALLAS_AUTO = os.environ.get("TOTSU_PALLAS", "0") == "1"

# HIGHEST is load-bearing on every solver-path dot: under vmap these inner
# products become MXU dot_generals whose DEFAULT precision rounds operands
# to bf16 — enough error in c^T x / b^T y (gap + tau updates) to stall
# eps_acc=1e-3 convergence of batched TPU solves (see DenseOp.matvec)
def _hidot(a, b):
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "y", "status", "iters", "cri_pri", "cri_dual",
                 "cri_gap", "cri_unbdd", "cri_infeas", "state", "diag"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class SolveResult:
    """Pure solve output (vmap/pjit friendly).

    ``status`` is a :class:`SolverStatus` code as an int array; ``x`` / ``y``
    are the primal / dual solutions (already divided by tau on convergence,
    ref solver.rs:398-400) or the unboundedness / infeasibility certificates.
    """
    x: Any
    y: Any
    status: Any
    iters: Any
    cri_pri: Any
    cri_dual: Any
    cri_gap: Any
    cri_unbdd: Any
    cri_infeas: Any
    #: raw iteration state (:class:`ResumeState`) when requested via
    #: SolverParam.return_state — pass back as ``resume_state`` for exact
    #: checkpoint/resume (SURVEY.md section 5: the reference's state is
    #: trivially resumable but never exposed)
    state: Any = None
    #: engine diagnostics (dict of scalars) or None. The indirect direct
    #: engine reports {"cg_worst_rel": worst relative residual any CG
    #: resolvent solve exited with, "cg_tol": its target} — a value far
    #: above cg_tol means the max_cg cap truncated the linear solves and
    #: the DR map ran inexact (r5; VERDICT r4 #5: the cap used to
    #: truncate silently).
    diag: Any = None

    @property
    def converged(self):
        return self.status == SolverStatus.CONVERGED


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["u", "v", "k", "aux"],
    meta_fields=["engine", "accel"],
)
@dataclasses.dataclass(frozen=True)
class ResumeState:
    """Checkpoint of a running solve (``SolveResult.state``).

    Carries the iterate pair plus everything the engines need for EXACT
    resume (r5; VERDICT r4 #2 — the r4 (u, v)-only checkpoints restarted
    the accel epoch each chunk, costing ~60% extra iterations on the
    chunked n=6144 dense solve):

    * ``u`` / ``v`` — the iterate pair (segment tuples on the pdhg
      engine, flat vectors on the direct engine);
    * ``k`` — the global iteration count, so restart-cadence rules
      (``beta_art * k``) see the uninterrupted clock; resumed solves
      still report per-call ``iters`` (= k_final - k);
    * ``aux`` — a dict of engine/accel epoch state (Halpern anchor +
      epoch counters, restart running averages, the direct engine's
      cached inverse / Cholesky factor / Sherman-Morrison border and CG
      warm start). An empty dict (e.g. a megakernel checkpoint, whose
      in-kernel epoch state is not exported) resumes with a fresh accel
      epoch — the documented r4 behavior.
    * ``engine`` / ``accel`` — static tags; resuming with a different
      engine raises (the iteration variables differ), a different accel
      falls back to a fresh epoch.

    The ``aux`` caches are keyed to the problem data: resume only with
    the exact (c, a, b) that produced the checkpoint (``solve(...,
    chunk_iters=N)`` guarantees this). Warm-starting a *changed* problem
    is what ``warm_start`` is for.
    """
    u: Any
    v: Any
    k: Any
    aux: Any
    engine: str = "pdhg"
    accel: str = ""


def _unpack_resume(resume_state, engine: str, accel: str):
    """(u0, v0, k0, aux) from a ResumeState or a legacy bare (u, v) tuple.

    ``aux`` is None when the checkpoint carries no usable epoch state for
    this engine/accel combination (legacy tuples, megakernel checkpoints,
    accel mismatch) — callers then resume with a fresh accel epoch.
    Engine mismatch raises: the two engines iterate different variables.
    """
    other = "direct" if engine == "pdhg" else "pdhg"
    if isinstance(resume_state, ResumeState):
        if resume_state.engine != engine:
            raise ValueError(
                f"resume_state was produced by the {resume_state.engine} "
                f"engine and cannot resume method='{engine}' (different "
                "iteration variables); resume with the same method/profile "
                "that produced it")
        aux = resume_state.aux if resume_state.accel == accel else None
        if aux is not None and len(aux) == 0:
            aux = None
        return (resume_state.u, resume_state.v,
                jnp.asarray(resume_state.k, jnp.int32), aux)
    u0, v0 = resume_state
    seg = isinstance(u0, tuple) and len(u0) == 4
    if seg != (engine == "pdhg"):
        raise ValueError(
            f"resume_state was produced by the {other} engine and cannot "
            f"resume method='{engine}' (different iteration variables); "
            "resume with the same method/profile that produced it")
    return u0, v0, jnp.asarray(0, jnp.int32), None


_tmap = jax.tree_util.tree_map


def _tree_sq_dist(a, b):
    """Sum of squared differences over two identically-structured PyTrees."""
    return sum(jnp.sum((x - y) ** 2)
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def _emb_apply(a_op: LinOp, c, b, u):
    """K_emb @ u for the segment tuple u = (ux (n,), uy (m,), us (m,), ut ()).

    Mirrors SelfDualEmbed::op (solver.rs:109-131). The iterate is carried
    as a tuple of segments — not one concatenated vector — so each segment
    can hold its own sharding on a device mesh (x replicated, y/s sharded
    with A's rows): with A row-sharded, A @ x needs no communication and
    A^T @ y is exactly one all-reduce of an (n,)-vector."""
    ux, uy, us, ut = u
    a_ux, at_uy = a_op.dual_matvec(ux, uy)
    vn = at_uy + c * ut
    vm = -a_ux - us + b * ut
    v1 = -_hidot(c, ux) - _hidot(b, uy)
    return (vn, vm, v1)


def _emb_rapply(a_op: LinOp, c, b, v):
    """K_emb^T @ v for the segment tuple v = (vn (n,), vm (m,), v1 ()).

    Mirrors SelfDualEmbed::trans_op (solver.rs:133-157)."""
    vn, vm, v1 = v
    a_vn, at_vm = a_op.dual_matvec(vn, vm)
    ux = -at_vm - c * v1
    uy = a_vn - b * v1
    us = -vm
    ut = _hidot(c, vn) + _hidot(b, vm)
    return (ux, uy, us, ut)


def _precond(a_op: LinOp, c, b, cone: ConeLayout, eps_zero):
    """Diagonal preconditioners as segment tuples:
    dp_tau = 1/colabssum(K_emb) = (x, y, s, tau) parts,
    dp_sigma = 1/rowabssum(K_emb) = (n, m, 1) parts, eps_zero-clamped,
    with per-cone-block min-grouping of the non-separable factors.

    Mirrors SelfDualEmbed::abssum + SolverCore::calc_precond
    (solver.rs:159-183, 496-524)."""
    m = b.shape[0]
    col_a = a_op.col_abssum()
    row_a = a_op.row_abssum()
    abs_c = jnp.abs(c)
    abs_b = jnp.abs(b)
    sum_cb = abs_c.sum() + abs_b.sum()

    def inv(x):
        return 1.0 / jnp.maximum(x, eps_zero)

    tau_x = col_a + abs_c
    tau_y = row_a + abs_b
    # cone-grouped min over the dual-cone and cone blocks (solver.rs:509-523)
    dp_tau = (inv(tau_x), cone.group_min(inv(tau_y)),
              cone.group_min(jnp.ones((m,), dtype=c.dtype)),
              inv(sum_cb))
    dp_sigma = (inv(tau_x), inv(tau_y + 1.0), inv(sum_cb))
    return dp_tau, dp_sigma


def _run_restarted(update, check, u0, v0, check_period, max_iter, param,
                   dtype, status0=None, crits0=None, k0=None, aux=None):
    """PDLP-style restarted-averaging outer loop (Applegate et al. 2021,
    "Practical Large-Scale Linear Programming using Primal-Dual Hybrid
    Gradient"; the scheme behind cuPDLP). No reference counterpart — the
    reference iterates plain PDHG (solver.rs:364-457).

    Runs the exact same ``update`` step, but maintains the running average
    of the epoch's iterates; every ``check_period`` steps it evaluates the
    termination criteria at both the current iterate and the average, takes
    the better of the two as the restart candidate, and restarts the epoch
    from the candidate when

    * sufficient decay: residual <= 0.2 x residual at last restart, or
    * necessary decay + no progress: residual <= 0.8 x restart residual
      but worse than the previous check, or
    * artificial: the epoch exceeds 36% of total iterations so far.

    Averages of PDHG iterates stay inside every cone block (convex sets),
    so the convergence and infeasibility criteria remain meaningful at the
    averaged point. Residual = max of the three relative KKT criteria.

    Cost note: each check evaluates the criteria at BOTH the current and
    the averaged iterate (4 extra operator applications per check vs the
    plain loop's 2) — that is the PDLP restart-candidate rule, and it is
    measured to not matter: TPU LP n=1000, fixed 4000 iterations
    (benchmarks/benchmark_accel.py, BASELINE.md "Acceleration overhead"),
    restart runs at 99% of the plain loop's iters/s at check_period=20
    and 100% at 100 — the check amortizes exactly as check_period
    intends.
    """
    beta_suff, beta_nec, beta_art = 0.2, 0.8, 0.36
    inf = jnp.asarray(jnp.inf, dtype=dtype)

    def cond(state):
        k, status = state[4], state[5]
        return (status == SolverStatus.RUNNING) & (k < max_iter)

    def body(state):
        u, v, su, sv, k, status, crits, ke, res_rst, res_last, _ru, _rv \
            = state

        def inner(_, c2):
            ui, vi, si, ti = c2
            ui, vi = update(0, (ui, vi))
            return (ui, vi, _tmap(jnp.add, si, ui), _tmap(jnp.add, ti, vi))

        u, v, su, sv = jax.lax.fori_loop(
            0, check_period, inner, (u, v, su, sv))
        k = k + check_period
        ke = ke + check_period
        ub = _tmap(lambda s: s / ke.astype(dtype), su)
        vb = _tmap(lambda s: s / ke.astype(dtype), sv)

        st_c, cr_c = check(u, v, k)
        st_a, cr_a = check(ub, vb, k)
        res_c = jnp.max(cr_c[:3])
        res_a = jnp.max(cr_a[:3])
        use_avg = res_a < res_c
        cand_u = _tmap(lambda a, b_: jnp.where(use_avg, a, b_), ub, u)
        cand_v = _tmap(lambda a, b_: jnp.where(use_avg, a, b_), vb, v)
        status = jnp.where(use_avg, st_a, st_c)
        crits = jnp.where(use_avg, cr_a, cr_c)
        res = jnp.minimum(res_a, res_c)

        restart = (res <= beta_suff * res_rst) \
            | ((res <= beta_nec * res_rst) & (res > res_last)) \
            | (ke >= jnp.maximum(
                beta_art * k.astype(dtype),
                jnp.asarray(4.0 * check_period, dtype=dtype)))
        take = restart | (status != SolverStatus.RUNNING)
        # the pair the loop would CONTINUE with if not done (exact-resume
        # carry; see the matching comment in _run_halpern)
        ru = _tmap(lambda a, b_: jnp.where(restart, a, b_), cand_u, u)
        rv = _tmap(lambda a, b_: jnp.where(restart, a, b_), cand_v, v)
        u = _tmap(lambda a, b_: jnp.where(take, a, b_), cand_u, u)
        v = _tmap(lambda a, b_: jnp.where(take, a, b_), cand_v, v)
        su = _tmap(lambda s: jnp.where(restart, jnp.zeros_like(s), s), su)
        sv = _tmap(lambda s: jnp.where(restart, jnp.zeros_like(s), s), sv)
        ke = jnp.where(restart, 0, ke)
        res_rst = jnp.where(restart, res, res_rst)
        if param.log_period > 0:
            jax.lax.cond(
                (k - check_period) % param.log_period < check_period,
                lambda: jax.debug.print(
                    "{k}: res {r:.2e} (restart={rs})", k=k, r=res,
                    rs=restart),
                lambda: None)
        return (u, v, su, sv, k, status, crits, ke, res_rst, res, ru, rv)

    if k0 is None:
        k0 = jnp.asarray(0, dtype=jnp.int32)
    if status0 is None:
        status0 = jnp.asarray(SolverStatus.RUNNING, dtype=jnp.int32)
    if crits0 is None:
        crits0 = jnp.full((5,), jnp.inf, dtype=dtype)
    ke0 = jnp.asarray(0, dtype=jnp.int32)
    if aux is not None:
        # exact resume: restore the epoch's running sums and counters so
        # the iterate path continues as if never interrupted
        state0 = (u0, v0, aux["su"], aux["sv"], k0, status0, crits0,
                  aux["ke"], aux["res_rst"], aux["res_last"], u0, v0)
    else:
        state0 = (u0, v0, _tmap(jnp.zeros_like, u0),
                  _tmap(jnp.zeros_like, v0), k0, status0, crits0, ke0,
                  inf, inf, u0, v0)
    out = jax.lax.while_loop(cond, body, state0)
    u, v, su, sv, k, status, crits, ke, res_rst, res_last, ru, rv = out
    aux_out = {"su": su, "sv": sv, "ke": ke, "res_rst": res_rst,
               "res_last": res_last, "ru": ru, "rv": rv}
    return u, v, k, status, crits, aux_out


def _run_halpern(update, check, u0, v0, check_period, max_iter, param,
                 dtype, status0=None, crits0=None, k0=None, aux=None):
    """Restarted reflected-Halpern PDHG (rHPDHG; Lu & Yang 2024, the scheme
    behind cuPDLP+). No reference counterpart.

    The PDHG step ``T`` (the exact reference update) is wrapped in the
    Halpern iteration with reflection,

        z_{k+1} = (k+1)/(k+2) * (2 T(z_k) - z_k) + 1/(k+2) * z_0,

    which achieves the optimal O(1/k) fixed-point-residual rate for
    nonexpansive T (PDHG's operator is averaged in the preconditioner
    norm, so its reflection is nonexpansive). The epoch restarts from the
    *projected* point T(z) when the fixed-point residual ||T(z) - z||
    decays sufficiently (x0.2), stalls after a necessary decay (x0.8), or
    the epoch exceeds 36% of total iterations. Because reflected iterates
    may leave the cones, termination is always evaluated at T(z), which is
    projected — so convergence/infeasibility certificates stay valid.
    """
    beta_suff, beta_nec, beta_art = 0.2, 0.8, 0.36
    inf = jnp.asarray(jnp.inf, dtype=dtype)

    def cond(state):
        k, status = state[4], state[5]
        return (status == SolverStatus.RUNNING) & (k < max_iter)

    def body(state):
        (u, v, au, av, k, status, crits, ke, fp_rst, fp_last,
         _ru, _rv) = state

        def inner(_, c2):
            ui, vi, kei = c2
            tu, tv = update(0, (ui, vi))
            w = (kei.astype(dtype) + 1.0) / (kei.astype(dtype) + 2.0)
            un = _tmap(lambda t, i, a: w * (2.0 * t - i) + (1.0 - w) * a,
                       tu, ui, au)
            vn = _tmap(lambda t, i, a: w * (2.0 * t - i) + (1.0 - w) * a,
                       tv, vi, av)
            return (un, vn, kei + 1)

        u, v, ke = jax.lax.fori_loop(
            0, check_period, inner, (u, v, ke))
        k = k + check_period

        tu, tv = update(0, (u, v))
        fp = jnp.sqrt(_tree_sq_dist(tu, u) + _tree_sq_dist(tv, v))
        status, crits = check(tu, tv, k)

        restart = (fp <= beta_suff * fp_rst) \
            | ((fp <= beta_nec * fp_rst) & (fp > fp_last)) \
            | (ke.astype(dtype) >= jnp.maximum(
                beta_art * k.astype(dtype),
                jnp.asarray(4.0 * check_period, dtype=dtype)))
        done = status != SolverStatus.RUNNING
        take = restart | done
        # the pair the loop would CONTINUE with if not done: the result
        # takes the projected T(z) on exit (criteria-consistent), but an
        # exact resume must restart from this raw carry — replacing it
        # with T(z) at a chunk seam measurably perturbs the path
        ru = _tmap(lambda a, b_: jnp.where(restart, a, b_), tu, u)
        rv = _tmap(lambda a, b_: jnp.where(restart, a, b_), tv, v)
        u = _tmap(lambda a, b_: jnp.where(take, a, b_), tu, u)
        v = _tmap(lambda a, b_: jnp.where(take, a, b_), tv, v)
        au = _tmap(lambda a, b_: jnp.where(restart, a, b_), tu, au)
        av = _tmap(lambda a, b_: jnp.where(restart, a, b_), tv, av)
        ke = jnp.where(restart, 0, ke)
        fp_rst = jnp.where(restart, fp, fp_rst)
        if param.log_period > 0:
            jax.lax.cond(
                (k - check_period) % param.log_period < check_period,
                lambda: jax.debug.print(
                    "{k}: fp_res {r:.2e} (restart={rs})", k=k, r=fp,
                    rs=restart),
                lambda: None)
        return (u, v, au, av, k, status, crits, ke, fp_rst, fp, ru, rv)

    if k0 is None:
        k0 = jnp.asarray(0, dtype=jnp.int32)
    if status0 is None:
        status0 = jnp.asarray(SolverStatus.RUNNING, dtype=jnp.int32)
    if crits0 is None:
        crits0 = jnp.full((5,), jnp.inf, dtype=dtype)
    ke0 = jnp.asarray(0, dtype=jnp.int32)
    if aux is not None:
        # exact resume: restore the Halpern anchor and epoch counters
        state0 = (u0, v0, aux["au"], aux["av"], k0, status0, crits0,
                  aux["ke"], aux["fp_rst"], aux["fp_last"], u0, v0)
    else:
        state0 = (u0, v0, u0, v0, k0, status0, crits0, ke0, inf, inf,
                  u0, v0)
    out = jax.lax.while_loop(cond, body, state0)
    u, v, au, av, k, status, crits, ke, fp_rst, fp_last, ru, rv = out
    aux_out = {"au": au, "av": av, "ke": ke, "fp_rst": fp_rst,
               "fp_last": fp_last, "ru": ru, "rv": rv}
    return u, v, k, status, crits, aux_out


def _resolve_fast_profile(param: SolverParam, a, cone: ConeLayout,
                          row_sharding=None) -> SolverParam:
    """Resolve ``profile='fast'`` into concrete parameter overrides.

    Fills in the measured-fastest setting for every knob still at its
    dataclass default; explicitly set fields win. See the
    ``SolverParam.profile`` docstring for the policy and BASELINE.md for
    the measurements behind it.

    ``row_sharding`` keeps the solve on the pdhg engine (the only one
    that honors mesh constraints): rewriting to method='direct' would
    silently drop the sharding (ADVICE r4).
    """
    a_op = as_linop(a)
    dense = isinstance(a_op, DenseOp)
    m, n = a_op.shape
    updates = {"profile": "reference"}
    if param.check_period == 1:
        updates["check_period"] = 20
    if param.kernel == "":
        updates["kernel"] = "auto"
    # measured (BASELINE.md megakernel A/B, r3): for small mega-eligible
    # f32 problems the Pallas whole-solve kernel + Halpern beats the
    # direct engine end-to-end (LP n=100: 52 vs 77 ms; n=256: 53 vs 68 ms;
    # by n=512 the direct engine's iteration advantage wins again, 73 vs
    # 92 ms; QP via RSOC blocks n=100: 31 vs 41 ms, n=200: 44 vs 50 ms,
    # but by n=250 direct already wins 34 vs 48 — PDHG iteration counts
    # grow much faster with n on the RSOC epigraph, so RSOC layouts use a
    # lower crossover) — those stay on the pdhg engine where
    # kernel='auto' engages the megakernel
    from totsu_tpu.solver.cone import RSOC as _RSOC, EXP as _EXP, \
        POW as _POW, PSD as _PSD
    # exp/pow layouts never take mega-first (r4 crossover, BASELINE
    # "Megakernel exp/pow"): the kernel beats the XLA loop 1.0-1.5x on
    # these layouts, but halpern-PDHG needs 800-2,200 iterations where
    # DR needs 260-580, so the direct engine wins time-to-solution at
    # every measured size (54-66 ms vs 61-80). kernel='auto' still
    # engages the kernel whenever the pdhg engine runs.
    if any(f.kind in (_EXP, _POW) for f in cone.factors):
        _mega_n_max = 0
    else:
        _mega_n_max = 200 if any(f.kind == _RSOC
                                 for f in cone.factors) else 300
    mega_first = False
    if dense and param.method == "pdhg" and param.matvec_dtype is None \
            and param.relax == 1.0 and n <= _mega_n_max \
            and param.log_period == 0:
        # log_period > 0 disables kernel='auto' (_mega_choice) — route
        # logged fast-profile solves to the direct engine, a measured
        # configuration, instead of the never-measured pdhg+halpern-XLA
        # fallback (VERDICT r3 weak #4)
        from totsu_tpu.ops.pallas import megakernel as _mk
        mega_first = (
            updates.get("kernel", param.kernel) in ("auto", "mega")
            and jnp.result_type(getattr(a_op.a, "dtype", jnp.float64))
            == jnp.float32
            and _mk.supported(cone) and _mk.fits(m, n, cone)
            and _exec_platform() == "tpu")
    # dense bound raised 1200 -> 4096 (r4) -> 8192 (r5) on measurement
    # (BASELINE "Dense direct-engine bound" + "Dense frontier (r5)"):
    # time-to-1e-3 on the benchmark-LP shape, direct dense-NS vs the
    # pdhg fast set — n=2000: 0.571 s vs 0.813; n=4000: 16.6 vs 39.9
    # (2.4x); n=6144 (chunked): 80 s vs 148 (equil) / 244 (plain);
    # n=8192 (chunked): direct 138 s CONVERGED vs pdhg capped at 120k
    # iterations unconverged, equil included — past ~6k the first-order
    # tail outgrows any practical budget and the direct engine is the
    # only finishing route. Beyond 8192 is unmeasured and stays on pdhg.
    # On hosts with a dispatch-duration limit (this dev tunnel kills
    # ~1.5-min dispatches, CLAUDE.md) large direct solves need
    # solve(chunk_iters=...) — the r5 checkpoint carries the cached
    # inverse, so chunking adds only dispatch overhead.
    if row_sharding is not None:
        # row-sharded solves stay on the pdhg engine, which pins the
        # mesh constraints; the direct engine would drop them silently
        # (ADVICE r4 medium)
        if param.accel == "" and param.relax == 1.0:
            updates["accel"] = "halpern"
        if param.normalize is None:
            updates["normalize"] = True
    elif dense and n <= 8192 and not mega_first and param.method == "pdhg" \
            and param.matvec_dtype is None and param.relax == 1.0:
        updates["method"] = "direct"
        if param.accel == "":
            updates["accel"] = "halpern"
    elif not dense and param.method == "pdhg" \
            and param.matvec_dtype is None and param.relax == 1.0 \
            and not any(f.kind == _PSD for f in cone.factors):
        # measured r4 (BASELINE "Indirect engine at n=8192"; VERDICT r3
        # #1): for STRUCTURED/matrix-free operators the indirect direct
        # engine (warm-started CG on I + A^T A) beats the pdhg fast path
        # at every measured scale — blocked-ELL banded n=8192 time-to-1e-3
        # 0.072 s (240 DR iters) vs 0.097 s (1,920 halpern-PDHG iters),
        # matrix-free stencil 0.079 vs 0.098 s, n=1024 0.057 vs 0.060 s;
        # net of the ~50 ms tunnel the device-time gap is ~2x. Ruiz
        # equilibration measurably HURT both engines on these well-scaled
        # instances (BASELINE equil rows), so the profile leaves
        # equil_iters alone for non-dense operators — set it explicitly
        # for badly scaled data. PSD layouts are excluded above: on the
        # structured partitioning SDP the ranking flips (k=48: pdhg 87 ms
        # / 460 iters vs direct 91 / 960; k=128: 642 / 1,480 vs 824 /
        # 3,540 — the projection dominates per-iteration cost and DR has
        # no iteration advantage on SDP geometry), so PSD keeps
        # pdhg+halpern below.
        updates["method"] = "direct"
        if param.accel == "":
            updates["accel"] = "halpern"
    else:
        if param.accel == "" and param.relax == 1.0:
            updates["accel"] = "halpern"
        if param.normalize is None:
            updates["normalize"] = True
        if dense and param.equil_iters is None:
            updates["equil_iters"] = 10
    return dataclasses.replace(param, **updates)


def solve_jit(
    c,
    a,
    b,
    cone: ConeLayout,
    param: SolverParam = SolverParam(),
    warm_start: Optional[Tuple[Any, Any]] = None,
    resume_state: Optional[Tuple[Any, Any]] = None,
    row_sharding=None,
) -> SolveResult:
    """Pure, jit-traceable conic solve. Never raises; returns a status code.

    Equivalent of Solver::solve + SolverCore::solve (solver.rs:285-457).
    Composable with ``jax.jit`` / ``jax.vmap`` (batched instances) /
    ``pjit`` meshes (sharded operators). ``cone`` and ``param`` are static.

    * ``c``: (n,) objective vector
    * ``a``: (m, n) array or :class:`LinOp`
    * ``b``: (m,) right-hand side
    * ``warm_start``: optional (x0, y0) primal/dual seed (first-order methods
      restart well; the reference keeps state in the caller's work slice but
      never exposes this — SURVEY.md section 5 checkpoint/resume).
    * ``row_sharding``: optional ``NamedSharding`` over the constraint-row
      axis m. When given, the iterate's y/s/vm segments are pinned to it
      with ``with_sharding_constraint`` (x/tau replicated), so a row-sharded
      A runs the update with exactly one (n,)-all-reduce per A^T apply and
      no communication on the A apply. Use :func:`shard_dense_problem` to
      place the data; verified by tests/test_parallel.py's HLO
      collective-count test.
    """
    # resolve psd(method='auto') factors BEFORE fast-profile expansion —
    # the policy reads the original profile/eps_acc (cone.py docstring)
    cone = resolve_auto_methods(cone, param)
    if param.profile == "fast":
        param = _resolve_fast_profile(param, a, cone, row_sharding)
    elif param.profile != "reference":
        raise ValueError(f"unknown profile {param.profile!r}")
    if param.method == "direct":
        from totsu_tpu.solver.direct import solve_direct_jit
        if param.matvec_dtype is not None:
            raise ValueError("matvec_dtype is a pdhg-engine feature")
        if row_sharding is not None:
            # loud, not silent (ADVICE r4): the direct engine does not
            # pin mesh constraints, so the sharding would be dropped
            raise ValueError(
                "method='direct' does not honor row_sharding (mesh "
                "constraints are a pdhg-engine feature); use "
                "method='pdhg', or drop the sharding")
        return solve_direct_jit(c, a, b, cone, param, warm_start=warm_start,
                                resume_state=resume_state)
    if param.method != "pdhg":
        raise ValueError(f"unknown method {param.method!r}")
    a_op = as_linop(a)
    c = jnp.asarray(c)
    b = jnp.asarray(b)
    dtype = jnp.result_type(c.dtype, b.dtype)
    c = c.astype(dtype)
    b = b.astype(dtype)
    if isinstance(a_op, DenseOp) and a_op.a.dtype != dtype:
        # pin A to the iterate dtype (the direct engine already does):
        # a stray-f64 A under enable_x64 otherwise promotes half the
        # loop carry and trips an opaque while_loop dtype error
        a_op = type(a_op)(a_op.a.astype(dtype))

    equil_d = equil_e = None
    if param.equil_iters is not None and param.equil_iters > 0:
        # operator-form Ruiz (VERDICT r2 #3): works for any LinOp with
        # row_absmax/col_absmax/diag_scale (dense, blocked-ELL, stacked,
        # diag, ...); raises NotImplementedError for matrix-free CustomOp
        from totsu_tpu.solver.scaling import ruiz_equilibrate_op
        if isinstance(a_op, DenseOp):
            a_op = type(a_op)(a_op.a.astype(dtype))
        a_op, b, c, equil_d, equil_e = ruiz_equilibrate_op(
            a_op, b, c, cone, iters=param.equil_iters)
    if _PALLAS_AUTO and type(a_op) is DenseOp \
            and jax.devices()[0].platform == "tpu":
        a_op = PallasDenseOp(a_op.a)
    # Mixed-precision update path (SolverParam.matvec_dtype): the update
    # loop streams a low-precision copy of A (HBM-bound -> ~2x on large
    # problems) while the criteria/preconditioner below keep the exact A,
    # so certificates remain certificates. No reference counterpart (the
    # reference is single-dtype per backend, f32 on CUDA / f64 on LAPACK).
    mv_op = a_op
    precond_op = a_op
    if param.matvec_dtype is not None:
        # any LinOp with astype() (dense, blocked-ELL, stacked, diag, ...)
        mv_op = a_op.astype(jnp.dtype(param.matvec_dtype))
        # the Pock-Chambolle bound tau_j sigma_i ||K||^2 <= 1 must hold for
        # the matrix actually ITERATED: rounding can inflate |a_ij| by up
        # to 2^-9 relative, so build the preconditioner from the
        # rounded-then-widened A (the abs-sum reductions fuse the widening;
        # no persistent copy). Criteria below still use the exact A.
        precond_op = mv_op.astype(dtype)
    n = c.shape[0]
    m = b.shape[0]
    if cone.dim != m:
        raise ValueError(f"cone dim {cone.dim} != m {m}")
    if a_op.shape != (m, n):
        raise ValueError(f"operator shape {a_op.shape} != ({m}, {n})")

    eps_zero = dtype.type(param.eps_zero) if hasattr(dtype, "type") else param.eps_zero
    eps_acc = param.eps_acc
    eps_inf = effective_eps_inf(param, dtype)
    max_iter = param.bounded_max_iter
    check_period = max(1, param.check_period)

    # One-time norms (SolverCore::calc_norms, solver.rs:460-481; for the
    # vector operators b and c the Frobenius probe reduces to the 2-norm).
    norm_b = jnp.linalg.norm(b)
    norm_c = jnp.linalg.norm(c)

    # b/c norm normalization (SolverParam.normalize): the UPDATE loop
    # iterates on b/||b||, c/||c||, which balances the homogenizing tau row
    # of K_emb against the data rows; criteria / certificates / solution
    # below stay in the un-normalized space (iterates are unscaled inside
    # ``check``), so statuses certify the original problem.
    do_norm = bool(param.normalize) if param.normalize is not None else False
    if do_norm:
        # skip the scaling when the norm is negligible (b = 0 or c = 0
        # problems, e.g. pure feasibility): dividing by eps_zero would blow
        # the seed/solution up by 1e12 — normalization is simply a no-op
        # on that vector instead (the SCS convention)
        sb = jnp.where(norm_b > eps_zero, norm_b, 1.0)
        sc = jnp.where(norm_c > eps_zero, norm_c, 1.0)
        b_it = b / sb
        c_it = c / sc
    else:
        sb = sc = None
        b_it, c_it = b, c

    dp_tau, dp_sigma = _precond(precond_op, c_it, b_it, cone, eps_zero)

    # optional mesh pinning of the row-axis segments (see docstring)
    if row_sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        _rep = NamedSharding(row_sharding.mesh, PartitionSpec())

        def pin_row(x):
            return jax.lax.with_sharding_constraint(x, row_sharding)

        def pin_rep(x):
            return jax.lax.with_sharding_constraint(x, _rep)

        dp_tau = (pin_rep(dp_tau[0]), pin_row(dp_tau[1]),
                  pin_row(dp_tau[2]), dp_tau[3])
        dp_sigma = (pin_rep(dp_sigma[0]), pin_row(dp_sigma[1]), dp_sigma[2])
    else:
        def pin_row(x):
            return x

        def pin_rep(x):
            return x

    # init (SolverCore::init_vecs, solver.rs:483-494): u = 0 except tau = 1.
    # The iterate is a segment tuple u = (x, y, s, tau), v = (vn, vm, kappa)
    # so each segment keeps its own mesh sharding (VERDICT r1 #3).
    u0 = (pin_rep(jnp.zeros((n,), dtype=dtype)),
          pin_row(jnp.zeros((m,), dtype=dtype)),
          pin_row(jnp.zeros((m,), dtype=dtype)),
          jnp.asarray(1.0, dtype=dtype))
    v0 = (pin_rep(jnp.zeros((n,), dtype=dtype)),
          pin_row(jnp.zeros((m,), dtype=dtype)),
          jnp.asarray(0.0, dtype=dtype))
    k_start = jnp.asarray(0, dtype=jnp.int32)
    resume_aux = None
    taken_u0, taken_v0 = u0, v0
    if resume_state is not None:
        u0, v0, k_start, resume_aux = _unpack_resume(
            resume_state, "pdhg", param.accel)
        taken_u0, taken_v0 = u0, v0
        need = {
            "halpern": {"au", "av", "ke", "fp_rst", "fp_last", "ru", "rv"},
            "restart": {"su", "sv", "ke", "res_rst", "res_last", "ru",
                        "rv"},
        }.get(param.accel, set())
        if resume_aux is not None and not need <= set(resume_aux):
            # e.g. a megakernel checkpoint (empty aux) resumed on the XLA
            # engine: no epoch state to restore — fresh epoch
            resume_aux = None
        if resume_aux is not None and "ru" in resume_aux:
            # the raw pre-projection carry, not the T(z) result point —
            # this is what the uninterrupted loop would have continued
            # on. TERMINAL checkpoints are the exception: their loop
            # exits immediately, so the seed IS the presented solution —
            # it must stay the checkpointed taken pair (state.u/state.v,
            # the point the saved criteria describe), not the raw
            # reflected carry (r5 review: reseeding a CONVERGED lane
            # from ru/rv drifted its solution 7e-8 while reporting the
            # checkpoint's bit-identical criteria). Per-lane select so
            # vmapped batches mix terminal and running lanes.
            saved_st = resume_aux.get("status")
            if saved_st is None:
                u0, v0 = resume_aux["ru"], resume_aux["rv"]
            else:
                term = jnp.logical_and(
                    saved_st != SolverStatus.EXCESS_ITER,
                    saved_st != SolverStatus.RUNNING)
                u0 = _tmap(lambda tk, raw: jnp.where(term, tk, raw),
                           u0, resume_aux["ru"])
                v0 = _tmap(lambda tk, raw: jnp.where(term, tk, raw),
                           v0, resume_aux["rv"])
    elif warm_start is not None:
        ws_x, ws_y = warm_start
        ux0, uy0 = u0[0], u0[1]
        if ws_x is not None:
            ws_x = jnp.asarray(ws_x, dtype=dtype)
            if equil_e is not None:
                ws_x = ws_x / equil_e
            if do_norm:
                ws_x = ws_x / sb
            ux0 = pin_rep(ws_x)
        if ws_y is not None:
            ws_y = jnp.asarray(ws_y, dtype=dtype)
            if equil_d is not None:
                ws_y = ws_y / equil_d
            if do_norm:
                ws_y = ws_y / sc
            # keep the seed inside K* (identity for a dual-feasible y)
            uy0 = pin_row(cone.project(ws_y, dual=True))
        # Seed the slack block s = Pi_K(b - A x0) as well (tau = 1 space).
        # With it, a warm start at the exact solution makes u0 an exact
        # fixed point of the PDHG map with v0 = 0: K_emb u* = 0 so the v
        # update is a no-op, and the cone projections leave u* unchanged.
        # Without it (round-1 bug) the seed was far from any fixed point
        # and the Halpern anchor z0 = (u0, v0) actively hurt: 13,320 warm
        # iterations vs 8,800 cold on the regression instance.
        s_seed = pin_row(cone.project(b_it - a_op.matvec(ux0), dual=False))
        u0 = (ux0, uy0, s_seed, u0[3])

    relax = float(param.relax)
    if param.accel == "halpern" and relax != 1.0:
        # same guardrail as the direct engine: the Halpern scheme reflects
        # the map (2T - I), which is only nonexpansive for the unrelaxed
        # (averaged) PDHG step
        raise ValueError("accel='halpern' requires relax=1.0")

    # ---- Pallas whole-solve megakernel dispatch (SolverParam.kernel) ----
    use_mega, mega_interpret = _mega_choice(
        param, a_op, cone, dtype, row_sharding)
    if use_mega:
        from totsu_tpu.ops.pallas import megakernel as _mk
        if resume_aux is not None and "ru" in resume_aux:
            # an XLA accel checkpoint resumed on the megakernel: seed
            # from the TAKEN pair, not the raw reflected carry — mega
            # restarts the epoch anyway (no exported in-kernel state)
            # and its check_at_start would otherwise evaluate
            # certificates at a point possibly outside the cones (the
            # same spurious-UNBOUNDED mechanism the XLA path guards
            # against at chunk seams).
            u0, v0 = taken_u0, taken_v0
        u, v, k, status, crits = _mk.solve_mega(
            a_op.a, c_it, b_it, c, b, dp_tau, dp_sigma, u0, v0, cone,
            eps_acc=eps_acc, eps_inf=eps_inf,
            eps_zero=float(param.eps_zero), max_iter=max_iter,
            check_period=check_period, relax=relax, accel=param.accel,
            sb=sb if do_norm else None, sc=sc if do_norm else None,
            check_at_start=(warm_start is not None
                            or resume_state is not None),
            interpret=mega_interpret)
        # mega counts per-call; its in-kernel epoch state is not exported,
        # so the checkpoint carries an empty aux (resume = fresh epoch)
        return _finish(u, v, k_start + k, k_start, status, crits, None,
                       param, eps_zero, do_norm, sb, sc, equil_d, equil_e)

    # global-iteration cap: on resume the loop continues from k_start and
    # max_iter bounds the iterations of THIS call (chunk semantics)
    cap = k_start + max_iter

    def update(_, carry):
        """One Pock-Chambolle step (SolverCore::update_vecs solver.rs:526-571),
        optionally over-relaxed (param.relax != 1)."""
        u_old, v_old = carry
        r = _emb_rapply(mv_op, c_it, b_it, v_old)
        # proj: dual cone on the y block, primal cone on the s block,
        # tau >= 0 — the x block is NOT projected
        ux = pin_rep(u_old[0] - dp_tau[0] * r[0])
        uy = pin_row(cone.project(u_old[1] - dp_tau[1] * r[1], dual=True))
        us = pin_row(cone.project(u_old[2] - dp_tau[2] * r[2], dual=False))
        ut = jnp.maximum(u_old[3] - dp_tau[3] * r[3], 0.0)
        u = (ux, uy, us, ut)
        ru = _tmap(lambda o, nn: o - 2.0 * nn, u_old, u)
        kv = _emb_apply(mv_op, c_it, b_it, ru)
        vn = pin_rep(v_old[0] - dp_sigma[0] * kv[0])
        vm = pin_row(v_old[1] - dp_sigma[1] * kv[1])
        # proj onto F* cone: kappa <= 0 ... kappa := min(kappa, 0)
        v1 = jnp.minimum(v_old[2] - dp_sigma[2] * kv[2], 0.0)
        v = (vn, vm, v1)
        if relax != 1.0:
            u = _tmap(lambda o, nn: o + relax * (nn - o), u_old, u)
            v = _tmap(lambda o, nn: o + relax * (nn - o), v_old, v)
        return (u, v)

    inf = jnp.asarray(jnp.inf, dtype=dtype)

    def check(u, _v, k):
        """Termination criteria (criteria_conv solver.rs:573-612 and
        criteria_inf solver.rs:614-656 share their operator applications).
        Evaluated on the UN-normalized data: iterates are scaled back by
        (sb, sc) first, so statuses certify the original problem."""
        ux, uy_, us, val_tau = u
        if do_norm:
            ux, uy_, us = ux * sb, uy_ * sc, us * sb
        ax, aty = a_op.dual_matvec(ux, uy_)
        cx = _hidot(c, ux)
        by = _hidot(b, uy_)

        tau_pos = val_tau > eps_zero
        inv_tau = 1.0 / jnp.where(tau_pos, val_tau, 1.0)

        # -- convergence (SCS-style relative residuals)
        p = ax * inv_tau + us * inv_tau - b
        d = c + aty * inv_tau
        g_x = cx * inv_tau
        g_y = by * inv_tau
        g = g_x + g_y
        cri_pri = jnp.linalg.norm(p) / (1.0 + norm_b)
        cri_dual = jnp.linalg.norm(d) / (1.0 + norm_c)
        cri_gap = jnp.abs(g) / (1.0 + jnp.abs(g_x) + jnp.abs(g_y))
        conv = tau_pos & (cri_pri <= eps_acc) & (cri_dual <= eps_acc) \
            & (cri_gap <= eps_acc)

        # -- unboundedness / infeasibility certificates
        p_inf = ax + us
        d_inf = aty
        m_cx = -cx
        m_by = -by
        cri_unbdd = jnp.where(
            m_cx > eps_zero, jnp.linalg.norm(p_inf) * norm_c / m_cx, inf)
        cri_infeas = jnp.where(
            m_by > eps_zero, jnp.linalg.norm(d_inf) * norm_b / m_by, inf)
        unbdd = (~tau_pos) & (cri_unbdd <= eps_inf)
        infeas = (~tau_pos) & (cri_infeas <= eps_inf)

        excess = k >= cap
        status = jnp.where(
            conv, SolverStatus.CONVERGED,
            jnp.where(unbdd, SolverStatus.UNBOUNDED,
                      jnp.where(infeas, SolverStatus.INFEASIBLE,
                                jnp.where(excess, SolverStatus.EXCESS_ITER,
                                          SolverStatus.RUNNING))))
        crits = jnp.stack([cri_pri, cri_dual, cri_gap, cri_unbdd, cri_infeas])
        return status.astype(jnp.int32), crits

    def cond(state):
        _, _, k, status, _ = state
        return (status == SolverStatus.RUNNING) & (k < cap)

    def body(state):
        u, v, k, status, crits = state
        u, v = jax.lax.fori_loop(0, check_period, update, (u, v))
        k = k + check_period
        status, crits = check(u, v, k)
        if param.log_period > 0:
            jax.lax.cond(
                (k - check_period) % param.log_period < check_period,
                lambda: jax.debug.print(
                    "{k}: pri_dual_gap {p:.2e} {d:.2e} {g:.2e} "
                    "unbdd_infeas {ub:.2e} {inf:.2e}",
                    k=k, p=crits[0], d=crits[1], g=crits[2],
                    ub=crits[3], inf=crits[4]),
                lambda: None)
        return (u, v, k, status, crits)

    if resume_aux is not None and "crits" in resume_aux:
        # exact resume: restore the checkpointed criteria and status
        # (EXCESS_ITER becomes RUNNING — that is what resuming means; a
        # CONVERGED/UNBOUNDED/INFEASIBLE checkpoint stays terminal, so
        # already-finished lanes of a chunked BATCH stop immediately).
        # Re-evaluating the check at the seed would be WRONG for the
        # accel wrappers — a Halpern checkpoint's iterate is the raw
        # REFLECTED point (possibly outside the cones), where the
        # certificate ratios are meaningless (observed: a chunked
        # feasible LP spuriously certified UNBOUNDED at a chunk seam).
        saved = resume_aux.get("status")
        if saved is not None:
            status0 = jnp.where(
                saved == SolverStatus.EXCESS_ITER,
                SolverStatus.RUNNING, saved).astype(jnp.int32)
        else:
            status0 = jnp.asarray(SolverStatus.RUNNING, dtype=jnp.int32)
        crits0 = resume_aux["crits"]
    elif warm_start is not None or resume_state is not None:
        # evaluate the criteria on the seed itself: an already-converged
        # warm start (e.g. re-solving an unchanged problem) terminates at
        # 0 iterations instead of orbiting the seed. Cold starts skip this
        # (preserves the reference iterate-path/count parity exactly).
        status0, crits0 = check(u0, v0, k_start)
    else:
        status0 = jnp.asarray(SolverStatus.RUNNING, dtype=jnp.int32)
        crits0 = jnp.full((5,), jnp.inf, dtype=dtype)
    if param.accel == "restart":
        u, v, k, status, crits, aux = _run_restarted(
            update, check, u0, v0, check_period, cap, param, dtype,
            status0=status0, crits0=crits0, k0=k_start, aux=resume_aux)
    elif param.accel == "halpern":
        u, v, k, status, crits, aux = _run_halpern(
            update, check, u0, v0, check_period, cap, param, dtype,
            status0=status0, crits0=crits0, k0=k_start, aux=resume_aux)
    elif param.accel:
        raise ValueError(f"unknown accel {param.accel!r}")
    else:
        u, v, k, status, crits = jax.lax.while_loop(
            cond, body, (u0, v0, k_start, status0, crits0))
        aux = {}

    return _finish(u, v, k, k_start, status, crits, aux, param, eps_zero,
                   do_norm, sb, sc, equil_d, equil_e)


def _finish(u, v, k, k_start, status, crits, aux, param, eps_zero, do_norm,
            sb, sc, equil_d, equil_e) -> SolveResult:
    """Shared solve epilogue: scale the solution by 1/tau on the
    tau > eps_zero exit path (solver.rs:398-400; certificates are returned
    unscaled, 432-435), undo normalization/equilibration, pack the result.

    ``aux`` None means "no exportable epoch state" (megakernel): the
    checkpoint then resumes with a fresh accel epoch. Otherwise the last
    criteria ride along so a resumed solve restores them instead of
    re-evaluating the check at a possibly-reflected seed."""
    if aux is not None:
        aux = {**aux, "crits": crits, "status": status}
    else:
        aux = {}
    val_tau = u[3]
    scale = jnp.where(val_tau > eps_zero, 1.0 / jnp.where(
        val_tau > eps_zero, val_tau, 1.0), 1.0)
    sol_x = u[0] * scale
    sol_y = u[1] * scale
    if do_norm:
        # undo the b/c normalization: x = sb x', y = sc y'
        sol_x = sol_x * sb
        sol_y = sol_y * sc
    if equil_e is not None:
        # undo the data scaling: x = E x', y = D y'
        sol_x = sol_x * equil_e
        sol_y = sol_y * equil_d

    return SolveResult(
        x=sol_x, y=sol_y, status=status, iters=k - k_start,
        cri_pri=crits[0], cri_dual=crits[1], cri_gap=crits[2],
        cri_unbdd=crits[3], cri_infeas=crits[4],
        state=ResumeState(u=u, v=v, k=k, aux=aux, engine="pdhg",
                          accel=param.accel)
        if param.return_state else None)


def _exec_platform() -> str:
    """Platform the jitted solve will actually run on: the pinned default
    device wins (this host's TPU plugin ignores JAX_PLATFORMS, so tests pin
    CPU via jax_default_device — CLAUDE.md), else the first device."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform
    return jax.devices()[0].platform


def _mega_choice(param, a_op, cone, dtype, row_sharding):
    """Resolve SolverParam.kernel to (use_mega, interpret).

    'mega' forces the Pallas path (interpret mode off-TPU, so tests run it
    on CPU); 'auto' engages it only on a real TPU inside the supported +
    measured-win envelope. '' keeps the XLA loop."""
    if param.kernel not in ("", "auto", "mega"):
        raise ValueError(f"unknown kernel {param.kernel!r}")
    if param.kernel == "":
        return False, False
    from totsu_tpu.ops.pallas import megakernel as _mk
    m, n = a_op.shape
    ok = (type(a_op) is DenseOp and dtype == jnp.float32
          and row_sharding is None and param.matvec_dtype is None
          and param.accel in ("", "halpern") and _mk.supported(cone)
          and _mk.fits(m, n, cone))
    if param.kernel == "mega":
        if not ok:
            raise ValueError(
                "kernel='mega' requires a dense f32 A fitting VMEM "
                f"({_mk.VMEM_BUDGET_BYTES >> 20} MB), zero/R+/SOC/RSOC/"
                "exp/pow cones, accel in ('', 'halpern'), no "
                "matvec_dtype/row_sharding")
        return True, _exec_platform() != "tpu"
    # 'auto': TPU only; envelope = supported & fits (measured-win region —
    # see BASELINE.md megakernel A/B; refined there as measurements land)
    if ok and _exec_platform() == "tpu" and param.log_period != 0:
        # loud, not silent (VERDICT r3 weak #4): losing the kernel here
        # costs the measured 1.9-3.3x; _resolve_fast_profile knows this
        # rule and routes logged fast-profile solves to the direct engine
        import warnings
        warnings.warn(
            "kernel='auto': progress logging (log_period > 0) disables "
            "the Pallas megakernel (in-kernel printing is unsupported); "
            "set log_period=0 to re-enable the measured 1.9-3.3x, or "
            "kernel='' to silence this warning.",
            RuntimeWarning, stacklevel=3)
        return False, False
    return ok and _exec_platform() == "tpu", False


def solve_sequence(problems, param: SolverParam = SolverParam(),
                   warm_start=None):
    """Solve a sequence of same-shaped problems, warm-starting each from
    the previous solution (parametric sweeps, model-predictive control,
    homotopy continuation). ``problems`` yields (c, a, b, cone) tuples or
    ConicProblems; returns the list of SolveResults.

    First-order methods gain the most here: for slowly varying data the
    warm-started solve typically needs a small fraction of the cold
    iteration count (see tests/test_solver.py::test_warm_start...).
    """
    results = []
    ws = warm_start
    for prob in problems:
        if hasattr(prob, "cone"):
            c, a, b, cone = prob.c, prob.a, prob.b, prob.cone
        else:
            c, a, b, cone = prob
        res = solve(c, a, b, cone, param, warm_start=ws)
        results.append(res)
        ws = (res.x, res.y)
    return results


@functools.lru_cache(maxsize=64)
def _jitted_solver(cone: ConeLayout, param: SolverParam, has_warm: bool,
                   row_sharding=None):
    if has_warm:
        return jax.jit(lambda c, a, b, w: solve_jit(
            c, a, b, cone, param, warm_start=w, row_sharding=row_sharding))
    return jax.jit(lambda c, a, b: solve_jit(
        c, a, b, cone, param, row_sharding=row_sharding))


def solve(
    c,
    a,
    b,
    cone: ConeLayout,
    param: SolverParam = SolverParam(),
    warm_start: Optional[Tuple[Any, Any]] = None,
    row_sharding=None,
    polish: bool = False,
    chunk_iters: Optional[int] = None,
) -> SolveResult:
    """Host-facing solve: jit-compiled (cached per cone layout / params),
    raises :class:`SolverError` on non-convergence like the reference's
    ``Result`` (solver.rs:285-322). Use :func:`solve_jit` for the pure
    never-raising version (vmap / pjit / custom jit).

    ``polish=True`` runs a host-side f64 active-set KKT refinement on the
    converged solution (solver/polish.py; zero/rpos/SOC/RSOC/PSD cones —
    so the qp()/qcqp() epigraph reductions polish too — the device solve
    delivers eps_acc, the polish recovers ~machine precision from it;
    exp/pow layouts warn and return unpolished; structured LinOps are
    densified under a size guard, oversize ones raise) and returns the
    refined x/y with the criteria fields updated.

    ``chunk_iters=N`` runs the solve as a sequence of N-iteration
    dispatches stitched with exact ``resume_state`` checkpoints
    (``param.max_iter`` caps the total exactly; the tail chunk is
    shortened to fit). Use when a single dispatch would exceed an
    execution-time limit of the transport — e.g. this dev host's tunnel
    kills dispatches past ~2 minutes of device time (CLAUDE.md;
    BASELINE "n >= 6144 dense": the chunked n=6144 direct solve
    converges where the single dispatch cannot run). Chunked solves are
    EXACT for both XLA engines including the accel wrappers (the
    checkpoint carries the Halpern/restart epoch state and the direct
    engine's cached inverse — r5; the r4 per-chunk epoch restart cost
    ~60% extra iterations); megakernel chunks restart the accel epoch
    (in-kernel state is not exported)."""
    a_op = as_linop(a)
    param = _maybe_auto_equil(param, a_op, row_sharding)
    if chunk_iters is not None:
        return _solve_chunked(c, a_op, b, cone, param, warm_start,
                              row_sharding, polish, int(chunk_iters))
    fn = _jitted_solver(cone, param, warm_start is not None, row_sharding)
    if warm_start is not None:
        result = fn(jnp.asarray(c), a_op, jnp.asarray(b), warm_start)
    else:
        result = fn(jnp.asarray(c), a_op, jnp.asarray(b))
    _warn_cg_truncation(result)
    status = int(result.status)
    if status != SolverStatus.CONVERGED:
        raise SolverError(status)
    if polish:
        result = _apply_polish(result, c, a, b, cone, param)
    return result


#: Auto-equilibration threshold on :func:`scaling_spread` (the column
#: 2-norm spread). Calibrated anchors (BASELINE "Ill-scaled indirect
#: A/B" + scaling.py): every well-scaled instance class probes at
#: 1.1-2.9 — where Ruiz measurably HURTS (the r2 equil rows) — while
#: the ill-scaled family (where equilibration is the ONLY converging
#: configuration at span 1e4) probes at 24-172. 10 splits the regimes
#: with >= 3x margin on both sides.
_AUTO_EQUIL_SPREAD = 10.0


def _maybe_auto_equil(param: SolverParam, a_op, row_sharding):
    """Host-side, data-driven leg of the fast profile (r5): switch on
    Ruiz equilibration for badly scaled STRUCTURED operators. The
    trace-time :func:`_resolve_fast_profile` cannot see data, so this
    runs only in the host-facing :func:`solve` / chunked path, costing
    one fused probe dispatch + one scalar fetch per call. Fires only
    when every condition holds: ``profile='fast'``, ``equil_iters``
    UNSET (``None`` — an explicit value always wins, including the
    0 opt-out), unsharded, non-dense operator (the dense route's
    direct engine does exact linear solves — scaling there is
    unmeasured and the measured dense default already lives in the
    profile), and the operator supports the absmax/diag_scale trio
    Ruiz needs plus the col_sqsum the probe reads (SparseOp gained
    them in r5 and IS eligible; bare CustomOp is not; composite
    stacks delegate to their children, so a CustomOp wrapped in a
    VStackOp surfaces NotImplementedError from inside the probe —
    caught below, policy skipped)."""
    if (param.profile != "fast" or param.equil_iters is not None
            or row_sharding is not None):
        return param
    from totsu_tpu.solver.operator import DenseOp, LinOp
    if isinstance(a_op, DenseOp) or not isinstance(a_op, LinOp):
        return param
    t = type(a_op)
    if (t.diag_scale is LinOp.diag_scale
            or t.row_absmax is LinOp.row_absmax
            or t.col_absmax is LinOp.col_absmax
            or t.col_sqsum is LinOp.col_sqsum):
        return param
    spread = getattr(a_op, "_spread_memo", None)
    if spread is None:
        from totsu_tpu.solver.scaling import scaling_spread
        try:
            spread = scaling_spread(a_op)
        except NotImplementedError:
            # a child of a composite stack lacks the trio (e.g.
            # VStackOp((CustomOp, DiagOp, ...)) — the top-level class
            # check cannot see it); Ruiz could not run either, so the
            # policy stands down. NaN memo: compares False below.
            spread = float("nan")
        # memo per operator INSTANCE (best-effort: pytree round trips
        # rebuild the object and drop it) so warm-start sequences /
        # MPC loops reusing one operator pay the probe dispatch once
        object.__setattr__(a_op, "_spread_memo", spread)
    if spread > _AUTO_EQUIL_SPREAD:
        return dataclasses.replace(param, equil_iters=10)
    return param


def _warn_cg_truncation(result):
    """Surface indirect-engine CG truncation (VERDICT r4 #5): when the
    max_cg cap cut resolvent solves far short of their tolerance, the DR
    iteration ran on inexact resolvents — say so instead of silently
    absorbing the error into extra (or non-) convergence."""
    d = result.diag
    if d is None or "cg_worst_rel" not in d:
        return
    worst = float(d["cg_worst_rel"])
    tol = float(d["cg_tol"])
    if worst > 10.0 * tol:
        import warnings
        warnings.warn(
            "indirect engine: CG resolvent solves hit the iteration cap "
            f"(worst relative residual {worst:.1e} vs target {tol:.1e}) "
            "— the solve ran on inexact resolvents. For badly scaled "
            "data set equil_iters=10 (Ruiz; profile='fast' switches it "
            "on automatically when the data's column-norm spread "
            "exceeds 10); cg_precond='jacobi' is already the default for "
            "operators that support col_sqsum.",
            RuntimeWarning, stacklevel=3)


def _apply_polish(result, c, a, b, cone, param) -> SolveResult:
    """Host-side f64 active-set refinement of a converged result, with the
    criteria — INCLUDING the certificate fields — recomputed at the
    polished point (VERDICT r3 weak #7: mixing two iterates in one result
    is not allowed). Same formulas as the in-loop check
    (solver.rs:614-656) at the tau = 1 solution, where s = b - Ax so
    p_inf = b exactly."""
    from totsu_tpu.solver.polish import polish as _polish
    import numpy as _np
    pr = _polish(result, c, as_linop(a), jnp.asarray(b), cone)
    if not pr.polished:
        return result
    cn = _np.asarray(c, dtype=_np.float64)
    bn = _np.asarray(b, dtype=_np.float64)
    gx, gy = float(cn @ pr.x), float(bn @ pr.y)
    aty_p = _np.asarray(as_linop(a).rmatvec(jnp.asarray(pr.y)),
                        dtype=_np.float64)
    nb_, nc_ = _np.linalg.norm(bn), _np.linalg.norm(cn)
    m_cx, m_by = -gx, -gy
    cri_unbdd = (float(nb_ * nc_ / m_cx)
                 if m_cx > param.eps_zero else _np.inf)
    cri_infeas = (float(_np.linalg.norm(aty_p) * nb_ / m_by)
                  if m_by > param.eps_zero else _np.inf)
    return dataclasses.replace(
        result, x=jnp.asarray(pr.x), y=jnp.asarray(pr.y),
        cri_pri=jnp.asarray(pr.pri_res / (1.0 + nb_)),
        cri_dual=jnp.asarray(pr.dual_res / (1.0 + nc_)),
        cri_gap=jnp.asarray(abs(gx + gy) / (1.0 + abs(gx) + abs(gy))),
        cri_unbdd=jnp.asarray(cri_unbdd),
        cri_infeas=jnp.asarray(cri_infeas))


@functools.lru_cache(maxsize=64)
def _jitted_chunk_solver(cone: ConeLayout, param: SolverParam,
                         with_resume: bool, has_warm: bool,
                         row_sharding=None):
    if with_resume:
        return jax.jit(lambda c, a, b, st: solve_jit(
            c, a, b, cone, param, resume_state=st,
            row_sharding=row_sharding))
    if has_warm:
        return jax.jit(lambda c, a, b, w: solve_jit(
            c, a, b, cone, param, warm_start=w, row_sharding=row_sharding))
    return jax.jit(lambda c, a, b: solve_jit(
        c, a, b, cone, param, row_sharding=row_sharding))


def _solve_chunked(c, a, b, cone, param, warm_start, row_sharding, polish,
                   chunk_iters):
    """solve(..., chunk_iters=N): N-iteration dispatches stitched with
    exact resume_state checkpoints (see the solve() docstring).

    ``param.max_iter`` caps the total exactly: the final chunk is sized
    ``min(chunk_iters, cap - total)`` (one extra compile for an uneven
    tail — ADVICE r4)."""
    if chunk_iters <= 0:
        raise ValueError(f"chunk_iters must be positive, got {chunk_iters}")
    cap = param.bounded_max_iter
    p_chunk = dataclasses.replace(param, max_iter=min(chunk_iters, cap),
                                  return_state=True)
    cj, aj, bj = jnp.asarray(c), as_linop(a), jnp.asarray(b)
    fn0 = _jitted_chunk_solver(cone, p_chunk, False, warm_start is not None,
                               row_sharding)
    res = (fn0(cj, aj, bj, warm_start) if warm_start is not None
           else fn0(cj, aj, bj))
    total = int(res.iters)
    while int(res.status) == SolverStatus.EXCESS_ITER and total < cap:
        p_i = dataclasses.replace(p_chunk,
                                  max_iter=min(chunk_iters, cap - total))
        fn = _jitted_chunk_solver(cone, p_i, True, False, row_sharding)
        res = fn(cj, aj, bj, res.state)
        total += int(res.iters)
    _warn_cg_truncation(res)
    status = int(res.status)
    if status == SolverStatus.EXCESS_ITER or (
            status == SolverStatus.RUNNING):
        raise SolverError(SolverStatus.EXCESS_ITER)
    if status != SolverStatus.CONVERGED:
        raise SolverError(status)
    res = dataclasses.replace(
        res, iters=jnp.asarray(total, jnp.int32),
        state=res.state if param.return_state else None)
    if polish:
        res = _apply_polish(res, c, a, b, cone, param)
    return res
