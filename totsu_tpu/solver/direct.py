"""Direct (ADMM / SCS-style) solve of the homogeneous self-dual embedding.

The reference iterates the HSDE with the matrix-free Pock-Chambolle method
(totsu_core solver.rs; our conic.py — ``method='pdhg'``). This module adds
the O'Donoghue et al. (SCS) ADMM splitting of the *same* embedding, which
trades a one-time dense factorization for iteration counts that are
typically two to three orders of magnitude smaller:

    u~  <- (I + Q)^{-1} (u + v)            (cached linear solve)
    u   <- Pi_C(u~ - v)                    (cone projection)
    v   <- v - u~ + u

with Q = [[0, A^T, c], [-A, 0, b], [-c^T, -b^T, 0]] and
C = R^n x K* x R+ over the variable u = (x, y, tau).

The linear solve reduces to a cached SPD n x n inverse via block
elimination + Sherman-Morrison on the (c, b) border:

    M = [[I, A^T], [-A, I]],   h = (c, b)
    M z = r  <=>  (I + A^T A) z1 = r1 - A^T r2,  z2 = r2 + A z1
    (I+Q) solve = M-solve + rank-1 correction with g = M^{-1} h

Per iteration: one (n x n) GEMV with the cached inverse + two A GEMVs +
projections — the same memory-bound profile as the PDHG path, executed on
the MXU/VPU, but converging in hundreds of iterations. This is a
capability the reference does not have; termination uses the reference's
exact criteria (solver.rs:573-656) so statuses are comparable.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from totsu_tpu.solver.cone import ConeLayout
from totsu_tpu.solver.operator import DenseOp, as_linop
from totsu_tpu.solver.params import SolverParam, SolverStatus
from totsu_tpu.solver.conic import SolveResult


def solve_direct_jit(
    c,
    a,
    b,
    cone: ConeLayout,
    param: SolverParam = SolverParam(),
    warm_start: Optional[Tuple[Any, Any]] = None,
) -> SolveResult:
    """Pure, jit-traceable direct-method solve (dense operators only)."""
    a_op = as_linop(a)
    if not isinstance(a_op, DenseOp):
        raise ValueError("the direct method requires a dense operator")
    c = jnp.asarray(c)
    b = jnp.asarray(b)
    dtype = jnp.result_type(c.dtype, b.dtype)
    c = c.astype(dtype)
    b = b.astype(dtype)
    amat = a_op.a.astype(dtype)
    n = c.shape[0]
    m = b.shape[0]
    if cone.dim != m:
        raise ValueError(f"cone dim {cone.dim} != m {m}")

    equil_d = equil_e = None
    if param.equil_iters > 0:
        from totsu_tpu.solver.scaling import ruiz_equilibrate
        amat, b, c, equil_d, equil_e = ruiz_equilibrate(
            amat, b, c, cone, iters=param.equil_iters)

    eps_zero = param.eps_zero
    eps_acc = param.eps_acc
    eps_inf = param.eps_inf
    max_iter = param.bounded_max_iter
    check_period = max(1, param.check_period)
    if param.accel == "halpern":
        # the reflection 2T - I is nonexpansive for the UNRELAXED DR map
        # (firmly nonexpansive); over-relaxation would break the Halpern
        # convergence guarantee
        if param.relax != 1.0:
            raise ValueError("accel='halpern' requires relax=1.0")
        relax = 1.0
    elif param.accel:
        raise ValueError(
            f"accel {param.accel!r} is not supported by the direct engine"
            " ('halpern' is)")
    else:
        relax = float(param.relax) if param.relax != 1.0 else 1.5
        # (SCS defaults to over-relaxation ~1.5; relax=1.0 in params means
        # "default", which for this method is 1.5.)

    norm_b = jnp.linalg.norm(b)
    norm_c = jnp.linalg.norm(c)

    # b/c norm normalization (SolverParam.normalize; default ON for this
    # engine): iterate on b/||b||, c/||c||; criteria / certificates /
    # solution below are evaluated on the un-normalized data. Measured on
    # the benchmark LP contract (n=100, eps 1e-3): 18040 -> 780 iterations
    # for plain DR, 260-560 with accel='halpern' (BASELINE.md).
    do_norm = bool(param.normalize) if param.normalize is not None else True
    if do_norm:
        sb = jnp.maximum(norm_b, eps_zero)
        sc = jnp.maximum(norm_c, eps_zero)
        b_it, c_it = b / sb, c / sc
    else:
        sb = sc = None
        b_it, c_it = b, c

    # cached solve pieces. In f32 the explicit inverse of (I + A^T A)
    # (condition ~ sigma_max(A)^2) is not accurate enough for the ADMM
    # fixed point — one step of iterative refinement per solve restores it
    # (costs one extra n^2 GEMV + two A GEMVs).
    prec = jnp.linalg.inv(jnp.eye(n, dtype=dtype) + amat.T @ amat)
    refine_steps = 1 if dtype == jnp.float32 else 0

    def spd_solve(rhs):
        z = prec @ rhs
        for _ in range(refine_steps):
            resid = rhs - z - amat.T @ (amat @ z)
            z = z + prec @ resid
        return z

    def m_solve(r1, r2):
        z1 = spd_solve(r1 - amat.T @ r2)
        z2 = r2 + amat @ z1
        return z1, z2

    g1, g2 = m_solve(c_it, b_it)
    gh = jnp.concatenate([g1, g2])
    h = jnp.concatenate([c_it, b_it])
    denom = 1.0 + jnp.dot(h, gh)

    def iq_solve(w):
        # solve (I + Q) z = w, z = (z1 (n), z2 (m), ztau (1))
        w1 = w[:n + m]
        wtau = w[-1]
        rhs = w1 - wtau * h
        t1, t2 = m_solve(rhs[:n], rhs[n:])
        t = jnp.concatenate([t1, t2])
        z = t - gh * (jnp.dot(h, t) / denom)
        ztau = wtau + jnp.dot(h, z)
        return jnp.concatenate([z, ztau[None]])

    def proj_c(w):
        # Pi_C with C = R^n x K* x R+
        wy = cone.project(w[n:n + m], dual=True)
        wtau = jnp.maximum(w[-1], 0.0)
        return jnp.concatenate([w[:n], wy, wtau[None]])

    nm1 = n + m + 1
    u0 = jnp.zeros((nm1,), dtype=dtype).at[-1].set(1.0)
    v0 = jnp.zeros((nm1,), dtype=dtype).at[-1].set(1.0)
    if warm_start is not None:
        ws_x, ws_y = warm_start
        if ws_x is not None:
            ws_x = jnp.asarray(ws_x, dtype=dtype)
            if equil_e is not None:
                ws_x = ws_x / equil_e
            if do_norm:
                ws_x = ws_x / sb
            u0 = u0.at[:n].set(ws_x)
        if ws_y is not None:
            ws_y = jnp.asarray(ws_y, dtype=dtype)
            if equil_d is not None:
                ws_y = ws_y / equil_d
            if do_norm:
                ws_y = ws_y / sc
            u0 = u0.at[n:n + m].set(ws_y)

    def update(_, carry):
        u, v = carry
        ut = iq_solve(u + v)
        ut = u + relax * (ut - u)      # over-relaxation on the affine step
        u_new = proj_c(ut - v)
        v_new = v - ut + u_new
        return (u_new, v_new)

    inf = jnp.asarray(jnp.inf, dtype=dtype)

    def check(u, v, k):
        """Reference termination criteria (solver.rs:573-656) with
        x = u.x, y = u.y, tau = u.tau, s = v.y (the slack lives in the
        dual residual block of v), kappa = v.tau. Evaluated on the
        UN-normalized data (iterates scaled back by sb/sc first)."""
        ux, uy_, val_tau = u[:n], u[n:n + m], u[-1]
        us = v[n:n + m]
        if do_norm:
            ux, uy_, us = ux * sb, uy_ * sc, us * sb
        ax = amat @ ux
        aty = uy_ @ amat
        cx = jnp.dot(c, ux)
        by = jnp.dot(b, uy_)

        tau_pos = val_tau > eps_zero
        inv_tau = 1.0 / jnp.where(tau_pos, val_tau, 1.0)
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

        excess = k >= max_iter
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
        return (status == SolverStatus.RUNNING) & (k < max_iter)

    def body(state):
        u, v, k, status, crits = state
        u, v = jax.lax.fori_loop(0, check_period, update, (u, v))
        k = k + check_period
        status, crits = check(u, v, k)
        return (u, v, k, status, crits)

    k0 = jnp.asarray(0, dtype=jnp.int32)
    status0 = jnp.asarray(SolverStatus.RUNNING, dtype=jnp.int32)
    crits0 = jnp.full((5,), jnp.inf, dtype=dtype)
    if param.accel == "halpern":
        from totsu_tpu.solver.conic import _run_halpern
        u, v, k, status, crits = _run_halpern(
            update, check, u0, v0, check_period, max_iter, param, dtype)
    else:
        u, v, k, status, crits = jax.lax.while_loop(
            cond, body, (u0, v0, k0, status0, crits0))

    val_tau = u[-1]
    tau_pos = val_tau > eps_zero
    scale = jnp.where(tau_pos, 1.0 / jnp.where(tau_pos, val_tau, 1.0), 1.0)
    sol_x = u[:n] * scale
    sol_y = u[n:n + m] * scale
    if do_norm:
        # undo the b/c normalization: x = sb x', y = sc y'
        sol_x = sol_x * sb
        sol_y = sol_y * sc
    if equil_e is not None:
        sol_x = sol_x * equil_e
        sol_y = sol_y * equil_d

    return SolveResult(
        x=sol_x, y=sol_y, status=status, iters=k,
        cri_pri=crits[0], cri_dual=crits[1], cri_gap=crits[2],
        cri_unbdd=crits[3], cri_infeas=crits[4])
