"""Solution polishing: active-set refinement of a converged solve.

First-order engines deliver eps_acc-accurate solutions; in f32 (the TPU
datatype) that is ~1e-3. Polishing recovers near-machine-precision f64
solutions from them by solving the KKT system restricted to the active
set — the standard SCS "solution polish" trick. No reference counterpart.

Reachable from the host facade as ``tt.solve(..., polish=True)`` (the
pure ``solve_jit`` stays polish-free: this step is host-side f64 numpy
by design — it is O(one lstsq) after the device solve and wants f64).

Supported factors: zero / rpos (classic LP active sets), SOC and PSD.
An SOC block is handled by its three solution regimes:

* slack interior (y = 0)      -> inactive, contributes nothing;
* slack = 0 (y interior)      -> all rows active as equalities;
* both on the boundary        -> slack and dual are anti-proportional
  (s = a(1, w), y = b(1, -w), ||w|| = 1): fix the direction from the
  current dual estimate and impose the linearized activity
  y_hat'(b_blk - A_blk x) = 0 (one equality), restricting the polished
  dual to the ray R+ y_hat.

A PSD block uses eigenspace active-face refinement (VERDICT r2 #9): at
the optimum S Y = 0, so range(Y) spans the active face. With U the
eigenvectors of the dual estimate mat(Y) above tolerance, impose
``U' mat(S) U = 0`` — one linear equality in x per active pair
(i <= j), row = vec_scaled(sym(u_i u_j')) . A_blk (exact: the scaled-vec
convention makes the packed dot the Frobenius inner product) — and
restrict the polished dual to the face, Y = U Gamma U' with Gamma
eigen-clipped to PSD after the fit.

Exp / pow / custom factors cannot be polished; ``solve(polish=True)``
then warns (never a silent no-op) and returns ``polished=False``.
"""

import dataclasses
import warnings
from typing import Optional

import numpy as np

from totsu_tpu.solver.cone import ConeLayout, ZERO, RPOS, SOC, PSD
from totsu_tpu.solver.conic import SolveResult


@dataclasses.dataclass
class PolishResult:
    x: np.ndarray
    y: np.ndarray
    polished: bool           # False -> inputs returned unchanged
    pri_res: float           # ||primal violation|| after
    dual_res: float          # ||c + A' y|| after
    obj: float


def _soc_viol(blk):
    """Distance-to-cone proxy for an SOC block (t, v): max(||v|| - t, 0)."""
    t, v = blk[0], blk[1:]
    return max(float(np.linalg.norm(v)) - float(t), 0.0)


def _supported(cone: ConeLayout) -> bool:
    return all(f.kind in (ZERO, RPOS, SOC, PSD) for f in cone.factors)


def _psd_k(dim: int) -> int:
    """Matrix order from packed length dim = k(k+1)/2."""
    return int(round((np.sqrt(8.0 * dim + 1.0) - 1.0) / 2.0))


def _unpack_np(v, k):
    """Scaled-vec packed (col-major upper triangle) -> dense sym, f64."""
    m = np.zeros((k, k))
    off = 0
    for j in range(k):
        for i in range(j + 1):
            val = v[off]
            if i != j:
                val = val / np.sqrt(2.0)
                m[i, j] = m[j, i] = val
            else:
                m[i, i] = val
            off += 1
    return m


def _pack_np(m):
    """Dense symmetric -> scaled-vec packed, f64."""
    k = m.shape[0]
    out = np.zeros(k * (k + 1) // 2)
    off = 0
    for j in range(k):
        for i in range(j + 1):
            out[off] = m[i, j] * (1.0 if i == j else np.sqrt(2.0))
            off += 1
    return out


def polish(res: SolveResult, c, a, b, cone: ConeLayout,
           active_tol: Optional[float] = None) -> PolishResult:
    """Refine ``res`` (host-side, f64). Accepts the polished point only if
    it improves the worst KKT residual; otherwise returns the original."""
    c = np.asarray(c, dtype=np.float64)
    a = np.asarray(a.a if hasattr(a, "a") else a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    x = np.asarray(res.x, dtype=np.float64)
    y = np.asarray(res.y, dtype=np.float64)
    m, n = a.shape

    def residuals(xx, yy):
        slack = b - a @ xx
        viol = np.zeros(m)
        off = 0
        for f in cone.factors:
            for _ in range(f.count):
                seg = slice(off, off + f.dim)
                if f.kind == ZERO:
                    viol[seg] = slack[seg]
                elif f.kind == RPOS:
                    viol[seg] = np.minimum(slack[seg], 0.0)
                elif f.kind == SOC:
                    viol[off] = _soc_viol(slack[seg])
                elif f.kind == PSD:
                    k = _psd_k(f.dim)
                    wmin = float(np.linalg.eigvalsh(
                        _unpack_np(slack[seg], k))[0])
                    viol[off] = max(-wmin, 0.0)
                off += f.dim
        pri = float(np.linalg.norm(viol))
        dual = float(np.linalg.norm(c + a.T @ yy))
        return pri, dual

    pri0, dual0 = residuals(x, y)
    base = PolishResult(x=x, y=y, polished=False, pri_res=pri0,
                        dual_res=dual0, obj=float(c @ x))
    if not _supported(cone) or m == 0:
        if not _supported(cone):
            bad = sorted({f.kind for f in cone.factors
                          if f.kind not in (ZERO, RPOS, SOC, PSD)})
            # loud no-op (VERDICT r2 #9): the caller asked for refinement
            # it cannot have; polished=False alone is too easy to miss
            warnings.warn(
                f"polish does not support cone factors {bad}; returning "
                "the unpolished solution (polished=False)",
                RuntimeWarning, stacklevel=2)
        return base

    # Active-set identification at eps_acc accuracy is fuzzy: a single
    # tolerance routinely misses a constraint of the optimal basis (then
    # the restricted lstsq returns a non-vertex minimum-norm point and the
    # candidate is rejected). Try a small tolerance ladder plus the
    # SCS-style magnitude rule (active iff y_i > slack_i) and keep the
    # best accepted candidate.
    slack = b - a @ x
    if active_tol is not None:
        tol_grid = [active_tol]
    else:
        t0 = 10.0 * max(pri0, 1e-9)
        tol_grid = [0.1 * t0, t0, 10.0 * t0, None]  # None = y > slack rule

    best = base
    for tol in tol_grid:
        cand = _polish_once(c, a, b, cone, x, y, slack, tol, residuals, m)
        if cand is not None and max(cand.pri_res, cand.dual_res) < \
                max(best.pri_res, best.dual_res):
            best = cand
    # re-linearization passes: SOC directions and PSD active faces are
    # estimated from the CURRENT dual, so one pass only reaches the
    # accuracy of that estimate; re-running from the polished point
    # converges the face like a Newton step (quadratic — 2 extra passes
    # reach f64 roundoff from an eps_acc ~ 1e-3 start)
    for _ in range(2):
        if not best.polished:
            break
        slack_b = b - a @ best.x
        improved = False
        for tol in tol_grid:
            cand = _polish_once(c, a, b, cone, best.x, best.y, slack_b,
                                tol, residuals, m)
            if cand is not None and max(cand.pri_res, cand.dual_res) < \
                    max(best.pri_res, best.dual_res):
                best = cand
                improved = True
        if not improved:
            break
    return best


def _polish_once(c, a, b, cone, x, y, slack, active_tol, residuals, m):
    """One active-set guess -> polished candidate (or None)."""

    def rpos_active(i):
        if active_tol is None:
            return y[i] > abs(slack[i])
        return abs(slack[i]) <= active_tol or y[i] >= active_tol

    def blk_tol():
        return 1e-9 if active_tol is None else active_tol

    # primal active rows (equalities for the lstsq) and the dual basis:
    # y = B @ gamma with one column per free scalar / per SOC ray
    prim_rows = []       # list of (row_vector over x, rhs)
    basis_cols = []      # columns of B (length m)
    ray_cols = []        # indices into gamma that must stay >= 0 (rays)
    rpos_rows = []       # y indices to clip at 0 after the fit
    psd_blocks = []      # (seg, U, [gamma col indices]) for the PSD clip

    off = 0
    for f in cone.factors:
        for _ in range(f.count):
            seg = slice(off, off + f.dim)
            if f.kind == ZERO:
                for i in range(off, off + f.dim):
                    prim_rows.append(i)
                    e = np.zeros(m)
                    e[i] = 1.0
                    basis_cols.append(e)
            elif f.kind == RPOS:
                for i in range(off, off + f.dim):
                    if rpos_active(i):
                        prim_rows.append(i)
                        e = np.zeros(m)
                        e[i] = 1.0
                        basis_cols.append(e)
                        rpos_rows.append(len(basis_cols) - 1)
            elif f.kind == SOC:
                s_blk = slack[seg]
                y_blk = y[seg]
                ny = float(np.linalg.norm(y_blk))
                ns = float(np.linalg.norm(s_blk))
                if ny <= blk_tol() or (active_tol is None and ny <= ns):
                    pass                       # inactive block
                elif ns <= blk_tol():
                    # slack pinned at 0: all rows equalities, dual free
                    for i in range(off, off + f.dim):
                        prim_rows.append(i)
                        e = np.zeros(m)
                        e[i] = 1.0
                        basis_cols.append(e)
                else:
                    # boundary: one linearized equality + dual on the ray
                    d = y_blk / ny
                    prim_rows.append(("soc", seg, d))
                    col = np.zeros(m)
                    col[seg] = d
                    basis_cols.append(col)
                    ray_cols.append(len(basis_cols) - 1)
            elif f.kind == PSD:
                # eigenspace active face from the complementarity gap
                # W = mat(Y) - mat(S): positive eigendirections are active
                # (the matrix form of the rpos "y_i > slack_i" rule). W
                # moves with the polished x, so the re-linearization
                # passes converge the face — identifying from Y alone is
                # self-reproducing (Y_p is built exactly rank-r on U) and
                # stalls at the first estimate's accuracy.
                k = _psd_k(f.dim)
                wmat = _unpack_np(y[seg], k) - _unpack_np(slack[seg], k)
                wy, q = np.linalg.eigh(wmat)
                act = wy > 0.0
                r = int(np.sum(act))
                if r > 0:
                    u = q[:, act]                      # (k, r)
                    cols_here = []
                    for jj in range(r):
                        for ii in range(jj + 1):
                            mt = np.outer(u[:, ii], u[:, jj])
                            d = _pack_np(0.5 * (mt + mt.T))
                            prim_rows.append(("soc", seg, d))
                            col = np.zeros(m)
                            col[seg] = d
                            basis_cols.append(col)
                            cols_here.append(len(basis_cols) - 1)
                    psd_blocks.append((seg, u, cols_here))
            off += f.dim

    if not basis_cols:
        return None

    # assemble the primal equality system
    rows = []
    rhs = []
    for r in prim_rows:
        if isinstance(r, tuple):
            _, seg, d = r
            rows.append(d @ a[seg])
            rhs.append(float(d @ b[seg]))
        else:
            rows.append(a[r])
            rhs.append(float(b[r]))
    a_act = np.asarray(rows)
    b_act = np.asarray(rhs)

    x_p, *_ = np.linalg.lstsq(a_act, b_act, rcond=None)

    bmat = np.stack(basis_cols, axis=1)        # (m, K)
    gam, *_ = np.linalg.lstsq(a.T @ bmat, -c, rcond=None)
    for k in rpos_rows:
        gam[k] = max(gam[k], 0.0)
    for k in ray_cols:
        gam[k] = max(gam[k], 0.0)
    y_p = bmat @ gam
    # PSD blocks: rebuild Gamma on the active face from the fitted
    # coefficients (basis sym(u_i u_j') has Frobenius dot 1/2 off-face-
    # diagonal), clip it to PSD, re-project the dual onto the face
    for seg, u, cols_here in psd_blocks:
        r = u.shape[1]
        gmat = np.zeros((r, r))
        idx = 0
        for jj in range(r):
            for ii in range(jj + 1):
                gval = gam[cols_here[idx]]
                if ii == jj:
                    gmat[ii, ii] = gval
                else:
                    gmat[ii, jj] = gmat[jj, ii] = 0.5 * gval
                idx += 1
        wg, qg = np.linalg.eigh(gmat)
        gpsd = (qg * np.maximum(wg, 0.0)) @ qg.T
        y_p[seg] = _pack_np(u @ gpsd @ u.T)

    pri1, dual1 = residuals(x_p, y_p)
    return PolishResult(x=x_p, y=y_p, polished=True, pri_res=pri1,
                        dual_res=dual1, obj=float(c @ x_p))
