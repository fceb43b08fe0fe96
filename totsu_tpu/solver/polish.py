"""Solution polishing: active-set refinement of a converged solve.

First-order engines deliver eps_acc-accurate solutions; in f32 (the TPU
datatype) that is ~1e-3. Polishing recovers near-machine-precision f64
solutions from them by solving the KKT system restricted to the active
constraints — the standard SCS "solution polish" trick. No reference
counterpart.

Currently supports layouts whose factors are all zero/rpos (LP-shaped
cones, which is also where active sets are well-defined); other cones
return the input unchanged.
"""

import dataclasses
from typing import Optional

import numpy as np

from totsu_tpu.solver.cone import ConeLayout, ZERO, RPOS
from totsu_tpu.solver.conic import SolveResult


@dataclasses.dataclass
class PolishResult:
    x: np.ndarray
    y: np.ndarray
    polished: bool           # False -> inputs returned unchanged
    pri_res: float           # ||A x + s - b|| after (s = clip residual)
    dual_res: float          # ||c + A' y|| after
    obj: float


def _is_lp_layout(cone: ConeLayout) -> bool:
    return all(f.kind in (ZERO, RPOS) for f in cone.factors)


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
        # primal violation: equality rows need slack 0; rpos rows slack >= 0
        viol = np.zeros(m)
        off = 0
        for f in cone.factors:
            seg = slice(off, off + f.total)
            if f.kind == ZERO:
                viol[seg] = slack[seg]
            else:
                viol[seg] = np.minimum(slack[seg], 0.0)
            off += f.total
        pri = float(np.linalg.norm(viol))
        dual = float(np.linalg.norm(c + a.T @ yy))
        return pri, dual

    pri0, dual0 = residuals(x, y)
    base = PolishResult(x=x, y=y, polished=False, pri_res=pri0,
                        dual_res=dual0, obj=float(c @ x))
    if not _is_lp_layout(cone) or m == 0:
        return base

    if active_tol is None:
        active_tol = 10.0 * max(pri0, 1e-9)
    slack = b - a @ x
    active = np.zeros(m, dtype=bool)
    off = 0
    for f in cone.factors:
        seg = slice(off, off + f.total)
        if f.kind == ZERO:
            active[seg] = True
        else:
            active[seg] = (np.abs(slack[seg]) <= active_tol) \
                | (y[seg] >= active_tol)
        off += f.total
    a_act = a[active]
    b_act = b[active]
    if a_act.shape[0] == 0:
        return base

    x_p, *_ = np.linalg.lstsq(a_act, b_act, rcond=None)
    y_act, *_ = np.linalg.lstsq(a_act.T, -c, rcond=None)
    y_p = np.zeros(m)
    y_p[active] = y_act
    # dual feasibility for rpos rows: y >= 0 — clip, then re-fit x is not
    # needed (clipping only relaxes inactive guesses)
    off = 0
    for f in cone.factors:
        seg = slice(off, off + f.total)
        if f.kind == RPOS:
            y_p[seg] = np.maximum(y_p[seg], 0.0)
        off += f.total

    pri1, dual1 = residuals(x_p, y_p)
    if max(pri1, dual1) < max(pri0, dual0):
        return PolishResult(x=x_p, y=y_p, polished=True, pri_res=pri1,
                            dual_res=dual1, obj=float(c @ x_p))
    return base
