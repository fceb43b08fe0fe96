"""Geometric program -> conic form (exponential cones).

**Beyond the reference surface** (Totsu's problem layer stops at
LP/QP/QCQP/SOCP/SDP; docs/PARITY.md "beyond" section): with the
exponential cone available (``cones.expc``), geometric programs reduce
cleanly to conic form. A GP in posynomial form is

    minimize    f_0(x)
    subject to  f_i(x) <= 1,  i = 1..p,       x > 0,
    where f(x) = sum_k c_k * prod_j x_j^(A_kj),   c_k > 0.

The standard log-change of variables y = log x makes every posynomial a
log-sum-exp: log f = lse_k(A_k y + log c_k), and the GP becomes the convex
program  min t  s.t. lse_0 <= t, lse_i <= 0. Each log-sum-exp epigraph
``lse_k(z) <= t`` is exactly

    sum_k u_k <= 1,   (z_k - t, 1, u_k) in K_exp   (e^{z_k - t} <= u_k),

i.e. one exp-cone block per monomial plus one R+ row per posynomial —
the same reduction CVXPY/ECOS/SCS use for GPs.

Conic variables: z = [y (n) | t (1) | u (total monomials)]; slack
convention s = b - A z in K (ref solver.rs conic form).
"""

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from totsu_tpu.problems.base import ConicProblem
from totsu_tpu.solver import cone as cones
from totsu_tpu.solver.operator import DenseOp


def gp(term_c: Sequence, term_a: Sequence,
       eq_c: Optional[Sequence] = None,
       eq_a: Optional[Sequence] = None) -> Tuple[ConicProblem, dict]:
    """Build the conic form of a geometric program.

    * ``term_c``: list (one per posynomial, entry 0 = objective) of
      positive coefficient vectors ``c_k``;
    * ``term_a``: matching list of exponent matrices, each ``(K_i, n)``;
    * ``eq_c`` / ``eq_a``: optional monomial *equalities* g(x) = 1
      (coefficient scalar + exponent row each) — affine in y:
      ``a^T y + log c = 0``.

    Returns ``(ConicProblem, meta)``; after ``res = prob.solve(...)``,
    recover the positive solution with ``x = np.exp(res.x[:n])`` and the
    optimal value with ``np.exp(res.x[meta['t']])``.
    """
    term_c = [np.asarray(ci, dtype=float) for ci in term_c]
    term_a = [np.asarray(ai, dtype=float) for ai in term_a]
    if len(term_c) != len(term_a):
        raise ValueError("term_c and term_a must pair up per posynomial")
    n = term_a[0].shape[1]
    for ci, ai in zip(term_c, term_a):
        if (ci <= 0).any():
            raise ValueError("posynomial coefficients must be positive")
        if ai.shape[0] != ci.shape[0]:
            raise ValueError("coefficients/exponent-rows count mismatch")
        if ai.shape[1] != n:
            raise ValueError(
                f"exponent matrix has {ai.shape[1]} columns, expected {n}")
    n_pos = len(term_c)
    ks = [ci.shape[0] for ci in term_c]
    n_u = sum(ks)
    nv = n + 1 + n_u            # y | t | u
    it = n                      # epigraph variable index
    iu0 = n + 1

    rows: List[np.ndarray] = []
    bs: List[float] = []

    def row(coeffs, bval):
        r = np.zeros(nv)
        for idx, v in coeffs:
            r[idx] = v
        rows.append(r)
        bs.append(float(bval))

    # ---- zero cone: monomial equalities a^T y = -log c
    eq_c = [] if eq_c is None else list(eq_c)
    eq_a = [] if eq_a is None else [np.asarray(a, dtype=float) for a in eq_a]
    if len(eq_c) != len(eq_a):
        raise ValueError("eq_c and eq_a must pair up per monomial equality")
    for cv, av in zip(eq_c, eq_a):
        if av.shape != (n,):
            raise ValueError(
                f"equality exponent row has shape {av.shape}, expected ({n},)")
        if float(cv) <= 0:
            raise ValueError("monomial coefficients must be positive")
        row([(j, float(av[j])) for j in range(n)], -np.log(float(cv)))

    # ---- rpos: one budget row per posynomial, 1 - sum_k u_k >= 0
    off = iu0
    for i, k in enumerate(ks):
        row([(off + j, 1.0) for j in range(k)], 1.0)
        off += k

    # ---- exp cones: (A_k y + log c_k [- t for the objective], 1, u_k)
    off = iu0
    for i, (ci, ai) in enumerate(zip(term_c, term_a)):
        for k in range(ci.shape[0]):
            coeffs = [(j, -float(ai[k, j])) for j in range(n)]
            if i == 0:
                coeffs.append((it, 1.0))     # s1 = A_k y - t + log c_k
            row(coeffs, np.log(float(ci[k])))
            row([], 1.0)                     # s2 = 1
            row([(off + k, -1.0)], 0.0)      # s3 = u_k
        off += ci.shape[0]

    c_obj = np.zeros(nv)
    c_obj[it] = 1.0                          # minimize t = log f_0(x)
    layout = cones.ConeLayout([
        cones.zero(len(eq_c)), cones.rpos(n_pos),
        cones.expc(count=n_u)])
    prob = ConicProblem(c=jnp.asarray(c_obj), a=DenseOp(jnp.asarray(rows)),
                        b=jnp.asarray(np.asarray(bs)), cone=layout)
    return prob, {"n": n, "t": it, "u0": iu0}
