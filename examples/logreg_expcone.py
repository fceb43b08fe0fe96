"""L1-regularized logistic regression via exponential cones.

    minimize_w  sum_i log(1 + exp(-y_i x_i^T w)) + lam ||w||_1

Each softplus epigraph ``log(1 + e^z) <= t`` is exactly two exp-cone
memberships plus one budget row:

    e^{z-t} <= u,   e^{-t} <= v,   u + v <= 1

i.e. ``(z - t, 1, u) in K_exp``, ``(-t, 1, v) in K_exp`` — the standard
conic reduction of the logistic loss (as in CVXPY/ECOS). The L1 term uses
the usual |w_j| <= a_j split into two R+ rows.

**No reference counterpart** (needs the exponential cone;
docs/PARITY.md "beyond" section). Self-check: scipy SLSQP on the smooth
bound-constrained equivalent (min loss + lam sum a, -a <= w <= a).
"""

import time

import numpy as np

from _common import setup, report


def build(x, y, lam):
    """Conic data for the logistic problem. Variables
    z = [w (n) | t (m) | u (m) | v (m) | a (n)]."""
    import totsu_tpu as tt

    m, n = x.shape
    iw = lambda j: j
    it = lambda i: n + i
    iu = lambda i: n + m + i
    iv = lambda i: n + 2 * m + i
    ia = lambda j: n + 3 * m + j
    nv = 2 * n + 3 * m

    rows, bs = [], []

    def row(coeffs, bval):
        r = np.zeros(nv)
        for idx, val in coeffs:
            r[idx] = val
        rows.append(r)
        bs.append(float(bval))

    # rpos: budgets 1 - u_i - v_i >= 0, then L1 splits a_j -+ w_j >= 0
    for i in range(m):
        row([(iu(i), 1.0), (iv(i), 1.0)], 1.0)
    for j in range(n):
        row([(ia(j), -1.0), (iw(j), 1.0)], 0.0)   # a_j - w_j >= 0
        row([(ia(j), -1.0), (iw(j), -1.0)], 0.0)  # a_j + w_j >= 0
    # exp blocks: (z_i - t_i, 1, u_i) with z_i = -y_i x_i.w, then (-t_i, 1, v_i)
    for i in range(m):
        row([(iw(j), y[i] * x[i, j]) for j in range(n)] + [(it(i), 1.0)], 0.0)
        row([], 1.0)
        row([(iu(i), -1.0)], 0.0)
    for i in range(m):
        row([(it(i), 1.0)], 0.0)
        row([], 1.0)
        row([(iv(i), -1.0)], 0.0)

    c = np.zeros(nv)
    c[n:n + m] = 1.0          # sum t_i
    c[n + 3 * m:] = lam       # lam * sum a_j
    layout = tt.ConeLayout([tt.rpos(m + 2 * n), tt.expc(count=2 * m)])
    return c, np.asarray(rows), np.asarray(bs), layout


def scipy_oracle(x, y, lam):
    from scipy.optimize import minimize
    m, n = x.shape

    def f(z):
        w, a = z[:n], z[n:]
        return float(np.sum(np.logaddexp(0.0, -y * (x @ w))) + lam * a.sum())

    cons = [{"type": "ineq", "fun": lambda z, j=j, s=s:
             z[n + j] - s * z[j]} for j in range(n) for s in (1.0, -1.0)]
    r = minimize(f, np.zeros(2 * n), method="SLSQP", constraints=cons,
                 options={"maxiter": 1000, "ftol": 1e-12})
    return r.fun, r.x[:n]


def main(m=40, n=8, lam=0.1, seed=3):
    backend = setup()
    import jax.numpy as jnp
    import totsu_tpu as tt

    rng = np.random.default_rng(seed)
    w_true = np.concatenate([rng.normal(size=n // 2) * 2.0,
                             np.zeros(n - n // 2)])
    x = rng.normal(size=(m, n))
    y = np.where(x @ w_true + 0.3 * rng.normal(size=m) > 0, 1.0, -1.0)

    c, a, b, layout = build(x, y, lam)
    param = tt.SolverParam(max_iter=500_000, eps_acc=1e-6, profile="fast")
    t0 = time.time()
    res = tt.solve(jnp.asarray(c), jnp.asarray(a), jnp.asarray(b),
                   layout, param)
    t_solve = time.time() - t0

    w = np.asarray(res.x)[:n]
    obj = float(np.sum(np.logaddexp(0.0, -y * (x @ w)))
                + lam * np.sum(np.abs(w)))
    obj_ref, w_ref = scipy_oracle(x, y, lam)
    report("logreg_expcone", res, t_solve,
           f"backend={backend} m={m} n={n} obj={obj:.6f} "
           f"oracle={obj_ref:.6f}")
    # objective parity with the NLP oracle; the conic solution must also
    # classify the training set at least as well
    assert obj <= obj_ref * (1.0 + 1e-3) + 1e-6
    acc = float(np.mean(np.sign(x @ w) == y))
    assert acc >= 0.8
    return obj


if __name__ == "__main__":
    main()
