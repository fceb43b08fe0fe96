"""Bounded least squares as a QP.

Working port of the reference's *stale* experimental/leastsq_qp (it targets
the obsolete 0.5.x API and no longer builds, SURVEY.md 2.6): fit
min ||F x - g||^2 s.t. 0 <= x <= 1, as a QP with P = F'F, q = -F'g.
Validated against the unconstrained normal-equations solution projected
into the box (active-set check via scipy-free KKT argument: compare with
numpy lstsq when the solution is interior).
"""

import time

import numpy as np

from _common import setup, report


def main(mrows=40, n=12, seed=3):
    backend = setup()
    import totsu_tpu as tt
    from totsu_tpu.utils import set_par_by_env

    rng = np.random.default_rng(seed)
    f_mat = rng.normal(size=(mrows, n))
    x_true = rng.random(n)  # inside the box
    g_vec = f_mat @ x_true + 0.01 * rng.normal(size=mrows)

    p_mat = f_mat.T @ f_mat
    q = -f_mat.T @ g_vec
    eye = np.eye(n)
    g_ineq = np.concatenate([-eye, eye])
    h_ineq = np.concatenate([np.zeros(n), np.ones(n)])

    prob = tt.problems.qp(p_mat, q, g_ineq, h_ineq)
    param = set_par_by_env(tt.SolverParam(max_iter=200_000, eps_acc=1e-6,
                                          method="direct"))
    t0 = time.time()
    res = prob.solve_jit(param)
    res.x.block_until_ready()
    t_solve = time.time() - t0

    x = np.asarray(res.x)[:n]
    # oracle: if unconstrained optimum is in the box it must match
    x_ls, *_ = np.linalg.lstsq(f_mat, g_vec, rcond=None)
    inside = np.all((x_ls > 1e-6) & (x_ls < 1 - 1e-6))
    err = float(np.abs(x - np.clip(x_ls, 0, 1)).max()) if inside else np.nan
    rmse = float(np.linalg.norm(f_mat @ x - g_vec) / np.sqrt(mrows))
    report("leastsq_qp", res, t_solve,
           f"backend={backend} rmse={rmse:.4f} "
           + (f"vs_lstsq_err={err:.2e}" if inside else "(bounds active)"))
    if inside:
        assert err < 1e-3
    assert x.min() > -1e-4 and x.max() < 1 + 1e-4
    return rmse


if __name__ == "__main__":
    main()
