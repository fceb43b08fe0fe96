"""Hard-margin Gaussian-kernel SVM dual as a QP.

Port of ref examples/svm_qp/src/main.rs:47-120: l = 50 ring-labeled random
points; P_ij = y_i y_j K(x_i, x_j); maximize sum(alpha) - 1/2 a'Pa subject
to alpha >= 0 and the single equality sum(alpha_i y_i) = 0; bias recovered
from support vectors afterwards.
"""

import time

import numpy as np

from _common import setup, report
from l1reg_lp import gaussian_kernel


def build(l=50, seed=10_000):
    rng = np.random.default_rng(seed)
    x = rng.random((l, 2))
    r = np.hypot(x[:, 0] - 0.5, x[:, 1] - 0.5)
    y = np.where((r > 0.25) & (r < 0.4), 1.0, -1.0)

    kmat = gaussian_kernel(x, x)
    p_mat = np.outer(y, y) * kmat
    q = -np.ones(l)
    g = -np.eye(l)
    h = np.zeros(l)
    a = y[None, :]
    b = np.zeros(1)
    return p_mat, q, g, h, a, b, x, y, kmat


def main(l=50):
    backend = setup()
    import totsu_tpu as tt
    from totsu_tpu.utils import set_par_by_env

    p_mat, q, g, h, a, b, x, y, kmat = build(l)
    param = set_par_by_env(tt.SolverParam(max_iter=200_000, eps_acc=1e-3))
    prob = tt.problems.qp(p_mat, q, g, h, a, b)

    t0 = time.time()
    res = prob.solve_jit(param)
    res.x.block_until_ready()
    t_solve = time.time() - t0

    alpha = np.asarray(res.x)[:l]
    # bias from support vectors (ref main.rs:107-117)
    sv = alpha > 1e-4
    wx = (alpha * y) @ kmat
    bias = float(np.mean(y[sv] - wx[sv])) if sv.any() else 0.0
    # self-check: training accuracy of the recovered classifier
    pred = np.sign(wx + bias)
    acc = float((pred == y).mean())
    obj = float(0.5 * alpha @ p_mat @ alpha + q @ alpha)
    report("svm_qp", res, t_solve,
           f"backend={backend} obj={obj:.6f} sv={int(sv.sum())} acc={acc:.3f}")
    assert acc >= 0.95, acc

    import _plot
    if _plot.enabled():
        # decision-boundary contour (the reference's ContourSeries plot)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from totsu_tpu.utils import contour_segments, chain_segments
        xs = np.linspace(0, 1, 80)
        ys = np.linspace(0, 1, 80)
        gx, gy = np.meshgrid(xs, ys)
        grid = np.stack([gx.ravel(), gy.ravel()], axis=1)
        f = gaussian_kernel(grid, x) @ (alpha * y) + bias
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.contourf(gx, gy, f.reshape(gx.shape), levels=[-1e9, 0, 1e9],
                    colors=["#cce", "#ecc"], alpha=0.6)
        # decision boundary via the library's own marching-squares series
        # (the reference's utils2::ContourSeries role)
        for line in chain_segments(
                contour_segments(xs, ys, f.reshape(gx.shape), level=0.0)):
            ax.plot(line[:, 0], line[:, 1], "k-", lw=1.5)
        ax.scatter(x[:, 0], x[:, 1], c=y, cmap="coolwarm",
                   edgecolors="k", s=25)
        ax.set_title("svm_qp: kernel SVM decision boundary")
        _plot.save(fig, "svm_qp.png")
    return obj


if __name__ == "__main__":
    main()
