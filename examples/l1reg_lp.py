"""L1-regularized L1-error Gaussian-kernel regression as an LP.

Port of ref examples/l1reg_lp/src/main.rs:45-123: n = 3l+1 variables
(z, alpha, beta, bias), m = 4l inequalities encoding
|y_i - (K alpha)_i - bias| <= z_i and |alpha_i| <= beta_i, objective
sum(z) + lambda * sum(beta), Gaussian kernel sigma^2 = 1/8, lambda = 0.2,
eps_acc = 1e-3.
"""

import time

import numpy as np

from _common import setup, report


def gaussian_kernel(xa, xb, sigma_sq=1.0 / 8.0):
    d2 = ((xa[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
    return np.exp(-d2 / sigma_sq)


def build(l=20, lam=0.2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((l, 2))
    y = np.cos(5.0 * x[:, 0]) * np.cos(7.0 * x[:, 1])

    kmat = gaussian_kernel(x, x)
    n = 3 * l + 1
    m = 4 * l

    c = np.zeros(n)
    c[:l] = 1.0          # z: L1 error
    c[2 * l:3 * l] = lam  # beta: L1 regularization

    g = np.zeros((m, n))
    eye = np.eye(l)
    # rows 0..l:   K alpha + bias - z <= y
    g[:l, :l] = -eye
    g[:l, l:2 * l] = kmat
    g[:l, 3 * l] = 1.0
    # rows l..2l: -K alpha - bias - z <= -y
    g[l:2 * l, :l] = -eye
    g[l:2 * l, l:2 * l] = -kmat
    g[l:2 * l, 3 * l] = -1.0
    # rows 2l..3l: alpha - beta <= 0
    g[2 * l:3 * l, l:2 * l] = eye
    g[2 * l:3 * l, 2 * l:3 * l] = -eye
    # rows 3l..4l: -alpha - beta <= 0
    g[3 * l:4 * l, l:2 * l] = -eye
    g[3 * l:4 * l, 2 * l:3 * l] = -eye

    h = np.concatenate([y, -y, np.zeros(2 * l)])
    return c, g, h, x, y, kmat


def main(l=20):
    backend = setup()
    import totsu_tpu as tt
    from totsu_tpu.utils import set_par_by_env

    c, g, h, x, y, kmat = build(l)
    param = set_par_by_env(tt.SolverParam(max_iter=200_000, eps_acc=1e-3))
    prob = tt.problems.lp(c, g, h)

    t0 = time.time()
    res = prob.solve_jit(param)
    res.x.block_until_ready()
    t_solve = time.time() - t0

    sol = np.asarray(res.x)
    z, alpha, beta, bias = (sol[:l], sol[l:2 * l], sol[2 * l:3 * l],
                            sol[3 * l])
    obj = float(c @ sol)
    # self-check: objective equals measured L1 error + lambda*||alpha||_1
    pred = kmat @ alpha + bias
    direct = np.abs(y - pred).sum() + 0.2 * np.abs(alpha).sum()
    report("l1reg_lp", res, t_solve,
           f"backend={backend} obj={obj:.6f} direct={direct:.6f}")
    assert abs(obj - direct) < 2e-2

    import _plot
    if _plot.enabled():
        # contour of the fitted kernel regressor over [0,1]^2 with samples
        # (the reference's plot.svg, main.rs:127-201)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        gx, gy = np.meshgrid(np.linspace(0, 1, 60), np.linspace(0, 1, 60))
        grid = np.stack([gx.ravel(), gy.ravel()], axis=1)
        fhat = gaussian_kernel(grid, x) @ alpha + bias
        fig, ax = plt.subplots(figsize=(5, 4))
        cs = ax.contourf(gx, gy, fhat.reshape(gx.shape), levels=12,
                         cmap="coolwarm")
        fig.colorbar(cs)
        ax.scatter(x[:, 0], x[:, 1], c=y, cmap="coolwarm",
                   edgecolors="k", s=30)
        ax.set_title("l1reg_lp: kernel regression fit")
        _plot.save(fig, "l1reg_lp.png")
    return obj


if __name__ == "__main__":
    main()
