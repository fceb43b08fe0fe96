"""Image noise reduction as a user-defined matrix-free conic problem.

Port of ref examples/imgnr_udef/src/: skips the Prob* layer entirely and
feeds the solver a custom operator (the showcase for matrix-free problems).

    minimize    z
    subject to  |(L x)_ij| <= t_ij        (elementwise, L = 3x3 Laplacian)
                sum(t) <= ratio * npixels
                0 <= x <= 1
                ||x - xh||_2 <= z         (SOC block)

The reference hand-writes a stencil Operator with derived absadd_cols
(laplacian.rs:16-199); here the Laplacian is a 3x3 valid convolution whose
adjoint falls out of jax.linear_transpose, and the |kernel| convolution
gives the row/col absolute sums in two lines.
"""

import time

import numpy as np

from _common import setup, report


def make_image(w=48, h=48, noise=0.25, seed=7):
    yy, xx = np.mgrid[0:h, 0:w]
    img = 0.5 + 0.35 * np.sin(xx / 6.0) * np.cos(yy / 5.0)
    rng = np.random.default_rng(seed)
    mask = rng.random((h, w)) < noise
    img_noisy = img.copy()
    img_noisy[mask] = rng.random(mask.sum())  # impulse noise
    return img, np.clip(img_noisy, 0.0, 1.0)


def build_operator(w, h, dtype):
    """The conic operator over variables u = (x [wh], z [1], t [tsz])."""
    import jax
    import jax.numpy as jnp
    from totsu_tpu.solver.operator import CustomOp

    wh = w * h
    tsz = (w - 2) * (h - 2)
    m = 2 * tsz + 1 + 2 * wh + 1 + wh
    n = wh + 1 + tsz

    # 3x3 Laplacian stencil (ref laplacian.rs:36-38)
    c0, c1, c2 = 1.0 - 4.0 / 16.0, -2.0 / 16.0, -1.0 / 16.0
    kern = jnp.asarray(np.array([[c2, c1, c2], [c1, c0, c1], [c2, c1, c2]]),
                       dtype=dtype)

    def conv_valid(img2d, k):
        return jax.lax.conv_general_dilated(
            img2d[None, None], k[None, None], (1, 1), "VALID")[0, 0]

    def lap(x_img):  # (wh,) -> (tsz,)
        return conv_valid(x_img.reshape(h, w), kern).reshape(tsz)

    lap_t = jax.linear_transpose(lap, jnp.zeros((wh,), dtype=dtype))

    def matvec(_, u):
        x, z, t = u[:wh], u[wh], u[wh + 1:]
        lx = lap(x)
        return jnp.concatenate([
            lx - t,            # y_lp: Lx <= t
            -lx - t,           # y_ln: -Lx <= t
            jnp.sum(t)[None],  # y_l1: sum(t) <= target
            -x,                # y_xp: x >= 0
            x,                 # y_xn: x <= 1
            (-z)[None],        # y_sz: SOC radius
            -x,                # y_sx: SOC vector
        ])

    def rmatvec(_, v):
        v_lp = v[:tsz]
        v_ln = v[tsz:2 * tsz]
        v_l1 = v[2 * tsz]
        v_xp = v[2 * tsz + 1:2 * tsz + 1 + wh]
        v_xn = v[2 * tsz + 1 + wh:2 * tsz + 1 + 2 * wh]
        v_sz = v[2 * tsz + 1 + 2 * wh]
        v_sx = v[2 * tsz + 2 + 2 * wh:]
        (y_x,) = lap_t(v_lp - v_ln)
        y_x = y_x - v_xp + v_xn - v_sx
        y_z = (-v_sz)[None]
        y_t = -v_lp - v_ln + v_l1
        return jnp.concatenate([y_x, y_z, y_t])

    # |kernel| convolutions give the stencil's abs row/col sums
    # (the closed-form equivalent of ref laplacian.rs absadd_cols_alpha)
    akern = jnp.abs(kern)

    def lap_abs(x_img):
        return conv_valid(x_img.reshape(h, w), akern).reshape(tsz)

    lap_abs_t = jax.linear_transpose(lap_abs, jnp.zeros((wh,), dtype=dtype))
    ones_t = jnp.ones((tsz,), dtype=dtype)
    ones_x = jnp.ones((wh,), dtype=dtype)

    def col_abssum(_):
        (lap_cols,) = lap_abs_t(ones_t)
        tau_x = 2.0 * lap_cols + 3.0       # lp+ln stencils, xp, xn, sx
        tau_z = jnp.ones((1,), dtype=dtype)
        tau_t = jnp.full((tsz,), 3.0, dtype=dtype)  # lp, ln, l1
        return jnp.concatenate([tau_x, tau_z, tau_t])

    def row_abssum(_):
        lap_rows = lap_abs(ones_x)
        return jnp.concatenate([
            lap_rows + 1.0, lap_rows + 1.0,
            jnp.asarray([float(tsz)], dtype=dtype),
            ones_x, ones_x,
            jnp.ones((1,), dtype=dtype),
            ones_x,
        ])

    return CustomOp(params=None, m=m, n=n, matvec_fn=matvec,
                    rmatvec_fn=rmatvec, col_abssum_fn=col_abssum,
                    row_abssum_fn=row_abssum), wh, tsz


def main(w=48, h=48, ratio=0.01):
    backend = setup()
    import jax.numpy as jnp
    import totsu_tpu as tt
    from totsu_tpu.solver import cone as cones
    from totsu_tpu.utils import set_par_by_env

    clean, noisy = make_image(w, h)
    dtype = jnp.zeros(0).dtype
    op, wh, tsz = build_operator(w, h, dtype)

    target = wh * ratio
    c = jnp.zeros((op.shape[1],), dtype=dtype).at[wh].set(1.0)
    b = jnp.concatenate([
        jnp.zeros((2 * tsz,), dtype=dtype),
        jnp.asarray([target], dtype=dtype),
        jnp.zeros((wh,), dtype=dtype),
        jnp.ones((wh,), dtype=dtype),
        jnp.zeros((1,), dtype=dtype),
        -jnp.asarray(noisy.reshape(wh), dtype=dtype),
    ])
    layout = cones.ConeLayout([
        cones.rpos(2 * tsz + 1 + 2 * wh),
        cones.soc(1 + wh),
    ])
    param = set_par_by_env(
        tt.SolverParam(max_iter=200_000, eps_acc=1.0 / 256.0))

    t0 = time.time()
    res = tt.solve_jit(c, op, b, layout, param)
    res.x.block_until_ready()
    t_solve = time.time() - t0

    sol = np.asarray(res.x)
    x_img = np.clip(sol[:wh].reshape(h, w), 0.0, 1.0)
    err_noisy = float(np.abs(clean - noisy).mean())
    err_denoised = float(np.abs(clean - x_img).mean())
    report("imgnr_udef", res, t_solve,
           f"backend={backend} {w}x{h} mean|err| noisy={err_noisy:.4f} "
           f"-> denoised={err_denoised:.4f}")
    assert err_denoised < err_noisy  # denoising actually helped

    import _plot
    if _plot.enabled():
        # clean / noisy / denoised triptych (the reference writes out.png)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(9, 3))
        for ax, img, title in zip(axes, [clean, noisy, x_img],
                                  ["clean", "noisy", "denoised"]):
            ax.imshow(img, cmap="gray", vmin=0, vmax=1)
            ax.set_title(title)
            ax.axis("off")
        _plot.save(fig, "imgnr_udef.png")
    return err_denoised


if __name__ == "__main__":
    main()
