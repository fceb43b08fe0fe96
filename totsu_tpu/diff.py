"""Differentiating through conic program solutions.

Implements the conic implicit-function approach of Agrawal, Barratt, Boyd,
Busseti, Moursi ("Differentiating through a cone program", 2019 — the
engine behind diffcp/cvxpylayers): at a converged solution, the
homogeneous residual map

    N(z) = Q Pi(z) - (Pi(z) - z) = 0,
    Q = [[0, A', c], [-A, 0, b], [-c', -b', 0]],
    Pi = projection onto C = R^n x K* x R+

is differentiable wherever the cone projection is, and

    M dz = -dQ u,     M = (Q - I) DPi(z) + I,   u = Pi(z)

gives solution sensitivities. DPi comes for free from ``jax.jvp`` of the
framework's cone projections; M is materialized dense (fine for the
moderate n+m of dense conic programs) and one linear solve per
forward/backward pass does the rest.

No reference counterpart — this is a modern-framework capability
(cvxpylayers-style learning through optimization) enabled by everything
being pure JAX.
"""

import functools

import jax
import jax.numpy as jnp

from totsu_tpu.solver.cone import ConeLayout
from totsu_tpu.solver.conic import solve_jit
from totsu_tpu.solver.params import SolverParam


def _proj_c(cone: ConeLayout, n: int, m: int, z):
    """Pi onto C = R^n x K* x R+ over z = (x, y, tau)."""
    zy = cone.project(z[n:n + m], dual=True)
    ztau = jnp.maximum(z[-1], 0.0)
    return jnp.concatenate([z[:n], zy, ztau[None]])


def _q_apply(c, a, b, u):
    n = c.shape[0]
    m = b.shape[0]
    ux, uy, ut = u[:n], u[n:n + m], u[-1]
    return jnp.concatenate([
        uy @ a + c * ut,
        -(a @ ux) + b * ut,
        (-jnp.dot(c, ux) - jnp.dot(b, uy))[None],
    ])


def make_differentiable_solver(cone: ConeLayout,
                               param: SolverParam = SolverParam()):
    """Return ``fn(c, a, b) -> (x, y)`` with a custom VJP through the
    optimality conditions. ``a`` is a dense (m, n) array. The solve must
    converge and the solution be at a differentiable (strict-
    complementarity) point, else gradients are subgradient-like."""

    @jax.custom_vjp
    def fn(c, a, b):
        res = solve_jit(c, a, b, cone, param)
        return res.x, res.y

    def fwd(c, a, b):
        x, y = fn(c, a, b)
        n = c.shape[0]
        m = b.shape[0]
        # embedding point: u = (x, y, 1), v = (0, s, 0) with s = b - A x
        s = b - a @ x
        z = jnp.concatenate([x, y - s, jnp.ones((1,), dtype=x.dtype)])
        return (x, y), (c, a, b, z)

    def bwd(resid, cot):
        c, a, b, z = resid
        x_bar, y_bar = cot
        n = c.shape[0]
        m = b.shape[0]
        nm1 = n + m + 1

        proj = functools.partial(_proj_c, cone, n, m)
        u = proj(z)

        # materialize M' = DPi' (Q' - I) + I  via vmapped VJPs of Pi
        _, proj_vjp = jax.vjp(proj, z)

        def mt_row(e):
            # row of M' applied to basis vector e: DPi'(Q' e - e) + e
            qte = _qt_apply(c, a, b, e)
            (w,) = proj_vjp(qte - e)
            return w + e

        def _qt_apply(cc, aa, bb, v):
            # Q is skew-symmetric: Q' = -Q
            return -_q_apply(cc, aa, bb, v)

        eye = jnp.eye(nm1, dtype=z.dtype)
        mt = jax.vmap(mt_row)(eye)   # rows: M' e_i -> matrix M'^T? careful:
        # mt[i] = M' e_i = i-th column of M'; stack as columns
        mt_mat = mt.T                # (nm1, nm1) true M'

        # cotangent on u: x = u_x / u_tau (tau = 1 at solution):
        # du_x = dx + x dtau-term; u_bar = (x_bar, y_bar,
        #        -(x.x_bar + y.y_bar)) from d(u/tau)
        x_sol = u[:n]
        y_sol = u[n:n + m]
        u_bar = jnp.concatenate([
            x_bar, y_bar,
            (-(jnp.dot(x_sol, x_bar) + jnp.dot(y_sol, y_bar)))[None],
        ])
        # z_bar = DPi' u_bar ; then solve M' w = z_bar. M is singular by
        # construction (z itself spans the nullspace: cone projections are
        # positively homogeneous so M z = N(z) = 0 — the scaling freedom of
        # the embedding), hence a least-squares solve, as diffcp does with
        # LSQR.
        (z_bar,) = proj_vjp(u_bar)
        w, _, _, _ = jnp.linalg.lstsq(mt_mat, z_bar)

        # theta_bar = -(dQ u)' w contracted through Q's structure:
        # dQ u = (dA' u_y + dc u_t, -dA u_x + db u_t, -dc.u_x - db.u_y)
        w_x, w_y, w_t = w[:n], w[n:n + m], w[-1]
        u_x, u_y, u_t = u[:n], u[n:n + m], u[-1]
        c_bar = -(w_x * u_t - w_t * u_x)
        b_bar = -(w_y * u_t - w_t * u_y)
        a_bar = -(jnp.outer(u_y, w_x) - jnp.outer(w_y, u_x))
        return c_bar, a_bar, b_bar

    fn.defvjp(fwd, bwd)
    return fn
