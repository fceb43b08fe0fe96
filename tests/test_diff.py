"""Implicit differentiation through solves vs finite differences."""

import numpy as np
import jax
import jax.numpy as jnp

import totsu_tpu as tt
from totsu_tpu.diff import make_differentiable_solver

PARAM = tt.SolverParam(max_iter=200_000, eps_acc=1e-10, method="direct")


def nondegenerate_lp():
    # min c.x s.t. Gx <= h with a unique nondegenerate vertex solution
    c = jnp.array([1.0, 2.0])
    g = jnp.array([[-1.0, 0.0], [0.0, -1.0], [1.0, 1.0]])
    h = jnp.array([0.0, 0.0, 4.0])
    lay = tt.ConeLayout([tt.rpos(3)])
    return c, g, h, lay


def fd_grad(f, x, eps=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp = x.copy()
        xm = x.copy()
        xp.flat[i] += eps
        xm.flat[i] -= eps
        g.flat[i] = (f(xp) - f(xm)) / (2 * eps)
    return g


def test_grad_wrt_b_matches_fd():
    c, g, h, lay = nondegenerate_lp()
    solver = make_differentiable_solver(lay, PARAM)

    def loss_h(hv):
        x, _ = solver(c, g, jnp.asarray(hv))
        return jnp.sum(x ** 2)

    grad = np.asarray(jax.grad(loss_h)(h))
    fd = fd_grad(lambda hv: float(loss_h(hv)), np.asarray(h))
    np.testing.assert_allclose(grad, fd, rtol=1e-4, atol=1e-6)


def test_grad_wrt_c_matches_fd():
    c, g, h, lay = nondegenerate_lp()
    solver = make_differentiable_solver(lay, PARAM)

    def loss_c(cv):
        x, y = solver(jnp.asarray(cv), g, h)
        return jnp.sum(x * jnp.array([1.0, -2.0])) + jnp.sum(y)

    grad = np.asarray(jax.grad(loss_c)(c))
    fd = fd_grad(lambda cv: float(loss_c(cv)), np.asarray(c))
    np.testing.assert_allclose(grad, fd, rtol=1e-4, atol=1e-6)


def test_grad_wrt_a_matches_fd():
    c, g, h, lay = nondegenerate_lp()
    solver = make_differentiable_solver(lay, PARAM)

    def loss_a(gv):
        x, _ = solver(c, jnp.asarray(gv), h)
        return jnp.sum(x)

    grad = np.asarray(jax.grad(loss_a)(g))
    fd = fd_grad(lambda gv: float(loss_a(gv.reshape(g.shape))),
                 np.asarray(g)).reshape(g.shape)
    np.testing.assert_allclose(grad, fd, rtol=1e-4, atol=1e-6)


def test_grad_through_qp():
    # learning-through-optimization shape: tune h to pull the QP solution
    # toward a target
    p_mat = jnp.eye(2)
    q = jnp.array([0.0, 0.0])
    prob = tt.problems.qp(p_mat, q, g=[[-1.0, 0.0], [0.0, -1.0]],
                          h=[-1.0, -1.0])
    lay = prob.cone
    solver = make_differentiable_solver(lay, PARAM)
    target = jnp.array([2.0, 3.0])

    def loss(hpart):
        b = prob.b.at[-2:].set(hpart)
        x, _ = solver(prob.c, prob.a.a, b)
        return jnp.sum((x[:2] - target) ** 2)

    h0 = jnp.array([-1.0, -1.0])
    grad = np.asarray(jax.grad(loss)(h0))
    fd = fd_grad(lambda hv: float(loss(jnp.asarray(hv))), np.asarray(h0))
    np.testing.assert_allclose(grad, fd, rtol=1e-3, atol=1e-5)
    # one gradient step reduces the loss
    l0 = float(loss(h0))
    l1 = float(loss(h0 - 0.1 * jnp.asarray(grad)))
    assert l1 < l0
