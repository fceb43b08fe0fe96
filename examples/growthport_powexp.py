"""Growth-optimal allocation via power + exponential cones.

Maximize the geometric mean of scenario portfolio returns (Kelly-style
growth rate) over the simplex, subject to an entropy diversification
budget:

    maximize   ( prod_i  r_i^T x )^(1/S)
    subject to sum_j x_j = 1,  x >= 0,
               sum_j x_j log x_j <= H        (negative entropy budget)

This example has NO reference counterpart: it showcases the two cone
factors that go beyond the reference's zero/R+/SOC/RSOC/PSD set
(docs/PARITY.md "beyond" section):

* the geometric mean is a balanced binary tree of 3-D power cones
  K_pow(1/2) = {(a, b, c) : sqrt(ab) >= |c|}  (``tt.powc``);
* each entropy term x_j log x_j <= q_j is one exponential-cone membership
  (-q_j, x_j, 1) in K_exp  (``tt.expc``), since
  x e^{-q/x} <= 1  <=>  x log x <= q.

Self-check: objective and allocation against a scipy SLSQP solve of the
equivalent log-form NLP (within the solver tolerance contract).
"""

import time

import numpy as np

from _common import setup, report


def build_problem(returns, h_budget):
    """Conic data (c, A, b, layout) for the growth problem.

    ``returns``: (S, n) scenario gross-return matrix (positive entries),
    S a power of two (the power-cone tree is a balanced binary tree).
    Slack convention: s = b - A z in K (ref solver.rs conic form).
    """
    import totsu_tpu as tt

    s_num, n = returns.shape
    assert s_num & (s_num - 1) == 0, "scenario count must be a power of 2"
    # variables z = [x (n) | q (n) | tree nodes (s_num - 1, root last)]
    n_tree = s_num - 1
    nv = 2 * n + n_tree
    ix = lambda j: j               # x_j
    iq = lambda j: n + j           # q_j
    it = lambda k: 2 * n + k       # tree node k

    rows = []
    bs = []

    def row(coeffs, bval):
        a = np.zeros(nv)
        for idx, v in coeffs:
            a[idx] = v
        rows.append(a)
        bs.append(bval)

    # zero cone: sum x = 1
    row([(ix(j), 1.0) for j in range(n)], 1.0)
    # rpos: x >= 0
    for j in range(n):
        row([(ix(j), -1.0)], 0.0)
    # rpos: entropy budget  H - sum q >= 0
    row([(iq(j), 1.0) for j in range(n)], h_budget)
    # power-cone tree: leaves are scenario returns y_i = returns[i] @ x;
    # level by level, node_k in K_pow(1/2) over its two children
    leaves = [("ret", i) for i in range(s_num)]
    k = 0
    pow_blocks = 0
    while len(leaves) > 1:
        nxt = []
        for a, b in zip(leaves[0::2], leaves[1::2]):
            for child in (a, b):
                if child[0] == "ret":
                    row([(ix(j), -returns[child[1], j])
                         for j in range(n)], 0.0)
                else:
                    row([(it(child[1]), -1.0)], 0.0)
            row([(it(k), -1.0)], 0.0)
            nxt.append(("node", k))
            k += 1
            pow_blocks += 1
        leaves = nxt
    root = it(k - 1)
    # exp cones: (-q_j, x_j, 1) in K_exp  <=>  x_j log x_j <= q_j
    for j in range(n):
        row([(iq(j), 1.0)], 0.0)
        row([(ix(j), -1.0)], 0.0)
        row([], 1.0)

    c = np.zeros(nv)
    c[root] = -1.0  # maximize the tree root = geometric mean
    layout = tt.ConeLayout([
        tt.zero(1), tt.rpos(n + 1),
        tt.powc(0.5, count=pow_blocks), tt.expc(count=n)])
    return c, np.asarray(rows), np.asarray(bs), layout, root


def scipy_oracle(returns, h_budget):
    """Log-form NLP solved by SLSQP: the objective-parity oracle."""
    from scipy.optimize import minimize
    s_num, n = returns.shape

    def negloggrowth(x):
        return -np.mean(np.log(returns @ x))

    cons = [
        {"type": "eq", "fun": lambda x: x.sum() - 1.0},
        {"type": "ineq",
         "fun": lambda x: h_budget - np.sum(x * np.log(np.maximum(x, 1e-12)))},
    ]
    r = minimize(negloggrowth, np.full(n, 1.0 / n), method="SLSQP",
                 bounds=[(0.0, 1.0)] * n, constraints=cons,
                 options={"maxiter": 500, "ftol": 1e-12})
    return np.exp(-r.fun), r.x


def main(n=6, s_num=4, h_budget=-1.2, seed=0):
    dev = setup()
    import jax.numpy as jnp
    import totsu_tpu as tt

    rng = np.random.default_rng(seed)
    # positive gross returns around 1 with scenario spread
    returns = 1.0 + 0.3 * rng.standard_normal((s_num, n)) ** 2 \
        - 0.1 * rng.random((s_num, n))
    c, a, b, layout, root = build_problem(returns, h_budget)

    param = tt.SolverParam(max_iter=300_000, eps_acc=1e-7)
    t0 = time.time()
    res = tt.solve(jnp.asarray(c), jnp.asarray(a), jnp.asarray(b),
                   layout, param)
    t_solve = time.time() - t0

    x = np.asarray(res.x)[:n]
    growth = float(np.asarray(res.x)[root])
    g_ref, x_ref = scipy_oracle(returns, h_budget)
    report(f"growthport_powexp {dev}", res, t_solve,
           f"growth={growth:.6f} oracle={g_ref:.6f}")
    print("  alloc      ", np.round(x, 4))
    print("  oracle     ", np.round(x_ref, 4))
    # self-checks: simplex feasibility, entropy budget, objective parity
    assert abs(x.sum() - 1.0) < 1e-5 and (x > -1e-6).all()
    ent = float(np.sum(x * np.log(np.maximum(x, 1e-12))))
    assert ent <= h_budget + 1e-4, (ent, h_budget)
    assert abs(growth - g_ref) < 2e-4 * (1.0 + abs(g_ref)), (growth, g_ref)
    # the tree root actually equals the geometric mean of the returns
    gm = float(np.exp(np.mean(np.log(returns @ x))))
    assert abs(growth - gm) < 1e-4, (growth, gm)
    return growth


if __name__ == "__main__":
    main()
