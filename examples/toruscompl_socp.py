"""Truss compliance minimization (topology optimization) on a torus graph
as an SOCP.

Port of ref examples/toruscompl_socp/src/main.rs:115-262: variables
(x, q, w) per member (cross-section, axial force, compliance epigraph);
l rotated-cone-style 2-row SOC blocks q_i^2 v_i / e <= ... , 2l + 1 scalar
(ni = 0, degenerate) SOC rows for the bounds 0 <= x <= 1 and the volume
budget, p = dof force-balance equalities.
"""

import time

import numpy as np

from _common import setup, report


def build(x_num=9, y_num=7, vol_ratio=0.2):
    # nodes on a grid; "torus" connectivity pattern (ref make_torus)
    coords = [(x, y) for x in range(x_num) for y in range(y_num)]
    nodeidx = {c: i for i, c in enumerate(coords)}
    members = []  # (head, tail)
    for hx in range(x_num):
        for hy in range(y_num):
            if hx % 2 == 1 and hy % 2 == 0:
                dxdy = [(1, 0), (0, 1), (1, 1), (-1, 1), (1, -1), (-1, -1)]
            else:
                dxdy = [(1, 0), (0, 1)]
            for dx, dy in dxdy:
                t = (hx + dx, hy + dy)
                if t in nodeidx:
                    members.append((nodeidx[(hx, hy)], nodeidx[t]))

    # boundary conditions: x=0 column fixed; force (0,-1) at right-mid node
    loads = {}
    fixed = set()
    for y in range(y_num):
        fixed.add(nodeidx[(0, y)])
    loads[nodeidx[(x_num - 1, y_num // 2)]] = (0.0, -1.0)

    # dof indices
    dof_idx = {}
    dof = 0
    for i, c in enumerate(coords):
        if i in fixed:
            dof_idx[i] = None
        else:
            dof_idx[i] = dof
            dof += 2

    l = len(members)
    n = 3 * l  # x, q, w
    e_mod = 1.0
    vlen = np.array([np.hypot(coords[h][0] - coords[t][0],
                              coords[h][1] - coords[t][1])
                     for h, t in members])

    f = np.zeros(n)
    f[2 * l:] = 1.0  # minimize sum of w

    g_list, h_list, c_list, d_list = [], [], [], []
    for i in range(l):
        gi = np.zeros((2, n))
        gi[0, i] = -1.0
        gi[0, 2 * l + i] = 1.0
        gi[1, l + i] = np.sqrt(2.0 * vlen[i] / e_mod)
        ci = np.zeros(n)
        ci[i] = 1.0
        ci[2 * l + i] = 1.0
        g_list.append(gi)
        h_list.append(np.zeros(2))
        c_list.append(ci)
        d_list.append(0.0)
    for i in range(l):  # 0 <= x_i
        ci = np.zeros(n)
        ci[i] = 1.0
        g_list.append(np.zeros((0, n)))
        h_list.append(np.zeros(0))
        c_list.append(ci)
        d_list.append(0.0)
    for i in range(l):  # x_i <= 1
        ci = np.zeros(n)
        ci[i] = -1.0
        g_list.append(np.zeros((0, n)))
        h_list.append(np.zeros(0))
        c_list.append(ci)
        d_list.append(1.0)
    # volume budget: sum v_i x_i <= total_volume * vol_ratio
    ci = np.zeros(n)
    ci[:l] = -vlen
    g_list.append(np.zeros((0, n)))
    h_list.append(np.zeros(0))
    c_list.append(ci)
    d_list.append(float(vlen.sum() * vol_ratio))

    # force balance: A q = b over free dofs
    a = np.zeros((dof, n))
    b = np.zeros(dof)
    for i, (hidx, tidx) in enumerate(members):
        beta = np.array([coords[tidx][0] - coords[hidx][0],
                         coords[tidx][1] - coords[hidx][1]], dtype=float)
        beta /= np.linalg.norm(beta)
        if dof_idx[hidx] is not None:
            a[dof_idx[hidx], l + i] += -beta[0]
            a[dof_idx[hidx] + 1, l + i] += -beta[1]
        if dof_idx[tidx] is not None:
            a[dof_idx[tidx], l + i] += beta[0]
            a[dof_idx[tidx] + 1, l + i] += beta[1]
    for node, (px, py) in loads.items():
        if dof_idx[node] is not None:
            b[dof_idx[node]] = px
            b[dof_idx[node] + 1] = py

    return f, g_list, h_list, c_list, d_list, a, b, l, vlen, vol_ratio


def main(x_num=9, y_num=7):
    backend = setup()
    import totsu_tpu as tt
    from totsu_tpu.utils import set_par_by_env

    (f, g_list, h_list, c_list, d_list, a, b, l, vlen,
     vol_ratio) = build(x_num, y_num)
    param = set_par_by_env(tt.SolverParam(max_iter=200_000, eps_acc=1e-3))
    prob = tt.problems.socp(f, g_list, h_list, c_list, d_list, a, b)

    t0 = time.time()
    res = prob.solve_jit(param)
    res.x.block_until_ready()
    t_solve = time.time() - t0

    sol = np.asarray(res.x)
    x_sec, q_force, w_comp = sol[:l], sol[l:2 * l], sol[2 * l:3 * l]
    obj = float(w_comp.sum())
    # self-checks: bounds, volume budget, force balance
    vol = float(vlen @ x_sec)
    budget = float(vlen.sum() * vol_ratio)
    eq_viol = float(np.abs(a @ sol - b).max())
    report("toruscompl_socp", res, t_solve,
           f"backend={backend} members={l} obj={obj:.4f} "
           f"vol={vol:.3f}<={budget:.3f} eq_viol={eq_viol:.2e}")
    assert x_sec.min() > -5e-3 and x_sec.max() < 1.005
    assert vol <= budget * 1.01
    assert eq_viol < 5e-3
    return obj


if __name__ == "__main__":
    main()
