"""Parameter sweep solved in lockstep: trajectory QCQPs for a range of
acceleration caps, one vmapped batched solve.

The batched-instances mode is new capability over the reference
(SURVEY.md 2.8 item 3): the QCQP reduction is JAX-traceable, so the whole
sweep — build + solve for every cap — is a single jitted, vmapped program
(shardable over a mesh batch axis on a pod slice).
"""

import time

import numpy as np

from _common import setup, report
from trajplan_qcqp import build


def main(t_cap=12, caps=(140.0, 170.0, 200.0, 300.0)):
    backend = setup()
    import jax
    import jax.numpy as jnp
    import totsu_tpu as tt
    from totsu_tpu.problems import qcqp
    from totsu_tpu.utils import set_par_by_env

    p_mats, q_vecs, r_base, a, b, t_cap, _ = build(t_cap, 1.0)
    param = set_par_by_env(
        tt.SolverParam(max_iter=600_000, eps_acc=1e-3, equil_iters=10))
    caps = jnp.asarray(caps)

    def solve_for_cap(cap):
        # r_i = -cap^2/2 for the acceleration constraints (index >= 1)
        r = jnp.asarray(r_base).at[1:].set(-0.5 * cap * cap)
        prob = qcqp(p_mats, q_vecs, r, a, b)
        return prob.solve_jit(param)

    fn = jax.jit(jax.vmap(solve_for_cap))
    t0 = time.time()
    res = fn(caps)
    jax.block_until_ready(res)
    t_solve = time.time() - t0

    n = 2 * t_cap
    objs = []
    for i, cap in enumerate(np.asarray(caps)):
        sol = np.asarray(res.x[i])[:n]
        obj = float(0.5 * sol @ p_mats[0] @ sol)
        objs.append(obj)
        status = int(res.status[i])
        assert status == tt.SolverStatus.CONVERGED, (cap, status)
    # tighter acceleration budget => higher velocity objective
    assert all(objs[i] >= objs[i + 1] - 1e-3 for i in range(len(objs) - 1)), objs
    print(f"[trajsweep_batch] backend={backend} {len(objs)} caps in lockstep "
          f"{t_solve:.2f}s objs=" +
          ",".join(f"{o:.1f}" for o in objs))
    return objs


if __name__ == "__main__":
    main()
