"""Scaled-down end-to-end runs of every example (the exec_all.sh smoke
contract, ref examples/exec_all.sh). Each example's main() carries its own
feasibility/objective self-checks; these tests assert they pass on small
instances so the suite stays fast."""

import os
import sys


sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_l1reg_lp():
    import l1reg_lp
    l1reg_lp.main(l=10)


def test_svm_qp():
    import svm_qp
    svm_qp.main(l=20)


def test_trajplan_qcqp():
    import trajplan_qcqp
    trajplan_qcqp.main(t_cap=12, a_cap=300.0)


def test_toruscompl_socp():
    import toruscompl_socp
    toruscompl_socp.main(x_num=5, y_num=4)


def test_partitioning_sdp():
    import partitioning_sdp
    partitioning_sdp.main(x_num=4, y_num=3)


def test_imgnr_udef():
    import imgnr_udef
    imgnr_udef.main(w=24, h=24, ratio=0.01)


def test_trajsweep_batch():
    import trajsweep_batch
    objs = trajsweep_batch.main(t_cap=10, caps=(200.0, 300.0, 500.0))
    assert len(objs) == 3


def test_leastsq_qp():
    import leastsq_qp
    leastsq_qp.main(mrows=30, n=8)


def test_nearestcorr_batch_sdp():
    import nearestcorr_batch_sdp
    nearestcorr_batch_sdp.main(batch=4, k=5)


def test_growthport_powexp():
    import growthport_powexp
    growthport_powexp.main(n=4, s_num=4, h_budget=-1.0)


def test_boxdesign_gp():
    import boxdesign_gp
    boxdesign_gp.main()


def test_logreg_expcone():
    import logreg_expcone
    logreg_expcone.main(m=24, n=6)


def test_fit_qp():
    import fit_qp
    fit_qp.main(n=3, n_obs=3, steps=80)


def test_mpc_qp():
    import mpc_qp
    # same fleet, warm vs cold: warm-started ticks must need fewer total
    # iterations (the disturbances are seeded, so runs are comparable)
    warm = mpc_qp.main(n_vehicles=3, h_horizon=4, ticks=10)
    cold = mpc_qp.main(n_vehicles=3, h_horizon=4, ticks=10, use_warm=False)
    assert sum(warm) < sum(cold), (warm, cold)
