"""Run every example end-to-end (the exec_all.sh equivalent,
ref examples/exec_all.sh). Pass --cpu to pin to host CPU/f64."""

import time

import l1reg_lp
import svm_qp
import trajplan_qcqp
import toruscompl_socp
import partitioning_sdp
import imgnr_udef
import trajsweep_batch
import nearestcorr_batch_sdp
import growthport_powexp
import boxdesign_gp
import logreg_expcone
import fit_qp
import mpc_qp


def main():
    t0 = time.time()
    l1reg_lp.main()
    svm_qp.main()
    trajplan_qcqp.main()
    toruscompl_socp.main()
    partitioning_sdp.main()
    imgnr_udef.main()
    trajsweep_batch.main()
    nearestcorr_batch_sdp.main()
    growthport_powexp.main()
    boxdesign_gp.main()
    logreg_expcone.main()
    fit_qp.main()
    mpc_qp.main()
    print(f"[run_all] all 13 examples OK in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
