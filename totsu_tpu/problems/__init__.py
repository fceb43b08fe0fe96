"""Problem layer: LP/QP/QCQP/SOCP/SDP standard-form reductions to conic form.

(ref: solver_rust_conic/totsu/src/problem/). Functional builders
(``lp``/``qp``/``qcqp``/``socp``/``sdp``) are JAX-traceable; the ``Prob*``
classes mirror the reference's constructor + ``problem()`` ergonomics.
"""

from totsu_tpu.problems.base import ConicProblem
from totsu_tpu.problems.matbuild import MatBuild
from totsu_tpu.problems.lp import lp, ProbLP
from totsu_tpu.problems.qp import qp, ProbQP
from totsu_tpu.problems.qcqp import qcqp, ProbQCQP
from totsu_tpu.problems.socp import socp, ProbSOCP
from totsu_tpu.problems.sdp import sdp, ProbSDP
from totsu_tpu.problems.gp import gp

__all__ = [
    "ConicProblem", "MatBuild",
    "lp", "ProbLP", "qp", "ProbQP", "qcqp", "ProbQCQP",
    "socp", "ProbSOCP", "sdp", "ProbSDP", "gp",
]
