"""Utilities: env-var config, device selection helpers."""

from totsu_tpu.utils.env import set_par_by_env, use_cpu
from totsu_tpu.utils.operator_check import check_operator

__all__ = ["set_par_by_env", "use_cpu", "check_operator"]
