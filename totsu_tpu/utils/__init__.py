"""Utilities: env-var config, device selection helpers."""

from totsu_tpu.utils.env import set_par_by_env, use_cpu

__all__ = ["set_par_by_env", "use_cpu"]
