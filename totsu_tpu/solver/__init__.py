"""Solver core: params, operators, cones, and the HSDE iteration loop."""

from totsu_tpu.solver.params import SolverParam, SolverStatus, SolverError
from totsu_tpu.solver.conic import solve, solve_jit, SolveResult
from totsu_tpu.solver import cone
from totsu_tpu.solver import operator
