from .driver import SimParams, initial_excess_density, pl_log_scale, pvsim, redim_state  # noqa: F401
from .solver import FusedObs, SolveResult, SolverConfig, solve  # noqa: F401
from .trpl import BDF_TABLE, MatParams  # noqa: F401
