"""Utilities: config/flags, deterministic logging, phase timers."""

from .config import SolveConfig, add_solve_args, config_from_args
from .logging import combine_outputs, print_csr_matrix, print_vector
from .timers import PhaseTimer, trace_to

from .hostmem import enable_malloc_reuse

__all__ = [
    "enable_malloc_reuse",
    "SolveConfig",
    "add_solve_args",
    "config_from_args",
    "combine_outputs",
    "print_csr_matrix",
    "print_vector",
    "PhaseTimer",
    "trace_to",
]
