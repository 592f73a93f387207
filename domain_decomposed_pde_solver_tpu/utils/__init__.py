"""Utilities: config/flags, deterministic logging, phase timers."""

from .config import SolveConfig, add_solve_args, config_from_args
from .logging import combine_outputs, print_csr_matrix, print_vector
from .timers import PhaseTimer, trace_to

from .hostmem import enable_malloc_reuse
from .compilecache import enable_persistent_cache

__all__ = [
    "enable_malloc_reuse",
    "enable_persistent_cache",
    "SolveConfig",
    "add_solve_args",
    "config_from_args",
    "combine_outputs",
    "print_csr_matrix",
    "print_vector",
    "PhaseTimer",
    "trace_to",
]
