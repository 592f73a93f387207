"""Preconditioners: Jacobi, Chebyshev, ILU(0), smoothed-aggregation AMG."""

from .jacobi import DiagonalPreconditioner, jacobi_preconditioner
from .chebyshev import (
    ChebyshevPreconditioner,
    chebyshev_preconditioner,
    estimate_lmax_dinv_a,
)
from .wrappers import CastPreconditioner
from .ilu import ILU0Preconditioner, ilu0_factor, ilu0_preconditioner, ilut_preconditioner
from .amg import (
    AMGPreconditioner,
    aggregate_greedy,
    infer_free_grid,
    smoothed_aggregation_preconditioner,
    smoothed_aggregation_setup,
)

__all__ = [
    "DiagonalPreconditioner",
    "ChebyshevPreconditioner",
    "CastPreconditioner",
    "ILU0Preconditioner",
    "ilu0_factor",
    "ilu0_preconditioner",
    "ilut_preconditioner",
    "jacobi_preconditioner",
    "chebyshev_preconditioner",
    "estimate_lmax_dinv_a",
    "AMGPreconditioner",
    "aggregate_greedy",
    "smoothed_aggregation_preconditioner",
    "smoothed_aggregation_setup",
    "infer_free_grid",
]
