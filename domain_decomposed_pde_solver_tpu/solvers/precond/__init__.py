"""Preconditioners: Jacobi, Chebyshev, smoothed-aggregation AMG."""

from .jacobi import jacobi_preconditioner
from .chebyshev import chebyshev_preconditioner, estimate_lmax_dinv_a

__all__ = [
    "jacobi_preconditioner",
    "chebyshev_preconditioner",
    "estimate_lmax_dinv_a",
]
