"""Jacobi (diagonal) preconditioner.

The TPU-friendly point preconditioner: one elementwise multiply, fuses into
the surrounding Krylov arithmetic.  Replaces the role of the reference's
Ifpack2 ILUT (``BelosMueLuSolver.cpp:92-97``) on the TPU path — ILUT's
sequential triangular solves are hostile to wide SIMD hardware, and for the
graph Laplacian Jacobi/Chebyshev/AMG reach the same answers (SURVEY §7
"ILUT parity").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.ell import ELLMatrix

__all__ = ["jacobi_preconditioner"]


def jacobi_preconditioner(A: ELLMatrix):
    """Return ``M(r) = r / diag(A)`` (padding slots use diag 1)."""
    inv_diag = 1.0 / A.diagonal_padded(fill=1.0)

    def apply(r: jax.Array) -> jax.Array:
        return r * inv_diag

    return apply
