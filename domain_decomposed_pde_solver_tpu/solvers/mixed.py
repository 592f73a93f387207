"""Mixed-precision solve: f32 device Krylov + f64 iterative refinement.

TPU hardware is built for f32/bf16; f64 is slow (emulated).  The BASELINE
still demands answers matching the f64 reference to 1e-8 relative residual
(SURVEY §7 "f64 on TPU ... a real tension").  Classical iterative
refinement resolves it:

    repeat:  r = b - A x        (f64, host CSR — one cheap matvec)
             solve A d ~= r     (f32 CG on device, loose tolerance)
             x := x + d         (f64 accumulation)

The device does all the heavy lifting at full f32 rate; the f64 outer loop
(a handful of host matvecs) recovers f64-accurate residuals.  Convergence:
each sweep contracts the error by ~the f32 solve tolerance until the f64
residual floor.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.csr import CSRMatrix
from ..ops.dia import choose_operator
from .cg import cg_solve
from .precond.jacobi import DiagonalPreconditioner

__all__ = ["MixedSolveResult", "iterative_refinement_solve"]


@dataclasses.dataclass
class MixedSolveResult:
    x: np.ndarray  # f64 solution
    refinements: int
    inner_iterations: int
    relres: float  # f64 relative residual
    converged: bool


def iterative_refinement_solve(
    A: CSRMatrix,
    b: np.ndarray,
    x0: Optional[np.ndarray] = None,
    *,
    tol: float = 1e-10,
    inner_tol: float = 1e-6,
    inner_maxiter: int = 1000,
    max_refinements: int = 20,
    precond: Any = "jacobi",
    operator=None,
) -> MixedSolveResult:
    """Solve ``A x = b`` to f64 accuracy using an f32 device solver.

    ``A``/``b`` are host f64; the device operator is built once (auto
    DIA/ELL via :func:`..ops.dia.choose_operator`) in f32.  ``precond``:
    ``"jacobi"`` | ``None`` | a callable pytree built by the caller.
    """
    n = A.n_rows
    b = np.asarray(b, dtype=np.float64)
    x = np.zeros(n) if x0 is None else np.asarray(x0, dtype=np.float64).copy()
    bnorm = float(np.linalg.norm(b)) or 1.0

    A32 = operator if operator is not None else choose_operator(A, dtype=jnp.float32)
    if precond == "jacobi":
        M = DiagonalPreconditioner(1.0 / A32.diagonal_padded(fill=1.0))
    else:
        M = precond

    inner_total = 0
    refinements = 0
    relres = float(np.linalg.norm(b - A.matvec(x))) / bnorm
    while relres > tol and refinements < max_refinements:
        r = b - A.matvec(x)  # f64 residual on host
        rnorm = float(np.linalg.norm(r)) or 1.0
        # Scale so the f32 inner solve works near unit magnitude.  The
        # uniform put/get interface keeps this agnostic to the operator's
        # internal layout (identity-padded ELL/DIA or permuted BSG).
        r32 = A32.put_vector((r / rnorm).astype(np.float32))
        res = cg_solve(
            A32,
            r32,
            jnp.zeros_like(r32),
            precond=M,
            tol=inner_tol,
            maxiter=inner_maxiter,
        )
        d = A32.get_vector(res.x).astype(np.float64) * rnorm
        x = x + d
        inner_total += int(res.iterations)
        refinements += 1
        new_relres = float(np.linalg.norm(b - A.matvec(x))) / bnorm
        if new_relres >= relres:  # stagnation at the f32 floor
            x = x - d  # keep the better iterate; reported relres stays its
            break
        relres = new_relres
    return MixedSolveResult(
        x=x,
        refinements=refinements,
        inner_iterations=inner_total,
        relres=relres,
        converged=relres <= tol,
    )
