"""Transient heat equation: implicit time stepping on the graph Laplacian.

The reference solves only the steady state; its Exodus "timesteps" are
solver-iteration snapshots (``BelosMueLuSolver.cpp:112-133``).  This model
family adds the real dynamics

    du/dt = -(A u - b),   u(0) = u0

with unconditionally-stable implicit Euler: each step solves

    (I + dt A) u_{n+1} = u_n + dt b

by warm-started CG (the previous step is an excellent initial guess, so
late steps converge in a handful of iterations).  The steady state of the
flow is exactly the reference's solution of ``A u = b``, which the tests
exploit.  Output: one Exodus timestep per physical time step — the
animation the reference fakes with solver iterates, but with physical time.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ell import pad_vector, unpad_vector
from ..solvers.cg import cg_solve_with_state
from .heat import HeatSystem

__all__ = ["TransientResult", "transient_heat_solve", "ShiftedOperator"]


@dataclasses.dataclass
class TransientResult:
    times: np.ndarray  # (n_steps,)
    u: np.ndarray  # (n_free,) final state
    history: Optional[np.ndarray]  # (n_steps, n_free) if recorded
    total_cg_iterations: int


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShiftedOperator:
    """``(I + dt A)`` as an operator pytree (any inner operator)."""

    A: object = dataclasses.field(metadata=dict(static=False))
    dt: jax.Array = dataclasses.field(metadata=dict(static=False))

    def matvec(self, x: jax.Array) -> jax.Array:
        return x + self.dt * self.A.matvec(x)

    def diagonal_padded(self, fill: float = 1.0) -> jax.Array:
        d = 1.0 + self.dt * self.A.diagonal_padded(fill=0.0)
        pad = jnp.arange(d.shape[0]) >= self.A.n_rows
        return jnp.where(pad, jnp.asarray(fill, d.dtype), d)


def transient_heat_solve(
    system: HeatSystem,
    operator,
    *,
    dt: float = 0.01,
    n_steps: int = 50,
    u0: Optional[np.ndarray] = None,
    tol: float = 1e-10,
    maxiter: int = 500,
    record: bool = False,
    callback: Optional[Callable[[int, float, np.ndarray], None]] = None,
    dtype=None,
) -> TransientResult:
    """Integrate du/dt = -(A u - b) with implicit Euler + warm-started CG.

    ``operator`` is the device operator for A (from
    :func:`..ops.dia.choose_operator`); the shifted systems reuse it
    unchanged.  ``callback(step, t, u_host)`` fires after every step (the
    hook the solution writer uses for per-timestep Exodus output).
    """
    n = system.n_free
    n_pad = operator.n_pad
    dt_arr = jnp.asarray(dt, operator.dtype)
    shifted = ShiftedOperator(A=operator, dt=dt_arr)
    from ..solvers.precond.jacobi import DiagonalPreconditioner

    M = DiagonalPreconditioner(1.0 / shifted.diagonal_padded())

    b = pad_vector(
        np.asarray(system.b, dtype=np.dtype(operator.dtype)), n_pad
    )
    u = pad_vector(
        np.zeros(n, dtype=np.dtype(operator.dtype)) if u0 is None
        else np.asarray(u0, dtype=np.dtype(operator.dtype)),
        n_pad,
    )
    times = []
    hist: List[np.ndarray] = []
    total_iters = 0
    t = 0.0
    for step in range(1, n_steps + 1):
        rhs = u + dt_arr * b
        res, _ = cg_solve_with_state(
            shifted, rhs, u, precond=M, tol=tol, maxiter=maxiter
        )
        u = res.x
        total_iters += int(res.iterations)
        t += dt
        times.append(t)
        if record or callback is not None:
            # Device->host fetch only when someone consumes it (each fetch
            # serializes the step against the host).
            u_host = unpad_vector(u, n)
            if record:
                hist.append(np.array(u_host))
            if callback is not None:
                callback(step, t, u_host)
    return TransientResult(
        times=np.asarray(times),
        u=unpad_vector(u, n),
        history=np.stack(hist) if hist else None,
        total_cg_iterations=total_iters,
    )
