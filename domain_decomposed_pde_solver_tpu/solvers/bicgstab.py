"""BiCGStab, pure JAX — the nonsymmetric workhorse without GMRES memory.

Rounds out the Krylov family (the reference's Belos factory exposes
BiCGStab alongside GMRES/CG; the driver only ever instantiates "GMRES",
``BelosMueLuSolver.cpp:105-106``).  Useful here for nonsymmetric operators
(future convection terms) where GMRES(m)'s O(m n) basis is too expensive.

Same conventions as :mod:`.cg`: operator/preconditioner as pytree
arguments, ``lax.while_loop`` body, injectable psum-capable dot.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .cg import IdentityPrecond

__all__ = ["BiCGStabResult", "bicgstab_solve"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "iterations", "relres", "converged"],
    meta_fields=[],
)
@dataclasses.dataclass
class BiCGStabResult:
    x: jax.Array
    iterations: jax.Array
    relres: jax.Array
    converged: jax.Array


@partial(jax.jit, static_argnames=("maxiter", "dot"))
def bicgstab_solve(
    A: Any,
    b: jax.Array,
    x0: jax.Array,
    *,
    precond: Any = None,  # right preconditioner
    tol: float = 1e-14,
    maxiter: int = 300,
    dot: Callable = jnp.vdot,
) -> BiCGStabResult:
    """Right-preconditioned BiCGStab; ``tol`` is relative ``||r||/||b||``."""
    M = precond if precond is not None else IdentityPrecond()
    dtype = b.dtype
    eps = jnp.finfo(dtype).tiny

    bnorm = jnp.sqrt(dot(b, b))
    bnorm = jnp.where(bnorm == 0, jnp.asarray(1.0, dtype), bnorm)
    target = jnp.asarray(tol, dtype) * bnorm

    r0 = b - A.matvec(x0)
    rhat = r0  # shadow residual

    def cond(state):
        x, r, p, v, rho, alpha, omega, k = state
        rnorm = jnp.sqrt(dot(r, r))
        return jnp.logical_and(rnorm > target, k < maxiter)

    def body(state):
        x, r, p, v, rho, alpha, omega, k = state
        rho_new = dot(rhat, r)
        beta = (rho_new / jnp.where(rho == 0, eps, rho)) * (
            alpha / jnp.where(omega == 0, eps, omega)
        )
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = A.matvec(phat)
        alpha = rho_new / jnp.where(dot(rhat, v) == 0, eps, dot(rhat, v))
        s = r - alpha * v
        shat = M(s)
        t = A.matvec(shat)
        tt = dot(t, t)
        omega = jnp.where(tt == 0, 0.0, dot(t, s) / jnp.where(tt == 0, eps, tt))
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega, k + 1)

    z = jnp.zeros_like(b)
    one = jnp.asarray(1.0, dtype)
    x, r, *_, k = jax.lax.while_loop(
        cond, body, (x0, r0, z, z, one, one, one, jnp.int32(0))
    )
    rnorm = jnp.sqrt(dot(r, r))
    return BiCGStabResult(
        x=x, iterations=k, relres=rnorm / bnorm, converged=rnorm <= target
    )
