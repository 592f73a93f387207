"""Restarted GMRES, pure JAX — literal parity with the reference solver.

The reference solves with Belos ``"GMRES"`` + right preconditioning
(``BelosMueLuSolver.cpp:101-106``).  This is GMRES(m) with modified
Gram-Schmidt Arnoldi and Givens rotations, expressed as fixed-shape
``lax.fori_loop``/``lax.while_loop`` programs: the Krylov basis is a static
(m+1, n) array, so XLA compiles one program regardless of iteration counts.

Operator/preconditioner are pytree arguments (see the API note in
:mod:`.cg`); orthogonalization dots become ``lax.psum`` reductions under the
sharded dot.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .cg import IdentityPrecond

__all__ = ["GMRESResult", "gmres_solve"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "iterations", "relres", "converged"],
    meta_fields=[],
)
@dataclasses.dataclass
class GMRESResult:
    x: jax.Array
    iterations: jax.Array  # total inner iterations
    relres: jax.Array
    converged: jax.Array


@partial(jax.jit, static_argnames=("restart", "maxiter", "dot"))
def gmres_solve(
    A: Any,
    b: jax.Array,
    x0: jax.Array,
    *,
    precond: Any = None,  # right preconditioner M (callable pytree)
    restart: int = 30,
    tol: float = 1e-14,
    maxiter: int = 300,
    dot: Callable = jnp.vdot,
) -> GMRESResult:
    """Solve ``A x = b`` with right-preconditioned GMRES(m).

    ``tol`` is relative (``||r||/||b||``), matching Belos' scaled residual
    test for the tolerance passed at ``BelosMueLuSolver.cpp:151``.
    """
    M = precond if precond is not None else IdentityPrecond()
    n = b.shape[0]
    m = restart
    dtype = b.dtype
    eps = jnp.finfo(dtype).tiny

    bnorm = jnp.sqrt(dot(b, b))
    bnorm = jnp.where(bnorm == 0, jnp.asarray(1.0, dtype), bnorm)
    target = jnp.asarray(tol, dtype) * bnorm

    def arnoldi_step(j, carry):
        V, H, cs, sn, g = carry
        # w = A M v_j
        w = A.matvec(M(V[j]))
        # Modified Gram-Schmidt against v_0..v_j.
        def mgs(i, wh):
            w, h = wh
            hij = jnp.where(i <= j, dot(V[i], w), 0.0)
            w = w - hij * V[i]
            h = h.at[i].set(hij)
            return (w, h)

        w, h = jax.lax.fori_loop(0, m + 1, mgs, (w, jnp.zeros(m + 1, dtype)))
        wnorm = jnp.sqrt(dot(w, w))
        h = h.at[j + 1].set(wnorm)
        V = V.at[j + 1].set(w / jnp.maximum(wnorm, eps))

        # Apply accumulated Givens rotations to the new column.
        def rot(i, hcol):
            hi, hi1 = hcol[i], hcol[i + 1]
            return jnp.where(
                i <= j - 1,
                hcol.at[i].set(cs[i] * hi + sn[i] * hi1).at[i + 1].set(
                    -sn[i] * hi + cs[i] * hi1
                ),
                hcol,
            )

        h = jax.lax.fori_loop(0, m, rot, h)
        # New rotation to zero h[j+1].
        denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
        c = jnp.where(denom > 0, h[j] / jnp.maximum(denom, eps), 1.0)
        s = jnp.where(denom > 0, h[j + 1] / jnp.maximum(denom, eps), 0.0)
        h = h.at[j].set(c * h[j] + s * h[j + 1]).at[j + 1].set(0.0)
        cs = cs.at[j].set(c)
        sn = sn.at[j].set(s)
        g = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
        H = H.at[:, j].set(h)
        return (V, H, cs, sn, g)

    def restart_cycle(state):
        x, _, k, _ = state
        r = b - A.matvec(x)
        beta = jnp.sqrt(dot(r, r))
        V = jnp.zeros((m + 1, n), dtype)
        V = V.at[0].set(r / jnp.maximum(beta, eps))
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        # Run j = 0..m-1 inner steps, tracking the first j where |g[j+1]|
        # (the implicit residual) drops below target.
        def inner(j, carry):
            basis, done_at = carry
            # Freeze the recurrence once converged so g/H stay exact.
            carry2 = jax.lax.cond(
                done_at == m, lambda c: arnoldi_step(j, c), lambda c: c, basis
            )
            g2 = carry2[4]
            hit = jnp.abs(g2[j + 1]) <= target
            done_at = jnp.where((done_at == m) & hit, j + 1, done_at)
            return carry2, done_at

        (V, H, cs, sn, g), done_at = jax.lax.fori_loop(
            0, m, inner, ((V, H, cs, sn, g), jnp.int32(m))
        )
        j_used = done_at  # number of inner iterations actually needed

        # Solve the j_used x j_used upper-triangular system H y = g by
        # masked back-substitution over the full static m.
        active = jnp.arange(m) < j_used

        def back(i_rev, y):
            i = m - 1 - i_rev
            hii = H[i, i]
            rhs = g[i] - jnp.dot(H[i, :], y)
            yi = jnp.where(active[i], rhs / jnp.where(hii != 0, hii, 1.0), 0.0)
            return y.at[i].set(yi)

        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, dtype))
        # x += M (V[:m]^T y)  (right preconditioning)
        update = jnp.tensordot(y, V[:m], axes=1)
        x = x + M(update)
        rnorm = jnp.abs(g[j_used])
        return (x, rnorm, k + j_used, beta)

    def cond(state):
        _, rnorm, k, _ = state
        return jnp.logical_and(rnorm > target, k < maxiter)

    r0 = b - A.matvec(x0)
    rnorm0 = jnp.sqrt(dot(r0, r0))
    x, rnorm, k, _ = jax.lax.while_loop(
        cond, restart_cycle, (x0, rnorm0, jnp.int32(0), rnorm0)
    )
    # Report the true residual, not the implicit one.
    r = b - A.matvec(x)
    rnorm = jnp.sqrt(dot(r, r))
    return GMRESResult(
        x=x, iterations=k, relres=rnorm / bnorm, converged=rnorm <= target
    )
