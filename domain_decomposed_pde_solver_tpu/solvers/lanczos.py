"""Lanczos spectral estimation (lambda_min / lambda_max / condition number).

The reference ships a power method (``ExodusMatrixTest.cpp:27-129``) which
converges slowly when eigenvalues cluster.  Lanczos gives both spectrum
edges in a few dozen matvecs: run k steps with full reorthogonalization
(k is small, so the (k, n) basis and the k^2 dots are cheap), then solve
the k x k tridiagonal eigenproblem on-device.

Uses the same operator/dot conventions as the Krylov solvers, so it runs
sharded (psum dot) unchanged.  Typical uses: Chebyshev interval bounds,
condition-number reporting, verifying AMG-filtered operators stay SPD.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["LanczosResult", "lanczos_extremes"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lmin", "lmax", "ritz_values"],
    meta_fields=[],
)
@dataclasses.dataclass
class LanczosResult:
    lmin: jax.Array  # smallest Ritz value (upper bound on lambda_min)
    lmax: jax.Array  # largest Ritz value (lower bound on lambda_max)
    ritz_values: jax.Array  # (k,) full Ritz spectrum

    @property
    def condition(self) -> jax.Array:
        return self.lmax / self.lmin


@partial(jax.jit, static_argnames=("k", "dot"))
def lanczos_extremes(
    A: Any,
    z0: jax.Array,
    *,
    k: int = 40,
    dot: Callable = jnp.vdot,
) -> LanczosResult:
    """k-step Lanczos with full reorthogonalization on operator ``A``.

    ``z0`` should be random and must be zero on padding slots so the
    recurrence stays in the logical subspace.
    """
    n = z0.shape[0]
    dtype = z0.dtype
    eps = jnp.finfo(dtype).tiny

    def norm(v):
        return jnp.sqrt(dot(v, v))

    V = jnp.zeros((k + 1, n), dtype)
    V = V.at[0].set(z0 / jnp.maximum(norm(z0), eps))
    alphas = jnp.zeros(k, dtype)
    betas = jnp.zeros(k, dtype)  # betas[j] = beta_{j+1}

    def body(j, carry):
        V, alphas, betas = carry
        v = V[j]
        w = A.matvec(v)
        alpha = dot(v, w)
        w = w - alpha * v - jnp.where(j > 0, betas[jnp.maximum(j - 1, 0)], 0.0) * V[
            jnp.maximum(j - 1, 0)
        ]

        # Full reorthogonalization against all previous vectors (masked).
        def reorth(i, w):
            coeff = jnp.where(i <= j, dot(V[i], w), 0.0)
            return w - coeff * V[i]

        w = jax.lax.fori_loop(0, k + 1, reorth, w)
        beta = norm(w)
        V = V.at[j + 1].set(w / jnp.maximum(beta, eps))
        alphas = alphas.at[j].set(alpha)
        betas = betas.at[j].set(beta)
        return (V, alphas, betas)

    V, alphas, betas = jax.lax.fori_loop(0, k, body, (V, alphas, betas))

    # Exact breakdown (beta_j ~ 0) means the Krylov space became invariant at
    # step j: every later alpha/beta is noise from a re-normalized ~zero
    # vector and would inject spurious Ritz values (e.g. lmin = 0).  Static
    # shapes forbid truncating T, so mask instead: steps after the first
    # tiny beta get diagonal alphas[0] — a Rayleigh quotient, which on an
    # invariant subspace lies inside the captured Ritz interval, so the
    # extremes are unchanged — and zero off-diagonals (decoupled).
    scale = jnp.max(jnp.abs(alphas)) + jnp.max(betas)
    tiny = jnp.finfo(dtype).eps * jnp.maximum(scale, 1.0)
    brk = betas <= tiny  # breakdown at step j
    valid = jnp.concatenate(
        [jnp.ones(1, bool), jnp.cumsum(brk[:-1]) == 0]
    )  # valid[j]: no breakdown strictly before step j
    diag = jnp.where(valid, alphas, alphas[0])
    off = jnp.where(valid[1:] & ~brk[: k - 1], betas[: k - 1], 0.0)
    T = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    ritz = jnp.linalg.eigvalsh(T)
    return LanczosResult(lmin=ritz[0], lmax=ritz[-1], ritz_values=ritz)
