"""Power-method eigensolver — parity with ``ExodusMatrixTest``.

The reference runs a templated power iteration over any Tpetra operator
(``q = z/||z||; z = A q; lambda = q . z``, ``ExodusMatrixTest.cpp:27-129``)
with residual checks ``||A q - lambda q||_2`` every ``reportFrequency``
iterations and defaults 500 iterations / 1e-2 tolerance
(``ExodusMatrixTest.cpp:166, :95``).  Same algorithm here as a jitted
``lax.while_loop``; the dot is injectable for the sharded path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["PowerResult", "power_method"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["eigenvalue", "eigenvector", "iterations", "residual", "converged"],
    meta_fields=[],
)
@dataclasses.dataclass
class PowerResult:
    eigenvalue: jax.Array
    eigenvector: jax.Array
    iterations: jax.Array
    residual: jax.Array
    converged: jax.Array


@partial(jax.jit, static_argnames=("maxiter", "check_every", "dot"))
def power_method(
    A,
    z0: jax.Array,
    *,
    maxiter: int = 500,
    tol: float = 1e-2,
    check_every: int = 50,
    dot: Callable = jnp.vdot,
) -> PowerResult:
    """``A``: pytree operator with ``.matvec(x)`` (see API note in cg.py)."""
    matvec = A.matvec
    tol = jnp.asarray(tol, z0.dtype)

    def norm(v):
        return jnp.sqrt(dot(v, v))

    def body(state):
        z, lam, res, k = state
        q = z / jnp.maximum(norm(z), jnp.finfo(z.dtype).tiny)
        z = matvec(q)
        lam = dot(q, z)
        # Residual check on report iterations only, like the reference
        # (``ExodusMatrixTest.cpp:95-107``); elsewhere carry the previous.
        res = jnp.where(
            (k + 1) % check_every == 0, norm(z - lam * q), res
        )
        return (z, lam, res, k + 1)

    def cond(state):
        _, _, res, k = state
        return jnp.logical_and(res > tol, k < maxiter)

    z, lam, res, k = jax.lax.while_loop(
        cond,
        body,
        (z0, jnp.asarray(0.0, z0.dtype), jnp.asarray(jnp.inf, z0.dtype), jnp.int32(0)),
    )
    q = z / jnp.maximum(norm(z), jnp.finfo(z.dtype).tiny)
    final_res = norm(matvec(q) - dot(q, matvec(q)) * q)
    return PowerResult(
        eigenvalue=lam,
        eigenvector=q,
        iterations=k,
        residual=final_res,
        converged=final_res <= tol,
    )
