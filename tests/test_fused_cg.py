"""Fused whole-CG Pallas kernel vs the composable CG solver.

The fused kernel must reproduce the (operator, Jacobi) CG trajectory —
same iteration counts, same answers — while running the entire loop in
one pallas_call (interpret mode here; compiled on TPU).
"""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from domain_decomposed_pde_solver_tpu.ops.bsg import bsg_from_csr
from domain_decomposed_pde_solver_tpu.ops.csr import CSRMatrix
from domain_decomposed_pde_solver_tpu.solvers import cg_solve, jacobi_preconditioner
from domain_decomposed_pde_solver_tpu.solvers.fused_cg import fused_cg_solve


def _laplacian(n, deg, seed, shift=0.5):
    rng = np.random.default_rng(seed)
    m = n * deg // 2
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    keep = u != v
    u, v = u[keep], v[keep]
    M = sp.coo_matrix(
        (np.ones(2 * u.size), (np.r_[u, v], np.r_[v, u])), shape=(n, n)
    ).tocsr()
    M.data[:] = -1.0
    M.setdiag(0)
    M.eliminate_zeros()
    M.setdiag(-np.asarray(M.sum(axis=1)).ravel() + shift)
    M = M.tocsr()
    M.sort_indices()
    return M


def _to_csr(S):
    return CSRMatrix(
        indptr=S.indptr.astype(np.int64),
        indices=S.indices.astype(np.int64),
        data=S.data.astype(np.float64),
        shape=S.shape,
    )


@pytest.mark.parametrize("n,deg,seed", [(700, 8, 0), (2500, 14, 1)])
def test_fused_matches_composable_cg(n, deg, seed):
    S = _laplacian(n, deg, seed)
    B = bsg_from_csr(_to_csr(S))
    rng = np.random.default_rng(seed + 7)
    x_true = rng.standard_normal(n)
    b_host = (S @ x_true).astype(np.float32)
    b = B.put_vector(b_host)

    ref = cg_solve(
        B, b, jnp.zeros_like(b), precond=jacobi_preconditioner(B),
        tol=1e-6, maxiter=500,
    )
    res = fused_cg_solve(B, b, tol=1e-6, maxiter=500)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    x = B.get_vector(res.x).astype(np.float64)
    relres = np.linalg.norm(S @ x - b_host) / np.linalg.norm(b_host)
    assert relres < 5e-6


def test_fused_respects_maxiter():
    S = _laplacian(500, 8, 3, shift=1e-3)  # ill-conditioned
    B = bsg_from_csr(_to_csr(S))
    b = B.put_vector(np.random.default_rng(4).standard_normal(500).astype(np.float32))
    res = fused_cg_solve(B, b, tol=1e-12, maxiter=7)
    assert int(res.iterations) == 7
    assert not bool(res.converged)


def test_fused_warm_start():
    S = _laplacian(600, 9, 5)
    B = bsg_from_csr(_to_csr(S))
    x_true = np.random.default_rng(6).standard_normal(600)
    b = B.put_vector((S @ x_true).astype(np.float32))
    r1 = fused_cg_solve(B, b, tol=1e-6, maxiter=500)
    # Restart from the converged iterate: should finish immediately.
    r2 = fused_cg_solve(B, b, x0=r1.x, tol=1e-6, maxiter=500)
    assert int(r2.iterations) == 0
    assert bool(r2.converged)
