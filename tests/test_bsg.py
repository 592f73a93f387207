"""BSG (binned shuffle-gather) format: packing invariants + SpMV parity.

The packed form must reproduce the CSR matvec bit-for-bit up to f32
rounding, through both evaluation paths (pure-XLA reference and the Pallas
kernel in interpreter mode).  Replaces nothing in the reference — the
reference's SpMV is Tpetra's (``ExodusMatrixTest.cpp:98-102``); BSG is the
TPU-native formulation for unstructured meshes.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from domain_decomposed_pde_solver_tpu.ops.bsg import (
    BSGMatrix,
    bsg_from_csr,
    bsg_spmv,
)
from domain_decomposed_pde_solver_tpu.ops.csr import CSRMatrix


def _random_laplacian(n, avg_deg, seed):
    """Random symmetric graph Laplacian with integer entries (like the
    heat system: off-diag -1, diag = degree)."""
    rng = np.random.default_rng(seed)
    nnz_half = n * avg_deg // 2
    u = rng.integers(0, n, nnz_half)
    v = rng.integers(0, n, nnz_half)
    keep = u != v
    u, v = u[keep], v[keep]
    rows = np.concatenate([u, v])
    cols = np.concatenate([v, u])
    M = sp.coo_matrix((np.ones(rows.size), (rows, cols)), shape=(n, n)).tocsr()
    M.data[:] = 1.0  # dedupe multiplicity
    M = M.multiply(-1).tolil()
    M.setdiag(-np.asarray(M.sum(axis=1)).ravel())
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


@pytest.mark.parametrize("n,deg,seed", [(37, 4, 0), (600, 9, 1), (2500, 15, 2)])
@pytest.mark.parametrize("reorder", [True, False])
def test_bsg_matvec_matches_csr(n, deg, seed, reorder):
    S = _random_laplacian(n, deg, seed)
    A = bsg_from_csr(_to_csr(S), reorder=reorder)
    assert isinstance(A, BSGMatrix)
    x = np.random.default_rng(seed + 100).standard_normal(n).astype(np.float32)
    y_ref = (S @ x).astype(np.float32)
    xp = A.put_vector(x)

    y1 = A.get_vector(np.asarray(A.matvec_reference(xp)))
    np.testing.assert_allclose(y1, y_ref, rtol=2e-5, atol=1e-4)

    # Pallas kernel, interpreter mode (no TPU in CI).
    y2 = A.get_vector(np.asarray(bsg_spmv(A, xp, interpret=True)))
    np.testing.assert_allclose(y2, y_ref, rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("win", [8, 32])
def test_bsg_wide_windows_match_csr(win):
    """win=32 bins (ROADMAP item 5): fewer micro-ops, same numbers —
    through both the XLA reference and the Pallas kernel (interpret)."""
    S = _random_laplacian(2500, 15, 7)
    A8 = bsg_from_csr(_to_csr(S), win=8)
    A = bsg_from_csr(_to_csr(S), win=win)
    assert A.win == win
    if win > 8:
        assert A.max_mo <= A8.max_mo  # wider bins never add micro-ops
    x = np.random.default_rng(7).standard_normal(2500).astype(np.float32)
    y_ref = (S @ x).astype(np.float32)
    xp = A.put_vector(x)
    y1 = A.get_vector(np.asarray(A.matvec_reference(xp)))
    np.testing.assert_allclose(y1, y_ref, rtol=2e-5, atol=1e-4)
    y2 = A.get_vector(np.asarray(bsg_spmv(A, xp, interpret=True)))
    np.testing.assert_allclose(y2, y_ref, rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("win", [8, 32])
def test_bsg_sparse_upload_bit_identical(win):
    """The low-fill (index, value) device-scatter construction must produce
    the SAME packed operator as the dense host fill — w0/qq/rm/vals/diag
    all bit-identical (slot indices are unique by the micro-op conflict
    rules, so the scatter cannot collide)."""
    S = _random_laplacian(3000, 12, 11)
    Ad = bsg_from_csr(_to_csr(S), win=win, sparse_upload=False)
    As = bsg_from_csr(_to_csr(S), win=win, sparse_upload=True)
    assert As.max_mo == Ad.max_mo and As.n_tiles == Ad.n_tiles
    for name in ("w0", "qq", "rm", "vals", "diag"):
        np.testing.assert_array_equal(
            np.asarray(getattr(As, name)), np.asarray(getattr(Ad, name)),
            err_msg=name,
        )
    x = np.random.default_rng(3).standard_normal(3000).astype(np.float32)
    y_ref = (S @ x).astype(np.float32)
    xp = As.put_vector(x)
    y = As.get_vector(np.asarray(As.matvec_reference(xp)))
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("win,chunk", [(8, 16), (8, 32), (16, 16), (32, 16)])
def test_bsg_ragged_matches_csr(win, chunk):
    """Ragged (chunked flat micro-op) layout: same numbers as CSR through
    both the XLA reference and the Pallas chunk-grid kernel (interpret).
    The layout exists because at scale every dense tile pays max_mo while
    the mean is ~57% of it (measured at 3.2M-row refined lbracket)."""
    S = _random_laplacian(4000, 14, 21)
    A = bsg_from_csr(_to_csr(S), win=win, chunk=chunk, layout="ragged")
    assert A.tmap is not None and A.chunk == chunk
    n_chunks, C = A.w0.shape
    assert C == chunk and A.qq.shape == (n_chunks, chunk, 8, 128)
    tmap = np.asarray(A.tmap)
    assert tmap.shape == (n_chunks,)
    # Every tile owns >= 1 chunk and chunks are tile-ordered (the kernel's
    # first-visit/accumulate logic needs non-decreasing tmap).
    assert (np.diff(tmap) >= 0).all()
    np.testing.assert_array_equal(np.unique(tmap), np.arange(A.n_tiles))
    x = np.random.default_rng(21).standard_normal(4000).astype(np.float32)
    y_ref = (S @ x).astype(np.float32)
    xp = A.put_vector(x)
    y1 = A.get_vector(np.asarray(A.matvec_reference(xp)))
    np.testing.assert_allclose(y1, y_ref, rtol=2e-5, atol=1e-4)
    y2 = A.get_vector(np.asarray(bsg_spmv(A, xp, interpret=True)))
    np.testing.assert_allclose(y2, y_ref, rtol=2e-5, atol=1e-4)


def test_bsg_ragged_sparse_upload_bit_identical():
    """Ragged sparse (index, value) upload == ragged dense host fill."""
    S = _random_laplacian(3000, 12, 11)
    Ad = bsg_from_csr(_to_csr(S), layout="ragged", sparse_upload=False)
    As = bsg_from_csr(_to_csr(S), layout="ragged", sparse_upload=True)
    assert As.w0.shape == Ad.w0.shape
    np.testing.assert_array_equal(np.asarray(As.tmap), np.asarray(Ad.tmap))
    for name in ("w0", "qq", "rm", "vals", "diag"):
        np.testing.assert_array_equal(
            np.asarray(getattr(As, name)), np.asarray(getattr(Ad, name)),
            err_msg=name,
        )


def test_bsg_layout_auto_picks_dense_when_small():
    """Small operators stay dense (the chunk grid can't amortize), and
    ragged is only selected when it cuts slot bytes >= 1.25x."""
    S = _random_laplacian(2000, 10, 5)
    A = bsg_from_csr(_to_csr(S))  # layout="auto"
    assert A.tmap is None and A.chunk == 0


def test_bsg_ragged_rejected_by_fused_cg():
    from domain_decomposed_pde_solver_tpu.solvers import fused_cg_solve

    S = _random_laplacian(1000, 8, 6)
    A = bsg_from_csr(_to_csr(S), layout="ragged")
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="dense BSG layout"):
        fused_cg_solve(A, jnp.zeros(A.n_pad, jnp.float32))


def test_bsg_win_validation():
    S = _random_laplacian(64, 4, 8)
    with pytest.raises(ValueError):
        bsg_from_csr(_to_csr(S), win=12)
    with pytest.raises(ValueError):
        bsg_from_csr(_to_csr(S), win=128)  # int8 qq bound


def test_bsg_put_get_roundtrip():
    S = _random_laplacian(211, 6, 3)
    A = bsg_from_csr(_to_csr(S))
    x = np.arange(211, dtype=np.float32)
    np.testing.assert_array_equal(A.get_vector(np.asarray(A.put_vector(x))), x)


def test_bsg_packing_is_conflict_free():
    """Within one micro-op every populated output slot (a, l) and every
    source pair (a, r) appears at most once — the condition under which the
    two-level shuffle is exact."""
    S = _random_laplacian(1500, 12, 4)
    csr = _to_csr(S)
    A = bsg_from_csr(csr)
    vals = np.asarray(A.vals, dtype=np.float32)
    rm = np.asarray(A.rm)
    # Count the populated slots: must equal nnz (no drops, no dups).
    assert int((vals != 0).sum()) == csr.nnz
    # Per micro-op, populated (a, r) pairs are unique: scatter nnz markers
    # into (a, r) and check none collided (collision would overwrite).
    for t in range(A.n_tiles):
        for m in range(A.max_mo):
            mask = vals[t, m] != 0
            if not mask.any():
                continue
            a_idx, l_idx = np.nonzero(mask)
            r_idx = rm[t, m, a_idx, l_idx]
            pairs = set(zip(a_idx.tolist(), r_idx.tolist()))
            assert len(pairs) == a_idx.size


def test_bsg_diagonal():
    S = _random_laplacian(123, 5, 5)
    A = bsg_from_csr(_to_csr(S))
    d = A.get_vector(np.asarray(A.diag))
    np.testing.assert_allclose(d, S.diagonal(), rtol=0, atol=0)


def test_bsg_exact_compact_storage_for_integer_laplacian():
    S = _random_laplacian(300, 6, 6)
    A = bsg_from_csr(_to_csr(S))
    # Graph-Laplacian entries are small integers: int8 is exact (bf16 is
    # the middle tier for integer-but-large or bf16-round-trippable data).
    assert A.storage == "int8"
    A2 = bsg_from_csr(_to_csr(S), storage="bfloat16")
    assert A2.storage == "bfloat16"
    x = np.random.default_rng(4).standard_normal(300).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(A.matvec_reference(A.put_vector(x))),
        np.asarray(A2.matvec_reference(A2.put_vector(x))))


def test_bsg_float_values_keep_f32():
    S = _random_laplacian(100, 5, 7).astype(np.float64)
    S.data *= np.pi
    A = bsg_from_csr(_to_csr(S))
    assert A.storage == "float32"
    x = np.random.default_rng(8).standard_normal(100).astype(np.float32)
    y = A.get_vector(np.asarray(A.matvec_reference(A.put_vector(x))))
    np.testing.assert_allclose(y, (S @ x).astype(np.float32), rtol=2e-5, atol=1e-4)


def test_bsg_in_cg_solver():
    """BSG works as a drop-in CG operator (matvec + diagonal contracts)."""
    from domain_decomposed_pde_solver_tpu.solvers.cg import cg_solve

    S = _random_laplacian(400, 7, 9)
    # Make strictly SPD (remove the constant-vector null space).
    S = (S + 0.5 * sp.eye(400)).tocsr()
    A = bsg_from_csr(_to_csr(S))
    rng = np.random.default_rng(10)
    x_true = rng.standard_normal(400)
    b = S @ x_true
    bp = A.put_vector(b.astype(np.float32))
    x0 = A.put_vector(np.zeros(400, np.float32))
    res = cg_solve(A, bp, x0, tol=1e-6, maxiter=500)
    x = A.get_vector(np.asarray(res.x))
    assert float(res.relres) < 1e-5
    np.testing.assert_allclose(x, x_true, rtol=0, atol=5e-3)


def test_bsg_rejects_rectangular():
    csr = CSRMatrix(
        indptr=np.array([0, 1], dtype=np.int64),
        indices=np.array([0], dtype=np.int64),
        data=np.array([1.0]),
        shape=(1, 2),
    )
    with pytest.raises(ValueError):
        bsg_from_csr(csr)


def test_native_canonical_order_matches_lexsort(data_dir):
    """The native bucketed ordering must reproduce np.lexsort exactly on a
    permuted mesh matrix (ops/bsg.py packing fast path)."""
    from domain_decomposed_pde_solver_tpu.io import read_exodus
    from domain_decomposed_pde_solver_tpu.models import assemble_heat_system
    from domain_decomposed_pde_solver_tpu.ops.bsg import _rcm_perm
    from domain_decomposed_pde_solver_tpu.utils.native import (
        bsg_canonical_order_native,
    )

    mesh = read_exodus(str(data_dir / "brick.exo"))
    sy = assemble_heat_system(mesh)
    A = sy.A
    n = A.n_rows
    perm = _rcm_perm(A)
    order = bsg_canonical_order_native(np.asarray(A.indptr), A.indices, perm, n)
    if order is None:
        pytest.skip("native library unavailable")
    rows = np.repeat(np.arange(n, dtype=np.int64), A.row_lengths())
    cols = np.asarray(A.indices, dtype=np.int64)
    rp, cp = perm[rows], perm[cols]
    o = np.lexsort((cp, rp))
    np.testing.assert_array_equal(rp[o], rp[order])
    np.testing.assert_array_equal(cp[o], cp[order])


def test_native_fill_matches_numpy_fill(data_dir):
    """bsg_fill (native single-pass) == the NumPy fancy-scatter fill, given
    the same micro-op assignment."""
    from domain_decomposed_pde_solver_tpu.io import read_exodus
    from domain_decomposed_pde_solver_tpu.models import assemble_heat_system
    import domain_decomposed_pde_solver_tpu.ops.bsg as bsgmod
    import domain_decomposed_pde_solver_tpu.utils.native as nat

    if nat.load_native() is None:
        pytest.skip("native library unavailable")
    mesh = read_exodus(str(data_dir / "brick.exo"))
    sy = assemble_heat_system(mesh)
    B1 = bsgmod.bsg_from_csr(sy.A)
    real_fill = nat.bsg_fill_native
    nat.bsg_fill_native = lambda *a, **k: None
    try:
        B0 = bsgmod.bsg_from_csr(sy.A)
    finally:
        nat.bsg_fill_native = real_fill
    for f in ("w0", "qq", "rm", "vals", "diag"):
        np.testing.assert_array_equal(
            np.asarray(getattr(B1, f)), np.asarray(getattr(B0, f))
        )
    assert B1.max_mo == B0.max_mo


def test_bsg_sparse_upload_2d_bit_identical():
    """The 2-D segmented (micro-op, slot) scatter — the path for slot
    spaces past int32 at 25M-row scale — must produce the same packed
    operator as the dense host fill, including the last-segment padding
    (out-of-range micro-op ids scatter-drop)."""
    S = _random_laplacian(3000, 12, 7)
    Ad = bsg_from_csr(_to_csr(S), win=8, sparse_upload=False)
    A2 = bsg_from_csr(_to_csr(S), win=8, sparse_upload="2d")
    assert A2.max_mo == Ad.max_mo and A2.n_tiles == Ad.n_tiles
    for name in ("w0", "qq", "rm", "vals", "diag"):
        np.testing.assert_array_equal(
            np.asarray(getattr(A2, name)), np.asarray(getattr(Ad, name)),
            err_msg=name,
        )


def test_bsg_sparse_upload_2d_segmented(monkeypatch):
    """Multi-segment streaming + last-segment OOB padding of the 2-D
    scatter, forced by shrinking the segment size below nnz."""
    import domain_decomposed_pde_solver_tpu.ops.bsg as bsgmod

    monkeypatch.setattr(bsgmod, "_UPLOAD_SEG", 4096)
    S = _random_laplacian(2000, 10, 13)
    Ad = bsg_from_csr(_to_csr(S), win=8, sparse_upload=False)
    A2 = bsg_from_csr(_to_csr(S), win=8, sparse_upload="2d")
    for name in ("w0", "qq", "rm", "vals", "diag"):
        np.testing.assert_array_equal(
            np.asarray(getattr(A2, name)), np.asarray(getattr(Ad, name)),
            err_msg=name,
        )


def test_bsg_int8_storage_auto():
    """Integer-valued operators (the graph Laplacian) store the value
    plane as int8 (1 B/slot) with bit-identical SpMV results; non-integer
    values keep bf16/f32."""
    import jax.numpy as jnp

    S = _random_laplacian(3000, 12, 5)
    A = bsg_from_csr(_to_csr(S))
    assert A.storage == "int8" and A.vals.dtype == jnp.int8
    x = np.random.default_rng(9).standard_normal(3000).astype(np.float32)
    y_ref = (S @ x).astype(np.float32)
    xp = A.put_vector(x)
    np.testing.assert_allclose(
        A.get_vector(np.asarray(A.matvec_reference(xp))), y_ref,
        rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(
        A.get_vector(np.asarray(bsg_spmv(A, xp, interpret=True))), y_ref,
        rtol=2e-5, atol=1e-4)

    from domain_decomposed_pde_solver_tpu.ops.csr import CSRMatrix

    S2 = S.astype(np.float64) * 0.3  # non-integer values
    c = _to_csr(S2)
    A2 = bsg_from_csr(c)
    assert A2.storage in ("bfloat16", "float32")
    y2 = A2.get_vector(np.asarray(A2.matvec_reference(A2.put_vector(x))))
    np.testing.assert_allclose(y2, (S2 @ x).astype(np.float32),
                               rtol=2e-3, atol=1e-3)
