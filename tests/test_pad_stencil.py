"""VMEM-tiled Pallas stencil operator (padded 3-D layout).

Validates, against the proven XLA StencilOperator:
- layout embed/extract round trips,
- matvec_reference (same padded space, pure XLA) equals the identity-layout
  stencil matvec exactly,
- the Pallas kernel (interpret mode on CPU) equals matvec_reference,
- diagonal and CG solve behave through the format-agnostic interface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domain_decomposed_pde_solver_tpu.io.boxmesh import box_mesh
from domain_decomposed_pde_solver_tpu.models import assemble_heat_system
from domain_decomposed_pde_solver_tpu.ops import choose_operator
from domain_decomposed_pde_solver_tpu.ops.pallas.stencil_kernel import (
    PadStencilOperator,
    pad_stencil_from_stencil,
    pad_stencil_spmv,
)  # noqa: F401
from domain_decomposed_pde_solver_tpu.ops.stencil import StencilOperator
from domain_decomposed_pde_solver_tpu.solvers import cg_solve, jacobi_preconditioner
from domain_decomposed_pde_solver_tpu.solvers.precond.amg import infer_free_grid

# (box nodes per axis) -> free grids exercising: odd dims, even dims,
# mx just under/over the 128-lane boundary, thin boxes.
SHAPES = [(8, 8, 8), (13, 9, 11), (10, 14, 8)]
BIG_X = (132, 8, 8)  # free mx = 131 -> mxp = 256 (multi-vreg lane rolls)


def _build(shape, elem="TETRA4"):
    mesh = box_mesh(*shape, elem_type=elem)
    s = assemble_heat_system(mesh)
    dims = infer_free_grid(mesh, s.free_to_node)
    assert dims is not None
    st = choose_operator(s.A, dtype=jnp.float32, grid_dims=dims)
    assert isinstance(st, StencilOperator), type(st)
    return s, st, pad_stencil_from_stencil(st, bz=4)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("elem", ["TETRA4", "HEX8"])
def test_reference_matches_stencil_operator(shape, elem):
    s, st, A = _build(shape, elem)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(s.n_free).astype(np.float32)
    y_st = np.asarray(st.matvec(st.put_vector(x)))[: s.n_free]
    xp = A.put_vector(x)
    yp = A.matvec_reference(xp)
    y_pad = A.get_vector(yp)
    np.testing.assert_array_equal(y_pad, y_st)
    # pad slots stay exactly zero (the Krylov-space invariant)
    mask = np.asarray(A.pad_mask())
    assert not np.any(np.asarray(yp)[mask == 0])


@pytest.mark.parametrize("shape", SHAPES + [BIG_X])
@pytest.mark.parametrize("elem", ["TETRA4", "HEX8"])
def test_pallas_kernel_matches_reference(shape, elem):
    s, st, A = _build(shape, elem)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(s.n_free).astype(np.float32)
    xp = A.put_vector(x)
    y_ref = np.asarray(A.matvec_reference(xp))
    y_krn = np.asarray(pad_stencil_spmv(A, xp, interpret=True))
    np.testing.assert_allclose(y_krn, y_ref, rtol=2e-6, atol=2e-6)
    mask = np.asarray(A.pad_mask())
    assert not np.any(y_krn[mask == 0])


def test_put_get_roundtrip_and_diagonal():
    s, st, A = _build((9, 8, 10))
    rng = np.random.default_rng(2)
    x = rng.standard_normal(s.n_free).astype(np.float32)
    np.testing.assert_array_equal(A.get_vector(A.put_vector(x)), x)
    d_pad = np.asarray(A.diagonal_padded(fill=7.0))
    d_st = np.asarray(st.diagonal_padded(fill=7.0))[: s.n_free]
    np.testing.assert_allclose(A.get_vector(jnp.asarray(d_pad)), d_st,
                               rtol=1e-6)
    mask = np.asarray(A.pad_mask())
    assert np.all(d_pad[mask == 0] == 7.0)


def test_cg_solve_through_pad_stencil():
    s, st, A = _build((10, 10, 10))
    b = A.put_vector(s.b.astype(np.float32) / np.abs(s.b).max())
    M = jacobi_preconditioner(A)
    res = cg_solve(A, b, jnp.zeros_like(b), precond=M, tol=1e-6, maxiter=300)
    assert bool(res.converged)
    import scipy.sparse as sp

    S = sp.csr_matrix((s.A.data, s.A.indices, s.A.indptr), shape=s.A.shape)
    x = A.get_vector(res.x).astype(np.float64)
    bb = s.b / np.abs(s.b).max()
    relres = np.linalg.norm(S @ x - bb) / np.linalg.norm(bb)
    assert relres < 1e-5
    # Same iteration count as the identity-layout stencil operator.
    bs = st.put_vector((s.b / np.abs(s.b).max()).astype(np.float32))
    r2 = cg_solve(st, bs, jnp.zeros_like(bs),
                  precond=jacobi_preconditioner(st), tol=1e-6, maxiter=300)
    assert abs(int(res.iterations) - int(r2.iterations)) <= 1


def test_choose_operator_pad_stencil_gate():
    mesh = box_mesh(8, 8, 8, elem_type="TETRA4")
    s = assemble_heat_system(mesh)
    dims = infer_free_grid(mesh, s.free_to_node)
    # "never" (default) keeps the identity-layout stencil on CPU...
    st = choose_operator(s.A, dtype=jnp.float32, grid_dims=dims)
    assert isinstance(st, StencilOperator)
    # ..."always" forces the padded-3-D Pallas form.
    A = choose_operator(
        s.A, dtype=jnp.float32, grid_dims=dims, pad_stencil="always"
    )
    assert isinstance(A, PadStencilOperator)
    # "auto" only fires on TPU; under the CPU conftest it stays identity.
    st2 = choose_operator(
        s.A, dtype=jnp.float32, grid_dims=dims, pad_stencil="auto"
    )
    assert isinstance(st2, StencilOperator)


def test_space_map_matches_put_vector():
    _, _, A = _build((9, 11, 8))
    n = A.n_rows
    x = np.arange(1.0, n + 1, dtype=np.float32)
    xp = np.asarray(A.put_vector(x))
    sm = A.space_map()
    assert sm.shape == (n,)
    np.testing.assert_array_equal(xp[sm], x)
    mask = np.ones(A.n_pad, bool)
    mask[sm] = False
    assert not np.any(xp[mask])


def test_amg_through_pad_stencil_matches_identity_layout():
    """SA-AMG with the PadStencil fine operator: same iteration count and
    accuracy as the identity-layout stencil hierarchy (the space-map
    factored-transfer composition)."""
    from domain_decomposed_pde_solver_tpu.solvers.precond.amg import (
        smoothed_aggregation_setup,
    )

    mesh = box_mesh(14, 14, 14, elem_type="TETRA4")
    s = assemble_heat_system(mesh)
    dims = infer_free_grid(mesh, s.free_to_node)
    st = choose_operator(s.A, dtype=jnp.float32, grid_dims=dims)
    A = pad_stencil_from_stencil(st, bz=4)
    bhost = (s.b / np.abs(s.b).max()).astype(np.float32)

    M_id = smoothed_aggregation_setup(s.A, dtype=jnp.float32, grid_dims=dims)
    r_id = cg_solve(
        st, st.put_vector(bhost), jnp.zeros(st.n_pad, jnp.float32),
        precond=M_id, tol=1e-6, maxiter=100,
    )
    M_pad = smoothed_aggregation_setup(
        s.A, dtype=jnp.float32, grid_dims=dims, fine_operator=A
    )
    r_pad = cg_solve(
        A, A.put_vector(bhost), jnp.zeros(A.n_pad, jnp.float32),
        precond=M_pad, tol=1e-6, maxiter=100,
    )
    assert bool(r_pad.converged)
    assert int(r_pad.iterations) == int(r_id.iterations)
    import scipy.sparse as sp

    S = sp.csr_matrix((s.A.data, s.A.indices, s.A.indptr), shape=s.A.shape)
    x = A.get_vector(r_pad.x).astype(np.float64)
    relres = np.linalg.norm(S @ x - bhost) / np.linalg.norm(bhost)
    assert relres < 1e-5
    # pad-slot invariant survives the whole preconditioned solve
    mask = np.asarray(A.pad_mask())
    assert not np.any(np.asarray(r_pad.x)[mask == 0])


def test_sparse_corr_and_put_vector_sparse_match_dense():
    """At grid sizes where the boundary correction is <25% nonzero, corr
    ships as a sparse device scatter and RHS vectors may use
    put_vector_sparse — both must be bit-identical to the dense path."""
    mesh = box_mesh(32, 32, 32, elem_type="TETRA4")
    s = assemble_heat_system(mesh)
    dims = infer_free_grid(mesh, s.free_to_node)
    from domain_decomposed_pde_solver_tpu.ops.dia import pack_dia_host
    from domain_decomposed_pde_solver_tpu.ops.stencil import (
        stencil_parts_from_packed,
    )
    from domain_decomposed_pde_solver_tpu.ops.pallas.stencil_kernel import (
        pad_stencil_from_parts,
    )

    uniq, data = pack_dia_host(s.A, dtype=jnp.float32)
    parts = stencil_parts_from_packed(uniq, data, s.n_free, dims)
    assert parts is not None
    corr = parts["corr_pad"][: s.n_free]
    assert 0 < np.count_nonzero(corr) < 0.25 * s.n_free  # sparse path fires
    A = pad_stencil_from_parts(parts)
    # dense-embedded corr for comparison
    dense = np.zeros((A.Z, A.myp, A.mxp), np.float32)
    mx, my, mz = A.dims
    dense[1 : mz + 1, 1 : my + 1, :mx] = corr.reshape(mz, my, mx)
    np.testing.assert_array_equal(
        np.asarray(A.corr, dtype=np.float32), dense.reshape(-1)
    )
    # put_vector_sparse == put_vector on a boundary-sparse RHS
    np.testing.assert_array_equal(
        np.asarray(A.put_vector_sparse(s.b.astype(np.float32))),
        np.asarray(A.put_vector(s.b.astype(np.float32))),
    )
    # and on a dense vector (falls back to the dense upload)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(s.n_free).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(A.put_vector_sparse(v)), np.asarray(A.put_vector(v))
    )


def test_pad_brick_level0_device_matches_host():
    """The >4M zero-upload level-0 path: device-computed tval/scale/
    inv_diag must match the host scatters (up to f32 rounding of rsqrt)."""
    from domain_decomposed_pde_solver_tpu.solvers.precond.amg import (
        _pad_brick_level0_device, brick_aggregate,
    )

    mesh = box_mesh(20, 17, 15, elem_type="HEX8")
    s = assemble_heat_system(mesh)
    dims = infer_free_grid(mesh, s.free_to_node)
    st = choose_operator(s.A, dtype=jnp.float32, grid_dims=dims)
    A = pad_stencil_from_stencil(st, bz=4)
    brick = 6
    agg = brick_aggregate(dims, brick)
    counts = np.bincount(agg, minlength=int(agg.max()) + 1).astype(np.float64)
    import scipy.sparse as sp

    S = sp.csr_matrix((s.A.data, s.A.indices, s.A.indptr), shape=s.A.shape)
    d = S.diagonal()
    d = np.where(d != 0, d, 1.0)
    lmax, omega = 1.7, 4.0 / 3.0
    perm = A.space_map()
    tval_h = np.zeros(A.n_pad, np.float32)
    tval_h[perm] = 1.0 / np.sqrt(counts[agg])
    scale_h = np.zeros(A.n_pad, np.float32)
    scale_h[perm] = (omega / lmax) / d
    inv_h = np.zeros(A.n_pad, np.float32)
    inv_h[perm] = 1.0 / d
    tval_d, scale_d, inv_d = _pad_brick_level0_device(
        A, brick, omega, lmax, jnp.dtype(jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(tval_d), tval_h, rtol=1e-6)
    mask = np.asarray(A.pad_mask()) > 0
    np.testing.assert_allclose(
        np.asarray(scale_d)[mask], scale_h[mask], rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(inv_d)[mask], inv_h[mask],
                               rtol=1e-6)


@pytest.mark.parametrize(
    "shape,elem,sublane,lane",
    [
        # Single lane-tile (mxp=128): dz/dy absorbed by the VMEM windows,
        # only the two lane-roll buckets (dx = -1, +1) remain.
        ((13, 9, 11), "TETRA4", 0, 2),
        ((13, 9, 11), "HEX8", 0, 2),
        # Multi-lane-tile (mxp=256): dy realized as sublane rolls of the
        # 8-row-guarded tall windows; bucket dedup collapses TETRA4's 19
        # taps to 4 sublane + 2 lane rolls, HEX8's 27 to 2 + 2.
        ((132, 8, 8), "TETRA4", 4, 2),
        ((132, 8, 8), "HEX8", 2, 2),
    ],
)
def test_factored_roll_counts(shape, elem, sublane, lane, monkeypatch):
    """Shuffle economics regression: the factored-roll kernel must keep
    the per-layer VPU permute counts at the deduplicated minimum (a naive
    per-tap evaluation pays ~16 rolls/layer on TETRA4, ~24 on HEX8)."""
    import jax.experimental.pallas.tpu as pltpu_mod
    from domain_decomposed_pde_solver_tpu.ops.pallas import (
        stencil_kernel as sk,
    )

    _, _, A = _build(shape, elem)
    calls = {0: 0, 1: 0}
    orig = pltpu_mod.roll

    def counting(x, shift, axis=0, **kw):
        calls[axis] += 1
        return orig(x, shift, axis=axis, **kw)

    monkeypatch.setattr(pltpu_mod, "roll", counting)
    meta = (A.taps, A.groups, A.group_const, A.group_kind, A.dims,
            A.myp, A.mxp, A.bz, A.Z, A.nb)
    x2 = jnp.zeros((A.Z * A.myp, A.mxp), jnp.float32)
    corr2 = A.corr.reshape(A.Z * A.myp, A.mxp)
    zlim = jnp.array([[1, A.dims[2]]], jnp.int32)
    jax.eval_shape(
        lambda x, c: sk._pad_stencil_call(
            meta, A.quads, zlim, x, c, A.bz + 6, False
        ),
        x2, corr2,
    )
    assert calls[0] == sublane * A.bz and calls[1] == lane * A.bz, calls


def test_corr_storage_bf16_exact_only():
    _, _, A = _build((8, 8, 8))
    # Heat-Laplacian corrections are small integers -> bf16-exact storage.
    assert A.corr.dtype == jnp.bfloat16
    st2 = _build((8, 8, 8))[1]
    A2 = pad_stencil_from_stencil(st2, corr_storage="float32")
    assert A2.corr.dtype == jnp.float32
