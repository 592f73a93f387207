"""P1 FEM Poisson model tests: exactness on linear fields + solver integration."""

import jax.numpy as jnp
import numpy as np
import pytest

from domain_decomposed_pde_solver_tpu.io import box_mesh, read_exodus
from domain_decomposed_pde_solver_tpu.io.mesh import NodeSet
from domain_decomposed_pde_solver_tpu.models.poisson_fem import assemble_poisson_fem
from domain_decomposed_pde_solver_tpu.ops import choose_operator, pad_vector, unpad_vector
from domain_decomposed_pde_solver_tpu.solvers import cg_solve
from domain_decomposed_pde_solver_tpu.solvers.precond.jacobi import (
    DiagonalPreconditioner,
)


def _with_full_boundary_dirichlet(mesh, value_fn):
    """Mark every outer-surface node Dirichlet; returns (mesh', g) where the
    nodeset machinery is bypassed by injecting per-node values later."""
    # Boundary of a box: any coordinate at 0 or 1.
    c = mesh.coords
    on_bdry = (
        np.isclose(c, 0.0).any(axis=1) | np.isclose(c, 1.0).any(axis=1)
    )
    nodes = np.nonzero(on_bdry)[0]
    mesh = __import__("dataclasses").replace(
        mesh, node_sets=[NodeSet(id=1, nodes=nodes)]
    )
    return mesh, on_bdry


def test_tet_stiffness_rows_sum_zero():
    """Constants are in the kernel of the full stiffness matrix."""
    mesh = box_mesh(4, 4, 4, elem_type="TETRA4")
    mesh = __import__("dataclasses").replace(mesh, node_sets=[])  # no BCs
    sys_ = assemble_poisson_fem(mesh)
    rowsums = np.asarray(abs(sys_.A.to_scipy() @ np.ones(sys_.n_free)))
    assert rowsums.max() < 1e-10


def test_patch_test_linear_exact():
    """P1 FEM must reproduce a linear solution u = 1 + 2x + 3y - z exactly
    (the classical patch test) when the BC values are that field."""
    mesh = box_mesh(5, 4, 3, elem_type="TETRA4")
    mesh, on_bdry = _with_full_boundary_dirichlet(mesh, None)
    u_exact = 1 + 2 * mesh.coords[:, 0] + 3 * mesh.coords[:, 1] - mesh.coords[:, 2]

    sys_ = assemble_poisson_fem(mesh)
    # Override the nodeset-id BC convention with the true boundary values:
    # b = -K_fb g  =>  rebuild the lift manually.
    import scipy.sparse as sp

    # Assemble the full stiffness (no elimination) by removing nodesets.
    free = sys_.free_to_node
    mesh_noBC = __import__("dataclasses").replace(mesh, node_sets=[])
    full = assemble_poisson_fem(mesh_noBC)
    K = full.A.to_scipy()
    Kfb = K[free][:, np.nonzero(on_bdry)[0]]
    b = -Kfb @ u_exact[on_bdry]
    Kff = K[free][:, free]
    x = sp.linalg.spsolve(Kff.tocsc(), b)
    np.testing.assert_allclose(x, u_exact[free], rtol=1e-10, atol=1e-10)


def test_tri_fem_on_reference_mesh(data_dir):
    """TRI3 assembly on the bundled 2D mesh: SPD reduced system, and with
    constant boundary data the solution is that constant."""
    mesh = read_exodus(str(data_dir / "rectangle-tris-boundary.exo"))
    # Give both nodesets the same id-value by mapping: use nodeset ids as-is;
    # instead just check SPD + solver integration.
    sys_ = assemble_poisson_fem(mesh)
    A = sys_.A.to_dense()
    np.testing.assert_allclose(A, A.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(A) > 0)
    x = np.linalg.solve(A, sys_.b)
    assert 50.0 - 1e-9 <= x.min() and x.max() <= 200.0 + 1e-9  # max principle


def test_fem_solver_pipeline_integration():
    """FEM system must run through choose_operator + CG unchanged."""
    mesh = box_mesh(6, 6, 6, elem_type="TETRA4")
    sys_ = assemble_poisson_fem(mesh)
    A = choose_operator(sys_.A, dtype=jnp.float64)
    b = pad_vector(sys_.b, A.n_pad)
    M = DiagonalPreconditioner(1.0 / A.diagonal_padded())
    res = cg_solve(A, b, jnp.zeros_like(b), precond=M, tol=1e-12, maxiter=2000)
    assert bool(res.converged)
    import scipy.sparse.linalg as spla

    xd = spla.spsolve(sys_.A.to_scipy().tocsc(), sys_.b)
    x = unpad_vector(res.x, sys_.n_free)
    assert np.abs(x - xd).max() / max(np.abs(xd).max(), 1e-30) < 1e-8


def _plane_sideset(mesh, ss_id, xval):
    """All TETRA4 faces lying on the plane x == xval, as a SideSet."""
    from domain_decomposed_pde_solver_tpu.io.mesh import SideSet
    from domain_decomposed_pde_solver_tpu.io.sides import side_local_nodes

    elems, sides = [], []
    off = 0
    for blk in mesh.blocks:
        on = np.isclose(mesh.coords[:, 0], xval)
        for s in range(1, 5):
            idx = list(side_local_nodes("TETRA4", s))
            hit = on[blk.conn[:, idx]].all(axis=1)
            e = np.nonzero(hit)[0]
            elems.append(e + off)
            sides.append(np.full(e.size, s))
        off += blk.conn.shape[0]
    return SideSet(
        id=ss_id, elems=np.concatenate(elems), sides=np.concatenate(sides),
        name="", dist_factors=None,
    )


def _dirichlet_x0_mesh():
    from domain_decomposed_pde_solver_tpu.io.mesh import NodeSet

    mesh = box_mesh(9, 8, 7, elem_type="TETRA4")
    x0 = np.nonzero(np.isclose(mesh.coords[:, 0], 0.0))[0]
    mesh.node_sets = [
        NodeSet(id=5, nodes=x0.astype(np.int64), name="", dist_factors=None)
    ]
    mesh.side_sets = [_plane_sideset(mesh, 77, 1.0)]
    return mesh


def test_neumann_flux_exact_for_linear_solution():
    """u=5 at x=0 (Dirichlet), du/dn=g at x=1 (Neumann sideset): the exact
    solution u = 5 + g x is linear, so P1 FEM must reproduce it to
    rounding."""
    import scipy.sparse.linalg as spla

    mesh = _dirichlet_x0_mesh()
    g = 3.25
    sys_ = assemble_poisson_fem(mesh, neumann={77: g})
    u = spla.spsolve(sys_.A.to_scipy().tocsc(), sys_.b)
    exact = 5.0 + g * mesh.coords[sys_.free_to_node, 0]
    assert np.abs(u - exact).max() < 1e-12


def test_robin_impedance_exact_for_linear_solution():
    """Robin du/dn = -alpha (u - u_env) at x=1: 1D flux balance gives
    u = 5 + c x with c = alpha (u_env - 5) / (1 + alpha)."""
    import scipy.sparse.linalg as spla

    mesh = _dirichlet_x0_mesh()
    alpha, u_env = 2.0, 11.0
    sys_ = assemble_poisson_fem(mesh, robin={77: (alpha, u_env)})
    u = spla.spsolve(sys_.A.to_scipy().tocsc(), sys_.b)
    c = alpha * (u_env - 5.0) / (1.0 + alpha)
    exact = 5.0 + c * mesh.coords[sys_.free_to_node, 0]
    assert np.abs(u - exact).max() < 1e-12


def test_surface_load_total_equals_flux_times_area():
    from domain_decomposed_pde_solver_tpu.models import surface_load

    mesh = _dirichlet_x0_mesh()
    load = surface_load(mesh, 77, 3.0)
    # x=1 face of the unit box has area 1 -> total load = g * area = 3.
    assert abs(load.sum() - 3.0) < 1e-12


def test_unknown_sideset_raises():
    mesh = _dirichlet_x0_mesh()
    with pytest.raises(ValueError, match="no sideset 999"):
        assemble_poisson_fem(mesh, neumann={999: 1.0})


# ---------------------------------------------------------------------------
# HEX8 (trilinear) volume elements + quad-face surface integrals
# ---------------------------------------------------------------------------


def _hex_plane_sideset(mesh, ss_id, xval):
    """All HEX8 faces lying on the plane x == xval, as a SideSet."""
    from domain_decomposed_pde_solver_tpu.io.mesh import SideSet
    from domain_decomposed_pde_solver_tpu.io.sides import side_local_nodes

    elems, sides = [], []
    off = 0
    for blk in mesh.blocks:
        on = np.isclose(mesh.coords[:, 0], xval)
        for s in range(1, 7):
            idx = list(side_local_nodes("HEX8", s))
            hit = on[blk.conn[:, idx]].all(axis=1)
            e = np.nonzero(hit)[0]
            elems.append(e + off)
            sides.append(np.full(e.size, s))
        off += blk.conn.shape[0]
    return SideSet(
        id=ss_id, elems=np.concatenate(elems), sides=np.concatenate(sides),
        name="", dist_factors=None,
    )


def _hex_dirichlet_x0_mesh(n=(6, 5, 4)):
    from domain_decomposed_pde_solver_tpu.io.mesh import NodeSet

    mesh = box_mesh(*n, elem_type="HEX8")
    x0 = np.nonzero(np.isclose(mesh.coords[:, 0], 0.0))[0]
    mesh.node_sets = [
        NodeSet(id=5, nodes=x0.astype(np.int64), name="", dist_factors=None)
    ]
    mesh.side_sets = [_hex_plane_sideset(mesh, 77, 1.0)]
    return mesh


def test_hex_stiffness_rows_sum_zero():
    mesh = box_mesh(3, 3, 3, elem_type="HEX8")
    from domain_decomposed_pde_solver_tpu.models.poisson_fem import (
        _hex_local_stiffness,
    )

    K = _hex_local_stiffness(mesh.coords, mesh.blocks[0].conn.astype(np.int64))
    np.testing.assert_allclose(K.sum(axis=2), 0.0, atol=1e-12)
    np.testing.assert_allclose(K, np.swapaxes(K, 1, 2), atol=1e-12)


def test_hex_patch_test_linear_exact():
    """Trilinear hexes reproduce u = a + bx + cy + dz exactly (patch test)."""
    from domain_decomposed_pde_solver_tpu.io.mesh import NodeSet

    mesh = box_mesh(4, 3, 3, elem_type="HEX8")
    # Dirichlet everywhere on the boundary, value from the linear field.
    c = mesh.coords
    u_exact = 2.0 + 3.0 * c[:, 0] - 1.5 * c[:, 1] + 0.5 * c[:, 2]
    bdry = np.nonzero(
        np.isclose(c[:, 0], 0) | np.isclose(c[:, 0], 1)
        | np.isclose(c[:, 1], 0) | np.isclose(c[:, 1], 1)
        | np.isclose(c[:, 2], 0) | np.isclose(c[:, 2], 1)
    )[0]
    mesh.node_sets = [
        NodeSet(id=1, nodes=bdry.astype(np.int64), name="", dist_factors=None)
    ]
    mesh.side_sets = []
    sys_ = assemble_poisson_fem(mesh)
    # Override the id-as-value convention: lift with the exact boundary data.
    import scipy.sparse as sp

    S = sp.csr_matrix(
        (sys_.A.data, sys_.A.indices, sys_.A.indptr), shape=sys_.A.shape
    )
    x = sp.linalg.spsolve(S.tocsc(), _lift_rhs(mesh, sys_, u_exact))
    np.testing.assert_allclose(x, u_exact[sys_.free_to_node], atol=1e-9)


def _lift_rhs(mesh, sys_, u_bdry):
    """RHS for K_ff x = -K_fb g with arbitrary boundary data g."""
    from domain_decomposed_pde_solver_tpu.models.poisson_fem import (
        _hex_local_stiffness,
    )

    n = mesh.num_nodes
    conn = mesh.blocks[0].conn.astype(np.int64)
    K = _hex_local_stiffness(mesh.coords, conn)
    a, b = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    rows = conn[:, a].reshape(-1)
    cols = conn[:, b].reshape(-1)
    vals = K.reshape(-1)
    free = sys_.node_to_free
    is_free = free >= 0
    fb = is_free[rows] & ~is_free[cols]
    out = np.zeros(sys_.n_free)
    np.add.at(out, free[rows[fb]], -vals[fb] * u_bdry[cols[fb]])
    return out


def test_hex_neumann_flux_exact_for_linear_solution():
    """u=5 at x=0 (Dirichlet), du/dn=g on the x=1 quad faces (Neumann):
    exact solution u = 5 + g x; trilinear hexes + 2x2 Gauss quad faces
    must reproduce it to solver precision."""
    mesh = _hex_dirichlet_x0_mesh()
    g = 3.0
    sys_ = assemble_poisson_fem(mesh, neumann={77: g})
    import scipy.sparse as sp

    S = sp.csr_matrix(
        (sys_.A.data, sys_.A.indices, sys_.A.indptr), shape=sys_.A.shape
    )
    x = sp.linalg.spsolve(S.tocsc(), sys_.b)
    want = 5.0 + g * mesh.coords[sys_.free_to_node, 0]
    np.testing.assert_allclose(x, want, atol=1e-9)


def test_hex_robin_impedance_exact_for_linear_solution():
    """Robin du/dn = -alpha (u - u_env) at x=1 on quad faces: exact linear
    solution u = 5 + s x with s = alpha (u_env - 5) / (1 + alpha)."""
    mesh = _hex_dirichlet_x0_mesh()
    alpha, u_env = 2.0, 11.0
    sys_ = assemble_poisson_fem(mesh, robin={77: (alpha, u_env)})
    import scipy.sparse as sp

    S = sp.csr_matrix(
        (sys_.A.data, sys_.A.indices, sys_.A.indptr), shape=sys_.A.shape
    )
    x = sp.linalg.spsolve(S.tocsc(), sys_.b)
    s = alpha * (u_env - 5.0) / (1.0 + alpha)
    want = 5.0 + s * mesh.coords[sys_.free_to_node, 0]
    np.testing.assert_allclose(x, want, atol=1e-9)


def test_quad_surface_load_total_equals_flux_times_area():
    mesh = _hex_dirichlet_x0_mesh()
    from domain_decomposed_pde_solver_tpu.models.poisson_fem import surface_load

    load = surface_load(mesh, 77, 4.0)
    np.testing.assert_allclose(load.sum(), 4.0 * 1.0, rtol=1e-12)


def test_quad_surface_mass_row_sums():
    """Row sums of the quad surface mass equal the load weights
    (partition of unity on the face)."""
    mesh = _hex_dirichlet_x0_mesh()
    from domain_decomposed_pde_solver_tpu.models.poisson_fem import (
        surface_load,
        surface_mass_coo,
    )

    rows, cols, vals = surface_mass_coo(mesh, 77)
    n = mesh.num_nodes
    rowsum = np.zeros(n)
    np.add.at(rowsum, rows, vals)
    np.testing.assert_allclose(rowsum, surface_load(mesh, 77, 1.0), atol=1e-12)
