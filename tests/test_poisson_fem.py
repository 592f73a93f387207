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
