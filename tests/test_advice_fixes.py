"""Regression tests for the round-1 advisor findings (ADVICE.md).

Each test pins the fixed behavior:
- degenerate elements (repeated node) must not corrupt the NumPy-fallback
  assembly path (self-edge vs diagonal-slot collision),
- multi-type partitions must emit unique Exodus element-block ids,
- hex faces shared between element blocks must get ONE face-center node
  under refinement (conformality),
- resuming a CG checkpoint against a modified operator must be rejected.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from domain_decomposed_pde_solver_tpu.io import box_mesh, refine_uniform
from domain_decomposed_pde_solver_tpu.io.mesh import ElemBlock, MeshModel, NodeSet
from domain_decomposed_pde_solver_tpu.models import assemble_heat_system
from domain_decomposed_pde_solver_tpu.ops import ell_from_csr, pad_vector
from domain_decomposed_pde_solver_tpu.parallel import decompose_mesh
from domain_decomposed_pde_solver_tpu.solvers import cg_solve_resumable


def _degenerate_mesh():
    """Two tets, the second repeating a node (degenerate conn)."""
    coords = np.array(
        [
            [0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [1.0, 1.0, 1.0],
        ]
    )
    conn = np.array([[0, 1, 2, 3], [1, 2, 4, 4]])  # second tet repeats node 4
    return MeshModel(
        coords=coords,
        blocks=[ElemBlock(id=1, elem_type="TETRA4", conn=conn)],
        node_sets=[NodeSet(id=7, nodes=np.array([0]))],
    )


def test_degenerate_element_numpy_fallback(monkeypatch):
    """The NumPy fallback must filter u==v self-edges exactly like the
    native kernel, so both backends assemble the identical matrix."""
    from domain_decomposed_pde_solver_tpu.utils import native as native_mod

    mesh = _degenerate_mesh()
    s_native = assemble_heat_system(mesh)

    monkeypatch.setattr(native_mod, "node_adjacency_native", lambda *a, **k: None)
    s_fallback = assemble_heat_system(mesh)

    np.testing.assert_array_equal(s_native.A.indptr, s_fallback.A.indptr)
    np.testing.assert_array_equal(s_native.A.indices, s_fallback.A.indices)
    np.testing.assert_array_equal(s_native.A.data, s_fallback.A.data)
    # No uninitialized np.empty slots: every row's columns strictly ascend.
    for r in range(s_fallback.A.n_rows):
        cols = s_fallback.A.indices[
            s_fallback.A.indptr[r] : s_fallback.A.indptr[r + 1]
        ]
        assert (np.diff(cols) > 0).all()


def test_decompose_unique_block_ids_multi_type():
    """A partition holding two element types splits into blocks with
    DISTINCT ids (Exodus requires unique eb_prop1 entries)."""
    hexm = box_mesh(2, 1, 1, elem_type="HEX8")
    tetm = box_mesh(1, 1, 1, elem_type="TETRA4")
    # One mesh with a hex block and a tet block over the same nodes.
    mesh = MeshModel(
        coords=hexm.coords,
        blocks=[
            hexm.blocks[0],
            ElemBlock(
                id=2,
                elem_type="TETRA4",
                conn=tetm.blocks[0].conn,  # nodes 0..7 exist in hexm too
            ),
        ],
        node_sets=hexm.node_sets,
    )
    parts = np.zeros(mesh.num_elem, dtype=np.int64)  # everything -> part 0
    dec = decompose_mesh(mesh, 1, elem_parts=parts)
    ids = [b.id for b in dec.blocks]
    assert len(ids) == len(set(ids)) == 2
    assert all(b.name == "partition_0" for b in dec.blocks)


def test_hex_refine_conformal_across_blocks():
    """Splitting a hex box into two element blocks must refine to the same
    node count as the single-block mesh (shared faces get one center)."""
    single = box_mesh(2, 2, 2, elem_type="HEX8")
    conn = single.blocks[0].conn
    split = MeshModel(
        coords=single.coords,
        blocks=[
            ElemBlock(id=1, elem_type="HEX8", conn=conn[:4]),
            ElemBlock(id=2, elem_type="HEX8", conn=conn[4:]),
        ],
        node_sets=single.node_sets,
    )
    r_single = refine_uniform(single, 1)
    r_split = refine_uniform(split, 1)
    assert r_split.num_nodes == r_single.num_nodes
    assert r_split.num_elem == r_single.num_elem
    # Identical node coordinates as a set.
    cs = np.sort(r_single.coords.view([("", float)] * 3).ravel())
    cp = np.sort(r_split.coords.view([("", float)] * 3).ravel())
    np.testing.assert_array_equal(cs, cp)
    # Nodeset growth matches too (face centers counted once).
    for a, b in zip(r_single.node_sets, r_split.node_sets):
        assert a.nodes.size == b.nodes.size


def test_resume_rejects_modified_operator(tmp_path):
    """Same RHS, different matrix -> resume must raise, not silently
    converge to a wrong answer."""
    mesh = box_mesh(4, 4, 4, elem_type="TETRA4")
    s = assemble_heat_system(mesh)
    A = ell_from_csr(s.A, dtype=jnp.float64)
    b = pad_vector(s.b, A.n_pad)
    x0 = jnp.zeros_like(b)
    path = str(tmp_path / "cg.npz")

    cg_solve_resumable(
        A, b, x0, checkpoint_path=path, checkpoint_every=2,
        tol=1e-12, maxiter=4,
    )
    # Perturb one matrix entry; the RHS is unchanged.
    A2 = dataclasses.replace(A, vals=A.vals.at[0, 0].mul(2.0))
    with pytest.raises(ValueError, match="different problem"):
        cg_solve_resumable(
            A2, b, x0, checkpoint_path=path, checkpoint_every=2,
            tol=1e-12, maxiter=4,
        )


# ---- round-2 advisor findings ---------------------------------------------


def test_bsg_fine_operator_with_grid_dims_uses_permuted_transfers():
    """A BSG fine operator lives in a permuted vector space; passing a
    matching ``grid_dims`` alongside it must NOT route setup into the
    identity-layout BrickProlongator (round-2 ADVICE, medium) — the forced
    permutation-composed transfers keep the whole hierarchy in the
    operator's space."""
    from domain_decomposed_pde_solver_tpu.ops.bsg import bsg_from_csr
    from domain_decomposed_pde_solver_tpu.solvers import cg_solve
    from domain_decomposed_pde_solver_tpu.solvers.precond.amg import (
        infer_free_grid,
        smoothed_aggregation_setup,
    )

    mesh = box_mesh(10, 10, 10, elem_type="TETRA4")
    s = assemble_heat_system(mesh)
    dims = infer_free_grid(mesh, s.free_to_node)
    assert dims is not None and int(np.prod(dims)) == s.n_free
    A = bsg_from_csr(s.A)  # RCM-permuted internal space
    assert A.perm is not None
    for factored in (True, False):
        M = smoothed_aggregation_setup(
            s.A,
            dtype=jnp.float32,
            fine_operator=A,
            grid_dims=dims,
            brick=3,
            factored_transfers=factored,
        )
        b = A.put_vector(s.b.astype(np.float32))
        bs = b / float(np.abs(s.b).max())
        res = cg_solve(
            A, bs, jnp.zeros_like(bs), precond=M, tol=1e-6, maxiter=60
        )
        assert bool(res.converged)
        # An identity-layout preconditioner applied to permuted vectors is
        # noise; the correct permuted hierarchy converges in a handful.
        assert int(res.iterations) <= 20, int(res.iterations)
        import scipy.sparse as sp

        S = sp.csr_matrix((s.A.data, s.A.indices, s.A.indptr), shape=s.A.shape)
        x = A.get_vector(res.x).astype(np.float64) * float(np.abs(s.b).max())
        relres = np.linalg.norm(S @ x - s.b) / np.linalg.norm(s.b)
        assert relres < 1e-5


def test_slab_amg_f64_build_solves_in_f64():
    """build_slab_amg(dtype=float64) + slab_amg_cg_solve must run the solve
    in f64 (round-2 ADVICE: b/x0/lmax were hardcoded f32, silently
    downgrading the CLI's sharded --dtype float64 path)."""
    import jax

    from domain_decomposed_pde_solver_tpu.parallel.slabamg import (
        build_slab_amg,
        slab_amg_cg_solve,
    )
    from domain_decomposed_pde_solver_tpu.solvers.precond.amg import (
        infer_free_grid,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    mesh = box_mesh(14, 14, 26, elem_type="TETRA4")
    s = assemble_heat_system(mesh)
    dims = infer_free_grid(mesh, s.free_to_node)
    assert dims is not None
    samg = build_slab_amg(s.A, dims, 2, dtype=np.float64)
    assert samg is not None
    b = s.b / np.abs(s.b).max()
    x, res = slab_amg_cg_solve(samg, b, np.zeros_like(b), tol=1e-11, maxiter=200)
    assert res.x.dtype == np.float64
    assert bool(res.converged)
    import scipy.sparse as sp

    S = sp.csr_matrix((s.A.data, s.A.indices, s.A.indptr), shape=s.A.shape)
    relres = np.linalg.norm(S @ x - b) / np.linalg.norm(b)
    # 1e-11 relative residual is unreachable in a f32 solve.
    assert relres < 1e-10, relres


def test_bsg_sharded_mixed_bf16_exactness_uniform_storage(data_dir):
    """If one part's local values are bf16-exact and another's are not,
    BSGShardedOperator.from_plan must still stack (uniform storage decided
    once on the global values — round-2 ADVICE)."""
    import jax

    from domain_decomposed_pde_solver_tpu.io import read_exodus
    from domain_decomposed_pde_solver_tpu.ops import coo_to_csr
    from domain_decomposed_pde_solver_tpu.parallel import (
        build_halo_plan,
        make_device_mesh,
        partition_graph,
        sharded_cg_solve,
    )
    from domain_decomposed_pde_solver_tpu.parallel.sharded import (
        BSGShardedOperator,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    mesh = read_exodus(str(data_dir / "brick.exo"))
    s = assemble_heat_system(mesh)
    A = s.A
    rows = np.repeat(np.arange(A.n_rows), A.row_lengths())
    off = rows != A.indices
    adj = coo_to_csr(
        rows[off], A.indices[off], np.ones(int(off.sum())), A.shape,
        sum_dups=False,
    )
    parts = partition_graph(adj, 4)
    plan = build_halo_plan(A, parts, 4, dtype=np.float64)
    # Make part 3's block non-bf16-exact while parts 0-2 stay exact
    # (Laplacian integers): scale one existing diagonal entry by (1+2^-20).
    p = 3
    r = int(np.argmax(plan.row_valid[p]))
    k = int(np.argmax(np.asarray(plan.ell_vals[p, r]) != 0))
    plan.ell_vals[p, r, k] *= 1.0 + 2.0**-20
    op = BSGShardedOperator.from_plan(plan, make_device_mesh(4))
    assert op.bsg_stack.storage == "float32"
    assert op.bsg_stack.vals.dtype == jnp.float32
    # And the operator still solves its (perturbed) system correctly.
    b_host = (s.b / np.abs(s.b).max()).astype(np.float32)
    deg = np.where(s.degree > 0, s.degree, 1.0)
    res = sharded_cg_solve(
        op, op.put_vector(b_host), op.put_vector(np.zeros_like(b_host)),
        precond_diag=op.put_vector(1.0 / deg), tol=1e-6, maxiter=500,
    )
    assert bool(res.converged)
