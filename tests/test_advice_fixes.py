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
