"""z-slab sharded Pallas pad-stencil operator (8 virtual CPU devices).

Validates, against the single-device PadStencilOperator:
- the sharded matvec (ppermute halo + per-device kernel) is exact,
- distributed CG converges with the SAME iteration count as the
  single-device pad-stencil solve (P-independence),
- uneven / partially-empty trailing slabs mask correctly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domain_decomposed_pde_solver_tpu.io.boxmesh import box_mesh
from domain_decomposed_pde_solver_tpu.models import assemble_heat_system
from domain_decomposed_pde_solver_tpu.ops import choose_operator
from domain_decomposed_pde_solver_tpu.ops.pallas.stencil_kernel import (
    pad_stencil_from_stencil,
)
from domain_decomposed_pde_solver_tpu.parallel.sharded import (
    AXIS, make_device_mesh,
)
from domain_decomposed_pde_solver_tpu.parallel.slabpad import (
    build_slab_pad_stencil, slab_pad_cg_solve,
)
from domain_decomposed_pde_solver_tpu.solvers import (
    cg_solve, jacobi_preconditioner,
)
from domain_decomposed_pde_solver_tpu.solvers.precond.amg import (
    infer_free_grid,
)
from jax.sharding import NamedSharding, PartitionSpec as P


def _build(shape, elem="TETRA4"):
    mesh = box_mesh(*shape, elem_type=elem)
    s = assemble_heat_system(mesh)
    dims = infer_free_grid(mesh, s.free_to_node)
    assert dims is not None
    st = choose_operator(s.A, dtype=jnp.float32, grid_dims=dims)
    return s, pad_stencil_from_stencil(st, bz=4)


@pytest.mark.parametrize(
    "nparts,shape",
    [
        (2, (10, 14, 7)),  # free grid (9, 15, 8): uneven slabs (6, 2)
        (4, (10, 8, 18)),  # free grid (9, 9, 19): slabs (6, 6, 6, 1)
    ],
)
@pytest.mark.parametrize("elem", ["TETRA4", "HEX8"])
def test_slab_matvec_matches_single_device(nparts, shape, elem):
    s, A = _build(shape, elem)
    plan = build_slab_pad_stencil(A, nparts)
    assert plan is not None
    rng = np.random.default_rng(0)
    x = rng.standard_normal(s.n_free).astype(np.float32)
    y_ref = A.get_vector(A.matvec_reference(A.put_vector(x)))

    dev_mesh = make_device_mesh(nparts)
    sh = NamedSharding(dev_mesh, P(AXIS))
    ops = jax.tree.map(
        lambda a: jax.device_put(a, sh), plan.make_ops(interpret=True)
    )
    x_s = jax.device_put(plan.scatter_vector(x), sh)

    def body(op_blk, x_blk):
        op = jax.tree.map(lambda a: a[0], op_blk)
        return op.matvec(x_blk[0])[None]

    y_s = jax.shard_map(
        body, mesh=dev_mesh, in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
        check_vma=False,  # pallas_call in body (see slabpad matvec note)
    )(ops, x_s)
    y = plan.gather_vector(np.asarray(y_s))
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)
    # owned-space pad slots stay exactly zero (dot-product safety)
    y3 = np.asarray(y_s).reshape(nparts * plan.L, plan.myp, plan.mxp)
    mx, my, mz = plan.dims
    assert not np.any(y3[mz:])
    assert not np.any(y3[:, 0, :]) and not np.any(y3[:, my + 1 :, :])
    assert not np.any(y3[:, :, mx:])


@pytest.mark.parametrize(
    "nparts,shape",
    [(2, (10, 11, 12)), (4, (10, 11, 18))],  # mz 13 -> (6,6+1 pad); 19 -> 6,6,6,1
)
def test_slab_cg_iteration_parity(nparts, shape):
    s, A = _build(shape)
    plan = build_slab_pad_stencil(A, nparts)
    assert plan is not None
    b = (s.b / np.abs(s.b).max()).astype(np.float32)

    res1 = cg_solve(
        A, A.put_vector(b), jnp.zeros(A.n_pad, jnp.float32),
        precond=jacobi_preconditioner(A), tol=1e-6, maxiter=300,
    )
    x, res = slab_pad_cg_solve(
        plan, b, np.zeros_like(b), tol=1e-6, maxiter=300,
    )
    assert bool(res.converged)
    assert int(res.iterations) == int(res1.iterations)
    import scipy.sparse as sp

    S = sp.csr_matrix((s.A.data, s.A.indices, s.A.indptr), shape=s.A.shape)
    relres = np.linalg.norm(S @ x.astype(np.float64) - b) / np.linalg.norm(b)
    assert relres < 1e-5


def test_build_rejects_overpartition():
    _, A = _build((8, 8, 6))  # mz = 5
    # bz=4 -> L=2; 8 parts leave trailing slabs empty -> refuse
    assert build_slab_pad_stencil(A, 8) is None
