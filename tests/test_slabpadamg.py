"""Distributed global SA-AMG with the Pallas pad-stencil per-device engine.

Locks in the BASELINE-config-5 composition (parallel/slabpadamg.py): the
sharded hierarchy whose fine-level matvecs run the pad-stencil kernel must
need the SAME number of CG iterations as the single-device hierarchy on
the pad operator (P-independence), and solve the actual system.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from domain_decomposed_pde_solver_tpu.io.boxmesh import box_mesh
from domain_decomposed_pde_solver_tpu.models import assemble_heat_system
from domain_decomposed_pde_solver_tpu.ops.pallas.stencil_kernel import (
    pad_stencil_from_stencil,
)
from domain_decomposed_pde_solver_tpu.ops.stencil import StencilOperator
from domain_decomposed_pde_solver_tpu.ops import choose_operator
from domain_decomposed_pde_solver_tpu.solvers import cg_solve
from domain_decomposed_pde_solver_tpu.solvers.precond.amg import (
    infer_free_grid,
    smoothed_aggregation_setup,
)
from domain_decomposed_pde_solver_tpu.parallel.slabpadamg import (
    build_slab_pad_amg,
    slab_pad_amg_cg_solve,
)


@pytest.fixture(scope="module")
def box():
    mesh = box_mesh(26, 26, 95, elem_type="TETRA4")
    sy = assemble_heat_system(mesh)
    dims = infer_free_grid(mesh, sy.free_to_node)
    assert dims is not None and dims[2] == 96  # free z-extent = nz + 1
    return mesh, sy, dims


def _single_device_iters(sy, dims):
    M = smoothed_aggregation_setup(sy.A, dtype=jnp.float32, grid_dims=dims)
    A = choose_operator(sy.A, dtype=jnp.float32)
    b = A.put_vector(sy.b.astype(np.float32))
    bs = b / float(np.abs(sy.b).max())
    res = cg_solve(A, bs, jnp.zeros_like(bs), precond=M, tol=1e-6, maxiter=200)
    return int(res.iterations)


@pytest.mark.slow
@pytest.mark.parametrize("nparts", [2, 4])
def test_iterations_match_single_device(box, nparts):
    if len(jax.devices()) < nparts:
        pytest.skip("needs virtual devices")
    mesh, sy, dims = box
    it1 = _single_device_iters(sy, dims)
    samg = build_slab_pad_amg(sy.A, dims, nparts)
    assert samg is not None
    # Slab boundaries sit on whole bricks and kernel blocks.
    assert samg.plan.L % samg.brick == 0
    assert (samg.plan.L + 2) % samg.plan.bz == 0
    b = sy.b.astype(np.float32) / float(np.abs(sy.b).max())
    x, res = slab_pad_amg_cg_solve(
        samg, b, np.zeros_like(b), tol=1e-6, maxiter=200
    )
    itP = int(res.iterations)
    # P-independence: within rounding slack of the single-device count.
    assert itP <= max(int(1.5 * it1), it1 + 2), (itP, it1)
    assert bool(res.converged)
    import scipy.sparse as sp

    S = sp.csr_matrix((sy.A.data, sy.A.indices, sy.A.indptr), shape=sy.A.shape)
    relres = np.linalg.norm(S @ x.astype(np.float64) - b) / np.linalg.norm(b)
    assert relres < 1e-5


@pytest.mark.slow
def test_vcycle_matches_single_device_hierarchy(box):
    """One sharded V-cycle == one single-device V-cycle on the same
    hierarchy (same algebra, slab-laid): apply both to the same residual
    and compare the fine-level corrections."""
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    mesh, sy, dims = box
    samg = build_slab_pad_amg(sy.A, dims, 4)
    assert samg is not None

    # Single-device reference cycle on the pad operator's space.
    st = choose_operator(sy.A, dtype=jnp.float32, grid_dims=dims)
    assert isinstance(st, StencilOperator)
    A1 = pad_stencil_from_stencil(st)
    M1 = smoothed_aggregation_setup(
        sy.A, dtype=jnp.float32, grid_dims=dims, fine_operator=A1
    )
    rng = np.random.default_rng(3)
    r = rng.standard_normal(sy.A.n_rows).astype(np.float32)
    z1 = np.asarray(M1(A1.put_vector(r)))
    z1_log = A1.get_vector(z1)

    # Sharded cycle applied to the same residual: route through the CG
    # driver with maxiter=1 and read the first preconditioned direction?
    # Simpler and exact: apply the block directly under shard_map.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from domain_decomposed_pde_solver_tpu.parallel.sharded import (
        AXIS,
        make_device_mesh,
    )
    from domain_decomposed_pde_solver_tpu.parallel.slabpadamg import (
        _SlabPadAMGBlock,
    )

    dev_mesh = make_device_mesh(4)
    sh = NamedSharding(dev_mesh, P(AXIS))
    rep = NamedSharding(dev_mesh, P())
    plan = samg.plan
    ops = jax.tree.map(
        lambda a: jax.device_put(a, sh), plan.make_ops(interpret=True)
    )
    r_s = jax.device_put(plan.scatter_vector(r), sh)
    tval = jax.device_put(samg.tval.astype(np.float32), sh)
    scale = jax.device_put(samg.scale.astype(np.float32), sh)
    inv_d = jax.device_put(samg.inv_diag.astype(np.float32), sh)
    tail = jax.device_put(samg.tail, rep)
    meta = dict(
        dims=plan.dims, brick=samg.brick, slab_c=samg.slab_c,
        n_c=samg.n_c, n_pad_c=samg.n_pad_c, smooth_steps=samg.smooth_steps,
    )
    lmax = samg.lmax

    def body(op_blk, r_blk, tv, sc, ivd, tail_arg):
        op = jax.tree.map(lambda a: a[0], op_blk)
        M = _SlabPadAMGBlock(
            A=op, tval=tv[0], scale=sc[0], inv_diag=ivd[0],
            lmax=jnp.asarray(lmax, jnp.float32), tail=tail_arg, **meta,
        )
        return M(r_blk[0])[None]

    fn = jax.shard_map(
        body, mesh=dev_mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=P(AXIS),
        check_vma=False,
    )
    zP = plan.gather_vector(np.asarray(fn(ops, r_s, tval, scale, inv_d, tail)))
    # Same hierarchy, same algebra; f32 reduction-order differences only.
    np.testing.assert_allclose(
        zP, z1_log, rtol=2e-4, atol=2e-4 * np.abs(z1_log).max()
    )


@pytest.mark.slow
def test_bz6_brick6_rebuild(box):
    """gcd(bz, brick) = 6 makes the slab congruences unsolvable (L ≡ -2
    mod 6 and L ≡ 0 mod 6); the builder must rebuild the operator with a
    compatible block size instead of silently returning None — this is
    exactly the 10M-scale configuration (the VMEM budget picks bz=6
    there)."""
    from domain_decomposed_pde_solver_tpu.ops.dia import pack_dia_host
    from domain_decomposed_pde_solver_tpu.ops.pallas.stencil_kernel import (
        pad_stencil_from_parts,
    )
    from domain_decomposed_pde_solver_tpu.ops.stencil import (
        stencil_parts_from_packed,
    )
    from domain_decomposed_pde_solver_tpu.parallel.slabpad import (
        build_slab_pad_stencil,
    )

    mesh, sy, dims = box
    packed = pack_dia_host(sy.A, dtype=jnp.float32)
    parts = stencil_parts_from_packed(packed[0], packed[1], sy.A.n_rows, dims)
    pad6 = pad_stencil_from_parts(parts, bz=6)
    assert pad6.bz == 6
    assert build_slab_pad_stencil(pad6, 2, z_align=6) is None  # unsolvable
    samg = build_slab_pad_amg(sy.A, dims, 2, pad_op=pad6, brick=6)
    assert samg is not None, "builder did not rebuild with a compatible bz"
    assert samg.plan.bz in (2, 4, 8)
    assert samg.plan.L % 6 == 0 and (samg.plan.L + 2) % samg.plan.bz == 0
    b = sy.b.astype(np.float32) / float(np.abs(sy.b).max())
    x, res = slab_pad_amg_cg_solve(
        samg, b, np.zeros_like(b), tol=1e-6, maxiter=100
    )
    assert bool(res.converged)
