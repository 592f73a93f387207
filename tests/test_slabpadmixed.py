"""Sharded mixed-precision refinement (parallel/slabpadmixed.py).

Convergence BELOW the f32 floor (~1e-7) through the distributed engine
proves the sharded f64 residual path: an error in the slab halo exchange,
parity alignment, or z-validity masking would stall every sweep at f32
accuracy.  The reference has no distributed mixed-precision capability
(`BelosMueLuSolver.cpp:87-139` is f64 GMRES+ILUT throughout).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from domain_decomposed_pde_solver_tpu.io.boxmesh import box_mesh
from domain_decomposed_pde_solver_tpu.models import assemble_heat_system
from domain_decomposed_pde_solver_tpu.solvers.precond.amg import (
    infer_free_grid,
)
from domain_decomposed_pde_solver_tpu.parallel.slabpadamg import (
    build_slab_pad_amg,
)
from domain_decomposed_pde_solver_tpu.parallel.slabpadmixed import (
    _slab_matvec_f64,
    slab_pad_amg_refine_solve,
)


@pytest.fixture(scope="module")
def box():
    mesh = box_mesh(26, 26, 95, elem_type="TETRA4")
    sy = assemble_heat_system(mesh)
    dims = infer_free_grid(mesh, sy.free_to_node)
    assert dims is not None
    S = sp.csr_matrix(
        (sy.A.data, sy.A.indices, sy.A.indptr), shape=sy.A.shape
    )
    return sy, dims, S


def _pad_op(sy, dims):
    from domain_decomposed_pde_solver_tpu.ops.dia import pack_dia_host
    from domain_decomposed_pde_solver_tpu.ops.pallas.stencil_kernel import (
        pad_stencil_from_parts,
    )
    from domain_decomposed_pde_solver_tpu.ops.stencil import (
        stencil_parts_from_packed,
    )

    uniq, data = pack_dia_host(sy.A, dtype=jnp.float32)
    parts = stencil_parts_from_packed(uniq, data, sy.n_free, dims)
    return pad_stencil_from_parts(parts)


@pytest.mark.slow
def test_slab_matvec_f64_matches_scipy(box):
    """The sharded f64 slab matvec IS the assembled operator."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from domain_decomposed_pde_solver_tpu.parallel.sharded import (
        AXIS, make_device_mesh,
    )
    from domain_decomposed_pde_solver_tpu.parallel.slabpad import (
        build_slab_pad_stencil,
    )

    sy, dims, S = box
    A = _pad_op(sy, dims)
    nparts = 4
    if len(jax.devices()) < nparts:
        pytest.skip("needs virtual devices")
    plan = build_slab_pad_stencil(A, nparts, z_align=6)
    assert plan is not None
    dev_mesh = make_device_mesh(nparts)
    sh = NamedSharding(dev_mesh, P(AXIS))
    ops = jax.tree.map(
        lambda a: jax.device_put(a, sh), plan.make_ops(True)
    )
    rng = np.random.default_rng(3)
    x = rng.standard_normal(sy.n_free)
    x_s = jax.device_put(plan.scatter_vector(x, dtype=np.float64), sh)
    pats = np.asarray(A.pats, np.float32)
    cvals = np.asarray(A.const_vals, np.float32)

    def body(op_blk, x_blk):
        op = jax.tree.map(lambda a: a[0], op_blk)
        return _slab_matvec_f64(op, pats, cvals, x_blk[0])[None]

    fn = jax.shard_map(
        body, mesh=dev_mesh, in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(AXIS), check_vma=False,
    )
    y = plan.gather_vector(np.asarray(fn(ops, x_s)))
    yref = S @ x
    assert np.linalg.norm(y - yref) / np.linalg.norm(yref) < 1e-14


@pytest.mark.slow
@pytest.mark.parametrize("nparts", [2, 4])
def test_refine_reaches_f64_accuracy(box, nparts):
    sy, dims, S = box
    if len(jax.devices()) < nparts:
        pytest.skip("needs virtual devices")
    samg = build_slab_pad_amg(sy.A, dims, nparts)
    assert samg is not None
    A = _pad_op(sy, dims)
    res = slab_pad_amg_refine_solve(samg, A, sy.b, tol=1e-10)
    assert res.converged and res.relres < 1e-10
    # True residual of the gathered solution — well below the f32 floor,
    # which only the exact sharded f64 outer loop can reach.
    rr = np.linalg.norm(S @ res.x - sy.b) / np.linalg.norm(sy.b)
    assert rr < 1e-9
    assert res.refinements >= 2  # f32 inner cannot reach 1e-10 in one


def test_refine_requires_x64(box):
    sy, dims, S = box
    samg = build_slab_pad_amg(sy.A, dims, 2)
    A = _pad_op(sy, dims)
    jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(ValueError, match="x64"):
            slab_pad_amg_refine_solve(samg, A, sy.b)
    finally:
        jax.config.update("jax_enable_x64", True)


@pytest.mark.slow
def test_refine_warm_start(box):
    """A warm start (one extra residual dispatch) converges from the
    given iterate instead of zero."""
    sy, dims, S = box
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    samg = build_slab_pad_amg(sy.A, dims, 2)
    r0 = slab_pad_amg_refine_solve(samg, b=sy.b, tol=1e-10)
    r1 = slab_pad_amg_refine_solve(samg, b=sy.b, x0=r0.x, tol=1e-10)
    assert r1.converged and r1.inner_iterations <= 2  # already converged
    rr = np.linalg.norm(S @ r1.x - sy.b) / np.linalg.norm(sy.b)
    assert rr < 1e-9


@pytest.mark.slow
def test_cli_f64_sharded_amg_routes_through_refinement(box, tmp_path):
    """--partitions N --precond amg --dtype float64 on a structured mesh
    reaches true f64 accuracy through the mixed-precision path (pinned by
    the inner-iteration count: a plain f64 CG to 1e-10 needs far more)."""
    from domain_decomposed_pde_solver_tpu.cli.solve import main as solve_main
    from domain_decomposed_pde_solver_tpu.io import read_nodal_vars
    from domain_decomposed_pde_solver_tpu.io.exodus import write_exodus

    sy, dims, S = box
    mesh_path = str(tmp_path / "box.exo")
    write_exodus(mesh_path, sy.mesh)
    out = str(tmp_path / "sol.exo")
    rc = solve_main([
        "--input", mesh_path, "--solution", out, "--partitions", "2",
        "--precond", "amg", "--dtype", "float64", "--tolerance", "1e-10",
        "--cpu", "--no-snapshots", "--iterations", "200",
    ])
    assert rc == 0
    names, times, vals = read_nodal_vars(out)
    x = vals[-1, 0][np.asarray(sy.free_to_node)]
    rr = np.linalg.norm(S @ x - sy.b) / np.linalg.norm(sy.b)
    assert rr < 1e-9
