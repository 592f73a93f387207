"""Distributed f64-accurate solve: sharded CG+AMG inside f64 refinement.

The slab-pad engine (Pallas pad-stencil per-device matvec, global sharded
SA-AMG hierarchy) runs the f32 inner sweeps; a device-resident f64
refinement loop with a ppermute-halo f64 slab matvec drives the true
residual below anything a pure-f32 solve can reach — the 1e-8+ BASELINE
accuracy metric, on P devices.  The reference has no distributed
mixed-precision capability (`BelosMueLuSolver.cpp:87-139` is f64
GMRES+ILUT throughout).

Run (8 virtual devices on CPU):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/07_sharded_f64_refinement.py
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")  # or leave default for TPU
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sp

from domain_decomposed_pde_solver_tpu.io import box_mesh
from domain_decomposed_pde_solver_tpu.models import assemble_heat_system
from domain_decomposed_pde_solver_tpu.parallel import (
    build_slab_pad_amg,
    slab_pad_amg_refine_solve,
)
from domain_decomposed_pde_solver_tpu.solvers.precond.amg import (
    infer_free_grid,
)


def main():
    mesh = box_mesh(26, 26, 46, elem_type="TETRA4")
    system = assemble_heat_system(mesh)
    dims = infer_free_grid(mesh, system.free_to_node)
    print(f"{system.n_free} free DOF, free grid {dims}")
    S = sp.csr_matrix(
        (system.A.data, system.A.indices, system.A.indptr),
        shape=system.A.shape,
    )

    for P in (2, 4):
        if len(jax.devices()) < P:
            continue
        samg = build_slab_pad_amg(system.A, dims, P)
        if samg is None:
            print(f"P={P}: slab layout unavailable for these dims")
            continue
        res = slab_pad_amg_refine_solve(samg, b=system.b, tol=1e-10)
        true_rr = np.linalg.norm(S @ res.x - system.b) / np.linalg.norm(
            system.b
        )
        print(
            f"P={P}: {res.refinements} sweeps / {res.inner_iterations} "
            f"inner f32 iterations -> true f64 residual {true_rr:.1e}"
        )
        assert true_rr < 1e-9


if __name__ == "__main__":
    main()
