"""High-level session API: build once, solve many.

Production/serving-style entry point: the expensive artifacts (mesh read,
assembly, device operator, AMG hierarchy) are built once per mesh; repeated
solves — e.g. sweeping boundary temperatures, or re-solving as sensor data
updates — reuse them and warm-start from the previous solution.

    solver = SteadyHeatSolver.from_file("mesh.exo")
    u1 = solver.solve()                          # reference BC values
    u2 = solver.solve(bc={100: 80.0, 1000: 25.0})  # new temperatures, warm

The BC override exploits linearity: the RHS for arbitrary per-nodeset
Dirichlet values is reassembled in O(nnz) on the host (the matrix never
changes), so each new solve costs only a preconditioned CG from a warm
start.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from .io.mesh import MeshModel
from .models.heat import HeatSystem, assemble_heat_system, unique_element_edges

__all__ = ["SteadyHeatSolver"]


class SteadyHeatSolver:
    """Reusable steady-state heat solver bound to one mesh."""

    def __init__(
        self,
        mesh: MeshModel,
        dtype=None,
        precond: str = "amg",
    ):
        import jax.numpy as jnp

        from .ops.dia import choose_operator

        self.mesh = mesh
        self.dtype = dtype if dtype is not None else jnp.float64
        self.system: HeatSystem = assemble_heat_system(mesh)
        self.operator = choose_operator(self.system.A, dtype=self.dtype)
        self._precond_kind = precond
        self._precond = self._build_precond(precond)
        self._last_x: Optional[np.ndarray] = None
        # Precompute the boundary-edge structure for fast RHS reassembly:
        # b[i] = sum over boundary neighbors c of value(c).
        u, v = unique_element_edges(mesh)
        free_mask = self.system.node_to_free >= 0
        sel = free_mask[u] & ~free_mask[v]
        self._b_rows = self.system.node_to_free[u[sel]]
        self._b_cols = v[sel]  # boundary mesh nodes

    @classmethod
    def from_file(cls, path: str, **kw) -> "SteadyHeatSolver":
        from .io.exodus import read_exodus

        return cls(read_exodus(path), **kw)

    def _build_precond(self, kind: str):
        from .solvers.precond.jacobi import jacobi_preconditioner

        if kind == "jacobi":
            return jacobi_preconditioner(self.operator)
        if kind == "amg":
            from .solvers.precond.amg import smoothed_aggregation_setup

            return smoothed_aggregation_setup(self.system.A, dtype=self.dtype)
        if kind == "none":
            return None
        raise ValueError(kind)

    def rhs_for(self, bc: Optional[Dict[int, float]] = None) -> np.ndarray:
        """RHS for per-nodeset Dirichlet values.

        ``bc`` maps nodeset id -> temperature; omitted sets keep the
        reference convention (value = nodeset id, smallest id winning for
        multiply-set nodes, ``ExodusIO.hpp:675-682``)."""
        if not bc:
            return self.system.b
        _, bval = self.mesh.boundary_value_per_node()
        for ns in sorted(self.mesh.node_sets, key=lambda s: s.id, reverse=True):
            if ns.id in bc:
                # Same descending-overwrite trick as boundary_value_per_node:
                # ascending-id priority for nodes in multiple sets.
                bval[ns.nodes.astype(np.int64)] = float(bc[ns.id])
        b = np.zeros(self.system.n_free)
        np.add.at(b, self._b_rows, bval[self._b_cols])
        return b

    def boundary_values_for(self, bc: Optional[Dict[int, float]] = None) -> np.ndarray:
        """Per-node values for Exodus timestep-0 output under ``bc``."""
        vals = self.mesh.boundary_write_values()
        if bc:
            for ns in sorted(self.mesh.node_sets, key=lambda s: s.id):
                if ns.id in bc:
                    vals[ns.nodes.astype(np.int64)] = float(bc[ns.id])
        return vals

    def solve(
        self,
        bc: Optional[Dict[int, float]] = None,
        tol: float = 1e-10,
        maxiter: int = 1000,
        warm_start: bool = True,
    ):
        """Solve for the given boundary temperatures; returns
        (u_free, CGResult)."""
        import jax.numpy as jnp

        from .ops.ell import pad_vector, unpad_vector
        from .solvers.cg import cg_solve

        b_host = self.rhs_for(bc)
        b = pad_vector(b_host.astype(np.dtype(self.dtype)), self.operator.n_pad)
        if warm_start and self._last_x is not None:
            x0 = pad_vector(
                self._last_x.astype(np.dtype(self.dtype)), self.operator.n_pad
            )
        else:
            x0 = jnp.zeros_like(b)
        res = cg_solve(
            self.operator, b, x0, precond=self._precond, tol=tol,
            maxiter=maxiter,
        )
        u = unpad_vector(res.x, self.system.n_free)
        self._last_x = np.array(u)
        return u, res

    def write_solution(self, path: str, u: np.ndarray,
                       bc: Optional[Dict[int, float]] = None,
                       timestep: int = 0) -> None:
        """Write ``u`` (free-node values) as an Exodus solution file."""
        from .io.exodus import ExodusSolutionWriter

        with ExodusSolutionWriter(path, self.mesh) as w:
            w._node_vals = self.boundary_values_for(bc)
            w.write_solution(u, self.system.free_to_node, timestep)
