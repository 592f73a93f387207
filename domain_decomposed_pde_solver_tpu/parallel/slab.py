"""Slab-sharded DIA operators: banded domain decomposition over ICI.

For banded matrices (DIA-formatted structured meshes, or RCM-ordered
unstructured ones) the natural decomposition is **contiguous row slabs**:
every coupling stays within the bandwidth, so each device only talks to its
two neighbors.  The halo exchange is then two ``lax.ppermute`` shifts of an
H-wide strip — the cheapest collective on a TPU ring (nearest-neighbor ICI
hops, no all-to-all) — and the local SpMV keeps the gather-free DIA form:

    x_ext = [left_halo | x_own | right_halo]          (2 ppermutes)
    y[i]  = sum_d data[d, i] * x_ext[H + i + off_d]   (static slices)

This is the multi-device engine for the 1M/10M-DOF structured configs
(BASELINE 5): per-device work is pure VPU streaming, per-step communication
volume is 2*H*4 bytes regardless of problem size.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.csr import CSRMatrix
from ..ops.dia import DIAMatrix, dia_from_csr
from ..solvers.cg import CGResult, cg_solve
from ..solvers.precond.jacobi import DiagonalPreconditioner
from .sharded import AXIS, _psum_dot, make_device_mesh

__all__ = ["SlabDIAPlan", "build_slab_plan", "SlabDIAOperator", "slab_cg_solve"]


@dataclasses.dataclass
class SlabDIAPlan:
    """Host-side description of a P-way contiguous slab split of a DIA matrix."""

    nparts: int
    n: int  # logical rows
    slab: int  # rows per device (padded)
    halo: int  # H >= max |offset|
    offsets: Tuple[int, ...]
    data: np.ndarray  # (P, ndiags, slab)

    def scatter_vector(self, x: np.ndarray, dtype=None) -> np.ndarray:
        out = np.zeros(
            (self.nparts, self.slab), dtype=x.dtype if dtype is None else dtype
        )
        flat = out.reshape(-1)
        flat[: self.n] = x
        return out

    def gather_vector(self, x_parts: np.ndarray) -> np.ndarray:
        return np.asarray(x_parts).reshape(-1)[: self.n]


def build_slab_plan(
    A: CSRMatrix | DIAMatrix, nparts: int, dtype=np.float32,
    row_align: int = 8,
) -> Optional[SlabDIAPlan]:
    """Build the slab plan; None if the matrix has no (small) DIA form.

    ``row_align``: slabs are padded to a multiple of this (set to ``mx*my``
    of a lexicographic grid so every slab is a whole number of z-layers —
    required by the two-level brick preconditioner in `slabbrick.py`)."""
    if isinstance(A, DIAMatrix):
        dia = A
        n = A.n_rows
        data_full = np.asarray(A.data)[:, :n]
    else:
        dia = dia_from_csr(A, dtype=dtype)
        if dia is None:
            return None
        n = A.n_rows
        data_full = np.asarray(dia.data)[:, :n]
    offsets = dia.offsets
    H = max(max(abs(o) for o in offsets), 1)
    H = ((H + 7) // 8) * 8
    slab = -(-n // nparts)
    slab = -(-slab // row_align) * row_align
    if slab < H:
        # Slabs thinner than the bandwidth would need beyond-neighbor
        # communication; refuse (caller falls back to the general path).
        return None
    data = np.zeros((nparts, len(offsets), slab), dtype=np.dtype(dtype))
    for p in range(nparts):
        lo = p * slab
        hi = min(lo + slab, n)
        if lo < n:
            data[p, :, : hi - lo] = data_full[:, lo:hi]
    return SlabDIAPlan(
        nparts=nparts, n=n, slab=slab, halo=H, offsets=offsets, data=data
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["offsets", "halo", "slab"],
)
@dataclasses.dataclass
class SlabDIAOperator:
    """Per-device slab block (used inside shard_map)."""

    data: jax.Array  # (ndiags, slab)
    offsets: Tuple[int, ...]
    halo: int
    slab: int

    def matvec(self, x_own: jax.Array) -> jax.Array:
        H, S = self.halo, self.slab
        nd = jax.lax.axis_size(AXIS)
        # Neighbor strips: device p receives p-1's last H (left) and p+1's
        # first H (right); ring edges contribute zeros.
        left = jax.lax.ppermute(
            x_own[S - H :], AXIS, [(i, i + 1) for i in range(nd - 1)]
        )
        right = jax.lax.ppermute(
            x_own[:H], AXIS, [(i + 1, i) for i in range(nd - 1)]
        )
        x_ext = jnp.concatenate([left, x_own, right])  # (S + 2H,)
        y = jnp.zeros_like(x_own)
        for d, off in enumerate(self.offsets):
            y = y + self.data[d] * jax.lax.dynamic_slice(
                x_ext, (H + off,), (S,)
            )
        return y


def slab_cg_solve(
    plan: SlabDIAPlan,
    b: np.ndarray,
    x0: np.ndarray,
    *,
    mesh: Optional[Mesh] = None,
    tol: float = 1e-12,
    maxiter: int = 1000,
    jacobi: bool = True,
    brick_precond=None,
):
    """Distributed CG over the slab decomposition: one SPMD program.

    ``brick_precond``: an optional `slabbrick.SlabBrickPrecond` — each
    device then preconditions with its communication-free two-level brick
    cycle instead of Jacobi.  Returns (x_host, CGResult-shaped scalars).
    """
    dev_mesh = mesh if mesh is not None else make_device_mesh(plan.nparts)
    sh = NamedSharding(dev_mesh, P(AXIS))
    data = jax.device_put(plan.data, sh)
    b_s = jax.device_put(plan.scatter_vector(b, dtype=plan.data.dtype), sh)
    x0_s = jax.device_put(plan.scatter_vector(x0, dtype=plan.data.dtype), sh)
    offsets, halo, slab = plan.offsets, plan.halo, plan.slab
    bp = brick_precond
    ci = jax.device_put(bp.coarse_inv, sh) if bp is not None else None
    idg = jax.device_put(bp.inv_diag, sh) if bp is not None else None

    def body(data_blk, b_blk, x_blk, ci_blk, id_blk):
        op = SlabDIAOperator(
            data=data_blk[0], offsets=offsets, halo=halo, slab=slab
        )
        if bp is not None:
            M = bp.block(data_blk[0], ci_blk[0], id_blk[0])
        elif jacobi:
            if 0 in offsets:
                d = data_blk[0][offsets.index(0)]
            else:
                d = jnp.ones_like(b_blk[0])
            inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)
            M = DiagonalPreconditioner(inv)
        else:
            M = None
        res = cg_solve(
            op, b_blk[0], x_blk[0], precond=M, tol=tol, maxiter=maxiter,
            dot=_psum_dot,
        )
        return res.x[None], res.iterations, res.relres, res.converged

    if bp is None:
        # Keep the arity static for shard_map: dummy replicated scalars.
        ci = jnp.zeros((plan.nparts, 1, 1), data.dtype)
        idg = jnp.zeros((plan.nparts, 1), data.dtype)
        ci = jax.device_put(ci, sh)
        idg = jax.device_put(idg, sh)

    fn = jax.shard_map(
        body,
        mesh=dev_mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(), P(), P()),
        check_vma=False,
    )
    x_s, iters, relres, conv = fn(data, b_s, x0_s, ci, idg)
    return plan.gather_vector(np.asarray(x_s)), CGResult(
        x=x_s, iterations=iters, relres=relres, converged=conv
    )
