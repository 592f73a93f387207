"""z-slab sharding of the VMEM-tiled Pallas pad-stencil operator.

The fastest single-chip structured SpMV in the package is the padded-3-D
Pallas kernel (:mod:`..ops.pallas.stencil_kernel`).  This module makes it
the **per-device engine of the multi-chip slab decomposition**: each device
owns a contiguous block of whole z-layers of the padded (Z, myp, mxp)
lattice, the halo is exactly ONE z-layer per ring neighbor (the stencil's
``|dz| <= 1``), exchanged with two nearest-neighbor ``lax.ppermute`` shifts
— the cheapest collective on a TPU ring — and the local matvec is the
unmodified pad-stencil kernel run on ``[lo_halo | own layers | hi_halo]``:

    owned layers L per device:  L even (z-parity invariance under the
        <=2-periodic coefficient patterns: global layer p*L + l has the
        same parity as local layer l) and L + 2 ≡ 0 (mod bz) (the halo
        layers stand in for the kernel's guard layers, so the local
        padded extent Z_local = L + 2 tiles exactly into DMA blocks)
    per-device z-validity:      the kernel's output mask bounds are the
        SMEM ``zlim`` scalars — (1, L) for interior slabs, (1, mz - p*L)
        for the slab holding the global grid end, (1, 0) past it

Per-step communication volume is ``2 * myp * mxp * 4`` bytes regardless of
problem size (~53 KB at 1M DOF); per-device work is the measured-fast
Pallas kernel.  This is the BASELINE-config-5 weak-scaling engine for
structured meshes (the reference weak-scales the same configs over MPI
ranks via Tpetra distributed CSR, `/root/reference/ExodusIO.hpp:733-1489`;
here the decomposition is layout-native and the halo static).

Vectors live in the **owned-only stacked space** ``(nparts, L*myp*mxp)``
(no halo duplication), so ``_psum_dot`` needs no masking: pad slots are
zero by the kernel's row/lane/z masks and stay zero through Krylov
updates.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas.stencil_kernel import PadStencilOperator, _pad_stencil_call
from ..solvers.cg import CGResult, cg_solve
from ..solvers.precond.jacobi import DiagonalPreconditioner
from .sharded import AXIS, _psum_dot, make_device_mesh

__all__ = [
    "SlabPadStencilOperator",
    "SlabPadPlan",
    "build_slab_pad_stencil",
    "slab_pad_cg_solve",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["quads", "zlim", "corr_ext"],
    meta_fields=[
        "taps", "groups", "group_const", "group_kind", "dims_local",
        "period", "myp", "mxp", "bz", "interpret",
    ],
)
@dataclasses.dataclass
class SlabPadStencilOperator:
    """Per-device z-slab block (used inside ``shard_map``).

    ``corr_ext`` is this slab's diagonal correction in the extended
    (L+2)-layer layout (zero guard layers where the halo slots sit);
    ``zlim`` the per-device (1, 2) int32 SMEM validity bounds.  All other
    fields have :class:`..ops.pallas.stencil_kernel.PadStencilOperator`
    semantics on the local dims ``(mx, my, L)``.
    """

    quads: jax.Array  # (n_groups, 8) f32
    zlim: jax.Array  # (1, 2) int32
    corr_ext: jax.Array  # ((L+2)*myp, mxp) f32 or bf16
    taps: Tuple[Tuple[int, int, int], ...]
    groups: Tuple[Tuple[int, ...], ...]
    group_const: Tuple[bool, ...]
    group_kind: Tuple[str, ...]
    dims_local: Tuple[int, int, int]  # (mx, my, L)
    period: int
    myp: int
    mxp: int
    bz: int
    interpret: bool

    @property
    def L(self) -> int:
        return self.dims_local[2]

    @property
    def n_pad(self) -> int:
        """Owned (per-device) vector length."""
        return self.L * self.myp * self.mxp

    @property
    def n_rows(self) -> int:
        return self.n_pad

    @property
    def dtype(self):
        return jnp.dtype(jnp.float32)

    def matvec(self, x_own: jax.Array) -> jax.Array:
        layer = self.myp * self.mxp
        nd = jax.lax.axis_size(AXIS)
        # One-z-layer halo strips from the ring neighbors; ring edges get
        # zeros — exactly the global operator's zero guard layers.
        lo = jax.lax.ppermute(
            x_own[self.n_pad - layer :], AXIS,
            [(i, i + 1) for i in range(nd - 1)],
        )
        hi = jax.lax.ppermute(
            x_own[:layer], AXIS, [(i + 1, i) for i in range(nd - 1)]
        )
        x_ext = jnp.concatenate([lo, x_own, hi])
        Zl = self.L + 2
        meta = (
            self.taps, self.groups, self.group_const, self.group_kind,
            self.dims_local, self.myp, self.mxp, self.bz, Zl,
            Zl // self.bz,
        )
        x2 = x_ext.astype(jnp.float32).reshape(Zl * self.myp, self.mxp)
        corr2 = self.corr_ext.reshape(Zl * self.myp, self.mxp)
        # vma=None + check_vma=False at the shard_map sites below: the
        # pallas HLO interpreter does not propagate varying-axis metadata
        # through its internal dynamic_slice/scratch discharge (JAX 0.9
        # raises "varying manual axes to match ... pass check_vma=False"),
        # so the collective-correctness check cannot be enabled on any
        # shard_map whose body contains a pallas_call.
        with jax.enable_x64(False):
            y = _pad_stencil_call(
                meta, self.quads, self.zlim, x2, corr2, self.bz + 6,
                self.interpret,
            )
        return y.reshape(-1)[layer : (self.L + 1) * layer].astype(
            x_own.dtype
        )


@dataclasses.dataclass
class SlabPadPlan:
    """Host-side description of the P-way z-slab split."""

    nparts: int
    L: int  # owned layers per device
    dims: Tuple[int, int, int]  # global (mx, my, mz)
    myp: int
    mxp: int
    bz: int
    quads: np.ndarray  # (n_groups, 8)
    zlims: np.ndarray  # (nparts, 1, 2) int32
    corr_ext: np.ndarray  # (nparts, (L+2)*myp, mxp) f32 or bf16
    inv_diag: np.ndarray  # (nparts, L*myp*mxp) f32 (pad slots 1.0)
    meta: dict  # taps/groups/group_const/group_kind/period

    @property
    def slab(self) -> int:
        return self.L * self.myp * self.mxp

    def scatter_vector(self, x: np.ndarray, dtype=np.float32) -> np.ndarray:
        """Logical lexicographic (n_rows,) -> owned stacked (P, slab)."""
        mx, my, mz = self.dims
        out = np.zeros(
            (self.nparts * self.L, self.myp, self.mxp), dtype=dtype
        )
        out[:mz, 1 : my + 1, :mx] = np.asarray(x, dtype=dtype).reshape(
            mz, my, mx
        )
        return out.reshape(self.nparts, self.slab)

    def gather_vector(self, x_parts) -> np.ndarray:
        mx, my, mz = self.dims
        x3 = np.asarray(x_parts).reshape(
            self.nparts * self.L, self.myp, self.mxp
        )
        return np.ascontiguousarray(x3[:mz, 1 : my + 1, :mx]).reshape(-1)

    def make_ops(self, interpret: bool) -> SlabPadStencilOperator:
        """Stacked (leading axis = nparts) operator pytree for shard_map."""
        mx, my, _ = self.dims
        return SlabPadStencilOperator(
            quads=jnp.asarray(
                np.broadcast_to(
                    self.quads, (self.nparts,) + self.quads.shape
                )
            ),
            zlim=jnp.asarray(self.zlims),
            corr_ext=jnp.asarray(self.corr_ext),
            dims_local=(mx, my, self.L),
            myp=self.myp,
            mxp=self.mxp,
            bz=self.bz,
            interpret=interpret,
            **self.meta,
        )


def build_slab_pad_stencil(
    A: PadStencilOperator, nparts: int, z_align: int = 1
) -> Optional[SlabPadPlan]:
    """Split a :class:`PadStencilOperator` into P z-layer slabs.

    ``z_align``: additionally require the owned-layer count L to be a
    multiple of this (the slab-AMG composition needs slab boundaries on
    whole brick-aggregate rows).  Returns None when the grid has fewer
    layers than the minimum slab (the slab must cover more than the
    1-layer halo depth) or no L satisfies the congruences.
    """
    mx, my, mz = A.dims
    bz = A.bz
    # L: smallest count covering mz/P with L even, L + 2 ≡ 0 (mod bz),
    # L ≡ 0 (mod z_align), and L >= 2*bz - 2 (the kernel's double-buffered
    # DMA streams (bz+2)-layer windows, so the local extent L + 2 must be
    # at least bz + 2 — i.e. at least two grid blocks).
    L_min = max(2 * bz - 2, -(-mz // nparts))
    k0 = -(-(L_min + 2) // bz)
    z_align = max(int(z_align), 1)
    L = None
    # k*bz - 2 cycles through residues mod z_align with period
    # z_align/gcd(bz, z_align) <= z_align; scan one full cycle (+slack).
    for k in range(k0, k0 + z_align + 2):
        cand = k * bz - 2
        if cand % 2 == 0 and cand % z_align == 0:
            L = cand
            break
    if L is None or L < 2:
        return None
    if nparts > 1 and (nparts - 1) * L >= mz:
        # A trailing slab would own zero real layers — correct (its zlim
        # masks everything) but wasteful; make the caller use fewer parts.
        return None
    myp, mxp = A.myp, A.mxp
    layer = myp * mxp

    # Preserve the operator's corr storage dtype (bfloat16 when exact):
    # the bz the VMEM budget picked assumed that byte width, and the
    # kernel reads corr blocks in either dtype (.astype(f32) in-kernel).
    corr_np = np.asarray(A.corr)
    corr3 = corr_np.reshape(A.Z, myp, mxp)
    corr_real = corr3[1 : mz + 1]  # (mz, myp, mxp)
    corr_full = np.zeros((nparts * L, myp, mxp), corr_np.dtype)
    corr_full[:mz] = corr_real
    corr_ext = np.zeros((nparts, (L + 2) * myp, mxp), corr_np.dtype)
    for p_i in range(nparts):
        corr_ext[p_i, myp : (L + 1) * myp] = corr_full[
            p_i * L : (p_i + 1) * L
        ].reshape(L * myp, mxp)

    zlims = np.zeros((nparts, 1, 2), np.int32)
    for p_i in range(nparts):
        zlims[p_i, 0] = (1, int(np.clip(mz - p_i * L, 0, L)))

    d = np.asarray(A.diagonal_padded(fill=1.0), dtype=np.float32).reshape(
        A.Z, myp, mxp
    )[1 : mz + 1]
    d_full = np.ones((nparts * L, myp, mxp), np.float32)
    d_full[:mz] = np.where(d != 0, d, 1.0)
    inv_diag = (1.0 / d_full).reshape(nparts, L * layer)

    quads = np.asarray(A.quads, dtype=np.float32)
    meta = dict(
        taps=A.taps, groups=A.groups, group_const=A.group_const,
        group_kind=A.group_kind, period=A.period,
    )
    return SlabPadPlan(
        nparts=nparts, L=L, dims=A.dims, myp=myp, mxp=mxp, bz=bz,
        quads=quads, zlims=zlims, corr_ext=corr_ext, inv_diag=inv_diag,
        meta=meta,
    )


def slab_pad_cg_solve(
    plan: SlabPadPlan,
    b: np.ndarray,
    x0: np.ndarray,
    *,
    mesh: Optional[Mesh] = None,
    tol: float = 1e-12,
    maxiter: int = 1000,
    jacobi: bool = True,
    interpret: Optional[bool] = None,
):
    """Distributed CG with the Pallas pad-stencil per-device matvec.

    Same contract as :func:`.slab.slab_stencil_cg_solve`; ``interpret``
    defaults to True off-TPU (CPU dryrun/test meshes) and False on TPU.
    Returns ``(x_host, CGResult-shaped scalars)``.
    """
    dev_mesh = mesh if mesh is not None else make_device_mesh(plan.nparts)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    sh = NamedSharding(dev_mesh, P(AXIS))
    ops = plan.make_ops(interpret)
    ops = jax.tree.map(lambda a: jax.device_put(a, sh), ops)
    b_s = jax.device_put(plan.scatter_vector(np.asarray(b, np.float32)), sh)
    x0_s = jax.device_put(
        plan.scatter_vector(np.asarray(x0, np.float32)), sh
    )
    invd_s = jax.device_put(plan.inv_diag, sh)

    def body(op_blk, b_blk, x_blk, invd_blk):
        op = jax.tree.map(lambda a: a[0], op_blk)
        M = DiagonalPreconditioner(invd_blk[0]) if jacobi else None
        res = cg_solve(
            op, b_blk[0], x_blk[0], precond=M, tol=tol, maxiter=maxiter,
            dot=_psum_dot,
        )
        return res.x[None], res.iterations, res.relres, res.converged

    fn = jax.shard_map(
        body,
        mesh=dev_mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(), P(), P()),
        check_vma=False,  # pallas_call in body; see SlabPadStencilOperator.matvec
    )
    x_s, iters, relres, conv = fn(ops, b_s, x0_s, invd_s)
    x = plan.gather_vector(np.asarray(x_s))
    return x, CGResult(x=x_s, iterations=iters, relres=relres, converged=conv)
