"""Distributed global SA-AMG with the Pallas pad-stencil per-device engine.

The BASELINE-config-5 composition: :mod:`.slabamg` proved the *global*
sharded hierarchy (P-independent CG iteration counts, brick transfers local
to slabs, replicated coarse tail); :mod:`.slabpad` proved the fastest
single-chip structured SpMV as a z-slab per-device engine (ppermute
1-layer halos).  This module is their product — the weak-scaling solver
whose per-device smoother work runs on the measured-fastest kernel:

- **Fine level**: :class:`.slabpad.SlabPadStencilOperator` per device
  (VMEM-tiled pad-stencil kernel + two nearest-neighbor ``ppermute``).
  Per-device vectors live in the slab's owned padded-3-D space
  ``(L, myp, mxp)``; pad slots hold zeros through the whole Krylov/cycle
  algebra (kernel output masks restore the invariant every matvec).
- **Transfers local**: slabs are aligned to whole ``brick`` z-layers
  (``build_slab_pad_stencil(z_align=brick)``), so the brick tentative
  transfer is pure reshape/repeat inside the slab (extract the real
  ``(L, my, mx)`` box, brick-sum / brick-repeat, re-embed); the smoothing
  half of P/R is one fine-level halo matvec.  Restriction costs exactly
  one ``all_gather`` of the per-slab coarse residual.
- **Coarse tail replicated**: identical redundant V-cycle per device
  (levels 1+ are ~49k rows at 10M DOF — latency-bound, replication
  deletes their comm).

Setup reuses :func:`..solvers.precond.amg.smoothed_aggregation_setup`
``level_info_out`` for the global level-0 pieces (agg/counts/d/lmax as
HOST arrays — no device round-trip through the tunnel), so iteration
counts match the single-device hierarchy by construction.

Replaces the role MueLu was meant to play in the reference
(``BelosMueLuSolver.cpp:11``) at weak scale (``ExodusIO.hpp:733-1489``
distributes the same solve over MPI ranks via Tpetra CSR).
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
from ..solvers.cg import CGResult, cg_solve
from ..solvers.precond.amg import AMGPreconditioner, smoothed_aggregation_setup
from .sharded import AXIS, _psum_dot, make_device_mesh
from .slabpad import SlabPadPlan, SlabPadStencilOperator, build_slab_pad_stencil

__all__ = ["SlabPadAMG", "build_slab_pad_amg", "slab_pad_amg_cg_solve"]


@dataclasses.dataclass
class SlabPadAMG:
    """Host-side bundle: slab-pad plan + level-0 pieces + replicated tail."""

    plan: SlabPadPlan
    brick: int
    tval: np.ndarray  # (P, slab) tentative weights, owned padded layout
    scale: np.ndarray  # (P, slab) omega/lmax/diag
    inv_diag: np.ndarray  # (P, slab), pad slots 1.0
    lmax: float
    smooth_steps: int
    tail: AMGPreconditioner  # replicated levels 1+ (tiny)
    n_c: int  # true coarse rows
    n_pad_c: int  # tail's padded vector length
    # The global operator the hierarchy was built on — pattern-plane
    # source for the sharded f64 refinement (.slabpadmixed).
    pad_op: object = None

    @property
    def slab_c(self) -> int:
        mx, my, _ = self.plan.dims
        b = self.brick
        return -(-mx // b) * -(-my // b) * (self.plan.L // b)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "tval", "scale", "inv_diag", "lmax", "tail"],
    meta_fields=["dims", "brick", "slab_c", "n_c", "n_pad_c", "smooth_steps"],
)
@dataclasses.dataclass
class _SlabPadAMGBlock:
    """Per-device callable pytree (lives inside shard_map)."""

    A: SlabPadStencilOperator
    tval: jax.Array  # (slab,) owned padded layout
    scale: jax.Array  # (slab,)
    inv_diag: jax.Array  # (slab,)
    lmax: jax.Array  # scalar
    tail: AMGPreconditioner  # replicated
    dims: Tuple[int, int, int]  # global (mx, my, mz)
    brick: int
    slab_c: int
    n_c: int
    n_pad_c: int
    smooth_steps: int

    # -- local brick tentative transfer in the padded slab space ---------
    def _t_apply(self, x_c_loc: jax.Array) -> jax.Array:
        mx, my, _ = self.dims
        L, myp, mxp = self.A.L, self.A.myp, self.A.mxp
        b = self.brick
        ncx, ncy, ncz = -(-mx // b), -(-my // b), L // b
        z = x_c_loc.reshape(ncz, ncy, ncx)
        z = jnp.repeat(z, b, axis=0)  # (L, ...)  L ≡ 0 (mod b)
        z = jnp.repeat(z, b, axis=1)[:, :my]
        z = jnp.repeat(z, b, axis=2)[:, :, :mx]
        z = jnp.pad(z, ((0, 0), (1, myp - my - 1), (0, mxp - mx)))
        # tval is zero on pad slots AND on owned layers past the global
        # grid end, so dead bricks contribute nothing.
        return self.tval * z.reshape(-1)

    def _t_transpose(self, w: jax.Array) -> jax.Array:
        mx, my, _ = self.dims
        L, myp, mxp = self.A.L, self.A.myp, self.A.mxp
        b = self.brick
        ncx, ncy, ncz = -(-mx // b), -(-my // b), L // b
        tw = (self.tval * w).reshape(L, myp, mxp)[:, 1 : my + 1, :mx]
        tw = jnp.pad(tw, ((0, 0), (0, ncy * b - my), (0, ncx * b - mx)))
        c = tw.reshape(ncz, b, ncy, b, ncx, b).sum(axis=(1, 3, 5))
        return c.reshape(-1)  # (slab_c,)

    # -- smoothed transfers (one halo matvec each) -----------------------
    def _p_apply(self, x_c_loc: jax.Array) -> jax.Array:
        t = self._t_apply(x_c_loc)
        return t - self.scale * self.A.matvec(t)

    def _r_apply(self, w: jax.Array) -> jax.Array:
        s = w - self.A.matvec(self.scale * w)
        return self._t_transpose(s)

    # -- shared Chebyshev smoother, same algebra as AMGPreconditioner --
    def _smooth(self, x: jax.Array, b: jax.Array, x_zero: bool = False):
        from ..solvers.precond.cheby import chebyshev_smooth

        return chebyshev_smooth(
            self.A.matvec, self.inv_diag, self.lmax, self.smooth_steps,
            x, b, x_zero=x_zero,
        )

    def __call__(self, r: jax.Array) -> jax.Array:
        """One global V-cycle, pad-stencil fine level."""
        x = self._smooth(jnp.zeros_like(r), r, x_zero=True)
        r_c_loc = self._r_apply(r - self.A.matvec(x))  # (slab_c,)
        # The only non-neighbor collective: gather the coarse residual.
        # Slab boundaries sit on brick rows, so the concatenation is the
        # global lexicographic brick numbering; trailing dead bricks (the
        # last slab's layers past mz) land past n_c and are masked.
        nd = jax.lax.axis_size(AXIS)
        r_c_full = jax.lax.all_gather(r_c_loc, AXIS).reshape(-1)
        G = nd * self.slab_c
        if G >= self.n_pad_c:
            r_c = r_c_full[: self.n_pad_c]
        else:
            r_c = jnp.pad(r_c_full, (0, self.n_pad_c - G))
        mask = jnp.arange(self.n_pad_c) < self.n_c
        r_c = jnp.where(mask, r_c, 0.0)
        x_c = self.tail(r_c)  # replicated coarse hierarchy (identical/dev)
        if G > self.n_pad_c:
            x_c = jnp.pad(x_c, (0, G - self.n_pad_c))
        p = jax.lax.axis_index(AXIS)
        x_c_loc = jax.lax.dynamic_slice(
            x_c, (p * self.slab_c,), (self.slab_c,)
        )
        x = x + self._p_apply(x_c_loc)
        return self._smooth(x, r)


def build_slab_pad_amg(
    A: CSRMatrix,
    grid_dims: Tuple[int, int, int],
    nparts: int,
    *,
    pad_op=None,
    brick: int = 6,
    **amg_kwargs,
) -> Optional[SlabPadAMG]:
    """Build the pad-engine distributed hierarchy; None when the problem
    doesn't fit (non-stencil matrix, or no slab size satisfies the brick
    and kernel-block congruences — the caller falls back to
    :func:`.slabamg.build_slab_amg`).

    ``pad_op``: the already-built global :class:`PadStencilOperator`
    (``choose_operator(..., pad_stencil=...)``); built from the CSR when
    omitted.  f32 only (the kernel's compute dtype).
    """
    import math

    mx, my, mz = (int(v) for v in grid_dims)
    if mx * my * mz != A.n_rows:
        return None

    def _pad_op_from_csr(bz=None):
        from ..ops.dia import pack_dia_host
        from ..ops.pallas.stencil_kernel import pad_stencil_from_parts
        from ..ops.stencil import stencil_parts_from_packed

        packed = pack_dia_host(A, dtype=jnp.float32)
        if packed is None:
            return None
        parts = stencil_parts_from_packed(
            packed[0], packed[1], A.n_rows, grid_dims
        )
        if parts is None:
            return None
        return (
            pad_stencil_from_parts(parts)
            if bz is None
            else pad_stencil_from_parts(parts, bz=bz)
        )

    if pad_op is None:
        pad_op = _pad_op_from_csr()
        if pad_op is None:
            return None
    plan = build_slab_pad_stencil(pad_op, nparts, z_align=brick)
    if plan is None and math.gcd(pad_op.bz, brick) > 2:
        # The slab congruences (L ≡ -2 mod bz, L ≡ 0 mod brick) are
        # solvable iff gcd(bz, brick) | 2 — e.g. the bz=6 the VMEM budget
        # picks at 10M-scale grids is incompatible with brick=6.  Rebuild
        # the operator with bz=4 (compatible with any brick; always fits
        # the VMEM budget at realistic widths) rather than silently
        # falling back to the slower slab engine.
        pad_op = _pad_op_from_csr(bz=4)
        if pad_op is not None:
            plan = build_slab_pad_stencil(pad_op, nparts, z_align=brick)
    if plan is None:
        return None

    info = []
    amg_kwargs.pop("fine_operator", None)  # this builder supplies it
    M = smoothed_aggregation_setup(
        A, dtype=jnp.float32, grid_dims=grid_dims, brick=brick,
        level_info_out=info,
        # Reuse the pad operator as the level-0 operator: setup then skips
        # its own choose_operator pack (a second multi-second nnz pass at
        # 10M) and the >4M device path computes the (discarded) level-0
        # transfer vectors on device instead of uploading 3 x 50 MB.
        fine_operator=pad_op,
        **amg_kwargs,
    )
    if not M.levels or not info:
        return None
    li = info[0]
    # Level-0 pieces as host arrays (no device download): tentative
    # weights, smoothing scale, inverse diagonal — embedded into the
    # owned-stacked padded slab layout.
    tval_flat = (1.0 / np.sqrt(np.maximum(li["counts"], 1.0)))[li["agg"]]
    scale_flat = (li["omega"] / li["lmax"]) / li["d"]
    inv_flat = 1.0 / li["d"]
    tval = plan.scatter_vector(tval_flat)
    scale = plan.scatter_vector(scale_flat)
    inv_diag = plan.scatter_vector(inv_flat)
    inv_diag = np.where(inv_diag == 0.0, 1.0, inv_diag)

    tail = AMGPreconditioner(
        levels=list(M.levels[1:]),
        coarse_inv=M.coarse_inv,
        smoother=M.smoother,
        smooth_steps=M.smooth_steps,
    )
    n_pad_c = (
        int(M.levels[1].A.n_pad)
        if len(M.levels) > 1
        else int(M.coarse_inv.shape[-1])
    )
    n_c = int(li["agg"].max()) + 1
    return SlabPadAMG(
        plan=plan,
        brick=brick,
        tval=tval,
        scale=scale,
        inv_diag=inv_diag,
        lmax=float(li["lmax"]),
        smooth_steps=M.smooth_steps,
        tail=tail,
        n_c=n_c,
        n_pad_c=n_pad_c,
        pad_op=pad_op,
    )


def slab_pad_amg_cg_solve(
    samg: SlabPadAMG,
    b: np.ndarray,
    x0: np.ndarray,
    *,
    mesh: Optional[Mesh] = None,
    tol: float = 1e-12,
    maxiter: int = 300,
    interpret: Optional[bool] = None,
):
    """Distributed CG preconditioned by the sharded global AMG hierarchy,
    pad-stencil per-device fine level.  Same contract as
    :func:`.slabamg.slab_amg_cg_solve`; f32."""
    plan = samg.plan
    dev_mesh = mesh if mesh is not None else make_device_mesh(plan.nparts)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    sh = NamedSharding(dev_mesh, P(AXIS))
    rep = NamedSharding(dev_mesh, P())
    ops = plan.make_ops(interpret)
    ops = jax.tree.map(lambda a: jax.device_put(a, sh), ops)
    b_s = jax.device_put(plan.scatter_vector(np.asarray(b, np.float32)), sh)
    x0_s = jax.device_put(
        plan.scatter_vector(np.asarray(x0, np.float32)), sh
    )
    tval = jax.device_put(samg.tval.astype(np.float32), sh)
    scale = jax.device_put(samg.scale.astype(np.float32), sh)
    inv_d = jax.device_put(samg.inv_diag.astype(np.float32), sh)
    tail = jax.device_put(samg.tail, rep)
    meta = dict(
        dims=plan.dims,
        brick=samg.brick,
        slab_c=samg.slab_c,
        n_c=samg.n_c,
        n_pad_c=samg.n_pad_c,
        smooth_steps=samg.smooth_steps,
    )
    lmax = samg.lmax

    def body(op_blk, b_blk, x_blk, tval_blk, scale_blk, invd_blk, tail_arg):
        op = jax.tree.map(lambda a: a[0], op_blk)
        M = _SlabPadAMGBlock(
            A=op,
            tval=tval_blk[0],
            scale=scale_blk[0],
            inv_diag=invd_blk[0],
            lmax=jnp.asarray(lmax, jnp.float32),
            tail=tail_arg,
            **meta,
        )
        res = cg_solve(
            op, b_blk[0], x_blk[0], precond=M, tol=tol, maxiter=maxiter,
            dot=_psum_dot,
        )
        return res.x[None], res.iterations, res.relres, res.converged

    fn = jax.shard_map(
        body,
        mesh=dev_mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(), P(), P()),
        check_vma=False,  # pallas_call in body; see SlabPadStencilOperator
    )
    x_s, iters, relres, conv = fn(ops, b_s, x0_s, tval, scale, inv_d, tail)
    x = plan.gather_vector(np.asarray(x_s))
    return x, CGResult(
        x=x_s, iterations=iters, relres=relres, converged=conv
    )
