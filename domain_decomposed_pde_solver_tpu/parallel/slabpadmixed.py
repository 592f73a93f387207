"""Sharded mixed-precision iterative refinement on the slab-pad engine.

Composes the package's two headline capabilities into the distributed
setting: the f32 slab-sharded CG+AMG solve (:mod:`.slabpadamg` — the
BASELINE-config-5 weak-scaling engine) becomes the *inner* solver of a
device-resident f64 iterative-refinement loop, giving f64-accurate answers
(the 1e-8+ BASELINE metric) without any f64 Pallas kernel:

    sweep (ONE sharded dispatch + one scalar fetch, all P devices):
        r32  = (r64 / ||r64||) cast                     [f32]
        e32  = CG+AMG solve of A e = r32                [f32, pad-stencil
                                                         kernel + sharded
                                                         global hierarchy]
        x64 += ||r64|| * e64                            [f64]
        r64  = b64 - A64 x64                            [f64 slab matvec]

The f64 residual matvec reuses :func:`..ops.stencil.stencil_core` on each
device's owned slab with one-z-layer ``ppermute`` halo strips — the
dtype-generic pattern-broadcast path, NOT a second stored operator.  For
the graph Laplacian the f32-stored stencil coefficients are integer-valued
and therefore exact in f64 (same gate as the single-device refinement,
``solvers/mixed.py``); the residual is exact to f64 rounding.

The reference has no distributed mixed-precision capability at all — its
answers are whatever f64 GMRES+ILUT reaches (`BelosMueLuSolver.cpp:87-139`);
here the distributed solve reaches f64 accuracy at f32 speed.

Requires ``jax_enable_x64``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas.stencil_kernel import PadStencilOperator
from ..ops.stencil import stencil_core
from ..solvers.cg import cg_solve
from ..solvers.mixed import MixedSolveResult, _adaptive_inner_tol
from .sharded import AXIS, _psum_dot, make_device_mesh
from .slabpad import SlabPadStencilOperator
from .slabpadamg import SlabPadAMG, _SlabPadAMGBlock

__all__ = ["slab_pad_amg_refine_solve"]


def _slab_matvec_f64(
    op: SlabPadStencilOperator, pats, const_vals, x_own: jax.Array
) -> jax.Array:
    """Exact f64 matvec on one device's owned slab (inside ``shard_map``).

    Same halo protocol as :meth:`SlabPadStencilOperator.matvec` (one
    interior z-layer per ring neighbor; ring edges get the global zero
    guard), evaluated through the dtype-generic ``stencil_core`` instead
    of the f32-only Pallas kernel.  Slab z-parity invariance (L even)
    makes local pattern indexing equal the global one.
    """
    mx, my, L = op.dims_local
    myp, mxp = op.myp, op.mxp
    x3p = x_own.reshape(L, myp, mxp)
    x3 = x3p[:, 1 : my + 1, :mx]
    nd = jax.lax.axis_size(AXIS)
    lo = jax.lax.ppermute(
        x3[-1], AXIS, [(i, i + 1) for i in range(nd - 1)]
    )
    hi = jax.lax.ppermute(x3[0], AXIS, [(i + 1, i) for i in range(nd - 1)])
    y3 = stencil_core(
        x3, lo, hi, op.period, op.taps, op.groups, op.group_const,
        const_vals, pats, x_own.dtype,
    )
    # Owned layers past the global grid end hold zeros in every vector
    # (the kernel's zlim contract); the roll form would leak the last
    # real layer into them through the dz=-1 taps — mask them off.
    valid = op.zlim[0, 1]
    zmask = jnp.arange(L)[:, None, None] < valid
    y3 = jnp.where(zmask, y3, jnp.asarray(0.0, y3.dtype))
    ypad = jnp.pad(y3, ((0, 0), (1, myp - my - 1), (0, mxp - mx)))
    corr_own = (
        op.corr_ext.reshape(L + 2, myp, mxp)[1 : L + 1].astype(x_own.dtype)
    )
    return (ypad + corr_own * x3p).reshape(-1)


def slab_pad_amg_refine_solve(
    samg: SlabPadAMG,
    pad_op: Optional[PadStencilOperator] = None,
    b: Optional[np.ndarray] = None,
    x0: Optional[np.ndarray] = None,
    *,
    mesh: Optional[Mesh] = None,
    tol: float = 1e-10,
    inner_tol: float = 1e-6,
    inner_maxiter: int = 200,
    max_refinements: int = 20,
    interpret: Optional[bool] = None,
) -> MixedSolveResult:
    """Distributed f64-accurate solve: sharded CG+AMG inner sweeps inside
    a device-resident f64 refinement loop (one dispatch + one scalar
    fetch per sweep).

    ``pad_op``: the global :class:`PadStencilOperator` the hierarchy was
    built on — source of the pattern planes the f64 residual reuses
    (defaults to ``samg.pad_op``).  Coefficients must be f32-exact
    (always true for the graph Laplacian's integer entries).  ``x0``:
    optional f64 warm start (costs one extra residual dispatch); the
    default zero start knows ``r0 = b``.  ``x`` in the result is the
    gathered host f64 solution in logical (lexicographic) ordering.
    """
    import time as _time

    if not jax.config.jax_enable_x64:
        raise ValueError(
            "slab_pad_amg_refine_solve needs jax_enable_x64 for the f64 "
            "outer residual"
        )
    if pad_op is None:
        pad_op = samg.pad_op
    if pad_op is None:
        raise ValueError("pad_op missing (hierarchy predates pad_op field)")
    if b is None:
        raise ValueError("b is required")
    plan = samg.plan
    dev_mesh = mesh if mesh is not None else make_device_mesh(plan.nparts)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    sh = NamedSharding(dev_mesh, P(AXIS))
    rep = NamedSharding(dev_mesh, P())

    t0 = _time.perf_counter()
    ops = plan.make_ops(interpret)
    ops = jax.tree.map(lambda a: jax.device_put(a, sh), ops)
    b64 = jax.device_put(
        plan.scatter_vector(np.asarray(b, np.float64), dtype=np.float64), sh
    )
    tval = jax.device_put(samg.tval.astype(np.float32), sh)
    scale = jax.device_put(samg.scale.astype(np.float32), sh)
    inv_d = jax.device_put(samg.inv_diag.astype(np.float32), sh)
    tail = jax.device_put(samg.tail, rep)
    # Pattern planes/constants are tiny (taps x 8 scalars) — baked into
    # the sweep program as constants, cast to f64 inside stencil_core.
    pats_c = np.asarray(pad_op.pats, np.float32)
    cvals_c = np.asarray(pad_op.const_vals, np.float32)
    meta = dict(
        dims=plan.dims,
        brick=samg.brick,
        slab_c=samg.slab_c,
        n_c=samg.n_c,
        n_pad_c=samg.n_pad_c,
        smooth_steps=samg.smooth_steps,
    )
    lmax = samg.lmax
    bnorm = float(np.linalg.norm(np.asarray(b, np.float64))) or 1.0

    def body(
        op_blk, b_blk, x_blk, r_blk, tval_blk, scale_blk, invd_blk,
        tail_arg, itol,
    ):
        op = jax.tree.map(lambda a: a[0], op_blk)
        b64l, x64l, r64l = b_blk[0], x_blk[0], r_blk[0]
        rnorm = jnp.sqrt(_psum_dot(r64l, r64l))
        rnorm = jnp.where(rnorm == 0, jnp.asarray(1.0, r64l.dtype), rnorm)
        r32 = (r64l / rnorm).astype(jnp.float32)
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
            op, r32, jnp.zeros_like(r32), precond=M, tol=itol,
            maxiter=inner_maxiter, dot=_psum_dot,
        )
        x_new = x64l + res.x.astype(jnp.float64) * rnorm
        r_new = b64l - _slab_matvec_f64(op, pats_c, cvals_c, x_new)
        rn = jnp.sqrt(_psum_dot(r_new, r_new))
        return x_new[None], r_new[None], rn, res.iterations

    sweep = jax.jit(
        jax.shard_map(
            body,
            mesh=dev_mesh,
            in_specs=(
                P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                P(AXIS), P(), P(),
            ),
            out_specs=(P(AXIS), P(AXIS), P(), P()),
            check_vma=False,  # pallas_call in body; see SlabPadStencilOperator
        )
    )

    if x0 is None:
        x64 = jnp.zeros_like(b64)
        r64 = b64  # r0 = b exactly, no dispatch
        relres = 1.0
    else:
        x64 = jax.device_put(
            plan.scatter_vector(np.asarray(x0, np.float64), dtype=np.float64),
            sh,
        )

        def resid(op_blk, b_blk, x_blk):
            op = jax.tree.map(lambda a: a[0], op_blk)
            r = b_blk[0] - _slab_matvec_f64(op, pats_c, cvals_c, x_blk[0])
            return r[None], jnp.sqrt(_psum_dot(r, r))

        r64, rn0 = jax.shard_map(
            resid, mesh=dev_mesh, in_specs=(P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P()), check_vma=False,
        )(ops, b64, x64)
        relres = float(rn0) / bnorm

    t1 = _time.perf_counter()
    inner_total = 0
    refinements = 0
    while relres > tol and refinements < max_refinements:
        itol = _adaptive_inner_tol(inner_tol, tol, relres)
        x_new, r_new, rnorm_new, iters = sweep(
            ops, b64, x64, r64, tval, scale, inv_d, tail,
            jnp.asarray(itol, jnp.float32),
        )
        new_relres = float(rnorm_new) / bnorm  # host sync point
        inner_total += int(iters)
        refinements += 1
        if new_relres >= relres:  # stagnation at the f32 floor
            break
        x64, r64, relres = x_new, r_new, new_relres
    t2 = _time.perf_counter()
    x_host = plan.gather_vector(np.asarray(x64, np.float64))
    t3 = _time.perf_counter()
    return MixedSolveResult(
        x=x_host,
        refinements=refinements,
        inner_iterations=inner_total,
        relres=relres,
        converged=relres <= tol,
        timings={
            "stage_ms": (t1 - t0) * 1e3,
            "sweeps_ms": (t2 - t1) * 1e3,
            "fetch_ms": (t3 - t2) * 1e3,
        },
    )
