"""Whole-solver fusion: Jacobi-preconditioned CG as ONE Pallas kernel.

Motivation (measured, see docs/PERF.md): each dispatch on this platform
carries ~0.4-30 ms fixed latency, and even inside a single XLA program the
per-iteration vector ops of CG cost ~2x the BSG matvec itself.  For
operators that fit VMEM (the reference's unstructured meshes: tet-cube's
packed BSG form is 7 MB), the entire Krylov loop — matvec, dots, axpys,
convergence test — can run inside one ``pallas_call`` with every operand
VMEM-resident: one dispatch per solve, zero HBM traffic after the initial
load.

The matvec is the BSG shuffle-gather form (:mod:`..ops.bsg`); the loop is
a ``lax.while_loop`` on the convergence test (falling back to a masked
``fori_loop`` where Mosaic rejects ``while``).  This is the TPU-native
replacement for the solve loop the reference drives through Belos
(``BelosMueLuSolver.cpp:112-133``), fused to the metal.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bsg import BSGMatrix, SUBL, LANES
from .cg import CGResult

__all__ = ["fused_cg_solve"]


def _kernel(T, M, R2, nx2, maxiter, tol,
            w0_ref, qq_ref, rm_ref, vals_ref, b_ref, x0_ref, invd_ref,
            x_ref, stats_ref, r_ref, p_ref, z_ref, ap_ref):
    import jax.experimental.pallas as pl

    def matvec(src_ref, dst_ref):
        def tile(t, _):
            def mo(m, acc):
                s = w0_ref[t, m]
                W = src_ref[pl.ds(s, SUBL), :]
                t1 = jnp.take_along_axis(
                    W, qq_ref[t, m].astype(jnp.int32), axis=0
                )
                g = jnp.take_along_axis(
                    t1, rm_ref[t, m].astype(jnp.int32), axis=1
                )
                return acc + vals_ref[t, m].astype(jnp.float32) * g

            acc = jax.lax.fori_loop(
                0, M, mo, jnp.zeros((SUBL, LANES), jnp.float32)
            )
            dst_ref[pl.ds(t * SUBL, SUBL), :] = acc
            return 0

        jax.lax.fori_loop(0, T, tile, 0)
        if nx2 > R2:  # keep the window guard rows exactly zero
            dst_ref[R2:, :] = jnp.zeros((nx2 - R2, LANES), jnp.float32)

    # r0 = b - A x0 ; z0 = D^-1 r0 ; p0 = z0
    x_ref[...] = x0_ref[...]
    matvec(x0_ref, ap_ref)
    r_ref[...] = b_ref[...] - ap_ref[...]
    z_ref[...] = invd_ref[...] * r_ref[...]
    p_ref[...] = z_ref[...]

    b2 = jnp.sum(b_ref[...] * b_ref[...])
    bnorm2 = jnp.where(b2 == 0, 1.0, b2)
    target2 = jnp.asarray(tol * tol, jnp.float32) * bnorm2
    rz0 = jnp.sum(r_ref[...] * z_ref[...])
    rnorm2_0 = jnp.sum(r_ref[...] * r_ref[...])

    def cond(c):
        k, rz, rnorm2 = c
        return jnp.logical_and(rnorm2 > target2, k < maxiter)

    def body(c):
        k, rz, rnorm2 = c
        matvec(p_ref, ap_ref)
        pAp = jnp.sum(p_ref[...] * ap_ref[...])
        alpha = rz / pAp
        x_ref[...] = x_ref[...] + alpha * p_ref[...]
        r_ref[...] = r_ref[...] - alpha * ap_ref[...]
        z_ref[...] = invd_ref[...] * r_ref[...]
        rz_new = jnp.sum(r_ref[...] * z_ref[...])
        p_ref[...] = z_ref[...] + (rz_new / rz) * p_ref[...]
        return (k + 1, rz_new, jnp.sum(r_ref[...] * r_ref[...]))

    k, rz, rnorm2 = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rz0, rnorm2_0)
    )
    # Full-row store (single-element VMEM stores are fragile in Mosaic).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    out = jnp.where(lane == 0, k.astype(jnp.float32), 0.0)
    out = jnp.where(lane == 1, jnp.sqrt(rnorm2 / bnorm2), out)
    out = jnp.where(lane == 2, (rnorm2 <= target2).astype(jnp.float32), out)
    stats_ref[...] = out


@partial(jax.jit, static_argnames=("tol", "maxiter", "interpret"))
def _fused_cg(A: BSGMatrix, b2, x02, invd2, *, tol, maxiter, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, M = A.n_tiles, A.max_mo
    R2 = A.n_pad // LANES
    nx2 = A.nx2
    kernel = partial(_kernel, T, M, R2, nx2, maxiter, tol)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vals
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # invd
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stats
        ],
        scratch_shapes=[
            pltpu.VMEM((nx2, LANES), jnp.float32),  # r
            pltpu.VMEM((nx2, LANES), jnp.float32),  # p
            pltpu.VMEM((nx2, LANES), jnp.float32),  # z
            pltpu.VMEM((nx2, LANES), jnp.float32),  # Ap
        ],
    )
    # x64=False during kernel trace: Mosaic's convert lowering recurses on
    # the f64-intermediate casts x64 tracing inserts (see stencil_kernel).
    with jax.enable_x64(False):
        x2, stats = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nx2, LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            ],
            interpret=interpret,
        )(A.w0, A.qq, A.rm, A.vals, b2, x02, invd2)
    return x2, stats


def fused_cg_solve(
    A: BSGMatrix,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 1e-6,
    maxiter: int = 300,
    interpret: Optional[bool] = None,
) -> CGResult:
    """Solve ``A x = b`` (both in the operator's padded space) with the
    fused Jacobi-CG kernel.  Same contract as :func:`..cg.cg_solve` with
    ``precond=jacobi``; vectors f32."""
    if A.tmap is not None:
        raise ValueError(
            "fused_cg_solve requires the dense BSG layout (it tiles the "
            "whole solve over n_tiles x max_mo); pack with "
            "bsg_from_csr(..., layout='dense') — ragged targets large "
            "operators where SpMV dispatch cost is negligible anyway"
        )
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n_pad = A.n_pad
    R2 = n_pad // LANES
    nx2 = A.nx2

    def to2(v):
        v2 = jnp.reshape(v.astype(jnp.float32), (R2, LANES))
        return jnp.concatenate(
            [v2, jnp.zeros((nx2 - R2, LANES), jnp.float32)], axis=0
        )

    d = A.diag
    invd = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
    b2 = to2(b)
    x02 = to2(x0 if x0 is not None else jnp.zeros_like(b))
    invd2 = to2(invd)
    x2, stats = _fused_cg(
        A, b2, x02, invd2, tol=float(tol), maxiter=int(maxiter),
        interpret=bool(interpret),
    )
    x = x2[:R2].reshape(n_pad)
    return CGResult(
        x=x,
        iterations=stats[0, 0].astype(jnp.int32),
        relres=stats[0, 1],
        converged=stats[0, 2] > 0,
    )
