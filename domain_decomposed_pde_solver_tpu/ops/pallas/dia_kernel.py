"""Pallas TPU kernel: DIA (stencil) SpMV.

The DIA matvec is a sum of shifted elementwise multiply-adds.  The XLA
lowering (one window slice per diagonal) re-reads ``x`` from HBM once per
diagonal unless fusion catches it; this kernel makes the optimal schedule
explicit:

- ``x`` (edge-padded so every shifted window is in-bounds) sits in VMEM for
  the whole sweep as a ``(rows, 128)`` 2-D array;
- the diagonal-coefficient matrix streams through VMEM in row-chunks
  (grid over chunks);
- each chunk accumulates all shifted products in registers and writes ``y``
  exactly once.

Traffic = data once + x once + y once — the speed-of-light schedule for the
format (see pallas_guide "Grid and Block Specifications", "Memory Spaces").

Mosaic constraint (measured on v5e): 1-D dynamic VMEM loads must be
1024-aligned, which arbitrary diagonal offsets are not.  The kernel instead
decomposes each shift ``s = 128*R + r``: a *row*-window dynamic slice
(supported unaligned) handles the ``R`` part, and a static lane rotation —
two ``take_along_axis`` lane shuffles + a select, all constants baked per
diagonal — handles the ``r`` part.

Falls back transparently: :func:`dia_spmv_pallas` takes the same
(DIAMatrix, x) pair as the jnp path and is validated against it in
interpreter mode on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dia import DIAMatrix

__all__ = ["dia_spmv_pallas"]

LANES = 128


def _kernel(offsets, span_neg, chunk, x2_ref, data_ref, y_ref):
    import jax.experimental.pallas as pl

    pid = pl.program_id(0)
    crows = chunk // LANES
    acc = jnp.zeros((crows, LANES), jnp.float32)
    for d, off in enumerate(offsets):
        c = span_neg + off  # >= 0 by construction of the edge padding
        R0, r = divmod(c, LANES)
        W = x2_ref[pl.ds(pid * crows + R0, crows + 1), :]
        if r == 0:
            shifted = W[:-1, :]
        else:
            # Static lane rotation by r, built from in-kernel iotas (Pallas
            # kernels may not capture host constants).
            idx = jax.lax.broadcasted_iota(jnp.int32, (crows, LANES), 1)
            lane2 = jax.lax.rem(idx + jnp.int32(r), jnp.int32(LANES))
            use_next = idx + jnp.int32(r) >= jnp.int32(LANES)
            g_top = jnp.take_along_axis(W[:-1, :], lane2, axis=1)
            g_bot = jnp.take_along_axis(W[1:, :], lane2, axis=1)
            shifted = jnp.where(use_next, g_bot, g_top)
        coeff = data_ref[d, :].reshape(crows, LANES).astype(jnp.float32)
        acc = acc + coeff * shifted
    y_ref[...] = acc.astype(y_ref.dtype)


@partial(jax.jit, static_argnames=("interpret", "chunk"))
def dia_spmv_pallas(
    A: DIAMatrix, x_padded: jax.Array, *, chunk: int = 2048, interpret: bool = False
) -> jax.Array:
    """y = A @ x via the Pallas kernel.  Same contract as ``A.matvec``."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = A.n_pad
    offsets = A.offsets
    span_neg = max(0, -min(offsets))
    span_pos = max(0, max(offsets))
    # Pad n_pad up to a chunk multiple; edge-pad x so shifted windows are
    # always in-bounds (padding multiplies structurally-zero coefficients).
    n_grid = -(-n_pad // chunk)
    n_round = n_grid * chunk
    # 2-D VMEM layout: enough guard rows that every (crows+1)-row window of
    # every diagonal stays in-bounds.
    ext = span_neg + n_round + span_pos
    rows2 = -(-ext // LANES) + 1
    x_ext = jnp.zeros(rows2 * LANES, x_padded.dtype)
    x_ext = x_ext.at[span_neg : span_neg + n_pad].set(x_padded)
    x2 = x_ext.reshape(rows2, LANES)
    data = A.data  # possibly bf16 storage; the kernel upcasts per chunk
    if n_round != n_pad:
        data = jnp.pad(data, ((0, 0), (0, n_round - n_pad)))

    kernel = partial(_kernel, offsets, span_neg, chunk)
    crows = chunk // LANES
    # x64=False during kernel trace: Mosaic's convert lowering recurses on
    # the f64-intermediate casts x64 tracing inserts (see stencil_kernel).
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_grid * crows, LANES), x_padded.dtype),
            grid=(n_grid,),
            in_specs=[
                # x resident in VMEM for the whole sweep (fits to ~25M rows
                # in f32; larger problems are sharded into slabs first
                # anyway).
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((len(offsets), chunk), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((crows, LANES), lambda i: (i, 0)),
            interpret=interpret,
        )(x2, data)
    return y.reshape(n_grid * chunk)[:n_pad]
