"""Pallas TPU kernel: DIA (stencil) SpMV.

The DIA matvec is a sum of shifted elementwise multiply-adds.  The XLA
lowering (jnp.roll per diagonal) re-reads ``x`` once per diagonal from HBM
unless fusion catches it; this kernel makes the optimal schedule explicit:

- ``x`` (edge-padded so every shifted window is in-bounds) sits in VMEM for
  the whole sweep;
- the diagonal-coefficient matrix streams through VMEM in row-chunks
  (grid over chunks);
- each chunk accumulates all shifted products in registers and writes ``y``
  exactly once.

Traffic = data once + x once + y once — the speed-of-light schedule for the
format (see pallas_guide "Grid and Block Specifications", "Memory Spaces").
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


def _kernel(offsets, span_neg, chunk, x_ref, data_ref, y_ref):
    import jax.experimental.pallas as pl

    pid = pl.program_id(0)
    base = pid * chunk + span_neg
    acc = jnp.zeros((chunk,), x_ref.dtype)
    for d, off in enumerate(offsets):
        window = x_ref[pl.ds(base + off, chunk)]
        acc = acc + data_ref[d, :] * window
    y_ref[:] = acc


@partial(jax.jit, static_argnames=("interpret", "chunk"))
def dia_spmv_pallas(
    A: DIAMatrix, x_padded: jax.Array, *, chunk: int = 1024, interpret: bool = False
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
    x_ext = jnp.zeros(span_neg + n_round + span_pos, x_padded.dtype)
    x_ext = x_ext.at[span_neg : span_neg + n_pad].set(x_padded)
    data = A.data.astype(x_padded.dtype)  # DIA storage may be narrower (bf16)
    if n_round != n_pad:
        data = jnp.pad(data, ((0, 0), (0, n_round - n_pad)))

    kernel = partial(_kernel, offsets, span_neg, chunk)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_round,), x_padded.dtype),
        grid=(n_grid,),
        in_specs=[
            # x resident in VMEM for the whole sweep (fits for <~3M rows
            # in f32; larger problems are sharded into slabs first anyway).
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (len(offsets), chunk),
                lambda i: (0, i),
            ),
        ],
        out_specs=pl.BlockSpec((chunk,), lambda i: (i,)),
        interpret=interpret,
    )(x_ext, data)
    return y[:n_pad]
