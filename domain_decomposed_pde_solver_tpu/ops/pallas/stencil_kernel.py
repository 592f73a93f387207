"""VMEM-tiled Pallas lattice-stencil SpMV — single-pass-over-x structured SpMV.

The XLA pattern-broadcast stencil (:mod:`..stencil`) already collapses
coefficient traffic to zero, but XLA materializes each shifted window as its
own HBM read: measured at 1M DOF on v5e the op streams ~5x the x+y+corr
minimum (100.5 us vs an ~19 us lower bound; VERDICT r2 item 1).  This kernel
restores the minimum: x is read ONCE per z-block into VMEM and all ~19 tap
windows are served from on-chip memory.

Layout — the operator owns a *padded 3-D* vector space (same pattern as the
BSG operator owning a permuted space):

    row(iz, iy) = (iz + 1) * myp + 1 + iy       lane(ix) = ix
    myp = round8(my + 2)   mxp = round128(mx + 1)   Z = roundb(mz + 2)

so every geometric neighbor access is exact by construction:

- ``dy``/``dz`` shifts are *row windows* at dynamic offsets (the one class of
  unaligned VMEM access Mosaic lowers at full rate — the BSG empirics);
- ``dx = +-1`` shifts are full-width circular lane rolls: the >=1 zero pad
  column makes the grid-edge element exact, and the wrapped-around lane lands
  in a dead pad column that the output mask clears;
- grid-edge ``dy``/``dz`` neighbors read the zero pad rows / zero halo
  layers, so no in-range masks are ever computed (the flat-layout
  alternative needs ~6 compare/select ops per tap and is VPU-bound).

Vectors in this space carry zeros in every pad slot; ``matvec`` re-masks its
output, so Krylov iterations preserve the invariant.  ``put_vector`` /
``get_vector`` are pure reshape+pad (no index maps).

The per-``pallas_call`` dispatch overhead (~0.4 ms on the tunneled dev
environment) is amortized the usual way: the solver chains iterations inside
one jit program.

Replaces the SpMV the reference runs via Tpetra inside Belos
(``BelosMueLuSolver.cpp:112-133``) for structured (generated/box) meshes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..stencil import StencilOperator, stencil_core

__all__ = [
    "PadStencilOperator",
    "pad_stencil_from_stencil",
    "pad_stencil_from_parts",
]


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _tree_sum(terms):
    while len(terms) > 1:
        nxt = [a + b for a, b in zip(terms[::2], terms[1::2])]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pats", "const_vals", "pplanes", "corr"],
    meta_fields=[
        "taps", "groups", "group_const", "plane_of_group", "dims",
        "period", "myp", "mxp", "bz", "n_rows",
    ],
)
@dataclasses.dataclass
class PadStencilOperator:
    """Lattice-stencil operator over the padded 3-D vector space.

    ``pats``/``taps``/``groups``/``group_const``/``period`` have
    :class:`..stencil.StencilOperator` semantics (used by the non-TPU
    reference evaluation).  ``pplanes`` holds, per non-constant group, the
    two z-parity coefficient planes ``(G_pat, 2 * myp, mxp)`` the kernel
    multiplies by (broadcast once at build; ~100 KB, VMEM-resident).
    ``corr`` is the diagonal correction embedded in the padded space
    (bfloat16 when bit-exact, f32 compute).
    """

    pats: jax.Array  # (ndiags, p, p, p) f32
    const_vals: jax.Array  # (n_groups,) f32
    pplanes: jax.Array  # (max(G_pat,1), 2*myp, mxp) f32
    corr: jax.Array  # (n_space,) f32 or bf16
    taps: Tuple[Tuple[int, int, int], ...]
    groups: Tuple[Tuple[int, ...], ...]
    group_const: Tuple[bool, ...]
    plane_of_group: Tuple[int, ...]  # group -> plane row (-1 for const)
    dims: Tuple[int, int, int]
    period: int
    myp: int
    mxp: int
    bz: int
    n_rows: int  # logical DOF count mx*my*mz

    # -- padded-space geometry -------------------------------------------
    @property
    def Z(self) -> int:
        mz = self.dims[2]
        return _round_up(mz + 2, self.bz)

    @property
    def nb(self) -> int:
        return self.Z // self.bz

    @property
    def n_pad(self) -> int:
        """Internal vector length (the operator's padded space)."""
        return self.Z * self.myp * self.mxp

    @property
    def n_cols(self) -> int:
        return self.n_rows

    @property
    def dtype(self):
        return jnp.dtype(jnp.float32)

    # -- host <-> device vector interface (pure reshape/pad) -------------
    def put_vector(self, x, dtype=jnp.float32) -> jax.Array:
        mx, my, mz = self.dims
        x3 = np.zeros((self.Z, self.myp, self.mxp), dtype=np.dtype(dtype))
        x3[1 : mz + 1, 1 : my + 1, :mx] = np.asarray(x).reshape(mz, my, mx)
        return jnp.asarray(x3.reshape(-1))

    def put_vector_sparse(self, x, dtype=jnp.float32) -> jax.Array:
        """Like :meth:`put_vector` but ships only the nonzeros when the
        vector is sparse enough (boundary-driven RHS vectors are ~3%
        nonzero at 10M DOF; the tunnel moves 0.7-80 MB/s)."""
        x = np.asarray(x)
        nz = np.flatnonzero(x)
        if nz.size >= 0.25 * x.size:
            return self.put_vector(x, dtype)
        mx, my, mz = self.dims
        iz, r = np.divmod(nz, mx * my)
        iy, ix = np.divmod(r, mx)
        slots = ((iz + 1) * self.myp + iy + 1) * self.mxp + ix
        return (
            jnp.zeros(self.n_pad, jnp.dtype(dtype))
            .at[jnp.asarray(slots)]
            .set(jnp.asarray(x[nz].astype(np.dtype(dtype))))
        )

    def get_vector(self, xp) -> np.ndarray:
        mx, my, mz = self.dims
        x3 = np.asarray(xp).reshape(self.Z, self.myp, self.mxp)
        return np.ascontiguousarray(
            x3[1 : mz + 1, 1 : my + 1, :mx]
        ).reshape(-1)

    def embed_device(self, x3_flat: jax.Array) -> jax.Array:
        """(mz*my*mx,) interior (lexicographic) -> padded space, on device."""
        mx, my, mz = self.dims
        x3 = x3_flat[: mx * my * mz].reshape(mz, my, mx)
        return jnp.pad(
            x3,
            (
                (1, self.Z - mz - 1),
                (1, self.myp - my - 1),
                (0, self.mxp - mx),
            ),
        ).reshape(-1)

    def extract_device(self, xp: jax.Array) -> jax.Array:
        """Padded space -> (mz*my*mx,) interior, on device."""
        mx, my, mz = self.dims
        x3 = xp.reshape(self.Z, self.myp, self.mxp)
        return x3[1 : mz + 1, 1 : my + 1, :mx].reshape(-1)

    def pad_mask(self) -> jax.Array:
        """1.0 on real DOF slots, 0.0 on padding (device)."""
        mx, my, mz = self.dims
        return self.embed_device(jnp.ones(mx * my * mz, jnp.float32))

    def space_map(self) -> np.ndarray:
        """Internal slot index per logical (lexicographic) DOF.

        The uniform "operator owns its vector space" protocol (same role
        as ``BSGMatrix.perm``): consumers that build per-row auxiliary
        arrays (AMG transfers, Jacobi diagonals) scatter them with
        ``arr_pad[space_map()] = arr`` so they land in this operator's
        padded 3-D layout.
        """
        mx, my, mz = self.dims
        iz, iy, ix = np.meshgrid(
            np.arange(mz), np.arange(my), np.arange(mx), indexing="ij"
        )
        return (
            ((iz + 1) * self.myp + iy + 1) * self.mxp + ix
        ).reshape(-1)

    def diagonal_padded(self, fill: float = 1.0) -> jax.Array:
        mx, my, mz = self.dims
        p = self.period
        try:
            didx = self.taps.index((0, 0, 0))
        except ValueError:
            didx = None
        d = self.corr.astype(jnp.float32)
        mask = self.pad_mask()
        if didx is not None:
            pat = self.pats[didx].astype(jnp.float32)
            c = pat[jnp.arange(mz) % p]
            c = c[:, jnp.arange(my) % p]
            c = c[:, :, jnp.arange(mx) % p]
            d = d + self.embed_device(c.reshape(-1))
        d = jnp.where(jnp.logical_and(mask > 0, d == 0), fill, d)
        return jnp.where(mask > 0, d, jnp.asarray(fill, d.dtype))

    # -- matvec ------------------------------------------------------------
    def matvec(self, x_padded: jax.Array) -> jax.Array:
        if jax.devices()[0].platform != "tpu":
            return self.matvec_reference(x_padded)
        return pad_stencil_spmv(self, x_padded)

    def matvec_reference(self, x_padded: jax.Array) -> jax.Array:
        """Pure-XLA evaluation in the same padded space (non-TPU backends,
        and the golden path the Pallas kernel is tested against).  Requires
        the pad-slot-zero vector invariant."""
        mx, my, mz = self.dims
        x3 = x_padded.reshape(self.Z, self.myp, self.mxp)[
            1 : mz + 1, 1 : my + 1, :mx
        ]
        y3 = stencil_core(
            x3, None, None, self.period, self.taps, self.groups,
            self.group_const, self.const_vals, self.pats, x_padded.dtype,
        )
        y = self.embed_device(y3.reshape(-1))
        return y + self.corr.astype(x_padded.dtype) * x_padded


def _build_pattern_planes(
    period: int, pats_in, groups, group_const, myp: int, mxp: int
) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """Per non-constant group: (2*myp, mxp) z-parity coefficient planes.

    plane[zp * myp + r, l] = pat[zp, (r - 1) % p, l % p] — the row offset
    bakes in the leading zero pad row (iy = r - 1); values at pad rows /
    lanes are don't-care (the kernel masks its output).
    """
    p = period
    pats = np.asarray(pats_in, dtype=np.float32)
    plane_of_group = []
    planes = []
    r = np.arange(myp)
    l = np.arange(mxp)
    ypar = (r - 1) % p
    xpar = l % p
    for g, tap_idx in enumerate(groups):
        if group_const[g]:
            plane_of_group.append(-1)
            continue
        pat = pats[tap_idx[0]]  # (p, p, p) [iz%p, iy%p, ix%p]
        plane = np.empty((2 * myp, mxp), dtype=np.float32)
        for zp in (0, 1):
            plane[zp * myp : (zp + 1) * myp] = pat[zp % p][
                np.ix_(ypar, xpar)
            ]
        plane_of_group.append(len(planes))
        planes.append(plane)
    if planes:
        pp = np.stack(planes)
    else:
        pp = np.zeros((1, 2 * myp, mxp), dtype=np.float32)
    return pp, tuple(plane_of_group)


def pad_stencil_from_stencil(
    st: StencilOperator, bz: int = 8, corr_storage: str = "auto",
) -> PadStencilOperator:
    """Repack an (already verified) XLA stencil operator into the padded
    3-D layout.  Downloads ``st.corr`` from device — prefer
    :func:`pad_stencil_from_parts` on the host decomposition when
    available (``choose_operator`` uses it; the tunnel moves 0.7-80 MB/s
    depending on its state)."""
    n = st.n_rows
    parts = dict(
        pats=np.asarray(st.pats, np.float32),
        const_vals=np.asarray(st.const_vals, np.float32),
        corr_pad=np.asarray(st.corr, np.float32),
        taps=st.taps,
        groups=st.groups,
        group_const=st.group_const,
        dims=st.dims,
        period=st.period,
        n_rows=n,
        n_pad=int(st.n_pad),
    )
    return pad_stencil_from_parts(parts, bz=bz, corr_storage=corr_storage)


def pad_stencil_from_parts(
    parts: dict, bz: int = 8, corr_storage: str = "auto"
) -> PadStencilOperator:
    """Host stencil decomposition (``stencil_parts_from_packed``) ->
    padded-3-D Pallas operator, with no intermediate device operator.
    ``bz`` (even) is the z-layers-per-grid-step; it is shrunk
    automatically so the kernel's VMEM footprint stays under budget."""
    mx, my, mz = parts["dims"]
    myp = _round_up(my + 2, 8)
    mxp = _round_up(mx + 1, 128)

    # VMEM estimate per bz: double-buffered x window + pipelined corr/y
    # blocks + pattern planes; keep under ~10 MB of the ~16 MB budget.
    def vmem_bytes(b):
        scratch = 2 * (b + 6) * myp * mxp * 4
        blocks = 4 * b * myp * mxp * 4  # corr + y, double-buffered
        return scratch + blocks
    while bz > 2 and vmem_bytes(bz) > 10 * 2**20:
        bz -= 2
    if bz % 2:
        raise ValueError("bz must be even (z-parity is static per layer)")

    Z = _round_up(mz + 2, bz)
    n = mx * my * mz

    # Diagonal correction, embedded.  The correction is nonzero only where
    # the diagonal deviates from the lattice pattern (grid-boundary rows,
    # ~3% of a 10M box), so when sparse enough it ships as (idx, val)
    # pairs and scatters on device instead of uploading the dense padded
    # vector (50 MB -> ~2 MB through the 0.7-80 MB/s tunnel).
    corr_host = np.asarray(parts["corr_pad"][:n], dtype=np.float32)
    if corr_storage == "auto":
        from ..dia import _bf16_exact

        corr_storage = "bfloat16" if _bf16_exact(corr_host) else "float32"
    nz = np.flatnonzero(corr_host)
    n_pad_slots = Z * myp * mxp
    if nz.size < 0.25 * n:
        iz, r = np.divmod(nz, mx * my)
        iy, ix = np.divmod(r, mx)
        slots = ((iz + 1) * myp + iy + 1) * mxp + ix
        corr_j = (
            jnp.zeros(n_pad_slots, jnp.float32)
            .at[jnp.asarray(slots)]
            .set(jnp.asarray(corr_host[nz]))
        )
    else:
        corr3 = np.zeros((Z, myp, mxp), dtype=np.float32)
        corr3[1 : mz + 1, 1 : my + 1, :mx] = corr_host.reshape(mz, my, mx)
        corr_j = jnp.asarray(corr3.reshape(-1))
    if corr_storage == "bfloat16":
        corr_j = corr_j.astype(jnp.bfloat16)

    pplanes, plane_of_group = _build_pattern_planes(
        parts["period"], parts["pats"], parts["groups"],
        parts["group_const"], myp, mxp,
    )
    return PadStencilOperator(
        pats=jnp.asarray(parts["pats"], jnp.float32),
        const_vals=jnp.asarray(parts["const_vals"], jnp.float32),
        pplanes=jnp.asarray(pplanes),
        corr=corr_j,
        taps=parts["taps"],
        groups=parts["groups"],
        group_const=parts["group_const"],
        plane_of_group=plane_of_group,
        dims=parts["dims"],
        period=parts["period"],
        myp=myp,
        mxp=mxp,
        bz=bz,
        n_rows=n,
    )


# Scratch geometry: the DMA'd (bz+2)-layer x window is written at layer
# offset GUARD - sh (the first/last-block clamp shift sh is absorbed at
# DMA time), so x layer l always sits at scratch layer GUARD + l - (blk*bz
# - 1) and a tap (k, dz) reads the STATIC scratch layer k + dz + 1 + GUARD
# in [GUARD, GUARD+bz+1], plus an 8-row guard overhang for the aligned
# tall loads.  GUARD = 2 makes every read land inside SL = bz + 6 layers.
GUARD = 2  # leading guard layers in the scratch window


def _kernel(
    meta,
    cv_ref,
    x_hbm,
    pp_ref,
    corr_ref,
    y_ref,
    scratch,
    sems,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (taps, groups, group_const, plane_of_group, dims, myp, mxp, bz, Z,
     nb) = meta
    mx, my, mz = dims
    SL = bz + 6  # scratch layers per buffer
    i = pl.program_id(0)

    # Mosaic requires every *vector load* row offset on a multi-lane-tile
    # (mxp > 128) memref to be provably ≡ 0 (mod 8), and its divisibility
    # analysis does not track dynamic products (``sh * myp``,
    # ``(i % 2) * SL * myp``).  So all dynamism is kept out of the loads:
    # the double buffer is the *leading* scratch dim (dynamic leading-dim
    # indexing is tile-aligned by construction) and the first/last-block
    # clamp shift ``sh`` is folded into the DMA destination offset (DMAs
    # carry no alignment constraint).  Read offsets below are Python ints.
    def dma(slot, blk):
        cl = jnp.clip(blk * bz - 1, 0, Z - (bz + 2))
        sh = blk * bz - 1 - cl  # in {-1, 0, +1}
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(cl * myp, (bz + 2) * myp), :],
            scratch.at[slot, pl.ds((GUARD - sh) * myp, (bz + 2) * myp), :],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    slot = i % 2

    # Static row/lane interior mask (rows [1, my+1), lanes [0, mx)).
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (myp, mxp), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (myp, mxp), 1)
    rl_mask = jnp.logical_and(
        jnp.logical_and(r_ids >= 1, r_ids < my + 1), l_ids < mx
    )

    for k in range(bz):
        ell = i * bz + k  # absolute output layer
        zp = (k - 1) % 2  # z-parity of grid layer (bz even, layer = ell-1)
        windows = {}
        talls = {}

        def W(dz, dy):
            key = (dz, dy)
            if key not in windows:
                base = (k + dz + 1 + GUARD) * myp  # static (Python int)
                if mxp == 128:
                    # Single lane-tile: Mosaic lowers unaligned (static
                    # +dy) sublane windows at full rate (BSG empirics).
                    windows[key] = scratch[slot, pl.ds(base + dy, myp), :]
                else:
                    # Multi-lane-tile loads require row offsets ≡ 0
                    # (mod 8); +dy breaks that.  Load an 8-row-guarded
                    # tall window once per dz (aligned: myp ≡ 0 mod 8)
                    # and realize dy ∈ {-1,+1} as a static sublane roll.
                    if dz not in talls:
                        talls[dz] = scratch[
                            slot, pl.ds(base - 8, myp + 16), :
                        ]
                    t = talls[dz]
                    if dy:
                        # roll left by (8+dy) == roll right by H-(8+dy)
                        t = pltpu.roll(t, myp + 16 - (8 + dy), axis=0)
                        windows[key] = t[:myp]
                    else:
                        windows[key] = t[8 : 8 + myp]
            return windows[key]

        terms = []
        for g, tap_idx in enumerate(groups):
            ws = []
            for d in tap_idx:
                dx, dy, dz = taps[d]
                Wv = W(dz, dy)
                if dx:
                    Wv = pltpu.roll(Wv, (-dx) % mxp, axis=1)
                ws.append(Wv)
            S = _tree_sum(ws)
            if group_const[g]:
                terms.append(cv_ref[0, g] * S)
            else:
                gp = plane_of_group[g]
                plane = pp_ref[gp, pl.ds(zp * myp, myp), :]
                terms.append(plane * S)
        acc = _tree_sum(terms)
        acc = acc + corr_ref[pl.ds(k * myp, myp), :].astype(
            jnp.float32
        ) * W(0, 0)
        valid = jnp.logical_and(ell >= 1, ell <= mz)
        acc = jnp.where(jnp.logical_and(valid, rl_mask), acc, 0.0)
        y_ref[pl.ds(k * myp, myp), :] = acc


@partial(jax.jit, static_argnames=("interpret",))
def pad_stencil_spmv(
    A: PadStencilOperator, x_padded: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """y = A @ x in the padded 3-D space (f32)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    myp, mxp, bz, Z, nb = A.myp, A.mxp, A.bz, A.Z, A.nb
    meta = (
        A.taps, A.groups, A.group_const, A.plane_of_group, A.dims,
        myp, mxp, bz, Z, nb,
    )
    x2 = x_padded.astype(jnp.float32).reshape(Z * myp, mxp)
    corr2 = A.corr.reshape(Z * myp, mxp)
    SL = bz + 6
    # Trace the kernel under x64=False regardless of session config: the
    # kernel is pure f32/bf16/i32, and Mosaic's convert-lowering helper
    # infinitely recurses on the f64-intermediate casts x64 tracing
    # inserts (observed: RecursionError at lowering).
    with jax.enable_x64(False):
        y = _pad_stencil_call(meta, A, x2, corr2, SL, interpret)
    # (cast outside the x64=False scope, where float64 would silently
    # degrade to float32)
    return y.reshape(-1).astype(x_padded.dtype)


def _pad_stencil_call(meta, A, x2, corr2, SL, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    myp, mxp, bz, Z, nb = A.myp, A.mxp, A.bz, A.Z, A.nb
    y = pl.pallas_call(
        partial(_kernel, meta),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, len(A.groups)), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((bz * myp, mxp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bz * myp, mxp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z * myp, mxp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, SL * myp, mxp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(A.const_vals.reshape(1, -1), x2, A.pplanes, corr2)
    return y
