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

Shuffle economics (the round-3 factored-roll form): a naive per-tap
evaluation pays one cross-lane roll per ``dx != 0`` tap and one sublane
roll per ``(dz, dy != 0)`` window — ~16 rolls/layer on the 19-tap TETRA4
stencil, ~24 on 27-point HEX8 — and at the streamed-traffic minimum those
VPU permutes, not HBM, set the floor.  This kernel factors the rolls out
by linearity instead:

    coeff(r, l) * roll_d(W)  ==  roll_d( coeff_shifted * W )

so coefficient planes multiply BEFORE the shifts, taps sharing a shift
bucket sum first, and each distinct bucket rolls ONCE.  The plane shift is
free: coefficient patterns are (<=2)-periodic, so rolling a plane by +-1
just flips one parity bit, which becomes a static remap of the 8 pattern
scalars (read from SMEM; planes are synthesized in-kernel from iota
checkerboards, so nothing value-dependent is baked into the program).
Identical buckets — same pattern scalars, same window set — deduplicate at
trace time, which auto-discovers stencil separability: TETRA4 drops to 6
rolls/layer (multi-lane-tile) / 2 (single-tile), HEX8 to 4 / 2.

The per-``pallas_call`` dispatch overhead (~0.4 ms on the tunneled dev
environment) is amortized the usual way: the solver chains iterations inside
one jit program.

Replaces the SpMV the reference runs via Tpetra inside Belos
(``BelosMueLuSolver.cpp:112-133``) for structured (generated/box) meshes.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
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
    data_fields=["pats", "const_vals", "quads", "corr"],
    meta_fields=[
        "taps", "groups", "group_const", "group_kind", "dims",
        "period", "myp", "mxp", "bz", "n_rows",
    ],
)
@dataclasses.dataclass
class PadStencilOperator:
    """Lattice-stencil operator over the padded 3-D vector space.

    ``pats``/``taps``/``groups``/``group_const``/``period`` have
    :class:`..stencil.StencilOperator` semantics (used by the non-TPU
    reference evaluation).  ``quads`` holds the per-group pattern scalars
    ``[g, zp*4 + yp*2 + xp]`` the kernel reads from SMEM (period-1
    patterns are replicated across the parity axes).  ``group_kind``
    records each group's in-plane parity dependence — ``"c"`` constant
    per z-parity, ``"y"``/``"x"`` one-axis, ``"d"`` diagonal (depends on
    ``yp ^ xp`` only, the TETRA4 case), ``"f"`` full 2x2 — so the kernel
    synthesizes the cheapest coefficient plane and folds roll-induced
    parity flips into static scalar-index remaps.  ``corr`` is the
    diagonal correction embedded in the padded space (bfloat16 when
    bit-exact, f32 compute).
    """

    pats: jax.Array  # (ndiags, p, p, p) f32
    const_vals: jax.Array  # (n_groups,) f32
    quads: jax.Array  # (n_groups, 8) f32: [g, zp*4 + yp*2 + xp]
    corr: jax.Array  # (n_space,) f32 or bf16
    taps: Tuple[Tuple[int, int, int], ...]
    groups: Tuple[Tuple[int, ...], ...]
    group_const: Tuple[bool, ...]
    group_kind: Tuple[str, ...]  # "c" | "y" | "x" | "d" | "f"
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


def _build_group_quads(
    period: int, pats_in, groups, group_const
) -> Tuple[np.ndarray, Tuple[str, ...]]:
    """Per-group pattern scalars ``[g, zp*4 + yp*2 + xp]`` + parity kind.

    The kind classifies the 2x2 (yp, xp) quad at each z-parity so the
    kernel synthesizes the minimal coefficient plane: ``"c"`` constant,
    ``"y"``/``"x"`` varies along one parity axis, ``"d"`` depends only on
    ``yp ^ xp`` (so a +-1 roll in EITHER axis is the same single-bit
    remap — TETRA4's checkerboard patterns hit this), ``"f"`` full quad.
    """
    p = period
    if p not in (1, 2):
        raise ValueError(f"lattice period must be 1 or 2, got {p}")
    pats = np.asarray(pats_in, dtype=np.float32)
    nq = np.zeros((len(groups), 8), dtype=np.float32)
    kinds = []
    for g, tap_idx in enumerate(groups):
        pat = pats[tap_idx[0]]  # (p, p, p) [iz%p, iy%p, ix%p]
        for zp in range(2):
            for yp in range(2):
                for xp in range(2):
                    nq[g, zp * 4 + yp * 2 + xp] = pat[zp % p, yp % p, xp % p]
        q = nq[g].reshape(2, 2, 2)
        depy = not np.array_equal(q[:, 0, :], q[:, 1, :])
        depx = not np.array_equal(q[:, :, 0], q[:, :, 1])
        if group_const[g] or not (depy or depx):
            kinds.append("c")  # constant per z-parity (zp is static)
        elif depy and depx:
            xor = np.array_equal(q[:, 0, 0], q[:, 1, 1]) and np.array_equal(
                q[:, 0, 1], q[:, 1, 0]
            )
            kinds.append("d" if xor else "f")
        elif depy:
            kinds.append("y")
        else:
            kinds.append("x")
    return nq, tuple(kinds)


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
    n = mx * my * mz

    # Correction storage is decided BEFORE the bz budget loop: a bf16 corr
    # block halves its VMEM share, which at 10M-scale grids admits bz=6
    # instead of 4 — x-window DMA overlap (bz+2)/bz drops 1.5x -> 1.33x.
    corr_host = np.asarray(parts["corr_pad"][:n], dtype=np.float32)
    if corr_storage == "auto":
        from ..dia import _bf16_exact

        corr_storage = "bfloat16" if _bf16_exact(corr_host) else "float32"
    corr_b = 2 if corr_storage == "bfloat16" else 4

    # VMEM estimate per bz: double-buffered x window + pipelined corr/y
    # blocks + pattern planes; keep under ~10 MB of the ~16 MB budget.
    def vmem_bytes(b):
        scratch = 2 * (b + 6) * myp * mxp * 4
        blocks = 2 * b * myp * mxp * (4 + corr_b)  # y + corr, double-buffered
        return scratch + blocks
    while bz > 2 and vmem_bytes(bz) > 10 * 2**20:
        bz -= 2
    if bz % 2:
        raise ValueError("bz must be even (z-parity is static per layer)")

    Z = _round_up(mz + 2, bz)

    # Diagonal correction, embedded.  The correction is nonzero only where
    # the diagonal deviates from the lattice pattern (grid-boundary rows,
    # ~3% of a 10M box), so when sparse enough it ships as (idx, val)
    # pairs and scatters on device instead of uploading the dense padded
    # vector (50 MB -> ~2 MB through the 0.7-80 MB/s tunnel).
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

    quads, group_kind = _build_group_quads(
        parts["period"], parts["pats"], parts["groups"],
        parts["group_const"],
    )
    return PadStencilOperator(
        pats=jnp.asarray(parts["pats"], jnp.float32),
        const_vals=jnp.asarray(parts["const_vals"], jnp.float32),
        quads=jnp.asarray(quads),
        corr=corr_j,
        taps=parts["taps"],
        groups=parts["groups"],
        group_const=parts["group_const"],
        group_kind=group_kind,
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
    q_ref,
    zlim_ref,
    x_hbm,
    corr_ref,
    y_ref,
    scratch,
    sems,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (taps, groups, group_const, group_kind, dims, myp, mxp, bz, Z,
     nb) = meta
    mx, my, mz = dims
    SL = bz + 6  # scratch layers per buffer
    i = pl.program_id(0)
    single = mxp == 128  # single lane-tile: unaligned row windows are free

    # Mosaic requires every *vector load* row offset on a multi-lane-tile
    # (mxp > 128) memref to be provably ≡ 0 (mod 8), and its divisibility
    # analysis does not track dynamic products (``sh * myp``,
    # ``(i % 2) * SL * myp``).  So all dynamism is kept out of the loads:
    # the double buffer is the *leading* scratch dim (dynamic leading-dim
    # indexing is tile-aligned by construction) and the first/last-block
    # clamp shift ``sh`` is folded into the DMA destination offset (DMAs
    # carry no alignment constraint).  Read offsets below are Python ints.
    #
    # Ring reuse: the 2 window layers each block shares with its
    # predecessor (a = 0, 1 == predecessor's a = bz, bz+1) are VMEM-copied
    # from the other buffer instead of re-fetched, so x streams from HBM
    # exactly once (block 0 aside) — HBM x-traffic (bz+2)/bz -> 1.0.  The
    # copy completes before the next block's prefetch is enqueued into
    # that same buffer, so the two in-flight DMAs stay disjoint.
    slot = i % 2
    other = (i + 1) % 2

    def dma_full(blk):  # block 0 only: the whole (bz+2)-layer window
        cl = jnp.clip(blk * bz - 1, 0, Z - (bz + 2))
        sh = blk * bz - 1 - cl  # in {-1, 0, +1}
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(cl * myp, (bz + 2) * myp), :],
            scratch.at[slot, pl.ds((GUARD - sh) * myp, (bz + 2) * myp), :],
            sems.at[slot],
        )

    def dma_ring(dslot, blk):  # blocks >= 1: only the bz NEW layers
        s = blk * bz + 1
        cl = jnp.clip(s, 0, Z - bz)
        sh = s - cl  # in {0, +1} (top-block clamp only; a=bz+1 stays
        # unwritten there — it feeds only the Z-1 output layer, which the
        # z-validity mask zeroes)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(cl * myp, bz * myp), :],
            scratch.at[dslot, pl.ds((GUARD + 2 - sh) * myp, bz * myp), :],
            sems.at[dslot],
        )

    @pl.when(i == 0)
    def _():
        dma_full(0).start()
        dma_full(0).wait()

    @pl.when(i > 0)
    def _():
        dma_ring(slot, i).wait()
        cp = pltpu.make_async_copy(
            scratch.at[other, pl.ds((GUARD + bz) * myp, 2 * myp), :],
            scratch.at[slot, pl.ds(GUARD * myp, 2 * myp), :],
            sems.at[2],
        )
        cp.start()
        cp.wait()

    @pl.when(i + 1 < nb)
    def _():
        dma_ring(other, i + 1).start()

    # Static row/lane interior mask (rows [1, my+1), lanes [0, mx)).
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (myp, mxp), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (myp, mxp), 1)
    rl_mask = jnp.logical_and(
        jnp.logical_and(r_ids >= 1, r_ids < my + 1), l_ids < mx
    )

    # Parity checkerboards at coefficient-application coords: output rows
    # (single-tile) or the 8-row-guarded tall window (multi-tile; the
    # 8-row guard is parity-neutral).  Row r holds grid row iy = r - 1.
    H = myp if single else myp + 16
    rch = jax.lax.broadcasted_iota(jnp.int32, (H, mxp), 0)
    lch = jax.lax.broadcasted_iota(jnp.int32, (H, mxp), 1)
    boards = {}

    def board(which):
        if which not in boards:
            if which == "y":
                boards[which] = ((rch + 1) & 1).astype(jnp.float32)
            elif which == "x":
                boards[which] = (lch & 1).astype(jnp.float32)
            elif which == "d":
                boards[which] = ((rch + 1 + lch) & 1).astype(jnp.float32)
            else:  # "xy"
                boards[which] = board("y") * board("x")
        return boards[which]

    # Caches shared across the bz output layers.  Every key is ABSOLUTE —
    # source scratch layer a = k + dz + 1 (a Python int), z-parity zp
    # baked into plane keys — so work that adjacent output layers have in
    # common is traced once per grid step, not once per layer:
    #   * coefficient planes depend only on zp, which alternates, so each
    #     plane synthesizes at most twice per step instead of per layer;
    #   * symmetric stencils read the same source layer from both sides
    #     (output k sees layer a = k+2 as dz=+1, output k+2 sees it as
    #     dz=-1) with identical dy sets and parity-normalized planes, so
    #     the per-source-layer partial sums (``wparts``) and tall-window
    #     loads dedup across the two consumers.
    talls = {}  # a -> (myp+16, mxp) aligned tall window [multi-tile]
    base_wins = {}  # (a, dy) -> (myp, mxp) direct window [single-tile]
    planes = {}  # plane key (incl. zp) -> ("s", scalar) | ("p", array)
    wparts = {}  # (a, dys) -> per-source-layer partial window sum
    wsums = {}  # sorted window-key tuple -> summed base windows
    contents = {}  # ((plane_key, wkey), ...) -> pre-roll bucket sum
    rolled = {}  # (dx, content key) -> lane-rolled content [single-tile]
    rowed = {}  # (dy, content key) -> (myp, mxp) row-shifted [multi-tile]
    dx_sums = {}  # sorted rowed-key tuple -> summed rows [multi-tile]

    def tall(a):
        if a not in talls:
            base = (a + GUARD) * myp  # static (Python int)
            talls[a] = scratch[slot, pl.ds(base - 8, myp + 16), :]
        return talls[a]

    def win(a, dy):
        key = (a, dy)
        if key not in base_wins:
            base = (a + GUARD) * myp
            base_wins[key] = scratch[slot, pl.ds(base + dy, myp), :]
        return base_wins[key]

    def plane(pk):
        """-> ("s", scalar) | ("p", (H, mxp) array)."""
        if pk in planes:
            return planes[pk]
        if pk[0] == "c":
            v = ("s", q_ref[pk[1], pk[2] * 4])
        else:
            _, g, yf, xf, zp = pk
            kind = group_kind[g]

            def q(yp, xp):
                return q_ref[g, zp * 4 + (yp ^ yf) * 2 + (xp ^ xf)]

            q00 = q(0, 0)
            if kind == "x":
                arr = q00 + (q(0, 1) - q00) * board("x")
            elif kind == "y":
                arr = q00 + (q(1, 0) - q00) * board("y")
            elif kind == "d":
                arr = q00 + (q(0, 1) - q00) * board("d")
            else:
                arr = (
                    q00
                    + (q(0, 1) - q00) * board("x")
                    + (q(1, 0) - q00) * board("y")
                    + (q(1, 1) - q(0, 1) - q(1, 0) + q00) * board("xy")
                )
            v = ("p", arr)
        planes[pk] = v
        return v

    def wsum(keys):
        key = tuple(sorted(keys))
        if key not in wsums:
            if single:
                # Sum within each source layer first (those partials are
                # what symmetric neighbors share), then across layers.
                per_a = defaultdict(list)
                for a, dy in key:
                    per_a[a].append(dy)
                parts_l = []
                for a in sorted(per_a):
                    pk2 = (a, tuple(sorted(per_a[a])))
                    if pk2 not in wparts:
                        wparts[pk2] = _tree_sum(
                            [win(a, dy) for dy in pk2[1]]
                        )
                    parts_l.append(wparts[pk2])
                wsums[key] = _tree_sum(parts_l)
            else:
                wsums[key] = _tree_sum([tall(a) for a in key])
        return key

    def content(cdict):
        items = tuple((pk, wsum(cdict[pk])) for pk in sorted(cdict))
        if items not in contents:
            terms = []
            for pk, wk in items:
                kindv, v = plane(pk)
                terms.append(v * wsums[wk])
            contents[items] = _tree_sum(terms)
        return contents[items], items

    for k in range(bz):
        ell = i * bz + k  # absolute output layer
        zp = (k - 1) % 2  # z-parity of grid layer (bz even, layer = ell-1)

        def center():
            return win(k + 1, 0) if single else tall(k + 1)[8 : 8 + myp]

        # Coefficient planes: a factored roll by (dy, dx) shifts the plane
        # the opposite way; with <=2-periodic patterns that is a parity-
        # bit flip, normalized into the cache key per the group's kind (so
        # e.g. TETRA4's xor patterns give the SAME plane for a dy-flip and
        # a dx-flip).
        def plane_key(g, yf, xf):
            kind = group_kind[g]
            if kind == "c":
                return ("c", g, zp)
            if kind == "x":
                return ("p", g, 0, xf, zp)
            if kind == "y":
                return ("p", g, yf, 0, zp)
            if kind == "d":
                return ("p", g, 0, yf ^ xf, zp)
            return ("p", g, yf, xf, zp)

        # Shift buckets: single-tile factors only the lane roll (windows
        # absorb dz/dy), multi-tile factors both the sublane and the lane
        # roll out of per-source-layer tall windows.
        # bucket -> {plane_key: [absolute window key]}.
        contrib = defaultdict(lambda: defaultdict(list))
        for g, tap_idx in enumerate(groups):
            for d in tap_idx:
                dx, dy, dz = taps[d]
                a = k + dz + 1
                if single:
                    contrib[dx][plane_key(g, 0, dx & 1)].append((a, dy))
                else:
                    contrib[(dx, dy)][plane_key(g, dy & 1, dx & 1)].append(
                        a
                    )

        if single:
            out_terms = []
            for dx in sorted(contrib):
                U, ckey = content(contrib[dx])
                if dx:
                    rk = (dx, ckey)
                    if rk not in rolled:
                        rolled[rk] = pltpu.roll(U, (-dx) % mxp, axis=1)
                    U = rolled[rk]
                out_terms.append(U)
            acc = _tree_sum(out_terms)
        else:

            def row_shift(dy, cdict):
                c, ckey = content(cdict)
                key = (dy, ckey)
                if key not in rowed:
                    if dy == 0:
                        rowed[key] = c[8 : 8 + myp]
                    else:
                        # roll left by (8+dy) == roll right by H-(8+dy)
                        rowed[key] = pltpu.roll(
                            c, myp + 16 - (8 + dy), axis=0
                        )[:myp]
                return rowed[key], key

            per_dx = defaultdict(list)
            for dx, dy in contrib:
                per_dx[dx].append(dy)
            out_terms = []
            for dx in sorted(per_dx):
                arrs, keys = [], []
                for dy in sorted(per_dx[dx]):
                    a, kk = row_shift(dy, contrib[(dx, dy)])
                    arrs.append(a)
                    keys.append(kk)
                skey = tuple(sorted(keys))
                if skey not in dx_sums:
                    dx_sums[skey] = _tree_sum(arrs)
                U = dx_sums[skey]
                if dx:
                    U = pltpu.roll(U, (-dx) % mxp, axis=1)
                out_terms.append(U)
            acc = _tree_sum(out_terms)

        acc = acc + corr_ref[pl.ds(k * myp, myp), :].astype(
            jnp.float32
        ) * center()
        # z-validity bounds from SMEM: (1, mz) for the single-device
        # operator; per-device (1, owned-layer count) for z-slab shards
        # (where trailing slab layers past the global grid must zero).
        valid = jnp.logical_and(ell >= zlim_ref[0, 0], ell <= zlim_ref[0, 1])
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
        A.taps, A.groups, A.group_const, A.group_kind, A.dims,
        myp, mxp, bz, Z, nb,
    )
    x2 = x_padded.astype(jnp.float32).reshape(Z * myp, mxp)
    corr2 = A.corr.reshape(Z * myp, mxp)
    SL = bz + 6
    # Trace the kernel under x64=False regardless of session config: the
    # kernel is pure f32/bf16/i32, and Mosaic's convert-lowering helper
    # infinitely recurses on the f64-intermediate casts x64 tracing
    # inserts (observed: RecursionError at lowering).
    zlim = jnp.array([[1, A.dims[2]]], jnp.int32)
    with jax.enable_x64(False):
        y = _pad_stencil_call(meta, A.quads, zlim, x2, corr2, SL, interpret)
    # (cast outside the x64=False scope, where float64 would silently
    # degrade to float32)
    return y.reshape(-1).astype(x_padded.dtype)


def _pad_stencil_call(meta, quads, zlim, x2, corr2, SL, interpret, vma=None):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_groups = quads.shape[0]
    myp, mxp, bz, Z, nb = meta[5], meta[6], meta[7], meta[8], meta[9]
    y = pl.pallas_call(
        partial(_kernel, meta),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n_groups, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bz * myp, mxp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bz * myp, mxp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        # vma: set to the mesh-axis set when called inside a
        # check_vma=True shard_map (the slab-sharded path) so the output
        # is marked device-varying; None outside shard_map.
        out_shape=jax.ShapeDtypeStruct((Z * myp, mxp), jnp.float32, vma=vma),
        scratch_shapes=[
            pltpu.VMEM((2, SL * myp, mxp), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),  # [0:2] x-window ring, [2] boundary copy
        ],
        interpret=interpret,
    )(quads, zlim, x2, corr2)
    return y
