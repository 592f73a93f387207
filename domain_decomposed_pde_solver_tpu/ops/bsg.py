"""BSG — binned shuffle-gather sparse format for unstructured SpMV on TPU.

The TPU has no vectorized arbitrary gather: XLA lowers ``x[cols]`` to a
serialized per-element loop (~9 ns/element here), which makes ELL-family
SpMV on unstructured tet meshes two orders of magnitude slower than the
structured DIA path (the reference's actual workload is unstructured:
``tet-cube-heat.exo`` etc., ``BelosMueLuSolver.cpp:112-133``).

What Mosaic *does* lower efficiently (measured on v5e):

- unaligned *dynamic row slices* of a VMEM-resident ``(rows, 128)`` array,
- ``take_along_axis`` across sublanes within one ``(8, 128)`` tile,
- ``take_along_axis`` across lanes (any row count),
- dense elementwise FMAs.

BSG expresses SpMV entirely in those primitives.  Rows are processed in
tiles of 1024 (= 8 sublanes x 128 lanes over the ``(n/128, 128)`` layout of
``x``).  Every nonzero ``A[row, col] = v`` becomes one *slot* in a
**micro-op**: a micro-op ``m`` of tile ``t`` holds

- ``w0[t,m]``   : start row of an 8-row window ``W = x2[w0 : w0+8]``,
- ``rm[t,m,a,l]``: source lane of the slot that produces output ``(a, l)``,
- ``qq[t,m,a,r]``: window row holding the value for source lane ``r``,
- ``vals[t,m,a,l]``: the coefficient (0 in unused slots).

and the kernel evaluates, for each output element ``(a, l)`` of the tile,

    ``acc[a,l] += vals[a,l] * W[qq[a, rm[a,l]], rm[a,l]]``

i.e. one sublane shuffle + one lane shuffle + one FMA per micro-op — no
serialized gathers.  The two-level shuffle is exact when within a micro-op
every populated ``(sublane, source-lane)`` pair is unique; the host packer
(:func:`bsg_from_csr`) guarantees that by splitting conflicting slots into
extra micro-ops ("rounds") and by binning columns into aligned 8-row
windows.  RCM ordering keeps the column spread per tile small so few bins
are touched.

Measured on the tunneled v5e: the packed tet-cube-heat operator runs ~6x
faster than the best XLA gather formulation (SplitELL), limited by a fixed
~0.4 ms per-``pallas_call`` dispatch cost of this environment — which the
fused-CG driver (:mod:`..solvers.fused_cg`) amortizes over a whole solve.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .csr import CSRMatrix

__all__ = ["BSGMatrix", "bsg_from_csr", "bsg_from_coo", "bsg_spmv"]

TILE = 1024  # rows per tile: 8 sublanes x 128 lanes
LANES = 128
SUBL = 8
# Ragged-layout chunk cap: tmap is scalar-prefetch (whole array in SMEM,
# 1 MB total); 64k chunks = 256 KB int32, leaving room for w0 blocks etc.
_TMAP_CAP = 65536
# Updates per segment of the 2-D sparse-upload scatter (patchable in tests
# to exercise the multi-segment + last-segment-padding logic at small nnz).
_UPLOAD_SEG = 1 << 24


def _storage_vdt(storage):
    return {
        "int8": jnp.int8, "bfloat16": jnp.bfloat16, "float32": jnp.float32
    }[storage]


def _value_bytes(storage) -> int:
    return {"int8": 1, "bfloat16": 2, "float32": 4}[storage]


def _int8_exact(vals: np.ndarray) -> bool:
    """True iff every value is an integer in [-127, 127] — the graph
    Laplacian (degrees and -1s) qualifies, so its value plane stores as
    int8: 1 B/slot instead of bf16's 2 (the fine operator is the HBM
    budget at 25M rows), converted to f32 inside the kernel."""
    if not vals.size:
        return True
    m = float(np.abs(vals).max())
    return m <= 127 and bool(np.all(vals == np.rint(vals)))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["w0", "qq", "rm", "vals", "diag", "perm", "tmap"],
    meta_fields=["n_rows", "n_tiles", "max_mo", "nx2", "storage", "win",
                 "chunk", "x_len"],
)
@dataclasses.dataclass
class BSGMatrix:
    """Binned shuffle-gather matrix (square operators).

    Vectors passed to :meth:`matvec` live in the *internal (permuted,
    padded)* space of length ``n_pad = n_tiles * 1024``; use
    :meth:`put_vector` / :meth:`get_vector` to convert.

    Two storage layouts share this class (``tmap is None`` selects dense):

    - **dense**: every tile stores ``max_mo`` micro-ops —
      ``qq/rm/vals`` are ``(n_tiles, max_mo, 8, 128)``.  Simple, but at
      scale the per-tile micro-op count spreads (refined lbracket at
      3.2M rows: mean 130 vs max 229) and every tile pays the max.
    - **ragged**: micro-ops are stored flat, each tile padded only to a
      multiple of ``chunk`` — ``qq/rm/vals`` are
      ``(n_chunks, chunk, 8, 128)``, ``w0`` is ``(n_chunks, chunk)``,
      and ``tmap`` maps chunk -> output tile.  The kernel grids over
      chunks and revisits each tile's output block (sequential TPU grid,
      accumulate-in-VMEM), cutting HBM bytes by max_mo/mean_mo (1.66x
      measured at 3.2M rows) at identical arithmetic.
    """

    w0: jax.Array  # (n_tiles, max_mo) int32 window start rows (mult. of win)
    qq: jax.Array  # (n_tiles, max_mo, 8, 128) int8 window-row per (a, r)
    rm: jax.Array  # (n_tiles, max_mo, 8, 128) int8 source lane per (a, l)
    vals: jax.Array  # (n_tiles, max_mo, 8, 128) f32/bf16 coefficients
    diag: jax.Array  # (n_pad,) f32 diagonal (permuted), 0-padded
    perm: Optional[jax.Array]  # (n,) original row -> internal row, or None
    n_rows: int
    n_tiles: int
    max_mo: int
    nx2: int  # rows of the internal (nx2, 128) x layout (>= padded + win)
    storage: str  # "float32" | "bfloat16"
    win: int = SUBL  # x-rows per window bin (8 or 32; wider = fewer
    #   micro-ops at higher per-gather cost — measure before changing)
    tmap: Optional[jax.Array] = None  # (n_chunks,) int32 chunk -> tile
    #   (ragged layout only; None selects the dense layout)
    chunk: int = 0  # micro-ops per chunk (ragged layout only)
    x_len: int = 0  # rectangular ops (bsg_from_coo): logical input-vector
    #   length; 0 means square (input space == output space)

    @property
    def n_pad(self) -> int:
        return self.n_tiles * TILE

    @property
    def n_cols(self) -> int:
        return self.n_rows

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_rows)

    @property
    def dtype(self):
        return jnp.dtype(jnp.float32)

    def put_vector(self, x: np.ndarray, dtype=jnp.float32) -> jax.Array:
        """Original-order (n,) host vector -> internal padded device vector."""
        x = np.asarray(x)
        out = np.zeros(self.n_pad, dtype=np.dtype(dtype))
        if self.perm is not None:
            out[np.asarray(self.perm)] = x
        else:
            out[: self.n_rows] = x
        return jnp.asarray(out)

    def get_vector(self, xp: jax.Array) -> np.ndarray:
        """Internal padded device vector -> original-order (n,) host vector."""
        xp = np.asarray(xp)
        if self.perm is not None:
            return xp[np.asarray(self.perm)]
        return xp[: self.n_rows]

    def diagonal_padded(self, fill: float = 1.0) -> jax.Array:
        d = self.diag
        return jnp.where(d != 0, d, jnp.asarray(fill, d.dtype))

    def matvec(self, x_padded: jax.Array) -> jax.Array:
        # The Pallas kernel targets Mosaic (TPU); everywhere else (CPU
        # tests, virtual device meshes) the packed form evaluates exactly
        # the same numbers through plain XLA take_along_axis.
        if jax.devices()[0].platform != "tpu":
            return self.matvec_reference(x_padded)
        return bsg_spmv(self, x_padded)

    def matvec_reference(self, x_padded: jax.Array) -> jax.Array:
        """Pure-jnp (XLA) evaluation of the packed form — used to validate
        the packing itself and as the non-TPU fallback."""
        x2 = _as_x2(self, x_padded)
        W = x2[self.w0.reshape(-1)[:, None] + np.arange(self.win)[None, :], :]
        if self.tmap is None:
            W = W.reshape(self.n_tiles, self.max_mo, self.win, LANES)
            qq = self.qq.astype(jnp.int32)
            rm = self.rm.astype(jnp.int32)
            t1 = jnp.take_along_axis(W, qq, axis=2)
            g = jnp.take_along_axis(t1, rm, axis=3)
            y = (self.vals.astype(x_padded.dtype) * g).sum(axis=1)
            return y.reshape(self.n_pad)
        # Ragged: flat micro-ops, per-chunk tile segment-sum.
        m_tot = self.tmap.shape[0] * self.chunk
        qq = self.qq.astype(jnp.int32).reshape(m_tot, SUBL, LANES)
        rm = self.rm.astype(jnp.int32).reshape(m_tot, SUBL, LANES)
        t1 = jnp.take_along_axis(W, qq, axis=1)
        g = jnp.take_along_axis(t1, rm, axis=2)
        contrib = self.vals.astype(x_padded.dtype).reshape(g.shape) * g
        seg = jnp.repeat(self.tmap.astype(jnp.int32), self.chunk)
        y = jax.ops.segment_sum(contrib, seg, num_segments=self.n_tiles)
        return y.reshape(self.n_pad)


def _as_x2(A: BSGMatrix, x_padded: jax.Array) -> jax.Array:
    # Pad flat first: rectangular transfer ops (bsg_from_coo) take input
    # vectors whose padded length need not be a multiple of 128.
    need = A.nx2 * LANES
    n = x_padded.shape[0]
    if n < need:
        x_padded = jnp.concatenate(
            [x_padded, jnp.zeros(need - n, x_padded.dtype)]
        )
    return x_padded.reshape(A.nx2, LANES)


def _rcm_perm(csr: CSRMatrix) -> Optional[np.ndarray]:
    try:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        S = sp.csr_matrix(
            (np.asarray(csr.data), np.asarray(csr.indices), np.asarray(csr.indptr)),
            shape=csr.shape,
        )
        order = np.asarray(reverse_cuthill_mckee(S, symmetric_mode=True))
        perm = np.empty(csr.n_rows, dtype=np.int64)
        perm[order] = np.arange(csr.n_rows)
        return perm
    except Exception:  # pragma: no cover
        return None


def bsg_from_csr(
    csr: CSRMatrix,
    *,
    reorder: bool = True,
    storage: str = "auto",
    win: object = "auto",
    sparse_upload: object = "auto",
    layout: str = "auto",
    chunk: int = 16,
    timings_out: Optional[dict] = None,
) -> BSGMatrix:
    """Pack a square CSR matrix into BSG form.

    ``reorder=True`` applies RCM (symmetric permutation) first — tighter
    column clustering per tile means fewer window bins and fewer micro-ops.
    ``storage="auto"`` keeps coefficient storage in bfloat16 when every
    value round-trips exactly (true for graph Laplacians, whose entries are
    small integers), halving HBM/VMEM bytes with bit-identical results.
    ``win`` is the x-row width of a window bin (multiple of 8, <= 127 so
    the window row fits int8 qq).  Wider bins merge adjacent column
    windows, cutting micro-op count (slot fill at 3.2M lbracket: 0.064
    at win=8 -> 0.147 at win=32) at win/8 within-sublane-tile gathers
    per micro-op; with the hoisted gather (3 VPU ops per sub-tile) the
    win=32 kernel stays byte-bound, so fewer bytes win outright —
    dense win=32 measured 2559 us vs win=8's 4359 us at 3.2M rows.
    ``win="auto"`` picks 32 for operators >= 64 tiles and 8 below that
    (small operators are dispatch/VMEM-resident-bound; window width is
    then noise and 8 keeps the cheapest gather).

    ``sparse_upload="auto"`` ships the packed slot arrays to the device as
    (index, value) pairs and scatters on device when the slot fill is low
    (< 0.25).  Slot fill falls with scale (0.21 on 20k-row tet-cube, 0.064
    on 3.2M-row refined lbracket): the dense host slot arrays are then
    mostly zeros — ~4.5 GB of host->device transfer at 3.2M, which
    dominated the measured 208 s pack time on the tunneled link — while
    the sparse form moves ~0.8 GB and the device-side scatter is exact
    (slot indices are unique by the micro-op conflict rules).

    ``layout="auto"`` picks dense unless the dense slot arrays exceed
    ~4 GB, then ragged at chunk >= 64.  Real-chip A/B at 3.2M-row
    refined lbracket (9 configs): dense w8 is byte-bound at 1.03x of
    the probed stream (4359 us); ragged pays a ~230 ns fixed cost per
    grid step, so small chunks LOSE outright (c16 8712 us despite 1.65x
    fewer bytes) and c64 only ties (4343 us, 1.43x fewer bytes) —
    ragged is a memory-footprint lever, not a speed lever.  ``chunk``
    is the micro-ops-per-grid-step granularity (each tile's micro-op
    count is rounded up to a multiple of it).
    """
    if csr.shape[0] != csr.shape[1]:
        raise ValueError("BSG requires a square operator")
    if win == "auto":
        # Real-chip sweep at 3.2M-row lbracket (hoisted gather): win 8 /
        # 16 / 32 / 48 / 64 = 4359 / 3229 / 2559 / 2461 / 2403 us at
        # 2948 / 2055 / 1481 / 1340 / 1149 MB — wider windows raise slot
        # fill faster than the extra sub-tile selects cost, flattening
        # past 48.  64 takes both best time and smallest footprint.
        # At 16M+ rows the operator is the HBM budget (level-4 lbracket:
        # 12.2 GB at win=64 vs ~16 GB total) — take the widest window the
        # int8 qq admits (120) for maximum fill; the extra sub-tile
        # selects stay under the byte time at this scale.
        if csr.n_rows >= 16 * 1024 * TILE:
            win = 120
        elif csr.n_rows >= 64 * TILE:
            win = 64
        else:
            win = SUBL
    if win % SUBL or not 0 < win <= 127:
        raise ValueError("win must be a multiple of 8 in [8, 127] (int8 qq)")
    if layout not in ("auto", "dense", "ragged"):
        raise ValueError(f"layout must be auto|dense|ragged, got {layout!r}")
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    import time as _time

    _tm = {} if timings_out is None else timings_out
    _last = [_time.perf_counter()]

    def _mark(name):
        now = _time.perf_counter()
        _tm[name] = _tm.get(name, 0.0) + (now - _last[0])
        _last[0] = now

    n = csr.n_rows
    perm = _rcm_perm(csr) if reorder else None
    _mark("rcm")

    indptr = np.asarray(csr.indptr)
    # Canonical (row, col) order in the *internal* numbering, so the slot
    # index k below groups the k-th smallest column of each row — columns of
    # a slot then cluster into few window bins per tile.  Native bucketed
    # ordering (per-permuted-row column sorts) replaces the lexsort over two
    # nnz-sized int64 keys; NumPy fallback below.
    from ..utils.native import bsg_canonical_order_native

    p_eff = perm if perm is not None else np.arange(n, dtype=np.int64)
    order = bsg_canonical_order_native(indptr, csr.indices, p_eff, n)
    if order is not None:
        counts = np.zeros(n, dtype=np.int64)
        counts[p_eff] = np.diff(indptr)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        cols = p_eff[np.asarray(csr.indices, dtype=np.int64)[order]]
        data = np.asarray(csr.data, dtype=np.float64)[order]
    else:
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        cols = np.asarray(csr.indices, dtype=np.int64)
        data = np.asarray(csr.data, dtype=np.float64)
        if perm is not None:
            rows = perm[rows]
            cols = perm[cols]
        o = np.lexsort((cols, rows))
        rows, cols, data = rows[o], cols[o], data[o]
    _mark("canonical_order")

    n_tiles = max(1, -(-n // TILE))
    n_pad = n_tiles * TILE
    nx2 = n_pad // LANES + win  # zero guard rows so windows never overrun

    mo_index, max_mo = _assign_micro_ops(rows, cols, win, n_tiles, nx2, n_pad)
    _mark("assign")

    t = rows // TILE
    tmap = None
    if layout == "auto":
        # Real-chip A/B at 3.2M-row refined lbracket (9 configs, round 5):
        # dense is byte-bound at 1.03x of the probed stream and FASTEST in
        # wall time; ragged carries a measured ~230 ns fixed cost per grid
        # step (the per-step SMEM w0 block DMA is latency-exposed when the
        # chunk's byte time is shorter), so it only TIES dense at chunk=64
        # (4343 vs 4359 us) while storing 1.43x fewer bytes.  Pick dense
        # for speed unless the dense slot arrays would not fit next to
        # vectors + hierarchy in HBM — then take the ragged c64 tie and
        # bank the memory.
        dense_bytes = n_tiles * max_mo * TILE * 4  # bf16 val + rm + qq
        if n_tiles >= 64 and dense_bytes > 4e9:
            # Memory-constrained: take the largest chunk (least step
            # overhead) that still beats dense on bytes — per-tile
            # rounding can make big chunks store MORE than dense (w32 at
            # 3.2M: c64 pads mean 84 -> 128 > max_mo 116), in which case
            # dense is both faster and smaller and stays the pick.
            cnt0 = np.zeros(n_tiles, dtype=np.int64)
            np.maximum.at(cnt0, t, mo_index + 1)
            layout = "dense"
            for c in (64, 32, 16):
                rb = int((-(-np.maximum(cnt0, 1) // c) * c).sum()) * TILE * 4
                if rb <= 0.9 * dense_bytes:
                    layout, chunk = "ragged", c
                    break
        else:
            layout = "dense"
    if layout == "ragged":
        cnt = np.zeros(n_tiles, dtype=np.int64)
        np.maximum.at(cnt, t, mo_index + 1)
        # tmap is a scalar-prefetch operand and lives wholly in SMEM
        # (1 MB total); bound n_chunks so the int32 tmap stays <= ~256 KB
        # by widening chunk — per-tile rounding waste grows ~chunk/2 per
        # tile but stays far below the dense layout's max_mo - mean_mo.
        while True:
            padded = -(-np.maximum(cnt, 1) // chunk) * chunk
            if int(padded.sum()) // chunk <= _TMAP_CAP:
                break
            chunk *= 2
    if layout == "ragged":
        # Flat micro-op storage: tile ti's micro-ops live at
        # [offs[ti], offs[ti] + cnt[ti]), padded up to a chunk multiple
        # (padding micro-ops have vals = 0 / w0 = 0 — harmless).
        offs = np.concatenate([[0], np.cumsum(padded)])
        m_tot = int(offs[-1])
        n_chunks = m_tot // chunk
        tmap = np.repeat(
            np.arange(n_tiles, dtype=np.int32), (padded // chunk)
        )
        gmo = offs[t] + mo_index  # global (flat) micro-op id per entry
        shape4 = (n_chunks, chunk, SUBL, LANES)
        shape_w0 = (n_chunks, chunk)
        base = gmo * np.int64(SUBL)
        w0 = np.zeros(m_tot, dtype=np.int32)
    else:
        shape4 = (n_tiles, max_mo, SUBL, LANES)
        shape_w0 = (n_tiles, max_mo)
        gmo = t * np.int64(max_mo) + mo_index
        base = gmo * np.int64(SUBL)
        m_tot = n_tiles * max_mo
        w0 = np.zeros(m_tot, dtype=np.int32)

    n_slots = m_tot * SUBL * LANES
    if storage == "auto":
        # Bit-level exactness check on the CSR values (native one-pass; the
        # ml_dtypes host cast of the dense slot array cost ~7 s at 6M nnz).
        # Resolved BEFORE the fill so the sparse upload can ship bf16.
        from .dia import _bf16_exact

        cd = np.asarray(csr.data)
        if _int8_exact(cd):
            storage = "int8"
        elif _bf16_exact(cd):
            storage = "bfloat16"
        else:
            storage = "float32"
    if sparse_upload == "auto":
        # Byte-based decision: on the tunneled host->device link (0.7-80
        # MB/s) the TRANSFER dominates the pack, so compare actual bytes
        # moved, not slot fill.  Sparse ships idx int32 + lane int8 +
        # window row int8 + value (int8/bf16/f32); dense ships every slot's
        # value + rm + qq.  The old 0.25-fill gate kept a 143k-row AMG mid
        # level (fill 0.248) on the dense path — 138 MB and 85 s of the
        # setup at a slow tunnel state vs ~46 MB sparse.
        v_b = _value_bytes(storage)
        sparse_b = rows.size * (6 + max(v_b, 1))
        dense_b = n_slots * (2 + v_b)
        sparse_upload = sparse_b < 0.8 * dense_b
    _mark("layout")
    a = (rows % TILE) // LANES
    l = rows % LANES
    g = cols // LANES
    r = cols % LANES
    b = g // win
    if sparse_upload or layout == "ragged":
        # Host-side w0/diag; the dense host-fill branch below gets both
        # from its native single-pass kernel instead.
        w0[gmo] = (b * win).astype(np.int32)
        w0 = w0.reshape(shape_w0)
        diag = np.zeros(n_pad, dtype=np.float32)
        dmask = rows == cols
        diag[rows[dmask]] = data[dmask].astype(np.float32)
    if sparse_upload and (n_slots > 2**31 - 1 or sparse_upload == "2d"):
        # Level-4-scale operators: the flat slot index overflows int32, so
        # scatter into the 2-D (m_tot, 1024) view with (micro-op, in-tile
        # slot) index pairs instead — per-dimension index math stays in
        # range, and the updates stream in fixed-size segments through a
        # DONATED jit buffer so peak HBM is the final array plus one
        # segment (not 2x the array, which at a ~5 GB value plane would
        # not fit next to the rest of the solve).
        vals, rm, qq = _sparse_upload_2d(
            gmo, a, l, g, r, b, win, data, storage, m_tot, shape4
        )
        _mark("upload_scatter2d")
    elif sparse_upload:
        vals, rm, qq = _sparse_upload_1d(
            base, a, l, g, r, b, win, data, storage, n_slots, shape4, _mark
        )
    elif layout == "ragged":
        ch, mc = gmo // chunk, gmo % chunk
        vals = np.zeros(shape4, dtype=np.float32)
        rm = np.zeros(shape4, dtype=np.int8)
        qq = np.zeros(shape4, dtype=np.int8)
        vals[ch, mc, a, l] = data.astype(np.float32)
        rm[ch, mc, a, l] = r.astype(np.int8)
        qq[ch, mc, a, r] = (g - b * win).astype(np.int8)
        _mark("host_fill")
    else:
        filled = _bsg_fill_dense(
            rows, cols, data, mo_index, win, n_tiles, max_mo, n_pad
        )
        w0, qq, rm, vals, diag = filled
        _mark("host_fill")

    vals_j = jnp.asarray(vals)
    vdt = _storage_vdt(storage)
    if vals_j.dtype != vdt:
        vals_j = vals_j.astype(vdt)  # cast on device (XLA), not host
    _mark("storage_cast")

    return BSGMatrix(
        w0=jnp.asarray(w0),
        qq=jnp.asarray(qq),
        rm=jnp.asarray(rm),
        vals=vals_j,
        diag=jnp.asarray(diag),
        perm=jnp.asarray(perm) if perm is not None else None,
        n_rows=n,
        n_tiles=n_tiles,
        max_mo=max_mo,
        nx2=nx2,
        storage=storage,
        win=win,
        tmap=jnp.asarray(tmap) if tmap is not None else None,
        chunk=chunk if tmap is not None else 0,
    )


def _assign_micro_ops(rows, cols, win, n_tiles, nx2, n_pad):
    """Micro-op assignment = bipartite edge coloring per (tile, window bin):
    within one micro-op each output slot (a, l) and each source pair
    (a, r) may appear at most once (so the two-level shuffle is exact).
    Native first-fit greedy (ddps_native.cpp::bsg_assign; ~20x the NumPy
    matching below at multi-M nnz), NumPy iterative matching fallback.
    Entries must be (row, col)-sorted."""
    from ..utils.native import bsg_assign_native

    # The native assigner's "subl" argument only sets the window width
    # (win_rows * lanes columns per bin); the (a, r) source-conflict rule
    # is lane-based and unchanged.
    assigned = bsg_assign_native(rows, cols, TILE, win, LANES)
    if assigned is not None:
        mo_index, max_mo = assigned
        return mo_index, max(1, max_mo)
    # Greedy iterative matching: every round picks, per (t, b), at most
    # one remaining entry per row and per (a, r) — round count
    # approaches the max multiplicity (Konig: optimal = max degree for
    # bipartite graphs).
    t = rows // TILE
    a = (rows % TILE) // LANES
    g = cols // LANES
    r = cols % LANES
    b = g // win  # aligned win-row window bin
    nb = nx2 // win + 1
    tb = t * nb + b
    rkey = tb * np.int64(n_pad) + rows  # one entry per row per round
    skey = tb * np.int64(SUBL * LANES) + a * LANES + r  # per source pair
    rounds = np.full(rows.size, -1, dtype=np.int64)
    rem = np.arange(rows.size)
    it = 0
    while rem.size:
        # First remaining entry per row-group...
        _, fi = np.unique(rkey[rem], return_index=True)
        cand = rem[np.sort(fi)]
        # ...thinned to one per source-pair group.
        _, fj = np.unique(skey[cand], return_index=True)
        pick = cand[np.sort(fj)]
        rounds[pick] = it
        it += 1
        keep = np.ones(rem.size, dtype=bool)
        keep[np.searchsorted(rem, pick)] = False
        rem = rem[keep]

    # Dense micro-op id per tile from the (b, round) key.
    mo_key = b * np.int64(it) + rounds
    max_mo = 0
    mo_index = np.zeros(rows.size, dtype=np.int64)
    for ti in range(n_tiles):
        sel = t == ti
        if not sel.any():
            continue
        uk, inv = np.unique(mo_key[sel], return_inverse=True)
        mo_index[sel] = inv
        max_mo = max(max_mo, uk.size)
    return mo_index, max(1, max_mo)


def bsg_from_coo(
    rows,
    cols,
    data,
    n_rows: int,
    x_len: int,
    *,
    win: int = SUBL,
    storage: str = "auto",
) -> BSGMatrix:
    """Pack an arbitrary (possibly rectangular) COO pattern into BSG form.

    ``rows`` index the output space ``[0, n_rows)`` and ``cols`` the input
    space ``[0, x_len)``; no reordering is applied — both numberings are
    taken as given (callers supply internal/padded layouts).  Built for
    AMG grid transfers: with the coarse space relabeled by first
    appearance along the fine internal order, the tentative prolongator
    ``T`` (one entry per fine row, near-monotone columns) and the
    restriction ``T^T`` (contiguous-ish column runs per coarse row) both
    pack into a handful of micro-ops per tile, replacing the serialized
    ``jnp.take``/``segment_sum`` transfer pair (~9 ns/element on TPU — the
    dominant V-cycle cost at 3.2M rows) with bandwidth-rate shuffle
    gathers (SURVEY §7 "hard parts": unstructured gather/scatter).

    ``matvec`` input is any vector of length >= the padded input space
    (shorter inputs are zero-extended to ``nx2*128`` internally); output
    is the padded ``n_tiles*1024`` space.
    """
    if win % SUBL or not 0 < win <= 127:
        raise ValueError("win must be a multiple of 8 in [8, 127] (int8 qq)")
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    data = np.ascontiguousarray(data, np.float64)
    o = np.lexsort((cols, rows))
    rows, cols, data = rows[o], cols[o], data[o]
    n_tiles = max(1, -(-int(n_rows) // TILE))
    n_pad = n_tiles * TILE
    nx2 = -(-int(x_len) // LANES) + win  # zero guard rows for windows
    mo_index, max_mo = _assign_micro_ops(rows, cols, win, n_tiles, nx2, n_pad)
    if storage == "auto":
        from .dia import _bf16_exact

        if _int8_exact(data):
            storage = "int8"
        elif _bf16_exact(data):
            storage = "bfloat16"
        else:
            storage = "float32"
    n_slots = n_tiles * max_mo * TILE
    v_b = _value_bytes(storage)
    if (
        rows.size * (6 + v_b) < 0.8 * n_slots * (2 + v_b)
        and n_slots <= 2**31 - 1
    ):
        # Low fill: ship (index, value) pairs, scatter on device (same
        # byte-based gate as bsg_from_csr — the link dominates pack cost).
        t = rows // TILE
        a = (rows % TILE) // LANES
        l = rows % LANES
        g = cols // LANES
        r = cols % LANES
        b = g // win
        gmo = t * np.int64(max_mo) + mo_index
        w0 = np.zeros(n_tiles * max_mo, dtype=np.int32)
        w0[gmo] = (b * win).astype(np.int32)
        w0 = w0.reshape(n_tiles, max_mo)
        shape4 = (n_tiles, max_mo, SUBL, LANES)
        vals_j, rm, qq = _sparse_upload_1d(
            gmo * np.int64(SUBL), a, l, g, r, b, win, data, storage,
            n_slots, shape4,
        )
        return BSGMatrix(
            w0=jnp.asarray(w0),
            qq=qq,
            rm=rm,
            vals=vals_j,
            diag=jnp.zeros((n_pad,), jnp.float32),
            perm=None,
            n_rows=int(n_rows),
            n_tiles=n_tiles,
            max_mo=max_mo,
            nx2=nx2,
            storage=storage,
            win=win,
            x_len=int(x_len),
        )
    w0, qq, rm, vals, _diag = _bsg_fill_dense(
        rows, cols, data, mo_index, win, n_tiles, max_mo, n_pad
    )
    vals_j = jnp.asarray(vals)
    if vals_j.dtype != _storage_vdt(storage):
        vals_j = vals_j.astype(_storage_vdt(storage))
    return BSGMatrix(
        w0=jnp.asarray(w0),
        qq=jnp.asarray(qq),
        rm=jnp.asarray(rm),
        vals=vals_j,
        diag=jnp.zeros((n_pad,), jnp.float32),
        perm=None,
        n_rows=int(n_rows),
        n_tiles=n_tiles,
        max_mo=max_mo,
        nx2=nx2,
        storage=storage,
        win=win,
        x_len=int(x_len),
    )


def _sparse_upload_1d(base, a, l, g, r, b, win, data, storage, n_slots,
                      shape4, _mark=lambda name: None):
    """(index, value) upload + device scatter: the dense slot arrays
    are (1 - fill) zeros, and fill shrinks with scale.  Slot
    uniqueness: within a micro-op each output (a, l) appears at most
    once (vals/rm slots) and each source (a, r) at most once (qq
    slots) — the packer's conflict rules — so .at[].set has no
    duplicate collisions and the result is bit-identical to the
    dense fill (tests/test_bsg.py asserts it).  Upload is 8 B/nnz
    (10 for f32 values, 7 for integer-valued operators): slot index
    int32 + source lane int8 + window row int8 + value (int8 when every
    value is a small integer — the graph Laplacian — else bf16/f32 per
    the pre-resolved ``storage``); the output lane and the qq slot index
    are derived ON DEVICE (l = idx % 128, idx_q = idx - l + r) — the
    host->device link is the dominant pack cost at multi-M nnz on this
    tunneled environment."""
    idx_vl = jnp.asarray(((base + a) * LANES + l).astype(np.int32))
    r8 = jnp.asarray(r.astype(np.int8))
    qrow8 = jnp.asarray((g - b * win).astype(np.int8))
    vdt = _storage_vdt(storage)
    if (
        data.size
        and np.all(data == np.rint(data))
        and np.abs(data).max() <= 127
    ):
        vals_up = jnp.asarray(data.astype(np.int8))
    else:
        vals_up = jnp.asarray(data.astype(np.dtype(vdt)))
    jax.block_until_ready((idx_vl, r8, qrow8, vals_up))
    _mark("upload_h2d")
    l32 = jnp.remainder(idx_vl, LANES)
    idx_q = idx_vl - l32 + r8.astype(jnp.int32)
    vals = (
        jnp.zeros(n_slots, vdt)
        .at[idx_vl]
        .set(vals_up.astype(vdt))
        .reshape(shape4)
    )
    rm = jnp.zeros(n_slots, jnp.int8).at[idx_vl].set(r8).reshape(shape4)
    qq = (
        jnp.zeros(n_slots, jnp.int8)
        .at[idx_q]
        .set(qrow8)
        .reshape(shape4)
    )
    jax.block_until_ready((vals, rm, qq))
    _mark("scatter_dev")
    return vals, rm, qq


def _sparse_upload_2d(gmo, a, l, g, r, b, win, data, storage, m_tot, shape4):
    """Sparse (index, value) upload for slot spaces past int32: scatter
    into the 2-D (m_tot, 1024) view with (micro-op int32, in-tile slot
    int16) pairs, streamed in fixed-size segments through a donated jit
    buffer (peak HBM = final plane + one ~112 MB segment).  The last
    segment is padded with out-of-range micro-op ids, which scatter-drop
    (mode="drop") — one compile per plane dtype."""
    from functools import partial as _partial

    vdt = _storage_vdt(storage)
    mo = gmo.astype(np.int32)
    off = (a * LANES + l).astype(np.int16)
    offq = (a * LANES + r).astype(np.int16)
    qrow = (g - b * win).astype(np.int8)
    r8 = r.astype(np.int8)
    int_vals = bool(
        data.size
        and np.all(data == np.rint(data))
        and np.abs(data).max() <= 127
    )
    vhost = data.astype(np.int8) if int_vals else data.astype(np.dtype(vdt))

    @_partial(jax.jit, donate_argnums=(0,))
    def upd(buf, m, o, v):
        return buf.at[m, o].set(v.astype(buf.dtype), mode="drop")

    SEG = _UPLOAD_SEG
    n = mo.shape[0]

    def scatter(dtype, oidx, vals_h):
        buf = jnp.zeros((m_tot, TILE), dtype)
        for s in range(0, n, SEG):
            e = min(n, s + SEG)
            msl, osl, vsl = mo[s:e], oidx[s:e], vals_h[s:e]
            if e - s < SEG and n > SEG:
                pad = SEG - (e - s)
                msl = np.concatenate(
                    [msl, np.full(pad, m_tot, np.int32)]
                )
                osl = np.concatenate([osl, np.zeros(pad, osl.dtype)])
                vsl = np.concatenate([vsl, np.zeros(pad, vsl.dtype)])
            buf = upd(
                buf, jnp.asarray(msl), jnp.asarray(osl), jnp.asarray(vsl)
            )
        return buf.reshape(shape4)

    vals = scatter(vdt, off, vhost)
    rm = scatter(jnp.int8, off, r8)
    qq = scatter(jnp.int8, offq, qrow)
    jax.block_until_ready((vals, rm, qq))
    return vals, rm, qq


def _bsg_fill_dense(rows, cols, data, mo_index, win, n_tiles, max_mo, n_pad):
    """Dense host fill of the packed slot arrays (+ w0, diag): single-pass
    native kernel, NumPy fancy-scatter fallback."""
    from ..utils.native import bsg_fill_native

    filled = bsg_fill_native(
        rows, cols, data, mo_index, TILE, win, LANES, n_tiles, max_mo, n_pad
    )
    if filled is not None:
        w0, qq, rm, vals, diag = filled
    else:
        t = rows // TILE
        a = (rows % TILE) // LANES
        l = rows % LANES
        g = cols // LANES
        r = cols % LANES
        b = g // win
        w0 = np.zeros((n_tiles, max_mo), dtype=np.int32)
        qq = np.zeros((n_tiles, max_mo, SUBL, LANES), dtype=np.int8)
        rm = np.zeros((n_tiles, max_mo, SUBL, LANES), dtype=np.int8)
        vals = np.zeros((n_tiles, max_mo, SUBL, LANES), dtype=np.float32)

        w0[t, mo_index] = (b * win).astype(np.int32)
        vals[t, mo_index, a, l] = data.astype(np.float32)
        rm[t, mo_index, a, l] = r.astype(np.int8)
        qq[t, mo_index, a, r] = (g - b * win).astype(np.int8)

        # Diagonal (permuted space) for Jacobi-type preconditioners.
        diag = np.zeros(n_pad, dtype=np.float32)
        dmask = rows == cols
        diag[rows[dmask]] = data[dmask].astype(np.float32)
    return w0, qq, rm, vals, diag


def _spmv_kernel(max_mo, win, w0_ref, x_ref, qq_ref, rm_ref, v_ref, y_ref):
    import jax.experimental.pallas as pl

    acc = jnp.zeros((SUBL, LANES), jnp.float32)
    for m in range(max_mo):
        W = x_ref[pl.ds(w0_ref[0, 0, m], win), :]
        qq = qq_ref[0, m].astype(jnp.int32)
        t1 = _gather_window(W, qq, win)
        g = jnp.take_along_axis(t1, rm_ref[0, m].astype(jnp.int32), axis=1)
        acc = acc + v_ref[0, m].astype(jnp.float32) * g
    y_ref[0, :, :] = acc


def _gather_window(W, qq, win):
    """Two-level shuffle gather of one micro-op's window (shared by the
    dense and ragged kernels)."""
    if win == SUBL:
        return jnp.take_along_axis(W, qq, axis=0)
    # Mosaic refuses the direct cross-sublane-tile gather (trace
    # AssertionError): decompose into win/8 within-tile gathers +
    # selects.  The within-tile row (qq & 7) and tile id (qq >> 3) are
    # hoisted out of the per-tile loop — 3 VPU ops per sub-tile
    # (gather, compare, select) instead of 6; dense win=32 at 3.2M rows
    # was VPU-bound at ~12 ns/micro-op on the unhoisted form (byte time
    # 6.5 ns), so the hoist moves the wide-window configs toward the
    # bandwidth line instead of the shuffle line.
    qlo = jnp.bitwise_and(qq, SUBL - 1)
    qhi = jnp.right_shift(qq, 3)
    t1 = jnp.zeros((SUBL, LANES), jnp.float32)
    for s in range(win // SUBL):
        part = jnp.take_along_axis(W[s * SUBL : (s + 1) * SUBL], qlo, axis=0)
        t1 = jnp.where(qhi == s, part, t1)
    return t1


def _spmv_ragged_kernel(C, win, tmap_ref, w0_ref, x_ref, qq_ref, rm_ref,
                        v_ref, y_ref):
    """Grid step = one chunk of C micro-ops, all of one output tile.

    Chunks of a tile are consecutive grid steps (tmap is non-decreasing),
    so the output block stays VMEM-resident across revisits (sequential
    TPU grid) and is flushed once per tile; the first chunk of each tile
    initializes it.
    """
    import jax.experimental.pallas as pl

    c = pl.program_id(0)
    acc = jnp.zeros((SUBL, LANES), jnp.float32)
    for m in range(C):
        W = x_ref[pl.ds(w0_ref[0, 0, m], win), :]
        qq = qq_ref[0, m].astype(jnp.int32)
        t1 = _gather_window(W, qq, win)
        g = jnp.take_along_axis(t1, rm_ref[0, m].astype(jnp.int32), axis=1)
        acc = acc + v_ref[0, m].astype(jnp.float32) * g
    first = jnp.logical_or(
        c == 0, tmap_ref[c] != tmap_ref[jnp.maximum(c - 1, 0)]
    )

    @pl.when(first)
    def _init():
        y_ref[0, :, :] = acc

    @pl.when(jnp.logical_not(first))
    def _accum():
        y_ref[0, :, :] = y_ref[0, :, :] + acc


def _bsg_spmv_ragged(A: BSGMatrix, x2: jax.Array, interpret: bool) -> jax.Array:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks, C = A.w0.shape
    # Unit middle axis on the blocked SMEM w0: same Mosaic trailing-dims
    # block rule workaround as the dense kernel below (commit 89adcab) —
    # a (1, C) block on a 2-D array is refused when C isn't lane-tiled.
    w0_3 = A.w0[:, None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # tmap: chunk -> output tile
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, C), lambda c, tmap: (c, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x2 resident
            pl.BlockSpec((1, C, SUBL, LANES), lambda c, tmap: (c, 0, 0, 0)),
            pl.BlockSpec((1, C, SUBL, LANES), lambda c, tmap: (c, 0, 0, 0)),
            pl.BlockSpec((1, C, SUBL, LANES), lambda c, tmap: (c, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, SUBL, LANES), lambda c, tmap: (tmap[c], 0, 0)
        ),
    )
    with jax.enable_x64(False):
        y = pl.pallas_call(
            partial(_spmv_ragged_kernel, C, A.win),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (A.n_tiles, SUBL, LANES), jnp.float32
            ),
            interpret=interpret,
        )(A.tmap, w0_3, x2, A.qq, A.rm, A.vals)
    return y


@partial(jax.jit, static_argnames=("interpret",))
def bsg_spmv(A: BSGMatrix, x_padded: jax.Array, *, interpret: bool = False) -> jax.Array:
    """y = A @ x, both in the internal padded space, f32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x2 = _as_x2(A, x_padded.astype(jnp.float32))
    if A.tmap is not None:
        y = _bsg_spmv_ragged(A, x2, interpret)
        return y.reshape(A.n_pad).astype(x_padded.dtype)
    # w0 is a per-tile-blocked SMEM input, NOT a scalar-prefetch operand:
    # prefetch operands live wholly in SMEM (1 MB), and (n_tiles, max_mo)
    # int32 outgrows it at ~1M rows (3.2 MB at 3.2M DOF — observed
    # "Allocation would exceed memory (space=smem)" compile failure).
    # Blocked, each grid step holds only its tile's max_mo window starts.
    # The unit middle axis satisfies the last-two-dims block rule (the
    # block's trailing dims must equal the array's when not (8, 128)-
    # divisible).
    w0_3 = A.w0[:, None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(A.n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, A.max_mo), lambda t: (t, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x2 resident
            pl.BlockSpec((1, A.max_mo, SUBL, LANES), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, A.max_mo, SUBL, LANES), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, A.max_mo, SUBL, LANES), lambda t: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, SUBL, LANES), lambda t: (t, 0, 0)),
    )
    # x64=False during kernel trace: Mosaic's convert lowering recurses on
    # the f64-intermediate casts x64 tracing inserts (see stencil_kernel).
    with jax.enable_x64(False):
        y = pl.pallas_call(
            partial(_spmv_kernel, A.max_mo, A.win),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A.n_tiles, SUBL, LANES), jnp.float32),
            interpret=interpret,
        )(w0_3, x2, A.qq, A.rm, A.vals)
    return y.reshape(A.n_pad).astype(x_padded.dtype)
