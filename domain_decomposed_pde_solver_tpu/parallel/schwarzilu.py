"""Additive-Schwarz ILU(0)/ILUT: the literal distributed analogue of the
reference's production preconditioner.

What ``mpirun``-ed Ifpack2 ILUT actually does is factor each rank's LOCAL
diagonal block and apply the triangular solves with no inter-rank
communication (``BelosMueLuSolver.cpp:92-97`` — Ifpack2's ILUT is a
process-local factorization; the coupling between ranks exists only in the
Belos matvec).  This module reproduces exactly that under ``shard_map``:

- setup (host): each part's (owned x owned) diagonal block is extracted from
  the halo plan and factored with the framework's own ILU(0)/ILUT
  (:mod:`..solvers.precond.ilu` — native C++ factorization, level-scheduled
  device triangular sweeps);
- the P per-part :class:`ILU0Preconditioner` pytrees are padded to common
  static shapes and stacked with a leading part axis, so the SPMD program is
  uniform across devices (same recipe as :func:`.schwarz.build_block_amg`);
- apply (device): pass the stacked pytree as ``block_precond`` to
  :func:`.sharded.sharded_cg_solve` / :func:`.sharded.sharded_gmres_solve`;
  the shard_map body slices ``leaf[0]`` and the level-scheduled sweep runs
  per device with zero preconditioner communication.

Iteration counts sit above single-device ILUT (the dropped inter-part
couplings weaken the factorization as P grows — the classical additive-
Schwarz trade, identical to what the reference pays under mpirun) and below
Jacobi; measured rows live in docs/PERF.md.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.csr import CSRMatrix
from ..solvers.precond.ilu import (
    ILU0Preconditioner,
    ilu0_preconditioner,
    ilut_preconditioner,
)
from .halo import HaloPlan
from .schwarz import _local_diagonal_block

__all__ = ["build_block_ilu"]


def _pad_stack_side(parts, prefix: str, n_local: int):
    """Pad one triangular side (l or u) of P per-part preconditioners to
    common static shapes and stack along a new leading part axis.

    Safe paddings (see ``ilu._tri_sweep``): extra window rows are masked by
    ``count`` and write to the dump slot; extra levels get count 0; the
    solve-order arrays are extended so every ``dynamic_slice`` window stays
    in-bounds without clamping (a clamped start would misalign the mask).
    """
    win_c = max(getattr(m, f"{prefix}_win") for m in parts)
    nlev_c = max(getattr(m, f"{prefix}_nlev") for m in parts)
    K_c = max(np.asarray(getattr(m, f"{prefix}_cols")).shape[1] for m in parts)
    R_c = n_local + max(win_c - 1, 0)
    cols_s, vals_s, rows_s, starts_s, counts_s = [], [], [], [], []
    for m in parts:
        c = np.asarray(getattr(m, f"{prefix}_cols"))
        v = np.asarray(getattr(m, f"{prefix}_vals"))
        r = np.asarray(getattr(m, f"{prefix}_rows"))
        s = np.asarray(getattr(m, f"{prefix}_starts"))
        cnt = np.asarray(getattr(m, f"{prefix}_counts"))
        oc = np.zeros((R_c, K_c), c.dtype)
        oc[: c.shape[0], : c.shape[1]] = c
        ov = np.zeros((R_c, K_c), v.dtype)
        ov[: v.shape[0], : v.shape[1]] = v
        orow = np.full(R_c, n_local, r.dtype)  # dump slot = n_pad
        orow[: r.shape[0]] = r
        os_ = np.zeros(nlev_c, s.dtype)
        os_[: s.shape[0]] = s
        ocnt = np.zeros(nlev_c, cnt.dtype)
        ocnt[: cnt.shape[0]] = cnt
        cols_s.append(oc)
        vals_s.append(ov)
        rows_s.append(orow)
        starts_s.append(os_)
        counts_s.append(ocnt)
    return (
        jnp.asarray(np.stack(cols_s)),
        jnp.asarray(np.stack(vals_s)),
        jnp.asarray(np.stack(rows_s)),
        jnp.asarray(np.stack(starts_s)),
        jnp.asarray(np.stack(counts_s)),
        int(win_c),
        int(nlev_c),
    )


def build_block_ilu(
    A: CSRMatrix,
    plan: HaloPlan,
    dtype=jnp.float32,
    kind: str = "ilut",
    fill_factor: float = 1.0,
    droptol: float = 0.0,
) -> Optional[ILU0Preconditioner]:
    """Stacked per-part ILU(0)/ILUT preconditioners (leading axis = part).

    ``kind``: ``"ilut"`` (the reference's Ifpack2 defaults: level-of-fill
    1.0, drop tol 0 — ``BelosMueLuSolver.cpp:92-97``) or ``"ilu0"``.
    Returns an :class:`ILU0Preconditioner` whose data leaves carry a leading
    part axis; pass as ``block_precond`` to the sharded solvers.  Returns
    None when a part's local block hits a zero pivot (fall back to Jacobi).
    """
    rows = np.repeat(np.arange(A.n_rows), A.row_lengths())
    pr = plan.part_of_row[rows]
    pc = plan.part_of_row[A.indices]
    parts = []
    for p in range(plan.nparts):
        local = _local_diagonal_block(A, plan, p, rows, pr, pc)
        try:
            if kind == "ilut":
                m = ilut_preconditioner(
                    local, n_pad=plan.n_local, dtype=dtype,
                    fill_factor=fill_factor, droptol=droptol,
                )
            elif kind == "ilu0":
                m = ilu0_preconditioner(local, n_pad=plan.n_local, dtype=dtype)
            else:
                raise ValueError(f"unknown ILU kind: {kind!r}")
        except ZeroDivisionError:
            return None
        parts.append(m)

    lc, lv, lr, ls, lcnt, lwin, lnlev = _pad_stack_side(parts, "l", plan.n_local)
    uc, uv, ur, us, ucnt, uwin, unlev = _pad_stack_side(parts, "u", plan.n_local)
    inv_d = jnp.stack([m.inv_diag for m in parts])
    return ILU0Preconditioner(
        l_cols=lc, l_vals=lv, l_rows=lr, l_starts=ls, l_counts=lcnt,
        u_cols=uc, u_vals=uv, u_rows=ur, u_starts=us, u_counts=ucnt,
        inv_diag=inv_d,
        n_pad=int(plan.n_local), l_win=lwin, u_win=uwin,
        l_nlev=lnlev, u_nlev=unlev,
    )
