"""Synthetic structured box meshes (HEX8 / TETRA4) as MeshModel.

The bundled reference meshes top out at ~112k elements; the performance
targets (BASELINE configs 3/5) need 1M-10M-DOF problems.  This generator
produces Cubit-style box meshes of any size with Dirichlet nodesets on the
x-min / x-max faces — the same shape of problem as ``tet-cube-heat.exo``
(two opposing-face nodesets), at arbitrary scale, with no file I/O.
"""

from __future__ import annotations

import numpy as np

from .mesh import ElemBlock, MeshModel, NodeSet

__all__ = ["box_mesh"]

# Corner offsets of the 5-tet decomposition of a unit hex (parity-alternated
# to make faces conformal between neighboring hexes).
_TET5_EVEN = [
    (0, 1, 2, 5),
    (0, 2, 3, 7),
    (0, 5, 7, 4),
    (2, 7, 5, 6),
    (0, 2, 7, 5),
]
_TET5_ODD = [
    (1, 3, 0, 4),
    (1, 2, 3, 6),
    (1, 6, 4, 5),
    (3, 4, 6, 7),
    (1, 3, 6, 4),
]


def box_mesh(
    nx: int,
    ny: int,
    nz: int,
    elem_type: str = "HEX8",
    bc_ids=(100, 1000),
    title: str = "generated box mesh",
) -> MeshModel:
    """Structured box of ``nx*ny*nz`` cells on [0,1]^3.

    ``elem_type``: ``"HEX8"`` (one hex per cell) or ``"TETRA4"`` (5 tets per
    cell, parity-alternated).  Nodesets: ``bc_ids[0]`` on the x=0 face,
    ``bc_ids[1]`` on the x=1 face (cf. tet-cube-heat's two 645-node sets).
    """
    mx, my, mz = nx + 1, ny + 1, nz + 1
    # Node numbering: x fastest (node id = i + j*mx + k*mx*my).
    xs = np.linspace(0.0, 1.0, mx)
    ys = np.linspace(0.0, 1.0, my)
    zs = np.linspace(0.0, 1.0, mz)
    ii, jj, kk = np.meshgrid(
        np.arange(mx), np.arange(my), np.arange(mz), indexing="ij"
    )
    nid = ii + jj * mx + kk * mx * my
    coords = np.zeros((mx * my * mz, 3))
    coords[nid.ravel(), 0] = xs[ii.ravel()]
    coords[nid.ravel(), 1] = ys[jj.ravel()]
    coords[nid.ravel(), 2] = zs[kk.ravel()]

    # Cell corner nodes, standard HEX8 ordering (bottom CCW, then top CCW).
    ci, cj, ck = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    ci, cj, ck = ci.ravel(), cj.ravel(), ck.ravel()

    def node(i, j, k):
        return i + j * mx + k * mx * my

    corners = np.stack(
        [
            node(ci, cj, ck),
            node(ci + 1, cj, ck),
            node(ci + 1, cj + 1, ck),
            node(ci, cj + 1, ck),
            node(ci, cj, ck + 1),
            node(ci + 1, cj, ck + 1),
            node(ci + 1, cj + 1, ck + 1),
            node(ci, cj + 1, ck + 1),
        ],
        axis=1,
    )  # (ncells, 8)

    if elem_type.upper().startswith("HEX"):
        conn = corners
        et = "HEX8"
    else:
        parity = (ci + cj + ck) % 2
        conn = np.zeros((corners.shape[0], 5, 4), dtype=np.int64)
        for t, tet in enumerate(_TET5_EVEN):
            conn[parity == 0, t] = corners[parity == 0][:, tet]
        for t, tet in enumerate(_TET5_ODD):
            conn[parity == 1, t] = corners[parity == 1][:, tet]
        conn = conn.reshape(-1, 4)
        et = "TETRA4"

    i_all = np.arange(mx * my * mz)
    x_of = i_all % mx
    ns_lo = i_all[x_of == 0]
    ns_hi = i_all[x_of == nx]
    mesh = MeshModel(
        coords=coords,
        blocks=[ElemBlock(id=1, elem_type=et, conn=conn, name="box")],
        node_sets=[
            NodeSet(id=int(bc_ids[0]), nodes=ns_lo, name="xmin"),
            NodeSet(id=int(bc_ids[1]), nodes=ns_hi, name="xmax"),
        ],
        title=title,
        num_dim=3,
    )
    mesh.validate()
    return mesh
