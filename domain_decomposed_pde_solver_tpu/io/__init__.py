"""Mesh I/O: Exodus-II (netCDF3) ingest/egress and the in-memory mesh model."""

from .mesh import ElemBlock, MeshModel, NodeSet, SideSet, elem_type_ncommon
from .exodus import (
    ExodusSolutionWriter,
    read_exodus,
    read_nodal_vars,
    write_exodus,
)

__all__ = [
    "ElemBlock",
    "MeshModel",
    "NodeSet",
    "SideSet",
    "elem_type_ncommon",
    "read_exodus",
    "write_exodus",
    "read_nodal_vars",
    "ExodusSolutionWriter",
]
