"""PDE problem definitions ("model families" of the framework)."""

from .heat import HeatSystem, assemble_heat_system, unique_element_edges
from .laplacian import assemble_full_laplacian

__all__ = [
    "HeatSystem",
    "assemble_heat_system",
    "unique_element_edges",
    "assemble_full_laplacian",
]
