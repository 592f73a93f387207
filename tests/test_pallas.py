"""Pallas kernel tests (interpreter mode on CPU; compiled path on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domain_decomposed_pde_solver_tpu.io import box_mesh
from domain_decomposed_pde_solver_tpu.models import assemble_heat_system
from domain_decomposed_pde_solver_tpu.ops import dia_from_csr, pad_vector
from domain_decomposed_pde_solver_tpu.ops.pallas.dia_kernel import dia_spmv_pallas


@pytest.mark.parametrize("chunk", [128, 256, 1024])
def test_dia_pallas_matches_jnp(chunk):
    mesh = box_mesh(9, 8, 7, elem_type="TETRA4")
    sys_ = assemble_heat_system(mesh)
    A = dia_from_csr(sys_.A, dtype=jnp.float32)
    x = pad_vector(
        np.random.default_rng(0).standard_normal(A.n_pad).astype(np.float32),
        A.n_pad,
    )
    y_ref = np.asarray(A.matvec(x))
    y_pl = np.asarray(dia_spmv_pallas(A, x, chunk=chunk, interpret=True))
    np.testing.assert_allclose(y_pl, y_ref, rtol=1e-5, atol=1e-5)


def test_dia_pallas_hex():
    mesh = box_mesh(6, 6, 6, elem_type="HEX8")
    sys_ = assemble_heat_system(mesh)
    A = dia_from_csr(sys_.A, dtype=jnp.float32)
    x = pad_vector(
        np.random.default_rng(1).standard_normal(A.n_pad).astype(np.float32),
        A.n_pad,
    )
    np.testing.assert_allclose(
        np.asarray(dia_spmv_pallas(A, x, chunk=256, interpret=True)),
        np.asarray(A.matvec(x)),
        rtol=1e-5,
        atol=1e-5,
    )
