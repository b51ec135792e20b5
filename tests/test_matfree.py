"""Matrix-free DCA operator: exact equivalence with the stored stencil."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.stencil import apply_stencil
from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes
from multigridanisotropicdiffusion_tpu.models.mad import MADConfig, mad_diffusion
from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
from multigridanisotropicdiffusion_tpu.ops.matfree import MatrixFreeDCAOperator
from multigridanisotropicdiffusion_tpu.ops.smoothers import (
    jacobi_sweep,
    rb_gauss_seidel_sweep,
)

from .conftest import make_spd_tensor_field


@pytest.mark.parametrize(
    "shape,spacing",
    [
        ((7, 6), (1.0, 1.0)),
        ((8, 9), (0.5, 2.0)),
        ((6, 7, 8), (1.0, 0.5, 2.0)),
        ((7, 7, 7), (0.3125, 0.3125, 0.5)),
    ],
)
def test_matfree_apply_matches_stored(rng, shape, spacing):
    ndim = len(shape)
    tensor = make_spd_tensor_field(rng, shape, ndim)
    planes = as_sym_planes(tensor, shape)
    dt = 0.1

    stored = assemble_dca(planes, spacing, dt)
    mf = MatrixFreeDCAOperator(
        tuple(jnp.asarray(p) for p in planes), spacing, dt
    )

    x = jnp.asarray(rng.normal(size=shape))
    np.testing.assert_allclose(
        np.asarray(mf.apply(x)), np.asarray(apply_stencil(stored, x)),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(mf.diag), np.asarray(stored.diag), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(mf.offdiag_apply(x)),
        np.asarray(apply_stencil(stored, x)) - np.asarray(stored.diag * x),
        rtol=1e-11, atol=1e-11,
    )


def test_matfree_smoothers_match_stored(rng):
    shape = (9, 8)
    tensor = make_spd_tensor_field(rng, shape, 2)
    planes = as_sym_planes(tensor, shape)
    stored = assemble_dca(planes, (1.0, 1.0), 0.1)
    mf = MatrixFreeDCAOperator(tuple(jnp.asarray(p) for p in planes), (1.0, 1.0), 0.1)

    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    np.testing.assert_allclose(
        np.asarray(jacobi_sweep(mf, x, b)),
        np.asarray(jacobi_sweep(stored, x, b)),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(rb_gauss_seidel_sweep(mf, x, b)),
        np.asarray(rb_gauss_seidel_sweep(stored, x, b)),
        rtol=1e-12, atol=1e-12,
    )


@pytest.mark.parametrize("coarse_operator", ["dca", "galerkin"])
def test_matfree_solve_matches_stored(rng, coarse_operator):
    shape = (33, 32)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    image = rng.normal(size=shape) * 100.0

    res_s = mad_diffusion(
        image, tensor,
        config=MADConfig(time_step=0.1, tolerance=1e-10, coarse_operator=coarse_operator),
    )
    res_m = mad_diffusion(
        image, tensor,
        config=MADConfig(
            time_step=0.1, tolerance=1e-10, coarse_operator=coarse_operator,
            matrix_free=True,
        ),
    )
    assert float(res_m.final_residual[0]) <= 1e-10
    assert int(res_m.num_cycles[0]) == int(res_s.num_cycles[0])
    np.testing.assert_allclose(
        np.asarray(res_m.output), np.asarray(res_s.output), rtol=1e-10, atol=1e-10
    )


def test_matfree_3d_solve(rng):
    shape = (13, 12, 14)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    image = rng.normal(size=shape) * 10.0
    res = mad_diffusion(
        image, tensor, spacing=(1.0, 0.5, 2.0),
        config=MADConfig(time_step=0.1, tolerance=1e-10, matrix_free=True),
    )
    assert float(res.final_residual[0]) <= 1e-10
