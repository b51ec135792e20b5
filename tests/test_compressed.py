"""Compressed DCA operator: exact equivalence with the stored stencil."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.stencil import apply_stencil
from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes
from multigridanisotropicdiffusion_tpu.models.mad import MADConfig, mad_diffusion
from multigridanisotropicdiffusion_tpu.ops.compressed import assemble_compressed_dca
from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
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
def test_compressed_matches_stored(rng, shape, spacing):
    ndim = len(shape)
    tensor = make_spd_tensor_field(rng, shape, ndim)
    planes = as_sym_planes(tensor, shape)
    dt = 0.1
    stored = assemble_dca(planes, spacing, dt)
    comp = assemble_compressed_dca(
        tuple(jnp.asarray(p) for p in planes), spacing, dt
    )

    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    np.testing.assert_allclose(
        np.asarray(comp.apply(x)), np.asarray(apply_stencil(stored, x)),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(comp.diag), np.asarray(stored.diag))
    np.testing.assert_allclose(
        np.asarray(rb_gauss_seidel_sweep(comp, x, b)),
        np.asarray(rb_gauss_seidel_sweep(stored, x, b)),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(jacobi_sweep(comp, x, b)),
        np.asarray(jacobi_sweep(stored, x, b)),
        rtol=1e-12, atol=1e-12,
    )


def test_compressed_plane_count(rng):
    shape = (6, 7, 8)
    tensor = make_spd_tensor_field(rng, shape, 3)
    comp = assemble_compressed_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    # 3D: 2*3 face + 3 mixed + 1 diag = 10 planes (vs 19 stored)
    assert len(comp.face_p) + len(comp.face_m) + len(comp.mixed) + 1 == 10


@pytest.mark.parametrize("coarse_operator", ["dca", "galerkin"])
def test_compressed_solve_matches_stored(rng, coarse_operator):
    shape = (33, 32)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    image = rng.normal(size=shape) * 100.0

    res_s = mad_diffusion(
        image, tensor,
        config=MADConfig(time_step=0.1, tolerance=1e-10, coarse_operator=coarse_operator),
    )
    res_c = mad_diffusion(
        image, tensor,
        config=MADConfig(
            time_step=0.1, tolerance=1e-10, coarse_operator=coarse_operator,
            operator_repr="compressed",
        ),
    )
    assert float(res_c.final_residual[0]) <= 1e-10
    assert int(res_c.num_cycles[0]) == int(res_s.num_cycles[0])
    np.testing.assert_allclose(
        np.asarray(res_c.output), np.asarray(res_s.output), rtol=1e-10, atol=1e-10
    )


def test_compressed_3d_solve(rng):
    shape = (13, 12, 14)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    image = rng.normal(size=shape) * 10.0
    res = mad_diffusion(
        image, tensor, spacing=(1.0, 0.5, 2.0),
        config=MADConfig(time_step=0.1, tolerance=1e-10, operator_repr="compressed"),
    )
    assert float(res.final_residual[0]) <= 1e-10
