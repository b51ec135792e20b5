"""Chebyshev polynomial smoother (beyond-parity feature)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.stencil import densify, l2_norm, residual
from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes
from multigridanisotropicdiffusion_tpu.models.mad import MADConfig, mad_diffusion
from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
from multigridanisotropicdiffusion_tpu.ops.smoothers import chebyshev_smoother

from .conftest import make_spd_tensor_field


def test_chebyshev_reduces_residual(rng):
    shape = (16, 17)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    op = assemble_dca(as_sym_planes(tensor, shape), (1.0, 1.0), 0.1)
    b = jnp.asarray(rng.normal(size=shape))
    x = jnp.asarray(rng.normal(size=shape))
    r0 = float(l2_norm(residual(op, x, b)))
    for _ in range(5):
        x = chebyshev_smoother(op, x, b)
    r = float(l2_norm(residual(op, x, b)))
    assert r < 0.05 * r0


def test_chebyshev_fixed_point(rng):
    shape = (9, 8)
    tensor = make_spd_tensor_field(rng, shape, 2)
    op = assemble_dca(as_sym_planes(tensor, shape), (1.0, 1.0), 0.1)
    a = np.asarray(densify(op))
    x_exact = rng.normal(size=shape)
    b = jnp.asarray((a @ x_exact.ravel()).reshape(shape))
    out = chebyshev_smoother(op, jnp.asarray(x_exact), b)
    np.testing.assert_allclose(np.asarray(out), x_exact, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("ndim,shape", [(2, (33, 32)), (3, (13, 12, 14))])
def test_chebyshev_vcycle_converges(rng, ndim, shape):
    tensor = make_spd_tensor_field(rng, shape, ndim, hi=3.0)
    image = rng.normal(size=shape) * 100.0
    res = mad_diffusion(
        image, tensor,
        config=MADConfig(time_step=0.1, tolerance=1e-10, smoother="chebyshev"),
    )
    assert float(res.final_residual[0]) <= 1e-10
    # and it should be competitive with red-black GS in cycle count
    res_gs = mad_diffusion(
        image, tensor,
        config=MADConfig(time_step=0.1, tolerance=1e-10, smoother="gauss_seidel"),
    )
    assert int(res.num_cycles[0]) <= int(res_gs.num_cycles[0]) + 3


def test_chebyshev_halo_solve_matches_single_device(rng):
    """Distributed Chebyshev smoothing (halo='overlap'): one exchange per
    apply plus a global pmax for the Gershgorin bound — must match the
    single-device Chebyshev solve exactly (VERDICT r2 item 7a)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import dataclasses

    from multigridanisotropicdiffusion_tpu.parallel.sharding import make_grid_mesh

    shape = (16, 16, 16)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    image = rng.normal(size=shape) * 10.0
    base = MADConfig(time_step=0.1, tolerance=1e-9, max_cycles=30,
                     smoother="chebyshev")
    ref = mad_diffusion(image, tensor, config=base)
    mesh = make_grid_mesh(3, mesh_shape=(2, 2, 2))
    cfg = dataclasses.replace(base, halo="overlap")
    got = mad_diffusion(image, tensor, config=cfg, mesh=mesh, min_local=4)
    assert int(got.num_cycles[0]) == int(ref.num_cycles[0])
    np.testing.assert_allclose(
        np.asarray(got.output), np.asarray(ref.output),
        rtol=1e-10, atol=1e-10,
    )
