"""SPMD distribution tests on the 8-device virtual CPU mesh.

The key oracle (SURVEY.md §4): same math, different partitioning ==> same
residual trajectory and same solution to fp tolerance.  This doubles as the
halo-exchange correctness check — XLA's SPMD partitioner inserts the halos for
the shifted-slice stencils, and any mismatch would corrupt boundary voxels.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.models.mad import MADConfig, mad_diffusion
from multigridanisotropicdiffusion_tpu.parallel.sharding import (
    factorize_devices,
    field_sharding,
    level_spec,
    make_grid_mesh,
)

from .conftest import make_spd_tensor_field

needs_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_factorize_devices():
    assert factorize_devices(8, 2) == (4, 2)
    assert factorize_devices(8, 3) == (2, 2, 2)
    assert factorize_devices(4, 2) == (2, 2)
    assert factorize_devices(1, 2) == (1, 1)
    assert factorize_devices(6, 2) == (3, 2)


@needs_8_devices
def test_level_spec_agglomeration():
    mesh = make_grid_mesh(2, mesh_shape=(4, 2))
    # 64/4=16 and 64/2=32 >= 8 -> fully sharded
    assert level_spec(mesh, (64, 64), 8) == jax.sharding.PartitionSpec("x", "y")
    # 16/4=4 < 8 -> axis x replicated; 16/2=8 >= 8 -> y sharded
    assert level_spec(mesh, (16, 16), 8) == jax.sharding.PartitionSpec(None, "y")
    # coarsest: fully replicated
    assert level_spec(mesh, (8, 8), 8) == jax.sharding.PartitionSpec(None, None)


@needs_8_devices
@pytest.mark.parametrize("ndim,shape,mesh_shape", [
    (2, (64, 64), (4, 2)),
    (2, (65, 48), (4, 2)),       # odd size: uneven shards
    (3, (24, 25, 24), (2, 2, 2)),
])
def test_sharded_solve_matches_single_device(rng, ndim, shape, mesh_shape):
    tensor = make_spd_tensor_field(rng, shape, ndim, hi=3.0)
    image = rng.normal(size=shape) * 10.0
    config = MADConfig(time_step=0.1, tolerance=1e-10, max_cycles=50)

    ref = mad_diffusion(image, tensor, config=config)

    mesh = make_grid_mesh(ndim, mesh_shape=mesh_shape)
    got = mad_diffusion(image, tensor, config=config, mesh=mesh, min_local=4)

    assert int(got.num_cycles[0]) == int(ref.num_cycles[0])
    np.testing.assert_allclose(
        np.asarray(got.output), np.asarray(ref.output), rtol=1e-12, atol=1e-12
    )
    n = int(ref.num_cycles[0])
    # atol floor: residuals below ~1e-11 are at the f64 noise floor of the
    # problem scale, where SPMD reduction order legitimately differs.
    np.testing.assert_allclose(
        np.asarray(got.residual_history[0][:n]),
        np.asarray(ref.residual_history[0][:n]),
        rtol=1e-9,
        atol=1e-11,
    )


@needs_8_devices
@pytest.mark.parametrize("halo", ["shard_map", "overlap"])
@pytest.mark.parametrize("cycle,smoother", [
    ("vcycle", "gauss_seidel"),
    ("fmg", "gauss_seidel"),
    ("vcycle", "weighted_jacobi"),
])
def test_halo_mode_solve_matches_single_device(rng, halo, cycle, smoother):
    """Explicit shard_map/overlapped halo exchange produces the same solve as
    the single-device path — the full-solve oracle for parallel.halo."""
    shape = (24, 24, 16)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    image = rng.normal(size=shape) * 10.0
    config = MADConfig(
        time_step=0.1, tolerance=1e-10, max_cycles=50, cycle=cycle,
        smoother=smoother,
    )

    ref = mad_diffusion(image, tensor, config=config)

    mesh = make_grid_mesh(3, mesh_shape=(2, 2, 2))
    cfg_halo = MADConfig(
        time_step=0.1, tolerance=1e-10, max_cycles=50, cycle=cycle,
        smoother=smoother, halo=halo,
    )
    got = mad_diffusion(image, tensor, config=cfg_halo, mesh=mesh, min_local=4)

    assert int(got.num_cycles[0]) == int(ref.num_cycles[0])
    np.testing.assert_allclose(
        np.asarray(got.output), np.asarray(ref.output), rtol=1e-11, atol=1e-11
    )


@needs_8_devices
@pytest.mark.parametrize("halo", ["shard_map", "overlap"])
def test_halo_galerkin_radius2_matches_single_device(rng, halo):
    """Galerkin coarse operators reach stencil radius 2 under cell centering;
    the explicit-halo path must exchange radius-thick halos on those levels
    (regression: 1-voxel halos broke the 32^3 three-level hierarchy, whose
    middle 16^3 level is a radius-2 Galerkin operator under smoothing)."""
    shape = (32, 32, 32)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    image = rng.normal(size=shape) * 10.0
    base = MADConfig(
        time_step=0.05, tolerance=1e-8, max_cycles=30,
        coarse_operator="galerkin", galerkin_variant="exact",
    )
    ref = mad_diffusion(image, tensor, config=base)

    mesh = make_grid_mesh(3, mesh_shape=(2, 2, 2))
    cfg = dataclasses.replace(base, halo=halo)
    got = mad_diffusion(image, tensor, config=cfg, mesh=mesh, min_local=4)

    assert int(got.num_cycles[0]) == int(ref.num_cycles[0])
    np.testing.assert_allclose(
        np.asarray(got.output), np.asarray(ref.output), rtol=1e-11, atol=1e-11
    )


@needs_8_devices
def test_ved_sharded_matches_single_device():
    """The full VED pipeline (Hessian, eig, vesselness, tensor, diffusion)
    distributes over the mesh and matches the single-device result."""
    from multigridanisotropicdiffusion_tpu.models.ved import VEDConfig, ved

    n = 24
    coords = np.meshgrid(*[np.arange(n, dtype=float)] * 3, indexing="ij")
    c = (n - 1) / 2
    vol = 100.0 * np.exp(
        -((coords[1] - c) ** 2 + (coords[2] - c) ** 2) / (2 * 1.5**2)
    )
    vol += np.random.default_rng(5).normal(scale=1.0, size=vol.shape)
    cfg = VEDConfig(
        iterations=1, diffusion_iterations=2, scales=(1.0, 2.0),
        time_step=0.1, tolerance=1e-8,
    )
    ref = ved(vol, config=cfg)
    mesh = make_grid_mesh(3, mesh_shape=(2, 2, 2))
    got = ved(vol, config=cfg, mesh=mesh, min_local=4)
    np.testing.assert_allclose(
        np.asarray(got.vesselness), np.asarray(ref.vesselness),
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(got.output), np.asarray(ref.output), rtol=1e-10, atol=1e-10
    )


@needs_8_devices
def test_sharded_output_sharding(rng):
    """The solution comes back sharded over the mesh (no silent gather)."""
    shape = (64, 64)
    tensor = make_spd_tensor_field(rng, shape, 2)
    image = rng.normal(size=shape)
    mesh = make_grid_mesh(2, mesh_shape=(4, 2))
    res = mad_diffusion(
        image, tensor, config=MADConfig(tolerance=1e-8), mesh=mesh, min_local=8
    )
    out_sharding = res.output.sharding
    assert out_sharding.is_equivalent_to(field_sharding(mesh, shape, 8), 2)


@needs_8_devices
@pytest.mark.parametrize("cycle", ["vcycle", "fmg"])
def test_distributed_pallas_fast_path_matches_single(rng, cycle):
    """The distributed fast path — compressed operator + fused Pallas block
    kernels inside shard_map, overlapped halo exchange (the north-star
    config, VERDICT r1 item 1) — matches the plain single-device solve."""
    shape = (16, 16, 16)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    image = rng.normal(size=shape) * 10.0

    ref = mad_diffusion(
        image, tensor,
        config=MADConfig(time_step=0.1, tolerance=1e-9, max_cycles=60,
                         cycle=cycle),
    )
    cfg = MADConfig(
        time_step=0.1, tolerance=1e-9, max_cycles=60, cycle=cycle,
        operator_repr="compressed", use_pallas=True, halo="overlap",
    )
    mesh = make_grid_mesh(3, mesh_shape=(2, 2, 2))
    got = mad_diffusion(image, tensor, config=cfg, mesh=mesh, min_local=4)

    assert int(got.num_cycles[0]) == int(ref.num_cycles[0])
    np.testing.assert_allclose(
        np.asarray(got.output), np.asarray(ref.output), rtol=1e-8, atol=1e-8
    )


def test_multihost_entry_points_single_process():
    """Multi-host entry points degrade gracefully in a single process:
    initialize is a no-op, the mesh equals the plain spatial mesh (the
    2-host DCN-major launch protocol is documented on the functions)."""
    from multigridanisotropicdiffusion_tpu.parallel.sharding import (
        initialize_multihost,
        make_multihost_grid_mesh,
    )

    initialize_multihost()  # no-op single-process
    mesh = make_multihost_grid_mesh(3)
    assert mesh.axis_names == ("x", "y", "z")
    assert int(np.prod(tuple(mesh.shape.values()))) == len(jax.devices())


@needs_8_devices
def test_distributed_collapsed_galerkin_pallas_matches_single(rng):
    """Collapsed Galerkin coarse levels are radius-1 stored operators: they
    must ride the generic Pallas fast path inside shard_map and match the
    plain single-device collapsed-Galerkin solve.

    16^3 rather than 32^3: the 3-level 32^3 variant of this solver program
    reproducibly segfaults XLA's CPU *compiler* when built late in a
    full-suite process (it compiles and passes in a fresh process — see
    dryrun stage 4 and the standalone run); the 2-level program avoids the
    upstream compiler bug while exercising the same dispatch path."""
    shape = (16, 16, 16)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    image = rng.normal(size=shape) * 10.0
    base = MADConfig(
        time_step=0.05, tolerance=1e-8, max_cycles=30,
        coarse_operator="galerkin", galerkin_variant="collapsed",
    )
    ref = mad_diffusion(image, tensor, config=base)

    cfg = dataclasses.replace(
        base, operator_repr="compressed", use_pallas=True, halo="overlap"
    )
    mesh = make_grid_mesh(3, mesh_shape=(2, 2, 2))
    got = mad_diffusion(image, tensor, config=cfg, mesh=mesh, min_local=4)

    assert int(got.num_cycles[0]) == int(ref.num_cycles[0])
    np.testing.assert_allclose(
        np.asarray(got.output), np.asarray(ref.output), rtol=1e-8, atol=1e-8
    )
