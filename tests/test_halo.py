"""Explicit shard_map halo-exchange smoothers vs the global-view ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from multigridanisotropicdiffusion_tpu.core.stencil import residual as global_residual
from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes
from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
from multigridanisotropicdiffusion_tpu.ops.smoothers import (
    jacobi_sweep,
    rb_gauss_seidel_sweep,
)
from multigridanisotropicdiffusion_tpu.parallel.halo import (
    make_halo_jacobi_sweep,
    make_halo_rbgs_sweep,
    make_halo_residual,
)
from multigridanisotropicdiffusion_tpu.parallel.sharding import make_grid_mesh

from .conftest import make_spd_tensor_field

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@pytest.fixture(params=[((32, 32), (4, 2)), ((16, 24, 16), (2, 2, 2))])
def problem(rng, request):
    shape, mesh_shape = request.param
    ndim = len(shape)
    tensor = make_spd_tensor_field(rng, shape, ndim, hi=3.0)
    op = assemble_dca(as_sym_planes(tensor, shape), (1.0,) * ndim, 0.1)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    mesh = make_grid_mesh(ndim, mesh_shape=mesh_shape)
    spec = PartitionSpec(*mesh.axis_names)
    return op, x, b, mesh, spec


overlap_param = pytest.mark.parametrize("overlap", [False, True])


@needs_8
@overlap_param
def test_halo_rbgs_matches_global(problem, overlap):
    op, x, b, mesh, spec = problem
    sweep = make_halo_rbgs_sweep(mesh, spec, overlap)
    got = np.asarray(jax.jit(sweep)(op, x, b))
    want = np.asarray(rb_gauss_seidel_sweep(op, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@needs_8
@overlap_param
def test_halo_jacobi_matches_global(problem, overlap):
    op, x, b, mesh, spec = problem
    sweep = make_halo_jacobi_sweep(mesh, spec, overlap=overlap)
    got = np.asarray(jax.jit(sweep)(op, x, b))
    want = np.asarray(jacobi_sweep(op, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@needs_8
@overlap_param
def test_halo_residual_matches_global(problem, overlap):
    op, x, b, mesh, spec = problem
    res = make_halo_residual(mesh, spec, overlap)
    got = np.asarray(jax.jit(res)(op, x, b))
    want = np.asarray(global_residual(op, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@needs_8
def test_halo_overlap_partially_replicated_mesh(rng):
    """Axes whose spec is None (agglomerated/replicated) need no slab fixup."""
    shape = (20, 16, 12)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    op = assemble_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    mesh = make_grid_mesh(3, mesh_shape=(4, 2, 1))
    spec = PartitionSpec("x", "y", None)
    got = np.asarray(jax.jit(make_halo_rbgs_sweep(mesh, spec, True))(op, x, b))
    want = np.asarray(rb_gauss_seidel_sweep(op, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@needs_8
def test_halo_rbgs_repeated_convergence(problem):
    """Many halo sweeps drive the residual down identically to global sweeps."""
    op, x, b, mesh, spec = problem
    sweep = jax.jit(make_halo_rbgs_sweep(mesh, spec))
    xg = x
    for _ in range(10):
        x = sweep(op, x, b)
        xg = rb_gauss_seidel_sweep(op, xg, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xg), rtol=1e-10, atol=1e-10)

@pytest.fixture(params=[
    ((16, 24, 16), (2, 2, 2)),
    ((18, 24, 16), (2, 2, 2)),   # odd local blocks: origin-parity rebasing
])
def comp_problem(rng, request):
    from multigridanisotropicdiffusion_tpu.ops.compressed import (
        assemble_compressed_dca,
    )

    shape, mesh_shape = request.param
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    op = assemble_compressed_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    mesh = make_grid_mesh(3, mesh_shape=mesh_shape)
    spec = PartitionSpec(*mesh.axis_names)
    return op, x, b, mesh, spec


@needs_8
@overlap_param
def test_halo_compressed_rbgs_matches_global(comp_problem, overlap):
    """The generic XLA halo path accepts the compressed DCA operator."""
    op, x, b, mesh, spec = comp_problem
    got = np.asarray(jax.jit(make_halo_rbgs_sweep(mesh, spec, overlap))(op, x, b))
    want = np.asarray(rb_gauss_seidel_sweep(op, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@needs_8
def test_halo_pallas_rbgs_matches_global(comp_problem):
    """The fused Pallas block kernel inside shard_map (interpret mode on CPU)
    reproduces the global red-black sweep, including global-parity rebasing
    on odd-origin blocks and halo-slab splicing."""
    from multigridanisotropicdiffusion_tpu.parallel.halo import (
        make_halo_pallas_rbgs_sweep,
    )

    op, x, b, mesh, spec = comp_problem
    sweep = make_halo_pallas_rbgs_sweep(mesh, spec, interpret=True)
    got = np.asarray(jax.jit(sweep)(op, x, b))
    want = np.asarray(rb_gauss_seidel_sweep(op, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@needs_8
def test_halo_pallas_residual_matches_global(comp_problem):
    from multigridanisotropicdiffusion_tpu.parallel.halo import (
        make_halo_pallas_residual,
    )

    op, x, b, mesh, spec = comp_problem
    res = make_halo_pallas_residual(mesh, spec, interpret=True)
    got = np.asarray(jax.jit(res)(op, x, b))
    want = np.asarray(global_residual(op, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@needs_8
def test_halo_pallas_partially_replicated(rng):
    """Replicated axes need no slab fix; the kernel's local masking is a
    no-op at true global borders there."""
    from multigridanisotropicdiffusion_tpu.ops.compressed import (
        assemble_compressed_dca,
    )
    from multigridanisotropicdiffusion_tpu.parallel.halo import (
        make_halo_pallas_rbgs_sweep,
    )

    shape = (20, 16, 12)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    op = assemble_compressed_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    mesh = make_grid_mesh(3, mesh_shape=(4, 2, 1))
    spec = PartitionSpec("x", "y", None)
    sweep = make_halo_pallas_rbgs_sweep(mesh, spec, interpret=True)
    got = np.asarray(jax.jit(sweep)(op, x, b))
    want = np.asarray(rb_gauss_seidel_sweep(op, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@needs_8
def test_halo_pallas_repeated_convergence(comp_problem):
    """Many distributed Pallas sweeps track the global sweeps exactly."""
    from multigridanisotropicdiffusion_tpu.parallel.halo import (
        make_halo_pallas_rbgs_sweep,
    )

    op, x, b, mesh, spec = comp_problem
    sweep = jax.jit(make_halo_pallas_rbgs_sweep(mesh, spec, interpret=True))
    xg = x
    for _ in range(10):
        x = sweep(op, x, b)
        xg = rb_gauss_seidel_sweep(op, xg, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xg), rtol=1e-10, atol=1e-10)
