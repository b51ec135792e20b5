"""Distributed (shard_map) vesselness pipeline vs the single-device path.

The sharded pipeline reshards to z slabs, ppermutes max-radius halos, and
runs the fused kernels (interpret mode on the CPU mesh) per shard — output
must match the single-device XLA formulation up to the kernels' polynomial
arccos (parallel/pipeline.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from multigridanisotropicdiffusion_tpu.models.ved import _fused_scales
from multigridanisotropicdiffusion_tpu.parallel.pipeline import (
    make_sharded_vesselness_pipeline,
)
from multigridanisotropicdiffusion_tpu.parallel.sharding import make_grid_mesh

SCALES = (1.0, 2.0)
SPACING = (1.0, 1.0, 1.0)
PARAMS = dict(alpha=0.5, beta=0.5, gamma=5.0, epsilon=0.01, omega=5.0,
              sensitivity=10.0)


def _volume(shape, seed=0):
    rng = np.random.default_rng(seed)
    z, y, x = shape
    zz, yy, xx = np.meshgrid(np.arange(z), np.arange(y), np.arange(x),
                             indexing="ij")
    vol = 60.0 * np.exp(-(((yy - y / 2) ** 2) + (xx - x / 3) ** 2) / 4.0)
    vol += rng.normal(scale=1.0, size=shape)
    return jnp.asarray(vol)


def test_sharded_pipeline_matches_single_device():
    mesh = make_grid_mesh(3)  # all 8 virtual devices
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    shape = (9 * n, 24, 128)  # local z slab == the sigma=2 halo (9)
    u = _volume(shape)

    pipeline = make_sharded_vesselness_pipeline(
        shape, u.dtype, mesh, SCALES, SPACING, **PARAMS
    )
    assert pipeline is not None, "shape unexpectedly ineligible"
    resp_d, t_d = pipeline(u)

    resp_s, t_s = _fused_scales(
        u, SCALES, SPACING, PARAMS["alpha"], PARAMS["beta"], PARAMS["gamma"],
        PARAMS["epsilon"], PARAMS["omega"], PARAMS["sensitivity"], None,
        hessian_mode="smooth_fd", allow_pallas=False,
    )
    np.testing.assert_allclose(
        np.asarray(resp_d), np.asarray(resp_s), rtol=1e-5, atol=1e-9
    )
    for a, b in zip(t_d, t_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_sharded_pipeline_ineligible_shapes():
    mesh = make_grid_mesh(3)
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    # z does not divide by the device count
    assert make_sharded_vesselness_pipeline(
        (9 * n + 1, 24, 128), jnp.float64, mesh, SCALES, SPACING, **PARAMS
    ) is None
    # local slab thinner than the halo
    assert make_sharded_vesselness_pipeline(
        (4 * n, 24, 128), jnp.float64, mesh, SCALES, SPACING, **PARAMS
    ) is None


def test_sharded_pipeline_through_ved():
    """ved() with a mesh routes through the shard_map kernel pipeline when
    eligible and matches the meshless run."""
    from multigridanisotropicdiffusion_tpu.models.ved import VEDConfig, ved

    mesh = make_grid_mesh(3)
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    shape = (9 * n, 24, 128)
    u = _volume(shape)
    cfg = VEDConfig(iterations=1, diffusion_iterations=1, scales=SCALES,
                    time_step=0.1, tolerance=1e-6)
    ref = ved(u, config=cfg)
    got = ved(u, config=cfg, mesh=mesh, min_local=4)
    np.testing.assert_allclose(
        np.asarray(got.vesselness), np.asarray(ref.vesselness),
        rtol=1e-4, atol=1e-8,
    )
    for a, b in zip(got.tensor, ref.tensor):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(got.output), np.asarray(ref.output), rtol=1e-5, atol=1e-7
    )
