"""Verbose-trace path and benchmark.txt-contract logger tests."""

import numpy as np

from multigridanisotropicdiffusion_tpu.models.mad import MADConfig, mad_diffusion
from multigridanisotropicdiffusion_tpu.models.trace import mad_diffusion_verbose
from multigridanisotropicdiffusion_tpu.utils.benchlog import (
    ResidualTraceLogger,
    trace_from_result,
)

from .conftest import make_spd_tensor_field


def test_verbose_matches_jitted_solver(rng):
    shape = (17, 16)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=2.0)
    image = rng.normal(size=shape) * 10.0
    config = MADConfig(time_step=0.1, tolerance=1e-9)

    lines = []
    out_v, trace = mad_diffusion_verbose(
        image, tensor, config=config, print_fn=lines.append
    )
    out_j = mad_diffusion(image, tensor, config=config)

    np.testing.assert_allclose(
        np.asarray(out_v), np.asarray(out_j.output), rtol=1e-12, atol=1e-12
    )
    # trace structure: per-level lines with depth indentation + V-cycle headers
    assert any("VCycle n. 1" in l for l in lines)
    assert any("direct solver" in l for l in lines)
    assert any(l.startswith(" Level 0, iteration 1") for l in lines)


def test_benchmark_txt_contract(rng, tmp_path):
    shape = (16, 16)
    tensor = make_spd_tensor_field(rng, shape, 2)
    image = rng.normal(size=shape)
    logger = ResidualTraceLogger()
    mad_diffusion_verbose(
        image, tensor, config=MADConfig(tolerance=1e-8),
        print_fn=lambda s: None, logger=logger,
    )
    path = str(tmp_path / "benchmark.txt")
    logger.write(path)
    rows = open(path).read().strip().splitlines()
    assert len(rows) >= 2
    for row in rows:
        res, sec = row.split("_")
        assert float(res) > 0 and float(sec) >= 0


def test_trace_from_result(rng):
    shape = (16, 16)
    tensor = make_spd_tensor_field(rng, shape, 2)
    image = rng.normal(size=shape)
    res = mad_diffusion(image, tensor, config=MADConfig(tolerance=1e-8))
    samples = trace_from_result(res, wall_seconds=1.0)
    assert len(samples) == int(res.num_cycles[0])
    # residuals decreasing, times increasing up to the total
    rs = [r for r, _ in samples]
    ts = [t for _, t in samples]
    assert all(a > b for a, b in zip(rs, rs[1:]))
    assert ts == sorted(ts) and abs(ts[-1] - 1.0) < 1e-9


def test_verbose_distributed_matches_single_device(rng):
    """The trace path accepts the mesh and reproduces the distributed
    configuration (VERDICT r2 item 8): same residual lines and output as the
    single-device trace, via the explicit-halo smoother ops."""
    import dataclasses

    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from multigridanisotropicdiffusion_tpu.parallel.sharding import make_grid_mesh

    shape = (32, 32)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=2.0)
    image = rng.normal(size=shape) * 10.0
    cfg = MADConfig(time_step=0.1, tolerance=1e-8, max_cycles=20)
    out_ref, lines_ref = mad_diffusion_verbose(
        image, tensor, config=cfg, print_fn=lambda s: None
    )
    mesh = make_grid_mesh(2, mesh_shape=(4, 2))
    out_d, lines_d = mad_diffusion_verbose(
        image, tensor, config=dataclasses.replace(cfg, halo="overlap"),
        print_fn=lambda s: None, mesh=mesh, min_local=4,
    )
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_ref),
                               rtol=1e-10, atol=1e-10)
    assert len(lines_d) == len(lines_ref)
    for a, b in zip(lines_d, lines_ref):
        pa, pb = a.split("= "), b.split("= ")
        assert pa[0] == pb[0]
        if len(pa) == 2:  # residual lines agree to fp tolerance
            np.testing.assert_allclose(float(pa[1]), float(pb[1]),
                                       rtol=1e-6, atol=1e-12)


def test_verbose_distributed_rejects_padded_shapes(rng):
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from multigridanisotropicdiffusion_tpu.parallel.sharding import make_grid_mesh

    shape = (33, 32)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=2.0)
    image = rng.normal(size=shape)
    mesh = make_grid_mesh(2, mesh_shape=(4, 2))
    with pytest.raises(ValueError, match="pad-to-divisible"):
        mad_diffusion_verbose(
            image, tensor, config=MADConfig(halo="overlap"),
            print_fn=lambda s: None, mesh=mesh, min_local=4,
        )
