"""ITK-style filter façades (models/filters.py) match the functional API."""

import numpy as np
import pytest

import multigridanisotropicdiffusion_tpu as madt
from multigridanisotropicdiffusion_tpu.models.filters import (
    MultigridAnisotropicDiffusionImageFilter,
    VEDMultigridImageFilter,
)


def test_mad_filter_matches_functional(rng):
    img = rng.uniform(0.0, 255.0, size=(33, 40))
    tensor = np.zeros((*img.shape, 2, 2))
    tensor[..., 0, 0] = 50.0
    tensor[..., 1, 1] = 30.0

    f = (
        MultigridAnisotropicDiffusionImageFilter()
        .set_input(img)
        .set_diffusion_tensor(tensor)
        .set_time_step(0.1)
        .set_tolerance(1e-10)
        .set_max_cycles(100)
        .set_iterations_per_grid(2)
    )
    out = f.get_output()  # implicit update()

    cfg = madt.MADConfig(time_step=0.1, tolerance=1e-10, max_cycles=100,
                         iterations_per_grid=2)
    ref = madt.mad_diffusion(img, tensor, config=cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref.output))

    res = f.get_result()
    assert float(res.final_residual[0]) <= 1e-10
    # setter surface mirrors the reference's parameter set and chains
    f.set_cycle(madt.FMG).set_number_of_steps(2).set_verbose(False)
    assert f.get_config().cycle == madt.FMG
    assert f.get_config().number_of_steps == 2


def test_mad_filter_requires_inputs():
    with pytest.raises(ValueError, match="set_input"):
        MultigridAnisotropicDiffusionImageFilter().update()


def test_ved_filter_matches_functional(rng):
    vol = rng.uniform(0.0, 100.0, size=(12, 14, 12))

    f = (
        VEDMultigridImageFilter()
        .set_spacing((1.0, 1.0, 1.0))
        .set_input(vol)
        .set_scales([0.5, 1.0])
        .set_omega(1.5)
        .set_diffusion_iterations(1)
        .set_tolerance(1e-8)
    )
    out = f.get_output()

    cfg = madt.VEDConfig(scales=(0.5, 1.0), omega=1.5, diffusion_iterations=1,
                         tolerance=1e-8)
    ref = madt.ved(vol, spacing=(1.0, 1.0, 1.0), config=cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref.output))
    assert f.get_config().alpha == 0.5  # reference ctor default
