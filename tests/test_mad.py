"""End-to-end MAD solver tests: convergence to the reference's tolerance
contract and agreement with a dense direct solve."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.stencil import densify
from multigridanisotropicdiffusion_tpu.models.mad import (
    FMG,
    SMOOTHER,
    VCYCLE,
    MADConfig,
    build_hierarchy,
    mad_diffusion,
)
from multigridanisotropicdiffusion_tpu.core.grids import build_level_descriptors

from .conftest import make_spd_tensor_field


def _dense_solution(tensor, spacing, dt, b):
    from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca

    from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes

    op = assemble_dca(as_sym_planes(np.asarray(tensor), b.shape), spacing, dt)
    a = np.asarray(densify(op))
    return np.linalg.solve(a, np.asarray(b).ravel()).reshape(b.shape)


@pytest.mark.parametrize("smoother", ["gauss_seidel", "weighted_jacobi"])
@pytest.mark.parametrize("cycle", [VCYCLE, FMG])
def test_mad_2d_converges_to_tolerance(rng, smoother, cycle):
    shape = (33, 32)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    image = rng.normal(size=shape) * 100.0

    config = MADConfig(
        time_step=0.1,
        tolerance=1e-10,
        max_cycles=100,
        cycle=cycle,
        smoother=smoother,
    )
    result = mad_diffusion(image, tensor, spacing=(1.0, 1.0), config=config)

    assert float(result.final_residual[0]) <= 1e-10
    assert int(result.num_cycles[0]) < 100

    want = _dense_solution(tensor, (1.0, 1.0), 0.1, image)
    np.testing.assert_allclose(np.asarray(result.output), want, rtol=1e-7, atol=1e-7)


def test_mad_constant_tensor_anisotropic(rng):
    """The 2D reference test setup: constant tensor diag(50, 30), dt=0.1."""
    shape = (32, 32)
    tensor = np.zeros((*shape, 2, 2))
    tensor[..., 0, 0] = 50.0
    tensor[..., 1, 1] = 30.0
    image = rng.uniform(0, 255, size=shape)

    config = MADConfig(time_step=0.1, tolerance=1e-10, max_cycles=100)
    result = mad_diffusion(image, tensor, config=config)
    assert float(result.final_residual[0]) <= 1e-10

    want = _dense_solution(tensor, (1.0, 1.0), 0.1, image)
    np.testing.assert_allclose(np.asarray(result.output), want, rtol=1e-6, atol=1e-6)


def test_mad_3d_converges(rng):
    shape = (13, 12, 14)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    image = rng.normal(size=shape) * 10.0

    config = MADConfig(time_step=0.1, tolerance=1e-10, max_cycles=100)
    result = mad_diffusion(image, tensor, spacing=(1.0, 0.5, 2.0), config=config)
    assert float(result.final_residual[0]) <= 1e-10

    want = _dense_solution(tensor, (1.0, 0.5, 2.0), 0.1, image)
    np.testing.assert_allclose(np.asarray(result.output), want, rtol=1e-6, atol=1e-6)


def test_mad_smoother_mode_decreases_residual(rng):
    shape = (16, 16)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=2.0)
    image = rng.normal(size=shape)

    config = MADConfig(
        time_step=0.01, tolerance=1e-10, max_cycles=50, cycle=SMOOTHER
    )
    result = mad_diffusion(image, tensor, config=config)
    hist = np.asarray(result.residual_history[0])
    n = int(result.num_cycles[0])
    assert n > 1
    assert hist[n - 1] < hist[0]


def test_mad_multiple_time_steps(rng):
    shape = (17, 16)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=2.0)
    image = rng.normal(size=shape)

    config = MADConfig(time_step=0.05, number_of_steps=3, tolerance=1e-10)
    result = mad_diffusion(image, tensor, config=config)
    assert result.residual_history.shape == (3, 100)
    assert np.all(np.asarray(result.final_residual) <= 1e-10)

    # 3 implicit steps == solving A x = b three times in sequence
    from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca

    from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes

    op = assemble_dca(as_sym_planes(tensor, shape), (1.0, 1.0), 0.05)
    a = np.asarray(densify(op))
    b = np.asarray(image).ravel()
    for _ in range(3):
        b = np.linalg.solve(a, b)
    np.testing.assert_allclose(
        np.asarray(result.output).ravel(), b, rtol=1e-6, atol=1e-8
    )


def test_hierarchy_reuse(rng):
    shape = (16, 16)
    tensor = make_spd_tensor_field(rng, shape, 2)
    image = rng.normal(size=shape)
    config = MADConfig(time_step=0.1, tolerance=1e-8)

    levels = build_level_descriptors(shape, (1.0, 1.0))
    from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes

    hier = build_hierarchy(as_sym_planes(tensor, shape), levels, config.time_step)
    r1 = mad_diffusion(image, tensor, config=config, hierarchy=hier)
    r2 = mad_diffusion(image, tensor, config=config)
    np.testing.assert_allclose(
        np.asarray(r1.output), np.asarray(r2.output), rtol=1e-12
    )


@pytest.mark.parametrize("cycle", [VCYCLE, FMG, SMOOTHER])
def test_defect_correction_same_precision_matches_plain(rng, cycle):
    """With defect_dtype == solve dtype, x + V(0, b - A x) is the same linear
    iteration as V(x, b): same cycle counts, same solutions."""
    shape = (24, 20, 16)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    image = rng.normal(size=shape) * 10.0
    tol = 1e-9 if cycle != SMOOTHER else 1e-3
    plain = mad_diffusion(
        image, tensor,
        config=MADConfig(time_step=0.1, tolerance=tol, max_cycles=200, cycle=cycle),
    )
    defect = mad_diffusion(
        image, tensor,
        config=MADConfig(time_step=0.1, tolerance=tol, max_cycles=200,
                         cycle=cycle, defect_dtype="float64"),
    )
    assert int(defect.num_cycles[0]) == int(plain.num_cycles[0])
    np.testing.assert_allclose(
        np.asarray(defect.output), np.asarray(plain.output),
        rtol=1e-9, atol=1e-9,
    )


@pytest.mark.parametrize("lo,tol", [("float32", 1e-10), ("bfloat16", 1e-6)])
def test_defect_correction_low_precision_converges(rng, lo, tol):
    """Inner cycles in low precision still converge to the full-precision
    tolerance (the outer residual uses the exact operator), and the answer
    matches the dense direct solve."""
    shape = (17, 16)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    image = rng.normal(size=shape) * 10.0
    cfg = MADConfig(
        time_step=0.1, tolerance=tol, max_cycles=100, defect_dtype=lo
    )
    res = mad_diffusion(image, tensor, config=cfg)
    assert float(res.final_residual[0]) <= tol
    assert int(res.num_cycles[0]) < 100
    want = _dense_solution(tensor, (1.0, 1.0), 0.1, jnp.asarray(image))
    np.testing.assert_allclose(
        np.asarray(res.output), want, rtol=10 * tol, atol=10 * tol * 10.0
    )


def test_defect_correction_bf16_pallas_compressed(rng):
    """The bf16 defect path through the compressed operator + Pallas kernels
    (interpreter mode on CPU)."""
    shape = (16, 16, 16)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    image = rng.normal(size=shape) * 10.0
    cfg = MADConfig(
        time_step=0.1, tolerance=1e-5, max_cycles=60,
        operator_repr="compressed", use_pallas=True, defect_dtype="bfloat16",
    )
    res = mad_diffusion(image, tensor, config=cfg)
    assert float(res.final_residual[0]) <= 1e-5
    assert int(res.num_cycles[0]) < 60


def test_verbose_prints_residual_trace(rng, capsys):
    """MADConfig.verbose prints the per-cycle residual trace without changing
    the computation (reference SetVerbose semantics, .h:154-158)."""
    shape = (17, 16)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    image = rng.normal(size=shape) * 10.0
    cfg = MADConfig(time_step=0.1, tolerance=1e-8, verbose=True)
    res = mad_diffusion(image, tensor, config=cfg)
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if "relative residual" in l]
    assert len(lines) == int(res.num_cycles[0])
    assert f"= {float(res.residual_history[0, 0])}" in lines[0]

    quiet = mad_diffusion(
        image, tensor, config=MADConfig(time_step=0.1, tolerance=1e-8)
    )
    assert capsys.readouterr().out == ""
    np.testing.assert_array_equal(np.asarray(res.output), np.asarray(quiet.output))
