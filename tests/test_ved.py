"""VED pipeline tests on a synthetic bright tube."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.models.ved import (
    VEDConfig,
    fused_vesselness_tensor,
    generate_diffusion_tensor,
    max_vesselness_over_scales,
    ved,
    vesselness_measure,
)


def make_tube_volume(n=32, radius=1.5, axis=0, amplitude=100.0):
    """Bright cylinder along ``axis`` through the volume center."""
    coords = np.meshgrid(*[np.arange(n, dtype=float)] * 3, indexing="ij")
    c = (n - 1) / 2
    r2 = sum(
        (coords[d] - c) ** 2 for d in range(3) if d != axis
    )
    return amplitude * np.exp(-r2 / (2 * radius**2))


def _lam_planes(rows):
    lam = np.asarray(rows)
    return tuple(jnp.asarray(lam[:, i]) for i in range(3))


def test_vesselness_zero_for_dark_structures():
    # positive lambda2/lambda3 (dark tube on bright background) -> 0
    lam = _lam_planes([[0.1, 2.0, 3.0], [0.0, -1.0, 2.0], [0.1, 1.0, -3.0]])
    v = np.asarray(vesselness_measure(lam, 0.5, 0.5, 5.0))
    np.testing.assert_array_equal(v, 0.0)


def test_vesselness_high_for_tube_profile():
    # classic bright-vessel signature: l1 ~ 0, l2 ~ l3 << 0.
    # Hand-computed from the reference formula (alpha=beta=0.5, gamma=5):
    # Ra-term (1-exp(-(4/4.41)/0.5)) ~= 0.837, Rb-term ~= 1,
    # S-term (1-exp(-8.41/50)) ~= 0.155 -> v ~= 0.13.
    lam = _lam_planes([[-0.01, -2.0, -2.1]])
    v = float(vesselness_measure(lam, 0.5, 0.5, 5.0)[0])
    assert abs(v - 0.1297) < 0.01
    # stronger structure saturates the S-term
    lam_strong = _lam_planes([[-0.05, -10.0, -10.5]])
    vs = float(vesselness_measure(lam_strong, 0.5, 0.5, 5.0)[0])
    assert vs > 0.7
    # plate signature: l1 ~ 0, l2 ~ 0, l3 << 0 -> low (Ra ~ 0)
    lam_plate = _lam_planes([[-0.01, -0.02, -2.0]])
    vp = float(vesselness_measure(lam_plate, 0.5, 0.5, 5.0)[0])
    assert vp < 0.01 * v


def test_tube_detected_in_volume():
    vol = make_tube_volume(24, radius=1.5, axis=0)
    resp, q = max_vesselness_over_scales(
        jnp.asarray(vol), scales=(0.775, 1.245, 2.0), spacing=(1.0, 1.0, 1.0),
        alpha=0.5, beta=0.5, gamma=5.0,
    )
    resp = np.asarray(resp)
    c = vol.shape[1] // 2
    inside = resp[4:-4, c, c].mean()
    outside = resp[4:-4, 2, 2].mean()
    assert inside > 0.1
    assert inside > 10 * max(outside, 1e-6)

    # the omega direction (eigenvector 2 = largest signed eigenvalue) should
    # align with the tube axis (axis 0) at the tube center: the Hessian there
    # has two strongly negative eigenvalues (cross-section) and one ~0 (axis).
    axis_dir = np.abs(np.asarray([q[i][2][12, c, c] for i in range(3)]))
    assert axis_dir[0] > 0.9


def test_generate_diffusion_tensor_identity_outside():
    resp = jnp.asarray([0.0, 0.5])
    one, zero = jnp.ones(2), jnp.zeros(2)
    # identity eigenvector frame as planes: q[i][j] = delta_ij
    q = tuple(tuple(one if i == j else zero for j in range(3)) for i in range(3))
    t = generate_diffusion_tensor(resp, q, 0.01, 5.0, 10.0)
    assert len(t) == 6
    from multigridanisotropicdiffusion_tpu.core.symfield import sym_to_matrix

    tm = np.asarray(sym_to_matrix(t))
    np.testing.assert_allclose(tm[:, :, 0], np.eye(3), atol=1e-12)
    v = 0.5 ** (1.0 / 10.0)
    want = np.diag([1 + (0.01 - 1) * v, 1 + (0.01 - 1) * v, 1 + (5.0 - 1) * v])
    np.testing.assert_allclose(tm[:, :, 1], want, rtol=1e-12)


def test_tensor_symmetric_positive_definite():
    vol = make_tube_volume(20, radius=1.5)
    resp, q = max_vesselness_over_scales(
        jnp.asarray(vol), scales=(1.0, 2.0), spacing=(1.0,) * 3,
        alpha=0.5, beta=0.5, gamma=5.0,
    )
    t = generate_diffusion_tensor(resp, q, 0.01, 5.0, 10.0)
    from multigridanisotropicdiffusion_tpu.core.symfield import sym_to_matrix

    tm = np.asarray(sym_to_matrix(t))
    w = np.linalg.eigvalsh(np.moveaxis(tm, (0, 1), (-2, -1)).reshape(-1, 3, 3))
    assert w.min() > 0.005  # >= epsilon-ish


def test_fused_pipeline_matches_two_stage():
    """The memory-lean per-scale tensor selection is algebraically identical
    to max-over-scales followed by tensor assembly."""
    vol = make_tube_volume(20, radius=1.5, axis=1)
    args = dict(scales=(0.775, 1.245, 2.0), spacing=(1.0, 0.8, 1.2))
    resp, q = max_vesselness_over_scales(
        jnp.asarray(vol), alpha=0.5, beta=0.5, gamma=5.0, **args
    )
    want_t = generate_diffusion_tensor(resp, q, 0.01, 5.0, 10.0)
    got_resp, got_t = fused_vesselness_tensor(
        jnp.asarray(vol), alpha=0.5, beta=0.5, gamma=5.0,
        epsilon=0.01, omega=5.0, sensitivity=10.0, **args
    )
    np.testing.assert_allclose(np.asarray(got_resp), np.asarray(resp), rtol=1e-12)
    for got_p, want_p in zip(got_t, want_t):
        np.testing.assert_allclose(
            np.asarray(got_p), np.asarray(want_p), rtol=1e-12, atol=1e-12
        )


def test_tiled_pipeline_matches_untiled():
    """z-slab tiling (valid-mode z convs over a shared max-radius halo) is
    exact: identical results to the whole-volume pipeline."""
    vol = make_tube_volume(24, radius=1.5, axis=0)
    vol += np.random.default_rng(7).normal(scale=1.0, size=vol.shape)
    kw = dict(
        scales=(0.775, 1.245, 2.0), spacing=(0.9, 1.0, 1.1),
        alpha=0.5, beta=0.5, gamma=5.0, epsilon=0.01, omega=5.0,
        sensitivity=10.0,
    )
    want_resp, want_t = fused_vesselness_tensor(jnp.asarray(vol), **kw)
    got_resp, got_t = fused_vesselness_tensor(jnp.asarray(vol), z_slab=6, **kw)
    np.testing.assert_allclose(
        np.asarray(got_resp), np.asarray(want_resp), rtol=1e-11, atol=1e-14
    )
    for got_p, want_p in zip(got_t, want_t):
        np.testing.assert_allclose(
            np.asarray(got_p), np.asarray(want_p), rtol=1e-11, atol=1e-13
        )


def test_ved_end_to_end_tube():
    vol = make_tube_volume(24, radius=1.5, axis=0)
    noisy = vol + np.random.default_rng(3).normal(scale=2.0, size=vol.shape)
    cfg = VEDConfig(
        iterations=1,
        diffusion_iterations=2,
        scales=(0.775, 1.245, 2.0),
        time_step=0.1,
        tolerance=1e-8,
    )
    res = ved(noisy, spacing=(1.0, 1.0, 1.0), config=cfg)
    out = np.asarray(res.output)
    assert out.shape == vol.shape
    assert np.all(np.isfinite(out))
    assert np.all(np.asarray(res.diffusion.final_residual) <= 1e-8)
    # the tube survives diffusion: center stays much brighter than background
    c = vol.shape[1] // 2
    assert out[12, c, c] > 5 * np.abs(out[12, 2, 2])
    # noise in the background got smoothed
    bg_in = noisy[4:-4, 1:5, 1:5].std()
    bg_out = out[4:-4, 1:5, 1:5].std()
    assert bg_out < bg_in


@pytest.mark.parametrize("cycle", ["fmg", "smoother"])
def test_ved_cycle_modes(cycle):
    """The reference's itkVEDTest_GS_FMG / _S variants: the VED pipeline runs
    with FMG and smoother-only diffusion cycles (test/CMakeLists.txt:37-44)."""
    vol = make_tube_volume(20, radius=1.5, axis=2)
    cfg = VEDConfig(
        iterations=1, diffusion_iterations=2, scales=(1.0, 2.0),
        time_step=0.1, tolerance=1e-7 if cycle == "fmg" else 1e-3,
        cycle=cycle,
    )
    res = ved(vol, config=cfg)
    assert np.all(np.isfinite(np.asarray(res.output)))
    assert np.all(np.asarray(res.diffusion.final_residual) <= cfg.tolerance)


def test_ved_rejects_2d():
    with pytest.raises(ValueError):
        ved(np.zeros((8, 8)))


def test_ved_multi_iteration(rng):
    """iterations > 1: the vesselness/tensor pipeline is recomputed from the
    diffused volume each outer iteration and the multigrid hierarchy rebuilt
    (reference per-iteration reset, itkVEDMultigridImageFilter.hxx:104-128).
    Iteration 2 of a 2-iteration run is exactly the filter re-applied to
    iteration 1's output."""
    from multigridanisotropicdiffusion_tpu.models.ved import VEDConfig, ved

    vol = rng.uniform(0.0, 100.0, size=(12, 14, 12))
    cfg1 = VEDConfig(scales=(0.5, 1.0), omega=1.5, iterations=1,
                     diffusion_iterations=2, tolerance=1e-8)
    cfg2 = dataclasses.replace(cfg1, iterations=2)

    r1 = ved(vol, spacing=(1.0, 1.0, 1.0), config=cfg1)
    r2 = ved(vol, spacing=(1.0, 1.0, 1.0), config=cfg2)

    # the second iteration's tensor is computed from the diffused volume,
    # not the input — it must differ from the first iteration's
    dt = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(r2.tensor, r1.tensor)
    )
    assert dt > 0.0
    assert float(jnp.max(jnp.abs(r2.output - r1.output))) > 0.0

    # iteration 2 == re-running the 1-iteration filter on iteration 1's output
    r1b = ved(np.asarray(r1.output), spacing=(1.0, 1.0, 1.0), config=cfg1)
    np.testing.assert_array_equal(np.asarray(r2.output), np.asarray(r1b.output))
    np.testing.assert_array_equal(
        np.asarray(r2.vesselness), np.asarray(r1b.vesselness)
    )


def test_ved_bf16_pipeline_close_to_f32(rng):
    """pipeline_dtype='bfloat16' stores the streamed volumes low-precision
    but keeps tap accumulation / FD / eig / vesselness / tensor assembly in
    f32: the response and tensor stay within ~1% of the f32 pipeline in the
    mean (isolated near-degenerate voxels may swap eigenvector frames)."""
    from multigridanisotropicdiffusion_tpu.models.ved import (
        fused_vesselness_tensor,
    )

    n = 32
    z = np.arange(n, dtype=np.float64)
    vol = np.zeros((n, n, n))
    yy, xx = np.meshgrid(z, z, indexing="ij")
    vol += 80.0 * np.exp(-(((yy - 10) ** 2) + (xx - 20) ** 2) / 8.0)[None]
    vol += 90.0 * np.exp(
        -(((z[:, None] - 10) ** 2)[:, :, None] + ((xx - 24) ** 2)[None]) / 8.0
    )
    vol += 2.0 * rng.normal(size=(n, n, n))
    u = jnp.asarray(vol, jnp.float32)
    args = ((0.5, 1.0, 2.0), (1.0, 1.0, 1.0), 0.5, 0.5, 5.0, 0.01, 5.0, 10.0,
            None, "smooth_fd")
    r32, t32 = fused_vesselness_tensor(u, *args)
    r16, t16 = fused_vesselness_tensor(u, *args, "bfloat16")
    assert np.asarray(r16).dtype == np.float32  # math/outputs stay f32
    assert float(jnp.mean(jnp.abs(r32 - r16))) < 1e-2
    for a, b in zip(t32, t16):
        assert np.asarray(b).dtype == np.float32
        assert float(jnp.mean(jnp.abs(a - b))) < 0.05


def test_ved_bf16_pipeline_tiled_and_gaussian_modes(rng):
    """ADVICE r2: the benchmarked 512^3 bf16 config is the *z-slab-tiled*
    smooth_fd path, and gaussian_derivative under bf16 rounds between
    separable passes — both combinations must stay close to their f32
    counterparts, and the tiled bf16 path must equal the untiled bf16 path."""
    from multigridanisotropicdiffusion_tpu.models.ved import (
        fused_vesselness_tensor,
    )

    n = 32
    z = np.arange(n, dtype=np.float64)
    vol = np.zeros((n, n, n))
    yy, xx = np.meshgrid(z, z, indexing="ij")
    vol += 80.0 * np.exp(-(((yy - 10) ** 2) + (xx - 20) ** 2) / 8.0)[None]
    vol += 90.0 * np.exp(
        -(((z[:, None] - 10) ** 2)[:, :, None] + ((xx - 24) ** 2)[None]) / 8.0
    )
    vol += 2.0 * rng.normal(size=(n, n, n))
    u = jnp.asarray(vol, jnp.float32)
    common = ((0.5, 1.0, 2.0), (1.0, 1.0, 1.0), 0.5, 0.5, 5.0, 0.01, 5.0, 10.0)

    for mode, z_slab in (("smooth_fd", 8), ("gaussian_derivative", None),
                         ("gaussian_derivative", 8)):
        r32, t32 = fused_vesselness_tensor(u, *common, None, mode)
        r16, t16 = fused_vesselness_tensor(u, *common, z_slab, mode, "bfloat16")
        assert np.asarray(r16).dtype == np.float32, (mode, z_slab)
        assert float(jnp.mean(jnp.abs(r32 - r16))) < 1e-2, (mode, z_slab)
        for a, b in zip(t32, t16):
            assert float(jnp.mean(jnp.abs(a - b))) < 0.05, (mode, z_slab)

    # tiled bf16 vs untiled bf16: the slab convs reassociate the same taps,
    # so under bf16 storage the results differ only at bf16-rounding scale
    # (the f32 path's exact tiling equality is tested elsewhere)
    r_u, t_u = fused_vesselness_tensor(u, *common, None, "smooth_fd", "bfloat16")
    r_t, t_t = fused_vesselness_tensor(u, *common, 8, "smooth_fd", "bfloat16")
    assert float(jnp.max(jnp.abs(r_t - r_u))) < 1e-3
    for a, b in zip(t_u, t_t):
        assert float(jnp.mean(jnp.abs(b - a))) < 1e-2


def test_ved_float16_pipeline_promotes_math_to_f32(rng):
    """ADVICE r2: any sub-f32 pipeline_dtype (not just bfloat16) must keep
    the eig/vesselness/tensor math in float32."""
    from multigridanisotropicdiffusion_tpu.models.ved import (
        fused_vesselness_tensor,
    )

    u = jnp.asarray(rng.uniform(0.0, 50.0, size=(8, 10, 8)), jnp.float32)
    args = ((0.5, 1.0), (1.0, 1.0, 1.0), 0.5, 0.5, 5.0, 0.01, 5.0, 10.0,
            None, "smooth_fd")
    r32, t32 = fused_vesselness_tensor(u, *args)
    r16, t16 = fused_vesselness_tensor(u, *args, "float16")
    assert np.asarray(r16).dtype == np.float32
    for p in t16:
        assert np.asarray(p).dtype == np.float32
    assert float(jnp.mean(jnp.abs(r32 - r16))) < 2e-2
