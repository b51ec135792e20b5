"""Parity of the fused Pallas vesselness kernels (interpret mode) against the
XLA formulation in models/ved.py.

The fused path differs from the XLA path only through the polynomial arccos
(ops.eigen3.acos_poly, |err| ~2e-8) inside the eigenvalue formula; everything
else — FD stencil, storage-dtype rounding, select semantics — is shared code
or matches by construction.  Reference being accelerated:
itkVEDMultigridImageFilter.hxx:215-299 (UpdateVesselness) + :302-378
(GenerateDiffusionTensor).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multigridanisotropicdiffusion_tpu.models.ved import (
    _fused_scales,
    _fused_scales_kernel,
)
from multigridanisotropicdiffusion_tpu.ops.eigen3 import acos_poly

PARAMS = dict(alpha=0.5, beta=0.5, gamma=5.0, epsilon=0.01, omega=5.0,
              sensitivity=10.0)
SCALES = (0.8, 1.3)
SPACING = (1.0, 1.0, 1.0)


def _volume(shape, dtype=np.float64, seed=0):
    rng = np.random.default_rng(seed)
    z, y, x = shape
    zz, yy, xx = np.meshgrid(
        np.arange(z), np.arange(y), np.arange(x), indexing="ij"
    )
    # a bright tube along z + a weaker one along x + noise: non-trivial
    # eigenstructure and scale competition everywhere
    vol = 60.0 * np.exp(-(((yy - y / 2) ** 2) + (xx - x / 3) ** 2) / 4.0)
    vol += 40.0 * np.exp(-(((zz - z / 2) ** 2) + (yy - y / 3) ** 2) / 9.0)
    vol += rng.normal(scale=1.0, size=shape)
    return jnp.asarray(vol.astype(dtype))


def test_acos_poly_accuracy():
    x = jnp.linspace(-1.0, 1.0, 20001, dtype=jnp.float64)
    err = np.abs(np.asarray(acos_poly(x)) - np.arccos(np.asarray(x)))
    assert err.max() < 5e-8


def _run_both(u, z_valid_radius=None):
    args = (u, SCALES, SPACING, PARAMS["alpha"], PARAMS["beta"],
            PARAMS["gamma"], PARAMS["epsilon"], PARAMS["omega"],
            PARAMS["sensitivity"], z_valid_radius)
    fused = _fused_scales_kernel(*args, interpret=True)
    assert fused is not None, "shape unexpectedly kernel-ineligible"
    ref = _fused_scales(*args, hessian_mode="smooth_fd", allow_pallas=False)
    return fused, ref


def test_fused_vesselness_matches_xla_f64():
    u = _volume((12, 16, 128))
    (resp_k, t_k), (resp_x, t_x) = _run_both(u)
    np.testing.assert_allclose(
        np.asarray(resp_k), np.asarray(resp_x), rtol=1e-5, atol=1e-9
    )
    for a, b in zip(t_k, t_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_fused_vesselness_matches_xla_f32():
    u = _volume((10, 16, 128), dtype=np.float32)
    (resp_k, t_k), (resp_x, t_x) = _run_both(u)
    np.testing.assert_allclose(
        np.asarray(resp_k), np.asarray(resp_x), rtol=2e-4, atol=1e-6
    )
    for a, b in zip(t_k, t_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


def test_fused_vesselness_bf16_storage():
    """bf16-storage parity: the kernel eigensolves the UNROUNDED f32 FD
    planes while the XLA path eigensolves its stored bf16 planes (a
    deliberate relayout saving, see ops/pallas_vesselness.py), so responses
    differ at the bf16-quantization level — absolute, not relative (near-zero
    responses flip sign of their last bits)."""
    u = _volume((10, 16, 128), dtype=np.float32).astype(jnp.bfloat16)
    (resp_k, t_k), (resp_x, t_x) = _run_both(u)
    np.testing.assert_allclose(
        np.asarray(resp_k, np.float32), np.asarray(resp_x, np.float32),
        rtol=5e-2, atol=5e-3,
    )
    for a, b in zip(t_k, t_x):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        # isolated voxels flip their winning scale (or, on a degenerate top
        # eigenvalue, the in-eigenspace direction) at bf16-quantization ties
        # — their tensors differ arbitrarily; everything else must agree
        bad = np.abs(a - b) > 5e-2 + 5e-2 * np.abs(b)
        assert bad.mean() < 5e-3, (bad.mean(), np.abs(a - b).max())


def test_fused_vesselness_valid_z_slab():
    """The z-slab form (pre-padded input + z_valid_radius) equals the
    untiled form on the interior it computes."""
    from multigridanisotropicdiffusion_tpu.ops.hessian import kernel_radius

    u = _volume((8, 16, 128))
    r = max(kernel_radius(s, SPACING[0]) for s in SCALES) + 1
    u_pad = jnp.pad(u, ((r, r), (0, 0), (0, 0)), mode="edge")

    args_tail = (SCALES, SPACING, PARAMS["alpha"], PARAMS["beta"],
                 PARAMS["gamma"], PARAMS["epsilon"], PARAMS["omega"],
                 PARAMS["sensitivity"])
    fused_slab = _fused_scales_kernel(u_pad, *args_tail, r, interpret=True)
    fused_full = _fused_scales_kernel(u, *args_tail, None, interpret=True)
    assert fused_slab is not None and fused_full is not None
    np.testing.assert_allclose(
        np.asarray(fused_slab[0]), np.asarray(fused_full[0]),
        rtol=1e-10, atol=1e-12,
    )
    for a, b in zip(fused_slab[1], fused_full[1]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12
        )


def test_fused_vesselness_ineligible_shape_returns_none():
    # y with no granule-multiple tiling is ineligible in every mode (the
    # x % 128 lane constraint is Mosaic-only and lifted under interpret)
    u = _volume((8, 12, 128))
    out = _fused_scales_kernel(
        u, SCALES, SPACING, PARAMS["alpha"], PARAMS["beta"], PARAMS["gamma"],
        PARAMS["epsilon"], PARAMS["omega"], PARAMS["sensitivity"], None,
        interpret=True,
    )
    assert out is None
