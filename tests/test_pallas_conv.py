"""Pallas per-axis convolution kernels vs the XLA shifted-slice oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.ops.hessian import (
    _conv_axis,
    gaussian_kernels_1d,
)
from multigridanisotropicdiffusion_tpu.ops.pallas_conv import (
    pallas_conv_axis,
    pallas_conv_supported,
)


def _kernels():
    g, g1, g2 = gaussian_kernels_1d(1.3, 1.0)
    small = np.array([0.25, 0.5, 0.25])
    return [("g", g), ("g1", g1), ("g2", g2), ("small", small)]


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_pallas_conv_matches_conv_axis(rng, axis):
    shape = (12, 16, 256)
    x = jnp.asarray(rng.normal(size=shape))
    for name, k in _kernels():
        assert pallas_conv_supported(shape, axis, len(k), 8), (name, axis)
        want = np.asarray(_conv_axis(x, np.asarray(k), axis))
        got = np.asarray(pallas_conv_axis(x, k, axis, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13,
                                   err_msg=f"{name} axis {axis}")


def test_pallas_conv_z_valid(rng):
    """Valid-mode z conv (the z-slab pipeline's halo-consuming form)."""
    g = gaussian_kernels_1d(1.3, 1.0)[0]
    r = (len(g) - 1) // 2
    shape = (8 + 2 * r, 16, 256)
    x = jnp.asarray(rng.normal(size=shape))
    want = np.asarray(_conv_axis(x, np.asarray(g), 0, valid=True))
    got = np.asarray(pallas_conv_axis(x, g, 0, valid=True, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_pallas_conv_z_valid_zero_padded_kernel(rng):
    """Zero-padded taps (the shared-max-radius slab halo form) cost nothing
    and stay exact."""
    g = gaussian_kernels_1d(1.0, 1.0)[0]
    extra = 3
    gp = np.pad(np.asarray(g), (extra, extra))
    r = (len(gp) - 1) // 2
    shape = (14 + 2 * r, 16, 256)  # z_out=14: admits a tile >= r=7
    x = jnp.asarray(rng.normal(size=shape))
    want = np.asarray(_conv_axis(x, gp, 0, valid=True))
    got = np.asarray(pallas_conv_axis(x, gp, 0, valid=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_pallas_conv_large_sigma_y(rng):
    """Radius larger than one y tile is rejected; radius up to the tile
    works (border folds exact)."""
    shape = (4, 32, 256)
    x = jnp.asarray(rng.normal(size=shape))
    g = gaussian_kernels_1d(4.0, 1.0)[0]  # radius 16
    assert pallas_conv_supported(shape, 1, len(g), 8)
    want = np.asarray(_conv_axis(x, np.asarray(g), 1))
    got = np.asarray(pallas_conv_axis(x, g, 1, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_pallas_conv_support_gate():
    assert not pallas_conv_supported((12, 16, 250), 2, 9, 4)  # x % 128
    assert not pallas_conv_supported((12, 12, 256), 1, 9, 4)  # y % granule
    assert not pallas_conv_supported((12, 16), 1, 9, 4)       # 2D
    assert not pallas_conv_supported((12, 16, 256), 1, 9, 4, valid=True)
    assert pallas_conv_supported((12, 16, 256), 1, 9, 4)
