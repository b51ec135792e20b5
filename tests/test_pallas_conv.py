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
        assert pallas_conv_supported(shape, axis, len(k), 8, interpret=True), (name, axis)
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
    assert pallas_conv_supported(shape, 1, len(g), 8, interpret=True)
    want = np.asarray(_conv_axis(x, np.asarray(g), 1))
    got = np.asarray(pallas_conv_axis(x, g, 1, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_pallas_fd_hessian_matches_xla(rng):
    """The fused 6-plane FD kernel vs the XLA shifted-slice FD pass (exact:
    same taps, same edge replication on y/x, same z-halo consumption)."""
    from multigridanisotropicdiffusion_tpu.ops.hessian import _hessian_smooth_fd
    from multigridanisotropicdiffusion_tpu.ops.pallas_conv import (
        pallas_fd_hessian,
        pallas_fd_supported,
    )

    spacing = (0.5, 0.3125, 0.3125)
    sigma = 1.0
    shape = (20, 16, 256)
    u = jnp.asarray(rng.normal(size=shape))
    want = _hessian_smooth_fd(u, sigma, spacing, True, None,
                              allow_pallas=False)
    # reproduce the smoothed valid-z field the production path feeds the FD
    from multigridanisotropicdiffusion_tpu.ops.hessian import (
        _conv_axis,
        gaussian_kernels_1d,
        kernel_radius,
    )

    r = kernel_radius(sigma, spacing[0]) + 1
    up = jnp.pad(u, ((r, r), (0, 0), (0, 0)), mode="edge")
    us = up
    for d in range(3):
        g = gaussian_kernels_1d(sigma, spacing[d])[0]
        if d == 0:
            extra = (r - 1) - (len(g) - 1) // 2
            g = np.pad(np.asarray(g), (extra, extra))
            us = _conv_axis(us, g, 0, valid=True)
        else:
            us = _conv_axis(us, g, d)
    assert pallas_fd_supported(tuple(us.shape), 8, interpret=True)
    norm = sigma ** 2
    h0, h1, h2 = spacing
    facs = (norm / h0**2, norm / (4 * h0 * h1), norm / (4 * h0 * h2),
            norm / h1**2, norm / (4 * h1 * h2), norm / h2**2)
    got = pallas_fd_hessian(us, facs, interpret=True)
    assert len(got) == 6
    for k, (g_, w_) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                   rtol=1e-12, atol=1e-13, err_msg=str(k))


def test_pallas_conv_support_gate():
    assert not pallas_conv_supported((12, 16, 250), 2, 9, 4)  # x % 128
    assert not pallas_conv_supported((12, 12, 256), 1, 9, 4)  # y % granule
    assert not pallas_conv_supported((12, 16), 1, 9, 4)       # 2D
    assert not pallas_conv_supported((12, 16, 256), 1, 9, 4, valid=True)
    assert pallas_conv_supported((12, 16, 256), 1, 9, 4)


def test_pallas_conv_yx_matches_sequential(rng):
    from multigridanisotropicdiffusion_tpu.ops.pallas_conv import (
        pallas_conv_yx,
        pallas_conv_yx_supported,
    )
    from multigridanisotropicdiffusion_tpu.ops.hessian import (
        _conv_axis,
        gaussian_kernels_1d,
    )

    shape = (6, 16, 256)
    x = jnp.asarray(rng.normal(size=shape))
    gy = gaussian_kernels_1d(1.1, 1.0)[0]
    gx = gaussian_kernels_1d(1.1, 0.7)[0]
    assert pallas_conv_yx_supported(shape, len(gy), len(gx), 8, interpret=True)
    want = _conv_axis(_conv_axis(x, gy, 1, allow_pallas=False), gx, 2,
                      allow_pallas=False)
    got = pallas_conv_yx(x, gy, gx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-13)
