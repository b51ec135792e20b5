import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.symfield import sym_index, sym_pairs
from multigridanisotropicdiffusion_tpu.ops.hessian import gaussian_kernels_1d, hessian


def _h(planes, ndim, i, j):
    return np.asarray(planes[sym_index(ndim, i, j)])


def test_kernel_moments():
    for sigma, h in [(1.0, 1.0), (2.0, 0.5), (0.5, 0.3125), (0.3, 1.0)]:
        g, g1, g2 = gaussian_kernels_1d(sigma, h)
        r = (len(g) - 1) // 2
        x = np.arange(-r, r + 1) * h
        assert abs(g.sum() - 1) < 1e-12
        assert abs(g1.sum()) < 1e-12
        assert abs((g1 * x).sum() - 1) < 1e-12
        assert abs(g2.sum()) < 1e-12
        assert abs((g2 * x * x).sum() / 2 - 1) < 1e-12


def test_hessian_exact_on_quadratics():
    """H(ax^2+bxy+cy^2+...) is the constant matrix [[2a, b], [b, 2c]] in the
    interior (edge-replicate padding perturbs only a border band)."""
    n = 48
    y, x = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float), indexing="ij")
    u = 3.0 * y * y + 2.0 * x * y - 1.5 * x * x + 4 * x - 7 * y + 2
    h = hessian(jnp.asarray(u), sigma=2.0, spacing=(1.0, 1.0), normalize_across_scale=False)
    r = 10  # outside the kernel-support band
    sl = (slice(r, -r), slice(r, -r))
    np.testing.assert_allclose(_h(h, 2, 0, 0)[sl], 6.0, atol=1e-8)
    np.testing.assert_allclose(_h(h, 2, 0, 1)[sl], 2.0, atol=1e-8)
    np.testing.assert_allclose(_h(h, 2, 1, 0)[sl], 2.0, atol=1e-8)
    np.testing.assert_allclose(_h(h, 2, 1, 1)[sl], -3.0, atol=1e-8)


def test_hessian_anisotropic_spacing():
    """Physical-coordinate derivatives: halving the spacing along one axis
    scales the second derivative by 4 for the same voxel data."""
    n = 64
    z = np.arange(n, dtype=float)
    u = np.broadcast_to(z * z, (n, n)).copy()  # quadratic along axis 1
    h1 = hessian(jnp.asarray(u), 1.5, (1.0, 1.0), normalize_across_scale=False)
    h2 = hessian(jnp.asarray(u), 1.5, (1.0, 0.5), normalize_across_scale=False)
    r = 16  # > kernel radius ceil(4 * 1.5/0.5) = 12
    np.testing.assert_allclose(_h(h1, 2, 1, 1)[r:-r, r:-r], 2.0, atol=1e-8)
    np.testing.assert_allclose(_h(h2, 2, 1, 1)[r:-r, r:-r], 8.0, atol=1e-7)


def test_scale_normalization():
    n = 32
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(n, n)))
    h_raw = hessian(u, 1.5, normalize_across_scale=False)
    h_norm = hessian(u, 1.5, normalize_across_scale=True)
    for a, b in zip(h_norm, h_raw):
        np.testing.assert_allclose(np.asarray(a), 1.5**2 * np.asarray(b), rtol=1e-12)


def test_hessian_3d_symmetric():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(16, 17, 18)))
    h = hessian(u, 1.0, (1.0, 0.5, 2.0))
    assert len(h) == 6  # upper triangle of a 3x3 symmetric matrix
    for plane in h:
        assert plane.shape == (16, 17, 18)


def test_smooth_fd_exact_on_quadratics():
    """smooth_fd mode shares the exactness-on-quadratics property: moment-
    corrected smoothing preserves quadratics up to a constant shift, and
    central differences are exact on quadratics."""
    n = 48
    y, x = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float), indexing="ij")
    u = 3.0 * y * y + 2.0 * x * y - 1.5 * x * x + 4 * x - 7 * y + 2
    h = hessian(jnp.asarray(u), sigma=2.0, spacing=(1.0, 1.0),
                normalize_across_scale=False, mode="smooth_fd")
    r = 10
    sl = (slice(r, -r), slice(r, -r))
    np.testing.assert_allclose(_h(h, 2, 0, 0)[sl], 6.0, atol=1e-8)
    np.testing.assert_allclose(_h(h, 2, 0, 1)[sl], 2.0, atol=1e-8)
    np.testing.assert_allclose(_h(h, 2, 1, 1)[sl], -3.0, atol=1e-8)


def test_smooth_fd_close_to_gaussian_derivative():
    """On a smooth field the two modes agree to FD discretization error."""
    n = 32
    rng = np.random.default_rng(11)
    coords = np.meshgrid(*[np.arange(n, dtype=float)] * 3, indexing="ij")
    u = 50.0 * np.exp(
        -((coords[0] - 16) ** 2 + (coords[1] - 14) ** 2 + (coords[2] - 18) ** 2)
        / (2 * 6.0**2)
    )
    want = hessian(jnp.asarray(u), 2.0, (1.0, 1.0, 1.0))
    got = hessian(jnp.asarray(u), 2.0, (1.0, 1.0, 1.0), mode="smooth_fd")
    scale = max(np.abs(np.asarray(p)).max() for p in want)
    # the two modes' (equally arbitrary) edge-replicate treatments differ in
    # a ~2-voxel border band; compare the interior
    sl = (slice(2, -2),) * 3
    for i, (g, w) in enumerate(zip(got, want)):
        err = np.abs(np.asarray(g) - np.asarray(w))[sl].max() / scale
        assert err < 0.02, (i, err)


def test_smooth_fd_tiled_matches_untiled():
    """smooth_fd through the z-slab-tiled pipeline (halo = kernel radius + 1)."""
    from multigridanisotropicdiffusion_tpu.models.ved import fused_vesselness_tensor

    n = 24
    rng = np.random.default_rng(3)
    coords = np.meshgrid(*[np.arange(n, dtype=float)] * 3, indexing="ij")
    vol = 100.0 * np.exp(
        -((coords[1] - 11.5) ** 2 + (coords[2] - 11.5) ** 2) / (2 * 1.5**2)
    ) + rng.normal(scale=1.0, size=(n, n, n))
    kw = dict(
        scales=(0.775, 1.245, 2.0), spacing=(1.0, 1.0, 1.0),
        alpha=0.5, beta=0.5, gamma=5.0, epsilon=0.01, omega=5.0,
        sensitivity=10.0, hessian_mode="smooth_fd",
    )
    want_resp, want_t = fused_vesselness_tensor(jnp.asarray(vol), **kw)
    got_resp, got_t = fused_vesselness_tensor(jnp.asarray(vol), z_slab=8, **kw)
    np.testing.assert_allclose(
        np.asarray(got_resp), np.asarray(want_resp), rtol=1e-11, atol=1e-14
    )
    for got_p, want_p in zip(got_t, want_t):
        np.testing.assert_allclose(
            np.asarray(got_p), np.asarray(want_p), rtol=1e-11, atol=1e-13
        )
