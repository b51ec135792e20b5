"""Fused Pallas 3D restriction kernel vs the slice-form oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.ops.pallas_transfer import (
    pallas_restrict3d,
    pallas_restrict_supported,
)
from multigridanisotropicdiffusion_tpu.ops.transfer import restrict


@pytest.mark.parametrize("shape", [
    (8, 16, 256),
    (10, 32, 512),
    (16, 16, 256),
    (4, 16, 256),
])
def test_pallas_restrict_matches_slice_path(rng, shape):
    cent = ("c", "c", "c")
    assert pallas_restrict_supported(shape, cent, 8, interpret=True)
    x = jnp.asarray(rng.normal(size=shape))
    want = np.asarray(restrict(x, cent, lane_mm=False))
    got = np.asarray(pallas_restrict3d(x, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_pallas_restrict_support_gate():
    c3 = ("c", "c", "c")
    assert not pallas_restrict_supported((8, 16, 128), c3)   # x % 256 != 0
    assert not pallas_restrict_supported((7, 16, 256), c3)   # odd z
    assert not pallas_restrict_supported((8, 24, 256), c3)   # cy=12: no tile
    assert not pallas_restrict_supported((4, 8, 256), c3)    # cy < granule
    assert not pallas_restrict_supported((8, 16), ("c", "c"))
    assert not pallas_restrict_supported((8, 16, 256), ("c", "v", "c"))
    assert pallas_restrict_supported((8, 16, 256), c3)


def test_pallas_restrict_two_traces(rng):
    """Regression: the cached builder must not capture the first caller's
    trace (the weight constants were once jnp.asarray'd at build time inside
    the first jit trace and leaked into every later one)."""
    import jax

    x = jnp.asarray(rng.normal(size=(8, 16, 256)))
    f1 = jax.jit(lambda v: pallas_restrict3d(v, interpret=True))
    f2 = jax.jit(lambda v: pallas_restrict3d(v * 2.0, interpret=True))
    a = np.asarray(f1(x))
    b = np.asarray(f2(x))
    np.testing.assert_allclose(b, 2 * a, rtol=1e-12, atol=1e-13)


def test_pallas_restrict_f32(rng):
    shape = (8, 16, 256)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    want = np.asarray(restrict(x, ("c",) * 3, lane_mm=False))
    got = np.asarray(pallas_restrict3d(x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# prolongation kernel
# ---------------------------------------------------------------------------

from multigridanisotropicdiffusion_tpu.ops.pallas_transfer import (  # noqa: E402
    pallas_prolong3d,
    pallas_prolong_supported,
)
from multigridanisotropicdiffusion_tpu.ops.transfer import prolong  # noqa: E402


@pytest.mark.parametrize("coarse_shape", [
    (4, 8, 128),
    (5, 16, 256),
    (8, 8, 128),
    (2, 8, 128),
])
def test_pallas_prolong_matches_slice_path(rng, coarse_shape):
    cent = ("c", "c", "c")
    assert pallas_prolong_supported(coarse_shape, cent, 8, interpret=True)
    x = jnp.asarray(rng.normal(size=coarse_shape))
    want = np.asarray(prolong(x, cent, lane_mm=False))
    got = np.asarray(pallas_prolong3d(x, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_pallas_prolong_support_gate():
    c3 = ("c", "c", "c")
    assert not pallas_prolong_supported((4, 8, 100), c3)    # cx % 128 != 0
    assert not pallas_prolong_supported((1, 8, 128), c3)    # cz < 2
    assert not pallas_prolong_supported((4, 12, 128), c3)   # cy: no tile
    assert not pallas_prolong_supported((4, 8), ("c", "c"))
    assert not pallas_prolong_supported((4, 8, 128), ("c", "v", "c"))
    assert pallas_prolong_supported((4, 8, 128), c3)
