import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.grids import CELL, VERTEX
from multigridanisotropicdiffusion_tpu.ops.transfer import (
    coarse_size,
    prolong,
    restrict,
    restrict_tensor,
)

from .oracles import prolong_oracle, restrict_oracle

SHAPES_2D = [
    ((8, 8), (CELL, CELL)),
    ((9, 9), (VERTEX, VERTEX)),
    ((8, 9), (CELL, VERTEX)),
    ((9, 8), (VERTEX, CELL)),
    ((12, 7), (CELL, VERTEX)),
]
SHAPES_3D = [
    ((8, 9, 12), (CELL, VERTEX, CELL)),
    ((7, 7, 8), (VERTEX, VERTEX, CELL)),
]


@pytest.mark.parametrize("fine_shape,centering", SHAPES_2D + SHAPES_3D)
def test_restrict_matches_oracle(rng, fine_shape, centering):
    u = rng.normal(size=fine_shape)
    got = np.asarray(restrict(jnp.asarray(u), centering))
    want = restrict_oracle(u, centering)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("fine_shape,centering", SHAPES_2D + SHAPES_3D)
def test_prolong_matches_oracle(rng, fine_shape, centering):
    coarse_shape = tuple(coarse_size(n, c) for n, c in zip(fine_shape, centering))
    u = rng.normal(size=coarse_shape)
    got = np.asarray(prolong(jnp.asarray(u), centering))
    want = prolong_oracle(u, centering)
    assert got.shape == fine_shape
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_restrict_preserves_constants(rng):
    for fine_shape, centering in SHAPES_2D:
        u = jnp.ones(fine_shape)
        np.testing.assert_allclose(
            np.asarray(restrict(u, centering)), 1.0, rtol=1e-12
        )


def test_prolong_preserves_constants():
    for fine_shape, centering in SHAPES_2D:
        coarse_shape = tuple(
            coarse_size(n, c) for n, c in zip(fine_shape, centering)
        )
        u = jnp.ones(coarse_shape)
        np.testing.assert_allclose(
            np.asarray(prolong(u, centering)), 1.0, rtol=1e-12
        )


def test_restrict_tensor_componentwise(rng):
    shape = (8, 9)
    planes = tuple(jnp.asarray(rng.normal(size=shape)) for _ in range(3))
    centering = (CELL, VERTEX)
    got = restrict_tensor(planes, centering)
    assert len(got) == 3
    for g, p in zip(got, planes):
        want = restrict_oracle(np.asarray(p), centering)
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-12, atol=1e-12)
