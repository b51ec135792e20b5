import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.stencil import (
    StencilOperator,
    apply_stencil,
    densify,
    stencil_offsets,
)
from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca

from .conftest import make_spd_tensor_field
from .oracles import dca_oracle


def cf(tensor):
    """numpy (*shape, D, D) -> canonical plane tuple."""
    from multigridanisotropicdiffusion_tpu.core.symfield import sym_pairs
    ndim = tensor.shape[-1]
    return tuple(jnp.asarray(tensor[..., i, j]) for i, j in sym_pairs(ndim))


@pytest.mark.parametrize(
    "shape,spacing",
    [
        ((7, 6), (1.0, 1.0)),
        ((8, 9), (0.5, 2.0)),
        ((6, 6), (1.0, 3.0)),
        ((6, 7, 8), (1.0, 0.5, 2.0)),
        ((7, 7, 7), (0.3125, 0.3125, 0.5)),
    ],
)
def test_dca_matches_oracle(rng, shape, spacing):
    ndim = len(shape)
    tensor = make_spd_tensor_field(rng, shape, ndim)
    dt = 0.1

    op = assemble_dca(cf(tensor), spacing, dt)
    oracle = dca_oracle(tensor, spacing, dt)

    offsets = stencil_offsets(ndim)
    assert op.offsets == offsets
    for k, off in enumerate(offsets):
        expected = oracle.get(off, np.zeros(shape))
        np.testing.assert_allclose(
            np.asarray(op.coeffs[k]), expected, rtol=1e-12, atol=1e-12,
            err_msg=f"offset {off}",
        )
    # Nothing may remain on offsets we dropped (3D corners).
    for off, plane in oracle.items():
        if off not in offsets:
            np.testing.assert_allclose(plane, 0.0, atol=1e-14)


def test_dca_identity_for_zero_tensor():
    shape = (6, 6)
    tensor = tuple(jnp.zeros(shape) for _ in range(3))
    op = assemble_dca(tensor, (1.0, 1.0), 0.1)
    x = jnp.arange(36.0).reshape(shape)
    np.testing.assert_allclose(np.asarray(apply_stencil(op, x)), np.asarray(x))


def test_dca_row_sum_is_one(rng):
    """A = Id - dt*L with Neumann BCs: constants are preserved (L 1 = 0), so
    every row sums to 1. This holds including borders thanks to the folding."""
    shape = (7, 8)
    tensor = make_spd_tensor_field(rng, shape, 2)
    op = assemble_dca(cf(tensor), (1.0, 2.0), 0.05)
    ones = jnp.ones(shape)
    np.testing.assert_allclose(
        np.asarray(apply_stencil(op, ones)), 1.0, rtol=1e-10, atol=1e-10
    )


def test_dca_3d_row_sum(rng):
    shape = (6, 7, 6)
    tensor = make_spd_tensor_field(rng, shape, 3)
    op = assemble_dca(cf(tensor), (1.0, 1.0, 2.0), 0.1)
    np.testing.assert_allclose(
        np.asarray(apply_stencil(op, jnp.ones(shape))), 1.0, rtol=1e-10, atol=1e-10
    )


def test_densify_matches_apply(rng):
    shape = (6, 7)
    tensor = make_spd_tensor_field(rng, shape, 2)
    op = assemble_dca(cf(tensor), (1.0, 1.0), 0.1)
    a = np.asarray(densify(op))
    x = rng.normal(size=shape)
    np.testing.assert_allclose(
        a @ x.ravel(),
        np.asarray(apply_stencil(op, jnp.asarray(x))).ravel(),
        rtol=1e-12,
        atol=1e-12,
    )
