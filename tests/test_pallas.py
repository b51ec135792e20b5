"""Pallas RBGS kernel: interpreter-mode equivalence with the XLA path."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes
from multigridanisotropicdiffusion_tpu.ops.compressed import assemble_compressed_dca
from multigridanisotropicdiffusion_tpu.ops.pallas_smoothers import (
    pallas_rbgs_sweep,
    pallas_residual,
)
from multigridanisotropicdiffusion_tpu.ops.smoothers import rb_gauss_seidel_sweep

from .conftest import make_spd_tensor_field


@pytest.mark.parametrize(
    "shape,spacing",
    [
        ((6, 7, 8), (1.0, 0.5, 2.0)),
        ((9, 8, 10), (1.0, 1.0, 1.0)),
        ((7, 7, 7), (0.3125, 0.3125, 0.5)),
    ],
)
def test_pallas_rbgs_matches_xla(rng, shape, spacing):
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    comp = assemble_compressed_dca(as_sym_planes(tensor, shape), spacing, 0.1)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    got = np.asarray(pallas_rbgs_sweep(comp, x, b, interpret=True))
    want = np.asarray(rb_gauss_seidel_sweep(comp, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_pallas_rbgs_repeated(rng):
    shape = (8, 8, 8)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    comp = assemble_compressed_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    xg = x
    for _ in range(5):
        x = pallas_rbgs_sweep(comp, x, b, interpret=True)
        xg = rb_gauss_seidel_sweep(comp, xg, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xg), rtol=1e-11, atol=1e-11)


def test_pallas_y_tiled(rng):
    """Force a y-tile smaller than Y to exercise the halo-row path."""
    shape = (6, 8, 10)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    comp = assemble_compressed_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    want = np.asarray(rb_gauss_seidel_sweep(comp, x, b))
    for ty in (2, 4, 8):
        got = np.asarray(pallas_rbgs_sweep(comp, x, b, interpret=True, ty=ty))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12, err_msg=f"ty={ty}")


def test_pallas_y_tiled_8aligned(rng):
    """8-aligned y-tiling — the exact block/halo layout used on real TPU
    (8-row halo blocks, statically sliced)."""
    shape = (5, 24, 9)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    comp = assemble_compressed_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    want = np.asarray(rb_gauss_seidel_sweep(comp, x, b))
    for ty in (8, 24):
        got = np.asarray(pallas_rbgs_sweep(comp, x, b, interpret=True, ty=ty))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12, err_msg=f"ty={ty}")


def test_pallas_residual_matches_xla(rng):
    for shape, ty in (((6, 7, 9), None), ((5, 24, 9), 8), ((4, 16, 8), 16)):
        tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
        comp = assemble_compressed_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
        x = jnp.asarray(rng.normal(size=shape))
        b = jnp.asarray(rng.normal(size=shape))
        got = np.asarray(pallas_residual(comp, x, b, interpret=True, ty=ty))
        want = np.asarray(b - comp.apply(x))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                   err_msg=f"shape={shape} ty={ty}")


def test_pallas_rejects_2d(rng):
    shape = (8, 8)
    tensor = make_spd_tensor_field(rng, shape, 2)
    comp = assemble_compressed_dca(as_sym_planes(tensor, shape), (1.0, 1.0), 0.1)
    with pytest.raises(ValueError):
        pallas_rbgs_sweep(comp, jnp.zeros(shape), jnp.zeros(shape), interpret=True)


def test_pallas_bf16_blocks(rng):
    """bf16 coefficient/field blocks: loads upcast to f32 in-kernel, stores
    downcast — agreement with the XLA sweep on the same bf16 data, including
    the 16-row-granule y-tiled halo path."""
    shape = (4, 32, 16)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    comp = assemble_compressed_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    import jax

    comp16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), comp)
    x = jnp.asarray(rng.normal(size=shape)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=shape)).astype(jnp.bfloat16)
    want = np.asarray(
        rb_gauss_seidel_sweep(comp16, x, b).astype(jnp.float32)
    )
    for ty in (16, 32):  # 16 = granule-aligned halo path, 32 = full plane
        got = np.asarray(
            pallas_rbgs_sweep(comp16, x, b, interpret=True, ty=ty).astype(jnp.float32)
        )
        # in-kernel f32 compute vs XLA bf16 compute: bf16-rounding tolerance
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05, err_msg=f"ty={ty}")
