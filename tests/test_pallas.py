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


def test_pallas_2d_compressed_matches_xla(rng):
    """Round-5 2D kernels: the reference's own primary workload class
    (test/itk2DDiffusionTest_GS.cxx) now has a fused sweep too."""
    for shape, spacing in (((16, 24), (1.0, 0.7)), ((13, 11), (0.5, 1.0)),
                           ((64, 32), (1.0, 1.0))):
        tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
        comp = assemble_compressed_dca(
            as_sym_planes(tensor, shape), spacing, 0.1
        )
        x = jnp.asarray(rng.normal(size=shape))
        b = jnp.asarray(rng.normal(size=shape))
        got = np.asarray(pallas_rbgs_sweep(comp, x, b, interpret=True))
        want = np.asarray(rb_gauss_seidel_sweep(comp, x, b))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                   err_msg=str(shape))
        gr = np.asarray(pallas_residual(comp, x, b, interpret=True))
        wr = np.asarray(b - comp.apply(x))
        np.testing.assert_allclose(gr, wr, rtol=1e-12, atol=1e-12)


def test_pallas_2d_y_tiled(rng):
    """2D with a y-tile smaller than Y (granule-row halo blocks)."""
    from multigridanisotropicdiffusion_tpu.ops.pallas_smoothers import (
        pallas_rbgs_halfsweep,
    )

    shape = (32, 16)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=2.0)
    comp = assemble_compressed_dca(as_sym_planes(tensor, shape), (1.0, 1.0), 0.1)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    got = pallas_rbgs_halfsweep(comp, x, b, 0, interpret=True, ty=8)
    got = np.asarray(
        pallas_rbgs_halfsweep(comp, got, b, 1, interpret=True, ty=8)
    )
    want = np.asarray(rb_gauss_seidel_sweep(comp, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_pallas_2d_stored_matches_xla(rng):
    """Generic 2D stored radius-1 operator (collapsed-Galerkin-style)."""
    from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca

    shape = (16, 16)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=2.0)
    op = assemble_dca(as_sym_planes(tensor, shape), (1.0, 1.0), 0.1)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    got = np.asarray(pallas_rbgs_sweep(op, x, b, interpret=True))
    want = np.asarray(rb_gauss_seidel_sweep(op, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


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


# ---------------------------------------------------------------------------
# Generic stored-operator kernel (radius-1 StencilOperator, e.g. collapsed
# Galerkin coarse levels)
# ---------------------------------------------------------------------------

def _random_radius1_op(rng, shape, drop_corners=False):
    """Random diagonally-dominant radius-1 stored operator honoring the
    boundary invariant (out-of-range offsets carry zero coefficients)."""
    from multigridanisotropicdiffusion_tpu.core.stencil import (
        StencilOperator,
        stencil_offsets,
    )

    offsets = stencil_offsets(3, 1, drop_corners=drop_corners)
    planes = []
    guard = np.zeros(shape)
    for off in offsets:
        if all(o == 0 for o in off):
            planes.append(None)
            continue
        p = rng.normal(size=shape) * 0.1
        for d, o in enumerate(off):
            sl = [slice(None)] * 3
            if o > 0:
                sl[d] = slice(shape[d] - o, shape[d])
            elif o < 0:
                sl[d] = slice(0, -o)
            else:
                continue
            p[tuple(sl)] = 0.0
        planes.append(p)
        guard += np.abs(p)
    center = offsets.index((0, 0, 0))
    planes[center] = guard + 1.0
    return StencilOperator(tuple(jnp.asarray(p) for p in planes), offsets)


@pytest.mark.parametrize("drop_corners", [False, True])
def test_pallas_stored_matches_xla(rng, drop_corners):
    """27-point (and 19-point) stored-operator kernel vs the XLA sweep."""
    shape = (6, 8, 10)
    op = _random_radius1_op(rng, shape, drop_corners)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    want = np.asarray(rb_gauss_seidel_sweep(op, x, b))
    for ty in (None, 2, 8):
        got = np.asarray(pallas_rbgs_sweep(op, x, b, interpret=True, ty=ty))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                   err_msg=f"ty={ty}")


def test_pallas_stored_residual_matches_xla(rng):
    shape = (5, 24, 9)
    op = _random_radius1_op(rng, shape)
    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    want = np.asarray(b - op.apply(x))
    for ty in (None, 8):
        got = np.asarray(pallas_residual(op, x, b, interpret=True, ty=ty))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                   err_msg=f"ty={ty}")


def test_pallas_stored_collapsed_galerkin_level(rng):
    """The production use: a collapsed Galerkin coarse operator swept by the
    generic kernel agrees with the XLA sweep."""
    from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
    from multigridanisotropicdiffusion_tpu.ops.galerkin import (
        assemble_galerkin_parabolic,
    )

    shape = (12, 14, 16)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    fine = assemble_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    coarse = assemble_galerkin_parabolic(fine, ("c", "c", "c"), collapse=True)
    assert coarse.radius == 1

    from multigridanisotropicdiffusion_tpu.ops.pallas_smoothers import (
        pallas_compatible,
    )

    assert pallas_compatible(coarse)
    cshape = coarse.shape
    x = jnp.asarray(rng.normal(size=cshape))
    b = jnp.asarray(rng.normal(size=cshape))
    got = np.asarray(pallas_rbgs_sweep(coarse, x, b, interpret=True))
    want = np.asarray(rb_gauss_seidel_sweep(coarse, x, b))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_pallas_stored_radius2_exact_galerkin(rng):
    """Exact Galerkin levels (radius 2, up to 125 planes) run the radius-2
    kernel variant (5 z-positions, 2-row y halos, 2-lane rolls) and must
    agree with the XLA sweep; the distributed shard-local form stays gated
    to radius 1."""
    from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
    from multigridanisotropicdiffusion_tpu.ops.galerkin import assemble_galerkin
    from multigridanisotropicdiffusion_tpu.ops.pallas_smoothers import (
        pallas_compatible,
    )

    shape = (20, 22, 24)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    fine = assemble_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    exact = assemble_galerkin(fine, ("c", "c", "c"))
    assert exact.radius == 2
    assert pallas_compatible(exact)
    assert not pallas_compatible(exact, max_radius=1)

    cshape = exact.shape  # (10, 11, 12)
    x = jnp.asarray(rng.normal(size=cshape))
    b = jnp.asarray(rng.normal(size=cshape))
    want = np.asarray(rb_gauss_seidel_sweep(exact, x, b))
    got = np.asarray(pallas_rbgs_sweep(exact, x, b, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    want_r = np.asarray(b - exact.apply(x))
    got_r = np.asarray(pallas_residual(exact, x, b, interpret=True))
    np.testing.assert_allclose(got_r, want_r, rtol=1e-12, atol=1e-12)


def test_pallas_stored_radius2_y_tiled(rng):
    """Radius-2 kernel with a y-tile smaller than Y: the 2-row halo
    stitching around each tile."""
    from multigridanisotropicdiffusion_tpu.core.stencil import (
        StencilOperator,
        stencil_offsets,
    )

    shape = (5, 16, 10)
    offsets = stencil_offsets(3, 2, drop_corners=False)
    rng2 = np.random.default_rng(3)
    planes = []
    guard = np.zeros(shape)
    for off in offsets:
        if all(o == 0 for o in off):
            planes.append(None)
            continue
        p = rng2.normal(size=shape) * 0.05
        for d, o in enumerate(off):
            sl = [slice(None)] * 3
            if o > 0:
                sl[d] = slice(shape[d] - o, shape[d])
            elif o < 0:
                sl[d] = slice(0, -o)
            else:
                continue
            p[tuple(sl)] = 0.0
        planes.append(p)
        guard += np.abs(p)
    center = offsets.index((0, 0, 0))
    planes[center] = guard + 1.0
    op = StencilOperator(tuple(jnp.asarray(p) for p in planes), offsets)

    x = jnp.asarray(rng.normal(size=shape))
    b = jnp.asarray(rng.normal(size=shape))
    want = np.asarray(rb_gauss_seidel_sweep(op, x, b))
    for ty in (4, 8, 16):
        got = np.asarray(pallas_rbgs_sweep(op, x, b, interpret=True, ty=ty))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                   err_msg=f"ty={ty}")
