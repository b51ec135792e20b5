"""Galerkin coarse-operator tests: exact agreement with dense R A P."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.grids import CELL, VERTEX
from multigridanisotropicdiffusion_tpu.core.stencil import densify
from multigridanisotropicdiffusion_tpu.models.mad import MADConfig, mad_diffusion
from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
from multigridanisotropicdiffusion_tpu.ops.galerkin import assemble_galerkin
from multigridanisotropicdiffusion_tpu.ops.transfer import (
    coarse_size,
    prolong,
    restrict,
)

from .conftest import make_spd_tensor_field


def _dense_transfer(fine_shape, centering):
    """Materialize R and P as dense matrices by probing with basis vectors."""
    coarse_shape = tuple(coarse_size(s, c) for s, c in zip(fine_shape, centering))
    nf = int(np.prod(fine_shape))
    nc = int(np.prod(coarse_shape))
    r = np.zeros((nc, nf))
    for i in range(nf):
        e = np.zeros(nf)
        e[i] = 1.0
        r[:, i] = np.asarray(
            restrict(jnp.asarray(e.reshape(fine_shape)), centering)
        ).ravel()
    p = np.zeros((nf, nc))
    for j in range(nc):
        e = np.zeros(nc)
        e[j] = 1.0
        p[:, j] = np.asarray(
            prolong(jnp.asarray(e.reshape(coarse_shape)), centering)
        ).ravel()
    return r, p


@pytest.mark.parametrize(
    "shape,centering",
    [
        ((9, 9), (VERTEX, VERTEX)),
        ((8, 8), (CELL, CELL)),
        ((8, 9), (CELL, VERTEX)),
        ((9, 12), (VERTEX, CELL)),
        ((8, 9, 8), (CELL, VERTEX, CELL)),
    ],
)
def test_galerkin_matches_dense_rap(rng, shape, centering):
    ndim = len(shape)
    tensor = make_spd_tensor_field(rng, shape, ndim, hi=3.0)
    from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes

    fine_op = assemble_dca(as_sym_planes(tensor, shape), (1.0,) * ndim, 0.1)

    coarse_op = assemble_galerkin(fine_op, centering)
    got = np.asarray(densify(coarse_op))

    r, p = _dense_transfer(shape, centering)
    a = np.asarray(densify(fine_op))
    want = r @ a @ p
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize(
    "shape,centering",
    [
        ((8, 8), (CELL, CELL)),
        ((8, 9, 8), (CELL, VERTEX, CELL)),
    ],
)
def test_galerkin_parabolic_matches_dense(rng, shape, centering):
    """A_c = I - R (I - A_f) P — the implicit-Euler hierarchy form (exact
    identity + Galerkin dt*L)."""
    from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes
    from multigridanisotropicdiffusion_tpu.ops.galerkin import (
        assemble_galerkin_parabolic,
    )

    ndim = len(shape)
    tensor = make_spd_tensor_field(rng, shape, ndim, hi=3.0)
    fine_op = assemble_dca(as_sym_planes(tensor, shape), (1.0,) * ndim, 0.1)

    got = np.asarray(densify(assemble_galerkin_parabolic(fine_op, centering)))
    r, p = _dense_transfer(shape, centering)
    a = np.asarray(densify(fine_op))
    want = np.eye(r.shape[0]) - r @ (np.eye(a.shape[0]) - a) @ p
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


def test_galerkin_hierarchy_stays_diagonally_dominant(rng):
    """Deep-chain regression: the literal R A P of A = I - dt*L reaches
    sum|offdiag|/diag ~ 4-5 by the 5th coarsening and red-black GS DIVERGES
    on those levels (~2.5x residual growth per sweep; the 256^3/192^3 f32
    six-level solves blew up to relres=inf).  The parabolic form keeps every
    level's off-diagonal mass bounded by its dt*L part, so smoothing stays
    contractive on the whole chain."""
    from multigridanisotropicdiffusion_tpu.core.grids import (
        build_level_descriptors,
    )
    from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes
    from multigridanisotropicdiffusion_tpu.models.mad import build_hierarchy
    from multigridanisotropicdiffusion_tpu.ops.smoothers import (
        rb_gauss_seidel_sweep,
    )

    shape = (192, 192)  # six levels: 192 96 48 24 12 6 (2D keeps it cheap)
    levels = build_level_descriptors(shape, (1.0, 1.0))
    assert len(levels) == 6
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    hier = build_hierarchy(
        as_sym_planes(tensor, shape), levels, 0.1, coarse_operator="galerkin",
        galerkin_variant="exact",
    )
    for lvl, op in enumerate(hier.operators[1:], start=1):
        absrow = sum(
            np.abs(np.asarray(op.coeffs[k]))
            for k, off in enumerate(op.offsets)
            if any(o != 0 for o in off)
        )
        dom = absrow / np.asarray(op.diag)
        assert dom.max() < 1.5, (lvl, dom.max())
        # smoother-only iteration contracts on every level
        b = jnp.asarray(rng.normal(size=op.shape))
        x = jnp.zeros_like(b)
        r0 = float(jnp.linalg.norm(b - op.apply(x)))
        for _ in range(4):
            x = rb_gauss_seidel_sweep(op, x, b)
        r4 = float(jnp.linalg.norm(b - op.apply(x)))
        assert r4 < 0.8 * r0, (lvl, r4 / r0)


def test_galerkin_solver_converges(rng):
    """End-to-end MAD with Galerkin coarse operators: converges to the same
    fine-grid solution as the DCA hierarchy (the fine operator is identical;
    coarse operators only shape the correction path)."""
    shape = (33, 32)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    image = rng.normal(size=shape) * 100.0

    cfg_dca = MADConfig(time_step=0.1, tolerance=1e-10, coarse_operator="dca")
    cfg_gal = MADConfig(time_step=0.1, tolerance=1e-10, coarse_operator="galerkin")
    res_d = mad_diffusion(image, tensor, config=cfg_dca)
    res_g = mad_diffusion(image, tensor, config=cfg_gal)

    assert float(res_g.final_residual[0]) <= 1e-10
    np.testing.assert_allclose(
        np.asarray(res_g.output), np.asarray(res_d.output), rtol=1e-8, atol=1e-8
    )


def test_galerkin_fmg_3d(rng):
    shape = (13, 12, 14)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    image = rng.normal(size=shape) * 10.0
    cfg = MADConfig(
        time_step=0.1, tolerance=1e-10, cycle="fmg", coarse_operator="galerkin"
    )
    res = mad_diffusion(image, tensor, spacing=(1.0, 0.5, 2.0), config=cfg)
    assert float(res.final_residual[0]) <= 1e-10


def test_galerkin_deep_chain_matches_dense_rap(rng):
    """Chained coarsenings with mixed centering: a vertex coarsening of a
    radius-2 Galerkin operator genuinely has radius 2 — assuming radius 1
    aliases offset -2 onto +1 modulo 3 (regression: r1 shipped that bug; max
    dense error was ~5e-3 at level 2 of a 22 -> 11(cell) -> 6(vertex) chain)."""
    from multigridanisotropicdiffusion_tpu.core.grids import (
        build_level_descriptors,
    )
    from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes

    shape = (22, 22)
    levels = build_level_descriptors(shape, (1.0, 1.0))
    assert [l.centering for l in levels][1:] == [(CELL, CELL), (VERTEX, VERTEX)]
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    a0 = assemble_dca(as_sym_planes(tensor, shape), (1.0, 1.0), 0.1)

    a1 = assemble_galerkin(a0, levels[1].centering)
    r1, p1 = _dense_transfer(shape, levels[1].centering)
    want1 = r1 @ np.asarray(densify(a0)) @ p1
    np.testing.assert_allclose(np.asarray(densify(a1)), want1, rtol=1e-11, atol=1e-12)

    a2 = assemble_galerkin(a1, levels[2].centering)
    assert a2.radius == 2
    r2, p2 = _dense_transfer(levels[1].shape, levels[2].centering)
    want2 = r2 @ want1 @ p2
    np.testing.assert_allclose(np.asarray(densify(a2)), want2, rtol=1e-11, atol=1e-12)
