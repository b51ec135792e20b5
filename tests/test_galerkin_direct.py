"""Direct (closed-form) Galerkin assembly: equivalence with the probe path
and the dense R A P, 1-D transfer-matrix parity, and the collapsed variant."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.grids import (
    CELL,
    VERTEX,
    build_level_descriptors,
)
from multigridanisotropicdiffusion_tpu.core.stencil import densify
from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes
from multigridanisotropicdiffusion_tpu.models.mad import MADConfig, mad_diffusion
from multigridanisotropicdiffusion_tpu.ops.compressed import (
    assemble_compressed_dca,
)
from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
from multigridanisotropicdiffusion_tpu.ops.galerkin import (
    assemble_galerkin,
    assemble_galerkin_parabolic,
    collapse_to_radius1,
    stored_plane_terms,
)
from multigridanisotropicdiffusion_tpu.ops.galerkin_direct import (
    prolong_matrix_1d,
    restrict_matrix_1d,
)
from multigridanisotropicdiffusion_tpu.ops.transfer import (
    _prolong_1d_cell,
    _prolong_1d_vertex,
    _restrict_1d_cell,
    _restrict_1d_vertex,
    coarse_size,
)

from .conftest import make_spd_tensor_field


@pytest.mark.parametrize("fine_n", [8, 9, 12, 13, 16, 21])
@pytest.mark.parametrize("centering", [VERTEX, CELL])
def test_transfer_matrices_match_production_ops(fine_n, centering):
    """The numpy 1-D matrices must reproduce the production jnp transfer ops
    exactly (they are the ground truth the banded analysis builds on)."""
    if centering == VERTEX and fine_n % 2 == 0:
        pytest.skip("vertex centering needs odd fine size")
    if centering == CELL and fine_n % 2 == 1:
        pytest.skip("cell centering needs even fine size")
    c = coarse_size(fine_n, centering)
    eye_f = jnp.eye(fine_n, dtype=jnp.float64)
    eye_c = jnp.eye(c, dtype=jnp.float64)
    r_fn = _restrict_1d_vertex if centering == VERTEX else _restrict_1d_cell
    p_fn = _prolong_1d_vertex if centering == VERTEX else _prolong_1d_cell
    r_prod = np.asarray(r_fn(eye_f)).T  # column i = R e_i
    p_prod = np.asarray(p_fn(eye_c)).T
    np.testing.assert_array_equal(restrict_matrix_1d(fine_n, centering), r_prod)
    np.testing.assert_array_equal(prolong_matrix_1d(fine_n, centering), p_prod)


@pytest.mark.parametrize(
    "shape,centering",
    [
        ((9, 9), (VERTEX, VERTEX)),
        ((8, 8), (CELL, CELL)),
        ((8, 9), (CELL, VERTEX)),
        ((9, 12), (VERTEX, CELL)),
        ((8, 9, 8), (CELL, VERTEX, CELL)),
        ((12, 12, 12), (CELL, CELL, CELL)),
    ],
)
def test_direct_matches_probe(rng, shape, centering):
    ndim = len(shape)
    tensor = make_spd_tensor_field(rng, shape, ndim, hi=3.0)
    fine_op = assemble_dca(as_sym_planes(tensor, shape), (1.0,) * ndim, 0.1)

    probe = assemble_galerkin(fine_op, centering, method="probe")
    direct = assemble_galerkin(fine_op, centering, method="direct")
    assert direct.offsets == probe.offsets
    for off, cp, cd in zip(probe.offsets, probe.coeffs, direct.coeffs):
        np.testing.assert_allclose(
            np.asarray(cd), np.asarray(cp), rtol=1e-12, atol=1e-13, err_msg=str(off)
        )


def test_direct_from_compressed_fine_op(rng):
    """The production Galerkin hierarchy coarsens a *compressed* level-0
    operator; the direct path must materialize its planes correctly."""
    shape = (8, 10, 8)
    centering = (CELL, CELL, CELL)
    tensor = as_sym_planes(make_spd_tensor_field(rng, shape, 3, hi=3.0), shape)
    comp = assemble_compressed_dca(tensor, (1.0,) * 3, 0.1)
    stored = assemble_dca(tensor, (1.0,) * 3, 0.1)

    offsets, planes = stored_plane_terms(comp)
    assert offsets == stored.offsets
    for off, a, b in zip(offsets, planes, stored.coeffs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-13,
                                   atol=1e-14, err_msg=str(off))

    probe = assemble_galerkin_parabolic(comp, centering, method="probe")
    direct = assemble_galerkin_parabolic(comp, centering, method="direct")
    assert direct.offsets == probe.offsets
    for off, cp, cd in zip(probe.offsets, probe.coeffs, direct.coeffs):
        np.testing.assert_allclose(
            np.asarray(cd), np.asarray(cp), rtol=1e-12, atol=1e-13, err_msg=str(off)
        )


def test_direct_deep_chain_radius2_fine(rng):
    """Direct assembly of a radius-2 fine operator (a Galerkin level being
    coarsened again) down a mixed-centering chain, vs the probe path."""
    shape = (22, 24)
    levels = build_level_descriptors(shape, (1.0, 1.0))
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    a0 = assemble_dca(as_sym_planes(tensor, shape), (1.0, 1.0), 0.1)

    a1p = assemble_galerkin(a0, levels[1].centering, method="probe")
    a1d = assemble_galerkin(a0, levels[1].centering, method="direct")
    a2p = assemble_galerkin(a1p, levels[2].centering, method="probe")
    a2d = assemble_galerkin(a1d, levels[2].centering, method="direct")
    assert a2d.offsets == a2p.offsets
    assert a2d.radius == 2
    for off, cp, cd in zip(a2p.offsets, a2p.coeffs, a2d.coeffs):
        np.testing.assert_allclose(
            np.asarray(cd), np.asarray(cp), rtol=1e-11, atol=1e-12, err_msg=str(off)
        )


def test_direct_is_jittable(rng):
    """The hierarchy builder traces assembly under jit — the direct path's
    host-side analysis must work at trace time."""
    import jax

    shape = (8, 8)
    centering = (CELL, CELL)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    fine_op = assemble_dca(as_sym_planes(tensor, shape), (1.0,) * 2, 0.1)

    jitted = jax.jit(
        lambda op: assemble_galerkin(op, centering, method="direct")
    )
    got = jitted(fine_op)
    want = assemble_galerkin(fine_op, centering, method="probe")
    for cp, cd in zip(want.coeffs, got.coeffs):
        np.testing.assert_allclose(np.asarray(cd), np.asarray(cp),
                                   rtol=1e-12, atol=1e-13)


def test_collapse_preserves_row_sums_and_boundary_zeros(rng):
    shape = (12, 14, 12)
    centering = (CELL, CELL, CELL)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    fine_op = assemble_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    exact = assemble_galerkin(fine_op, centering)
    coll = collapse_to_radius1(exact)
    assert coll.radius == 1

    # row sums: sum over in-range entries of each row must match
    def row_sums(op):
        out = np.zeros(op.shape)
        for off, plane in zip(op.offsets, op.coeffs):
            out += np.asarray(plane)
        return out

    np.testing.assert_allclose(row_sums(coll), row_sums(exact),
                               rtol=1e-12, atol=1e-13)

    # boundary invariant: coefficients of out-of-range offsets are zero
    for off, plane in zip(coll.offsets, coll.coeffs):
        p = np.asarray(plane)
        for d, o in enumerate(off):
            if o > 0:
                sl = [slice(None)] * 3
                sl[d] = slice(p.shape[d] - o, p.shape[d])
                assert np.all(p[tuple(sl)] == 0.0), off
            elif o < 0:
                sl = [slice(None)] * 3
                sl[d] = slice(0, -o)
                assert np.all(p[tuple(sl)] == 0.0), off


def test_collapsed_variant_converges_like_exact(rng):
    """galerkin_variant='collapsed' must reach the same tolerance with a
    comparable cycle count and the same fine-grid solution."""
    shape = (33, 32)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=3.0)
    image = rng.normal(size=shape) * 100.0

    cfg_e = MADConfig(time_step=0.1, tolerance=1e-10, coarse_operator="galerkin",
                      galerkin_variant="exact")
    cfg_c = MADConfig(time_step=0.1, tolerance=1e-10, coarse_operator="galerkin",
                      galerkin_variant="collapsed")
    res_e = mad_diffusion(image, tensor, config=cfg_e)
    res_c = mad_diffusion(image, tensor, config=cfg_c)

    assert float(res_c.final_residual[0]) <= 1e-10
    assert int(res_c.num_cycles[0]) <= int(res_e.num_cycles[0]) + 2
    np.testing.assert_allclose(
        np.asarray(res_c.output), np.asarray(res_e.output), rtol=1e-8, atol=1e-8
    )


def test_collapsed_variant_converges_3d(rng):
    shape = (13, 12, 14)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    image = rng.normal(size=shape) * 10.0
    cfg = MADConfig(time_step=0.1, tolerance=1e-10, coarse_operator="galerkin",
                    galerkin_variant="collapsed")
    res = mad_diffusion(image, tensor, spacing=(1.0, 0.5, 2.0), config=cfg)
    assert float(res.final_residual[0]) <= 1e-10


def test_direct_conv_interior_matches_probe(rng, monkeypatch):
    """The large-array conv formulation of the banded interior (minor axes)
    must agree with the slice form / probe path — force it on by dropping
    the size gate."""
    from multigridanisotropicdiffusion_tpu.ops import galerkin_direct

    monkeypatch.setattr(galerkin_direct, "_CONV_MIN_ELEMENTS", 0)
    shape = (12, 14, 16)
    centering = (CELL, CELL, CELL)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=3.0)
    fine_op = assemble_dca(as_sym_planes(tensor, shape), (1.0,) * 3, 0.1)
    probe = assemble_galerkin(fine_op, centering, method="probe")
    direct = assemble_galerkin(fine_op, centering, method="direct")
    assert direct.offsets == probe.offsets
    for off, cp, cd in zip(probe.offsets, probe.coeffs, direct.coeffs):
        np.testing.assert_allclose(
            np.asarray(cd), np.asarray(cp), rtol=1e-12, atol=1e-13,
            err_msg=str(off),
        )


def test_exact_galerkin_solver_with_pallas(rng):
    """Single-device exact-Galerkin solve with use_pallas: the radius-2
    coarse levels dispatch to the radius-2 kernel variant and converge to
    the no-Pallas solution."""
    shape = (13, 12, 14)
    tensor = make_spd_tensor_field(rng, shape, 3, hi=2.0)
    image = rng.normal(size=shape) * 10.0
    base = MADConfig(time_step=0.1, tolerance=1e-10, coarse_operator="galerkin",
                     galerkin_variant="exact")
    ref = mad_diffusion(image, tensor, spacing=(1.0, 0.5, 2.0), config=base)
    import dataclasses

    cfg = dataclasses.replace(base, operator_repr="compressed", use_pallas=True)
    got = mad_diffusion(image, tensor, spacing=(1.0, 0.5, 2.0), config=cfg)
    assert float(got.final_residual[0]) <= 1e-10
    assert int(got.num_cycles[0]) == int(ref.num_cycles[0])
    np.testing.assert_allclose(np.asarray(got.output), np.asarray(ref.output),
                               rtol=1e-9, atol=1e-9)


def test_exact_galerkin_pruning_convergence_parity(rng):
    """galerkin_prune_tol: pruned exact hierarchies preserve row sums and
    converge to the same solution in the same cycle count class
    (ops.galerkin.prune_stored_operator)."""
    import dataclasses

    import jax.numpy as jnp

    from multigridanisotropicdiffusion_tpu.models.mad import (
        MADConfig,
        mad_diffusion,
    )
    from multigridanisotropicdiffusion_tpu.ops.galerkin import (
        prune_stored_operator,
    )
    from multigridanisotropicdiffusion_tpu.core.grids import (
        build_level_descriptors,
    )
    from multigridanisotropicdiffusion_tpu.models.mad import build_hierarchy

    shape = (24, 24, 24)
    a = rng.normal(size=(3, 3, *shape))
    m = np.einsum("ij...,kj...->ik...", a, a)
    m += np.eye(3)[:, :, None, None, None]
    tensor = tuple(
        jnp.asarray(m[i, j]) for i, j in ((0, 0), (0, 1), (0, 2), (1, 1),
                                          (1, 2), (2, 2))
    )
    image = rng.normal(size=shape) * 10.0

    # row sums preserved exactly by the lumping
    levels = build_level_descriptors(shape, (1.0, 1.0, 1.0))
    h = build_hierarchy(tensor, levels, 0.1, "galerkin", "stored", "exact")
    op = h.operators[1]
    pruned = prune_stored_operator(op, 1e-4)
    assert len(pruned.offsets) < len(op.offsets)
    ones = jnp.ones(op.shape)
    np.testing.assert_allclose(
        np.asarray(pruned.apply(ones)), np.asarray(op.apply(ones)),
        rtol=1e-12, atol=1e-12,
    )

    base = MADConfig(time_step=0.1, tolerance=1e-9, max_cycles=40,
                     coarse_operator="galerkin", galerkin_variant="exact")
    ref = mad_diffusion(image, tensor, config=base)
    got = mad_diffusion(
        image, tensor,
        config=dataclasses.replace(base, galerkin_prune_tol=1e-4),
    )
    assert float(got.final_residual[0]) <= 1e-9
    assert abs(int(got.num_cycles[0]) - int(ref.num_cycles[0])) <= 1
    np.testing.assert_allclose(
        np.asarray(got.output), np.asarray(ref.output), rtol=1e-7, atol=1e-7
    )
