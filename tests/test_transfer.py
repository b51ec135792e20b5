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


def test_restrict_banded_matches_slice_path(rng):
    """The large-field banded/conv restriction path must equal the slice
    path exactly (it is built from the same 1-D operators)."""
    from multigridanisotropicdiffusion_tpu.ops import transfer as tr
    from multigridanisotropicdiffusion_tpu.ops.transfer import restrict

    for shape, cent in [
        ((16, 17, 18), ("c", "v", "c")),
        ((33, 32), ("v", "c")),
        ((12, 14, 16), ("c", "c", "c")),
    ]:
        x = jnp.asarray(rng.normal(size=shape))
        want = np.asarray(restrict(x, cent))
        got = np.asarray(tr._restrict_banded(x, cent))
        np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14,
                                   err_msg=str((shape, cent)))
        # the public knob reaches the same path
        via_knob = np.asarray(restrict(x, cent, method="banded"))
        np.testing.assert_allclose(via_knob, want, rtol=1e-13, atol=1e-14)
    import pytest

    with pytest.raises(ValueError):
        restrict(x, cent, method="nope")


def test_axis_native_paths_match_legacy(rng):
    """The axis-native slice forms and the minor-axis MXU band-matmul path
    must equal the legacy moveaxis/last-axis forms exactly (the matmul
    blocks are built from the same parity-tested 1-D operator matrices;
    weights are exact binary fractions, so f64 matmuls are bitwise-safe)."""
    from multigridanisotropicdiffusion_tpu.ops import transfer as tr

    cases = [
        ((8, 12, 256), ("c", "v", "c")),   # lane-mm restrict on last axis
        ((7, 256), ("v", "c")),
        ((12, 10, 256), ("c", "c", "c")),
        ((9, 11, 13), ("v", "v", "v")),    # all-fallback odd sizes
        ((6, 512), ("c", "c")),
    ]
    for shape, cent in cases:
        x = jnp.asarray(rng.normal(size=shape))
        want = x
        for d, c in enumerate(cent):
            fn = (tr._restrict_1d_cell if c == "c" else tr._restrict_1d_vertex)
            want = tr._apply_along_axis(fn, want, d)
        got = tr.restrict(x, cent)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-13, atol=1e-14,
                                   err_msg=str((shape, cent)))
        # prolongation back up from the coarse field
        want_p = want
        for d, c in enumerate(cent):
            fn = (tr._prolong_1d_cell if c == "c" else tr._prolong_1d_vertex)
            want_p = tr._apply_along_axis(fn, want_p, d)
        got_p = tr.prolong(got, cent)
        np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                                   rtol=1e-13, atol=1e-14,
                                   err_msg=str((shape, cent)))
        # the no-matmul variant agrees too (the distributed form)
        got_nm = tr.restrict(x, cent, lane_mm=False)
        np.testing.assert_allclose(np.asarray(got_nm), np.asarray(want),
                                   rtol=1e-13, atol=1e-14)
        got_pnm = tr.prolong(got, cent, lane_mm=False)
        np.testing.assert_allclose(np.asarray(got_pnm), np.asarray(want_p),
                                   rtol=1e-13, atol=1e-14)


def test_restrict_banded_conv_interior(rng, monkeypatch):
    """Same equivalence with the conv interior forced on (the TPU form for
    large minor-axis interiors)."""
    from multigridanisotropicdiffusion_tpu.ops import galerkin_direct, transfer

    monkeypatch.setattr(galerkin_direct, "_CONV_MIN_ELEMENTS", 0)
    shape, cent = (16, 18, 20), ("c", "c", "c")
    x = jnp.asarray(rng.normal(size=shape))
    want = np.asarray(transfer.restrict(x, cent))
    got = np.asarray(transfer._restrict_banded(x, cent))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14)
