"""Fused Pallas compressed-DCA assembly vs the XLA assembly (interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.ops.compressed import (
    assemble_compressed_dca,
)
from multigridanisotropicdiffusion_tpu.ops.pallas_assemble import (
    pallas_assemble_compressed_dca,
    pallas_assemble_supported,
)


def _tensor(rng, shape):
    d0 = 1.0 + jnp.asarray(rng.uniform(0.5, 2.0, size=shape))
    d1 = 1.0 + jnp.asarray(rng.uniform(0.5, 2.0, size=shape))
    d2 = 1.0 + jnp.asarray(rng.uniform(0.5, 2.0, size=shape))
    o = 0.2 * jnp.asarray(rng.normal(size=(3, *shape)))
    return (d0, o[0], o[1], d1, o[2], d2)


@pytest.mark.parametrize("shape", [
    (8, 16, 128),
    (12, 32, 256),
    (3, 8, 128),
    (16, 8, 128),
])
@pytest.mark.parametrize("spacing", [(1.0, 1.0, 1.0), (0.5, 0.3125, 1.7)])
def test_pallas_assembly_matches_xla(rng, shape, spacing):
    assert pallas_assemble_supported(shape, 8, interpret=True)
    tensor = _tensor(rng, shape)
    want = assemble_compressed_dca(tensor, spacing, 0.1)
    got = pallas_assemble_compressed_dca(tensor, spacing, 0.1, interpret=True)

    for name in ("diag_plane",):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=1e-12, atol=1e-13, err_msg=name,
        )
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(got.face_p[d]), np.asarray(want.face_p[d]),
            rtol=1e-12, atol=1e-13, err_msg=f"face_p[{d}]",
        )
        np.testing.assert_allclose(
            np.asarray(got.face_m[d]), np.asarray(want.face_m[d]),
            rtol=1e-12, atol=1e-13, err_msg=f"face_m[{d}]",
        )
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(got.mixed[k]), np.asarray(want.mixed[k]),
            rtol=1e-12, atol=1e-13, err_msg=f"mixed[{k}]",
        )


def test_pallas_assembly_support_gate():
    assert not pallas_assemble_supported((8, 16, 100), 4)   # x % 128
    assert not pallas_assemble_supported((2, 16, 128), 4)   # z < 3
    assert not pallas_assemble_supported((8, 12, 128), 4)   # y % granule
    assert not pallas_assemble_supported((8, 16), 4)        # 2D
    assert pallas_assemble_supported((8, 16, 128), 4)
