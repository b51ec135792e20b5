import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.stencil import (
    apply_stencil,
    densify,
    l2_norm,
    residual,
)
from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
from multigridanisotropicdiffusion_tpu.ops.smoothers import (
    jacobi_sweep,
    parity_mask,
    rb_gauss_seidel_sweep,
)

from .conftest import make_spd_tensor_field


@pytest.fixture
def problem(rng):
    shape = (7, 8)
    tensor = make_spd_tensor_field(rng, shape, 2)
    planes = tuple(jnp.asarray(tensor[..., i, j]) for i, j in [(0, 0), (0, 1), (1, 1)])
    op = assemble_dca(planes, (1.0, 1.0), 0.1)
    b = jnp.asarray(rng.normal(size=shape))
    x = jnp.asarray(rng.normal(size=shape))
    return op, x, b


def test_parity_mask():
    m = np.asarray(parity_mask((3, 4)))
    for i in range(3):
        for j in range(4):
            assert m[i, j] == ((i + j) % 2 == 0)


def test_jacobi_matches_dense(problem):
    op, x, b = problem
    a = np.asarray(densify(op))
    d = np.diag(a)
    xf = np.asarray(x).ravel()
    bf = np.asarray(b).ravel()
    omega = 2.0 / 3.0
    want = (1 - omega) * xf + omega * (bf - (a @ xf - d * xf)) / d
    got = np.asarray(jacobi_sweep(op, x, b, omega)).ravel()
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_rbgs_matches_dense_two_color(problem):
    op, x, b = problem
    a = np.asarray(densify(op))
    d = np.diag(a)
    shape = op.shape
    red = np.asarray(parity_mask(shape)).ravel()
    xf = np.asarray(x).ravel().copy()
    bf = np.asarray(b).ravel()
    for color in (True, False):
        upd = (bf - (a @ xf - d * xf)) / d
        xf = np.where(red == color, upd, xf)
    got = np.asarray(rb_gauss_seidel_sweep(op, x, b)).ravel()
    np.testing.assert_allclose(got, xf, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("sweep", ["wj", "rbgs"])
def test_smoothers_reduce_residual(problem, sweep):
    op, x, b = problem
    r0 = float(l2_norm(residual(op, x, b)))
    for _ in range(20):
        if sweep == "wj":
            x = jacobi_sweep(op, x, b)
        else:
            x = rb_gauss_seidel_sweep(op, x, b)
    r = float(l2_norm(residual(op, x, b)))
    assert r < 0.2 * r0


def test_smoothers_fixed_point(problem, rng):
    """The exact solution is a fixed point of both smoothers."""
    op, _, _ = problem
    a = np.asarray(densify(op))
    x_exact = rng.normal(size=op.shape)
    b = jnp.asarray((a @ x_exact.ravel()).reshape(op.shape))
    x = jnp.asarray(x_exact)
    np.testing.assert_allclose(
        np.asarray(jacobi_sweep(op, x, b)), x_exact, rtol=1e-10, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(rb_gauss_seidel_sweep(op, x, b)), x_exact, rtol=1e-10, atol=1e-10
    )
