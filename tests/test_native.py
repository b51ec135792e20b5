"""Native (C++) kernel library tests: cross-implementation oracle checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.stencil import (
    apply_stencil as jax_apply,
    densify,
    l2_norm,
    residual as jax_residual,
)
from multigridanisotropicdiffusion_tpu.core.symfield import as_sym_planes
from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
from multigridanisotropicdiffusion_tpu.ops.smoothers import (
    jacobi_sweep,
    rb_gauss_seidel_sweep,
)
from multigridanisotropicdiffusion_tpu.utils import native

from .conftest import make_spd_tensor_field

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native toolchain unavailable"
)


@pytest.fixture(params=[(9, 8), (6, 7, 8)])
def problem(rng, request):
    shape = request.param
    ndim = len(shape)
    tensor = make_spd_tensor_field(rng, shape, ndim, hi=3.0)
    op = assemble_dca(as_sym_planes(tensor, shape), (1.0,) * ndim, 0.1)
    x = rng.normal(size=shape)
    b = rng.normal(size=shape)
    return op, x, b


def test_native_apply_matches_jax(problem):
    op, x, b = problem
    got = native.apply_stencil(op, x)
    want = np.asarray(jax_apply(op, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_native_residual_matches_jax(problem):
    op, x, b = problem
    got = native.residual(op, x, b)
    want = np.asarray(jax_residual(op, jnp.asarray(x), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_native_wj_matches_jax(problem):
    op, x, b = problem
    got = native.wj_sweep(op, x, b, omega=2.0 / 3.0)
    want = np.asarray(jacobi_sweep(op, jnp.asarray(x), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_native_gs_matches_dense_sequential(problem):
    """Exact lexicographic GS: forward substitution on (D+L) x' = b - U x in
    C-order — verify against a dense triangular computation."""
    op, x, b = problem
    a = np.asarray(densify(op))
    n = a.shape[0]
    lower = np.tril(a)  # includes diagonal
    upper = a - lower
    xf = np.asarray(x).ravel()
    bf = np.asarray(b).ravel()
    want = np.linalg.solve(lower, bf - upper @ xf)
    got = native.gs_sweep(op, x, b).ravel()
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_native_gs_is_fixed_point_on_solution(problem, rng):
    op, _, _ = problem
    a = np.asarray(densify(op))
    x_exact = rng.normal(size=op.shape)
    b = (a @ x_exact.ravel()).reshape(op.shape)
    out = native.gs_sweep(op, x_exact, b)
    np.testing.assert_allclose(out, x_exact, rtol=1e-10, atol=1e-10)


def test_colored_vs_sequential_convergence(problem):
    """Red-black GS (TPU) should converge at a rate comparable to exact
    lexicographic GS (reference) — within 2x iteration count to 1e-8."""
    op, x0, b = problem

    def iterate(step, x, tol=1e-8, max_it=500):
        bnorm = float(l2_norm(jnp.asarray(b)))
        for it in range(1, max_it + 1):
            x = step(x)
            r = float(l2_norm(jax_residual(op, jnp.asarray(np.asarray(x)), jnp.asarray(b)))) / bnorm
            if r <= tol:
                return it
        return max_it

    seq_iters = iterate(lambda x: native.gs_sweep(op, x, b), x0)
    rb_iters = iterate(
        lambda x: rb_gauss_seidel_sweep(op, jnp.asarray(np.asarray(x)), jnp.asarray(b)),
        x0,
    )
    assert rb_iters <= 2 * seq_iters
    assert seq_iters < 500 and rb_iters < 500
