import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.core.symfield import (
    sym_from_matrix,
    sym_pairs,
)
from multigridanisotropicdiffusion_tpu.ops.eigen3 import (
    eigh3,
    eigvalsh3,
    sort_by_abs3,
)


def _random_symmetric(rng, n):
    a = rng.normal(size=(n, 3, 3))
    return (a + np.swapaxes(a, -1, -2)) / 2


def _planes(a):
    """numpy (n, 3, 3) -> canonical plane tuple (a00, a01, a02, a11, a12, a22)."""
    return tuple(jnp.asarray(a[:, i, j]) for i, j in sym_pairs(3))


def _to_arrays(w, v=None):
    """Plane outputs -> (n, 3) eigenvalues, (n, 3, 3) eigenvector columns."""
    wn = np.stack([np.asarray(x) for x in w], axis=-1)
    if v is None:
        return wn, None
    vn = np.stack(
        [np.stack([np.asarray(v[i][j]) for j in range(3)], axis=-1) for i in range(3)],
        axis=-2,
    )
    return wn, vn


def test_eigenvalues_match_lapack(rng):
    a = _random_symmetric(rng, 500)
    w, _ = eigh3(_planes(a))
    wn, _ = _to_arrays(w)
    np.testing.assert_allclose(wn, np.linalg.eigvalsh(a), rtol=1e-9, atol=1e-9)


def test_eigenvectors_satisfy_definition(rng):
    a = _random_symmetric(rng, 500)
    w, v = eigh3(_planes(a))
    wn, vn = _to_arrays(w, v)
    av = np.einsum("nij,njk->nik", a, vn)
    vw = vn * wn[:, None, :]
    np.testing.assert_allclose(av, vw, rtol=1e-7, atol=1e-7)
    vtv = np.einsum("nji,njk->nik", vn, vn)
    np.testing.assert_allclose(vtv, np.broadcast_to(np.eye(3), vtv.shape), atol=1e-9)


def test_degenerate_matrices():
    cases = np.stack(
        [
            np.eye(3),
            np.zeros((3, 3)),
            np.diag([2.0, 2.0, 5.0]),
            np.diag([-1.0, 3.0, 3.0]),
            np.diag([4.0, 4.0, 4.0]),
            np.array([[1, 1, 0], [1, 1, 0], [0, 0, 7.0]]),  # eigvals 0,2,7
        ]
    )
    w, v = eigh3(_planes(cases))
    wn, vn = _to_arrays(w, v)
    np.testing.assert_allclose(wn, np.linalg.eigvalsh(cases), atol=1e-10)
    av = np.einsum("nij,njk->nik", cases, vn)
    vw = vn * wn[:, None, :]
    np.testing.assert_allclose(av, vw, atol=1e-9)
    vtv = np.einsum("nji,njk->nik", vn, vn)
    np.testing.assert_allclose(vtv, np.broadcast_to(np.eye(3), vtv.shape), atol=1e-9)


def test_near_degenerate_robustness(rng):
    for eps in (1e-6, 1e-10, 0.0):
        q, _ = np.linalg.qr(rng.normal(size=(100, 3, 3)))
        lam = np.stack(
            [np.full(100, 1.0), np.full(100, 1.0 + eps), rng.uniform(2, 3, 100)],
            axis=-1,
        )
        a = np.einsum("nik,nk,njk->nij", q, lam, q)
        a = (a + np.swapaxes(a, -1, -2)) / 2
        w, v = eigh3(_planes(a))
        wn, vn = _to_arrays(w, v)
        np.testing.assert_allclose(wn, np.sort(lam, axis=-1), rtol=1e-6, atol=1e-7)
        vtv = np.einsum("nji,njk->nik", vn, vn)
        np.testing.assert_allclose(vtv, np.broadcast_to(np.eye(3), vtv.shape), atol=1e-7)
        av = np.einsum("nij,njk->nik", a, vn)
        vw = vn * wn[:, None, :]
        np.testing.assert_allclose(av, vw, atol=1e-6)


def test_sort_by_abs(rng):
    w = rng.normal(size=(200, 3))
    got = np.stack(
        [np.asarray(x) for x in sort_by_abs3(tuple(jnp.asarray(w[:, i]) for i in range(3)))],
        axis=-1,
    )
    order = np.argsort(np.abs(w), axis=-1, kind="stable")
    want = np.take_along_axis(w, order, axis=-1)
    np.testing.assert_allclose(got, want)


def test_eigvalsh_only(rng):
    a = _random_symmetric(rng, 50)
    wn, _ = _to_arrays(eigvalsh3(_planes(a)))
    np.testing.assert_allclose(wn, np.linalg.eigvalsh(a), rtol=1e-9, atol=1e-9)


def test_sym_from_matrix(rng):
    a = rng.normal(size=(3, 3, 4, 5, 6))
    a = a + np.swapaxes(a, 0, 1)  # symmetric in components
    planes = sym_from_matrix(jnp.asarray(a))
    for plane, (i, j) in zip(planes, sym_pairs(3)):
        np.testing.assert_array_equal(np.asarray(plane), a[i, j])
    # trailing layout, reads lower triangle
    at = np.moveaxis(a, (0, 1), (-2, -1))
    planes2 = sym_from_matrix(jnp.asarray(at))
    for p1, p2 in zip(planes, planes2):
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
