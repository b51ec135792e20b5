"""Smoothers for the multigrid cycle: weighted Jacobi and red-black Gauss-Seidel.

The reference provides a lexicographic Gauss-Seidel sweep
(/root/reference/include/mad/itkMultigridGaussSeidelSmoother.hxx:33-111) and a
damped Jacobi sweep (itkMultigridWeightedJacobiSmoother.hxx:33-102, default
weight 2/3).  Lexicographic GS is inherently sequential — one voxel per step —
so the TPU-native Gauss-Seidel uses *red-black coloring*: two half-sweeps, each
a fully parallel stencil update over one parity class using the freshest values
of the other.  For the 9/19-point DCA stencil the diagonal couplings connect
same-color cells, so colored GS is not algebraically identical to
lexicographic GS; the observable contract of the reference tests (drive the
relative residual below tolerance) is preserved, and the smoothing factor is
comparable.

Both smoothers and the residual are expressed as the fixed K-term stencil
contraction from :mod:`..core.stencil`, which XLA fuses into a handful of
VPU passes over HBM-resident planes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.stencil import StencilOperator

#: Default damping for weighted Jacobi (itkMultigridWeightedJacobiSmoother.hxx:189).
DEFAULT_JACOBI_WEIGHT = 2.0 / 3.0


def parity_mask(shape: Tuple[int, ...], dtype=jnp.bool_) -> jnp.ndarray:
    """Checkerboard mask: True where the index-sum is even ("red" points)."""
    acc = None
    for d, s in enumerate(shape):
        ids = jax.lax.broadcasted_iota(jnp.int32, shape, d)
        acc = ids if acc is None else acc + ids
    return (acc % 2 == 0).astype(dtype) if dtype != jnp.bool_ else (acc % 2 == 0)


def jacobi_sweep(
    op,
    x: jnp.ndarray,
    b: jnp.ndarray,
    omega: float = DEFAULT_JACOBI_WEIGHT,
) -> jnp.ndarray:
    """One damped-Jacobi sweep:
    ``x' = (1-w) x + w (b - offdiag(A) x) / diag(A)``.

    ``op`` is any operator implementing the protocol (``offdiag_apply`` +
    ``diag``): stored :class:`~..core.stencil.StencilOperator` or the
    matrix-free DCA operator."""
    return (1.0 - omega) * x + omega * (b - op.offdiag_apply(x)) / op.diag


def rb_gauss_seidel_sweep(op, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """One red-black Gauss-Seidel sweep (red half-sweep then black)."""
    red = parity_mask(op.shape)
    diag = op.diag
    for color in (True, False):
        x_gs = (b - op.offdiag_apply(x)) / diag
        x = jnp.where(red == color, x_gs, x)
    return x


def make_smoother(
    kind: str, omega: float = DEFAULT_JACOBI_WEIGHT, use_pallas: bool = False
):
    """Return ``smooth(op, x, b) -> x'`` for the named smoother.

    ``kind``: 'gauss_seidel' (red-black) or 'weighted_jacobi'.
    ``use_pallas``: route 3D compressed-operator GS sweeps through the fused
    Pallas kernel (~2.3x the XLA path on TPU); other operator/dimension
    combinations fall back to the XLA sweep.
    """
    if kind in ("gauss_seidel", "gs", "rbgs"):
        if not use_pallas:
            return rb_gauss_seidel_sweep

        def sweep(op, x, b):
            from .pallas_smoothers import pallas_compatible, pallas_rbgs_sweep

            if pallas_compatible(op):
                # Mosaic is TPU-only; fall back to the interpreter elsewhere
                # so use_pallas stays functional (if slow) on CPU.
                interpret = jax.default_backend() != "tpu"
                return pallas_rbgs_sweep(op, x, b, interpret=interpret)
            return rb_gauss_seidel_sweep(op, x, b)

        return sweep
    if kind in ("weighted_jacobi", "wj", "jacobi"):
        return functools.partial(jacobi_sweep, omega=omega)
    if kind in ("chebyshev", "cheby"):
        return chebyshev_smoother
    raise ValueError(f"unknown smoother kind: {kind!r}")


def make_residual(use_pallas: bool = False):
    """Return ``resid(op, x, b) -> b - A x``.

    With ``use_pallas``, 3D compressed-operator residuals go through the fused
    Pallas kernel (one VMEM-tiled pass instead of XLA's padded-copy apply);
    other operator/dimension combinations use the XLA path."""
    from ..core.stencil import residual

    if not use_pallas:
        return residual

    def resid(op, x, b):
        from .pallas_smoothers import pallas_compatible, pallas_residual

        if pallas_compatible(op):
            interpret = jax.default_backend() != "tpu"
            return pallas_residual(op, x, b, interpret=interpret)
        return residual(op, x, b)

    return resid


#: Chebyshev smoother defaults: polynomial degree per smooth() call, and the
#: targeted upper spectral fraction [lmax/ratio, lmax] of D^-1 A.
CHEBYSHEV_DEGREE = 3
CHEBYSHEV_EIG_RATIO = 8.0


def chebyshev_smoother(
    op,
    x: jnp.ndarray,
    b: jnp.ndarray,
    degree: int = CHEBYSHEV_DEGREE,
    eig_ratio: float = CHEBYSHEV_EIG_RATIO,
) -> jnp.ndarray:
    """Chebyshev polynomial smoother on the Jacobi-preconditioned operator.

    No reference counterpart (a beyond-parity smoother): a degree-k Chebyshev
    polynomial in ``D^-1 A`` damping the upper spectral band
    ``[lmax/eig_ratio, lmax]`` — the standard accelerator-era multigrid
    smoother (one stencil apply per step, no coloring, no sequential
    dependency).  ``lmax`` is bounded per call by Gershgorin
    (``max(1 + rowsum|offdiag|/diag)``), a safe upper bound; XLA CSEs the
    bound across the smoothing steps of a cycle.
    """
    diag = op.diag
    lmax = jnp.max(1.0 + op.offdiag_abs_rowsum() / diag)
    lmin = lmax / eig_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    r = b - op.apply(x)
    d = (r / diag) / theta
    rho = 1.0 / sigma
    for _ in range(degree):
        x = x + d
        r = r - op.apply(d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * (r / diag)
        rho = rho_new
    x = x + d
    return x
