"""Separable Gaussian-derivative Hessian of a scalar field.

The reference wraps ITK's ``HessianRecursiveGaussianImageFilter`` with
``SetNormalizeAcrossScale(true)``
(/root/reference/include/itkVEDMultigridImageFilter.hxx:158-173) — an IIR
recursive-Gaussian approximation.  On TPU, IIR filters serialize along the
scan axis, so we use FIR separable convolutions instead: per axis a sampled
Gaussian / first / second derivative kernel with moment corrections (exact on
quadratics), truncated at 4 sigma.  The two approaches agree to the usual
recursive-approximation error; downstream consumers (vesselness) only need the
eigenstructure, not bitwise-identical second derivatives.

Scale normalization multiplies the Hessian by ``sigma**2`` (the standard
Lindeberg gamma=1 normalization that ITK's NormalizeAcrossScale applies for
second-order derivatives), making responses comparable across scales.

Derivatives are taken with respect to *physical* coordinates: kernels are
sampled at the voxel spacing of each axis.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.symfield import sym_pairs


@lru_cache(maxsize=256)
def gaussian_kernels_1d(
    sigma: float, spacing: float, max_radius: int = 64
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sampled Gaussian (g), first (g1) and second (g2) physical-derivative
    kernels for one axis.  ``k[j]`` is the coefficient of ``u[x + j]``.

    Moment-corrected: g sums to 1; g1 is zero-mean with first moment giving
    exact derivatives of linears; g2 is zero-mean, odd-moment-free, with
    second moment giving exact second derivatives of quadratics.
    """
    radius = kernel_radius(sigma, spacing, max_radius)
    j = np.arange(-radius, radius + 1, dtype=np.float64)
    x = j * spacing

    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()

    # Coefficient of u[x + j] for (G' * u): h * g'(-j h) = (j h / sigma^2) * g
    g1 = x / sigma**2 * g
    g1 -= g1.mean()
    m1 = np.sum(g1 * x)
    g1 /= m1  # now sum_j g1[j] * (j h) == 1 -> exact on linears

    g2 = (x**2 / sigma**4 - 1.0 / sigma**2) * g
    g2 -= g2.mean()
    m2 = np.sum(g2 * x * x) / 2.0
    g2 /= m2  # exact second derivative of quadratics

    return g, g1, g2


def _conv_axis(
    u: jnp.ndarray, kernel: np.ndarray, axis: int, valid: bool = False,
    allow_pallas: bool = True,
) -> jnp.ndarray:
    """Correlate ``u`` with a 1-D kernel along ``axis``.

    ``valid=False``: edge-replicate padding, shape-preserving.
    ``valid=True``: no padding — the axis shrinks by ``len(kernel) - 1``
    (used by the z-slab-tiled pipeline, where the halo is already present).

    On the TPU backend, eligible 3D passes route through the fused Pallas
    per-axis kernels (ops.pallas_conv) — the XLA shifted-slice chain below
    runs ~6x off HBM speed-of-light at 512^3.  ``allow_pallas=False``
    keeps the pass in pure XLA (mesh-sharded pipelines: the SPMD
    partitioner cannot partition a pallas_call).
    """
    if allow_pallas and u.ndim == 3 and jnp.issubdtype(u.dtype, jnp.floating):
        import jax

        if jax.default_backend() == "tpu":
            from .pallas_conv import pallas_conv_axis, pallas_conv_supported

            if pallas_conv_supported(
                tuple(u.shape), axis, len(kernel),
                jnp.dtype(u.dtype).itemsize, valid,
            ):
                return pallas_conv_axis(u, np.asarray(kernel), axis,
                                        valid=valid)
    radius = (len(kernel) - 1) // 2
    if valid:
        up = u
        n = u.shape[axis] - 2 * radius
    else:
        pad = [(0, 0)] * u.ndim
        pad[axis] = (radius, radius)
        up = jnp.pad(u, pad, mode="edge")
        n = u.shape[axis]
    # Low-precision (bf16) fields: stream in the storage dtype but
    # accumulate the taps in f32, rounding once per pass (the HBM saving
    # comes from bf16 storage; tap accumulation in bf16 would lose ~2
    # digits over a 17-tap kernel).
    acc_dtype = jnp.float32 if u.dtype == jnp.bfloat16 else u.dtype
    out = None
    k = np.asarray(kernel, np.float64)
    for j in range(len(kernel)):
        if kernel[j] == 0.0:  # zero-padded taps (tiled mode) cost nothing
            continue
        sl = [slice(None)] * u.ndim
        sl[axis] = slice(j, j + n)
        term = jnp.asarray(k[j], acc_dtype) * up[tuple(sl)].astype(acc_dtype)
        out = term if out is None else out + term
    return out.astype(u.dtype)


def kernel_radius(sigma: float, spacing: float, max_radius: int = 64) -> int:
    """Radius of the sampled kernels for (sigma, spacing) — the halo a tiled
    caller must provide."""
    return max(2, min(max_radius, int(math.ceil(4.0 * sigma / spacing))))


def hessian(
    u: jnp.ndarray,
    sigma: float,
    spacing: Sequence[float] | None = None,
    normalize_across_scale: bool = True,
    z_valid_radius: int | None = None,
    mode: str = "gaussian_derivative",
    allow_pallas: bool = True,
):
    """Gaussian-smoothed Hessian field as the canonical symmetric plane tuple
    (core.symfield order: ((0,0), (0,1), ..., upper triangle row-major)).

    ``H[i, j] = sigma^2 * d^2/dx_i dx_j (G_sigma * u)`` (physical coordinates;
    the ``sigma^2`` factor only when ``normalize_across_scale``).

    ``z_valid_radius``: when set, the axis-0 convolutions run in *valid* mode
    with kernels zero-padded to exactly that radius — the caller supplies a
    ``z_valid_radius``-thick halo on axis 0 and the output is thinner by
    ``2*z_valid_radius`` (the z-slab-tiled VED pipeline).  Must be >= the
    kernel radius for (sigma, spacing[0]) — plus 1 in ``smooth_fd`` mode.

    ``mode``:
      * ``'gaussian_derivative'`` (default) — exact sampled
        Gaussian-derivative kernels per component: D(D+1)/2 separable
        convolutions (15 1-D passes in 3D after prefix sharing).
      * ``'smooth_fd'`` — smooth once with the Gaussian (D 1-D passes), then
        take 2nd-order central finite differences of the smoothed field (a
        fused 3/4-point stencil pass).  ~3x fewer long-kernel passes; exact
        on quadratics like the default (moment-corrected smoothing + exact-
        on-quadratics central differences), and within the discretization
        error of the default elsewhere — the same accuracy class as ITK's
        recursive-IIR approximation the reference wraps.

    Struct-of-planes output: a stacked ``(..., D, D)`` (or even ``(D, D, ...)``)
    array could be assigned a TPU layout with the size-D axes in the minor
    (lane) position, padding them to (8, 128) — separate planes cannot.
    """
    ndim = u.ndim
    if spacing is None:
        spacing = (1.0,) * ndim
    if mode == "smooth_fd":
        return _hessian_smooth_fd(
            u, sigma, spacing, normalize_across_scale, z_valid_radius,
            allow_pallas,
        )
    if mode != "gaussian_derivative":
        raise ValueError(f"unknown hessian mode: {mode!r}")
    kernels = [gaussian_kernels_1d(float(sigma), float(h)) for h in spacing]
    if z_valid_radius is not None:
        r = (len(kernels[0][0]) - 1) // 2
        if z_valid_radius < r:
            raise ValueError(
                f"z_valid_radius {z_valid_radius} < kernel radius {r} "
                f"for sigma={sigma}, spacing={spacing[0]}"
            )
        extra = z_valid_radius - r
        kernels[0] = tuple(
            np.pad(k, (extra, extra)) for k in kernels[0]
        )

    # order[d] in {0,1,2}: which derivative order to apply along axis d.
    def separable(orders: Tuple[int, ...]) -> jnp.ndarray:
        out = u
        for d, o in enumerate(orders):
            out = _conv_axis(out, kernels[d][o], d,
                             valid=(d == 0 and z_valid_radius is not None),
                             allow_pallas=allow_pallas)
        return out

    norm = float(sigma) ** 2 if normalize_across_scale else 1.0

    planes = []
    for i, j in sym_pairs(ndim):
        orders = [0] * ndim
        if i == j:
            orders[i] = 2
        else:
            orders[i] = 1
            orders[j] = 1
        planes.append(separable(tuple(orders)) * norm)
    return tuple(planes)


def smoothed_field_valid_z(
    u: jnp.ndarray,
    sigma: float,
    spacing: Sequence[float],
    z_valid_radius: int | None = None,
    allow_pallas: bool = True,
) -> jnp.ndarray:
    """Gaussian-smooth ``u`` (one 1-D pass per axis) keeping a 1-thick z halo
    for a subsequent valid-z finite-difference pass.

    With ``z_valid_radius`` the input already carries that z halo (z-slab
    pipeline) and the smoothing consumes ``z_valid_radius - 1`` of it; without
    it the input is self-padded (edge replication) first, so tiled and
    untiled pipelines agree bitwise at the global z borders.  The output's
    axis 0 is the FD output extent + 2.
    """
    ndim = u.ndim
    if z_valid_radius is None:
        r = kernel_radius(float(sigma), float(spacing[0]))
        z_valid_radius = r + 1
        pad = [(0, 0)] * ndim
        pad[0] = (z_valid_radius, z_valid_radius)
        u = jnp.pad(u, pad, mode="edge")
    us = u
    for d in range(ndim):
        g = gaussian_kernels_1d(float(sigma), float(spacing[d]))[0]
        if d == 0:
            r = (len(g) - 1) // 2
            if z_valid_radius < r + 1:
                raise ValueError(
                    f"z_valid_radius {z_valid_radius} < kernel radius + 1 = "
                    f"{r + 1} for sigma={sigma}, spacing={spacing[0]} "
                    "(smooth_fd mode needs one extra halo plane)"
                )
            extra = (z_valid_radius - 1) - r
            g = np.pad(g, (extra, extra))
            us = _conv_axis(us, g, 0, valid=True,
                            allow_pallas=allow_pallas)
            continue
        if d == 1 and ndim == 3 and allow_pallas and \
                jnp.issubdtype(us.dtype, jnp.floating):
            import jax

            if jax.default_backend() == "tpu":
                from .pallas_conv import (
                    pallas_conv_yx,
                    pallas_conv_yx_supported,
                )

                gx = gaussian_kernels_1d(float(sigma), float(spacing[2]))[0]
                if pallas_conv_yx_supported(
                    tuple(us.shape), len(g), len(gx),
                    jnp.dtype(us.dtype).itemsize,
                ):
                    # fused y+x: one volume round-trip instead of two
                    return pallas_conv_yx(us, g, gx)
        us = _conv_axis(us, g, d, allow_pallas=allow_pallas)
    return us


def fd_factors(
    sigma: float, spacing: Sequence[float],
    normalize_across_scale: bool = True,
) -> Tuple[float, ...]:
    """Static per-plane normalization factors of the 3D central-difference
    Hessian (canonical symmetric order): (f00, f01, f02, f11, f12, f22)."""
    norm = float(sigma) ** 2 if normalize_across_scale else 1.0
    h0, h1, h2 = (float(h) for h in spacing)
    return (
        norm / h0 ** 2, norm / (4 * h0 * h1), norm / (4 * h0 * h2),
        norm / h1 ** 2, norm / (4 * h1 * h2), norm / h2 ** 2,
    )


def _hessian_smooth_fd(
    u: jnp.ndarray,
    sigma: float,
    spacing: Sequence[float],
    normalize_across_scale: bool,
    z_valid_radius: int | None,
    allow_pallas: bool = True,
):
    """smooth-then-finite-difference Hessian (see :func:`hessian` mode docs)."""
    ndim = u.ndim
    valid_z = True
    us = smoothed_field_valid_z(u, sigma, spacing, z_valid_radius,
                                allow_pallas)

    # 2) one fused central-difference stencil pass over the smoothed field.
    # Axis 0 in valid-z mode already carries its 1-thick halo; other axes get
    # edge-replicate halos (≅ the default mode's edge-replicated convs).
    if allow_pallas and ndim == 3 and jnp.issubdtype(us.dtype, jnp.floating):
        import jax

        if jax.default_backend() == "tpu":
            from .pallas_conv import pallas_fd_hessian, pallas_fd_supported

            if pallas_fd_supported(
                tuple(us.shape), jnp.dtype(us.dtype).itemsize
            ):
                return pallas_fd_hessian(
                    us, fd_factors(sigma, spacing, normalize_across_scale)
                )
    pad = [(1, 1)] * ndim
    if valid_z:
        pad[0] = (0, 0)
    up = jnp.pad(us, pad, mode="edge")
    out_shape = tuple(
        (us.shape[d] - 2) if (d == 0 and valid_z) else us.shape[d]
        for d in range(ndim)
    )

    fd_dtype = jnp.float32 if us.dtype == jnp.bfloat16 else us.dtype

    def sh(off):
        sl = tuple(
            slice(1 + o, 1 + o + s) for o, s in zip(off, out_shape)
        )
        return up[sl].astype(fd_dtype)

    zero = (0,) * ndim

    def unit(d, s=1):
        e = [0] * ndim
        e[d] = s
        return tuple(e)

    def add(a, b):
        return tuple(x + y for x, y in zip(a, b))

    norm = float(sigma) ** 2 if normalize_across_scale else 1.0
    center = sh(zero)
    planes = []
    for i, j in sym_pairs(ndim):
        if i == j:
            hi2 = float(spacing[i]) ** 2
            planes.append(
                (sh(unit(i)) - 2.0 * center + sh(unit(i, -1))) * (norm / hi2)
            )
        else:
            hij4 = 4.0 * float(spacing[i]) * float(spacing[j])
            planes.append(
                (
                    sh(add(unit(i), unit(j)))
                    - sh(add(unit(i), unit(j, -1)))
                    - sh(add(unit(i, -1), unit(j)))
                    + sh(add(unit(i, -1), unit(j, -1)))
                )
                * (norm / hij4)
            )
    # Hessian planes stay in the field's storage dtype (bf16 pipelines keep
    # their HBM saving; the FD arithmetic above ran in f32).
    return tuple(p.astype(us.dtype) for p in planes)
