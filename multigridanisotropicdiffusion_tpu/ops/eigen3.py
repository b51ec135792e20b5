"""Branch-free closed-form eigendecomposition of symmetric 3x3 matrix fields.

The reference calls ``vnl_symmetric_eigensystem`` per voxel inside an iterator
loop (/root/reference/include/itkVEDMultigridImageFilter.hxx:259-268) — one
solve per voxel.  On TPU we need the eigendecomposition of hundreds of
millions of 3x3 matrices per Hessian scale, so this module implements the
analytic (trigonometric) eigenvalue formula plus cross-product eigenvectors as
pure elementwise array ops: no per-voxel loops, no QR iteration, fully fusable
by XLA onto the VPU.

**Layout: struct-of-planes.**  TPU tiles two minor array dimensions to
(8, 128)-shaped lanes, and XLA may choose size-3 matrix axes as minor — a
~40x memory blowup at volume scale.  Every function here takes and returns
*component planes*: separate full-resolution arrays per matrix/vector
component.  A symmetric matrix field is the canonical 6-tuple
``(a00, a01, a02, a11, a12, a22)`` (core.symfield upper-triangle row-major
order); an eigenvector frame is a 3x3 nested tuple ``v[i][j]`` = component
``i`` of eigenvector ``j``.

Eigenvalues are returned in *ascending value* order (matching
``vnl_symmetric_eigensystem``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

SymPlanes = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


def _cross(u, v):
    """Cross product of two component-tuple vectors."""
    return (
        u[1] * v[2] - u[2] * v[1],
        u[2] * v[0] - u[0] * v[2],
        u[0] * v[1] - u[1] * v[0],
    )


def _dot(u, v):
    return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]


#: Abramowitz & Stegun 4.4.46 coefficients: acos(x) ~ sqrt(1-x) * poly(x) on
#: [0, 1], |error| <= 2e-8 (below f32 eps) — used where the acos primitive
#: does not exist (Mosaic/Pallas TPU kernels).
_ACOS_COEFFS = (
    1.5707963050, -0.2145988016, 0.0889789874, -0.0501743046,
    0.0308918810, -0.0170881256, 0.0066700901, -0.0012624911,
)


def acos_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial arccos for inputs in [-1, 1] (A&S 4.4.46, abs error ~2e-8).

    Mosaic has no ``acos``/``atan2`` lowering, so Pallas kernels that need the
    trigonometric 3x3 eigenvalue formula pass this as ``acos_fn``.  Built from
    sqrt + multiply-adds only.
    """
    ax = jnp.abs(x)
    p = jnp.asarray(_ACOS_COEFFS[-1], x.dtype)
    for c in _ACOS_COEFFS[-2::-1]:
        p = p * ax + jnp.asarray(c, x.dtype)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x < 0, jnp.asarray(jnp.pi, x.dtype) - r, r)


def eigvalsh3(planes: SymPlanes, acos_fn=jnp.arccos):
    """Eigenvalues (ascending) as three planes."""
    w, _ = eigh3(planes, compute_vectors=False, acos_fn=acos_fn)
    return w


def eigh3(planes: SymPlanes, compute_vectors: bool = True,
          acos_fn=jnp.arccos, vectors_mode: str = "full"):
    """Analytic eigendecomposition from symmetric component planes.

    Returns ``(w, v)``: ``w = (w0, w1, w2)`` eigenvalue planes ascending, and
    ``v[i][j]`` the ``i``-th component plane of the unit eigenvector for
    ``w[j]`` (``None`` when ``compute_vectors=False``).

    ``acos_fn`` swaps the arccos implementation (:func:`acos_poly` inside
    Pallas TPU kernels, where the acos primitive has no Mosaic lowering).

    ``vectors_mode='largest'`` computes only the eigenvector of the LARGEST
    (signed) eigenvalue and returns it as a flat component tuple
    ``v = (vx, vy, vz)`` — ~3x less vector math than the full frame.  The VED
    tensor ``Q diag(d1, d1, d3) Q^T = d1 I + (d3 - d1) q3 q3^T`` needs only
    that one direction.  On a two-fold-degenerate top eigenvalue the choice
    within the eigenspace is an arbitrary deterministic unit vector (the full
    mode makes a different arbitrary choice there).
    """
    a00, a01, a02, a11, a12, a22 = planes  # canonical symfield order
    dtype = a00.dtype

    # Scale for numerical stability: work on A / max|A|.  Divisions are
    # VPU-expensive (multi-op reciprocal refinement), so the whole value path
    # uses two reciprocals + multiplies instead of per-plane divides.
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a11)), jnp.abs(a22)),
        jnp.maximum(jnp.maximum(jnp.abs(a01), jnp.abs(a02)), jnp.abs(a12)),
    )
    scale_safe = jnp.where(scale > 0, scale, 1.0)
    inv_scale = 1.0 / scale_safe
    a00, a11, a22, a01, a02, a12 = (
        x * inv_scale for x in (a00, a11, a22, a01, a02, a12)
    )

    q = (a00 + a11 + a22) * (1.0 / 3.0)
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 * (1.0 / 6.0), 0.0))
    p_safe = jnp.where(p > 0, p, 1.0)

    # det(A - q I) / (2 p^3), clamped into acos's domain.
    detb = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    inv_p = 1.0 / p_safe
    inv_p3 = inv_p * inv_p * inv_p
    r = jnp.clip(detb * inv_p3 * 0.5, -1.0, 1.0)
    phi = acos_fn(r) * (1.0 / 3.0)

    # cos(phi + 2pi/3) = -cos(phi)/2 - (sqrt(3)/2) sin(phi); phi in [0, pi/3]
    # so sin(phi) = sqrt(1 - cos^2) >= 0 — one transcendental instead of two.
    # Near phi = 0 the sqrt loses ~half the bits of sin(phi), but there the
    # sin term is O(phi) against the dominant -cos/2; the absolute eigenvalue
    # error stays O(eps * p).
    c = jnp.cos(phi)
    s = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    w_hi = q + 2.0 * p * c
    w_lo = q + 2.0 * p * (-0.5 * c - (0.8660254037844386 * s))
    w_mid = 3.0 * q - w_hi - w_lo
    # Degenerate (p == 0, A = q I) needs no special case: p2 == 0 gives
    # detb == 0 exactly (B == 0), r == 0, and the 2*p*cos terms vanish, so
    # w == q falls out; the scaling above keeps inv_p3 finite for tiny p2
    # (normalized entries are O(1), so p >= ~sqrt(eps) or exactly 0).

    w = (w_lo * scale_safe, w_mid * scale_safe, w_hi * scale_safe)

    if not compute_vectors:
        return w, None

    feps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    def rows_minus(lam):
        r0 = (a00 - lam, a01, a02)
        r1 = (a01, a11 - lam, a12)
        r2 = (a02, a12, a22 - lam)
        return r0, r1, r2

    def pick(cond, u, v):
        return tuple(jnp.where(cond, ui, vi) for ui, vi in zip(u, v))

    def candidate(lam):
        """Eigenvector candidate for (scaled) eigenvalue ``lam`` as the largest
        cross product of two rows of ``M = A - lam I``, plus a *relative*
        validity flag (cross products at the float noise floor — degenerate
        eigenvalues — are rejected)."""
        r0, r1, r2 = rows_minus(lam)
        c0 = _cross(r0, r1)
        c1 = _cross(r0, r2)
        c2 = _cross(r1, r2)
        n0, n1, n2 = _dot(c0, c0), _dot(c1, c1), _dot(c2, c2)
        best = pick(n0 >= n1, c0, c1)
        nbest = jnp.maximum(n0, n1)
        best = pick(nbest >= n2, best, c2)
        nbest = jnp.maximum(nbest, n2)
        rn = jnp.maximum(jnp.maximum(_dot(r0, r0), _dot(r1, r1)), _dot(r2, r2))
        ok = nbest > (64.0 * feps) ** 2 * rn * rn
        inv = jax.lax.rsqrt(jnp.where(ok, nbest, 1.0))
        return tuple(c * inv for c in best), ok

    def stable_perp(p_vec):
        """A unit vector orthogonal to unit vector ``p_vec``: cross with the
        canonical axis least aligned with it."""
        ax, ay, az = (jnp.abs(c) for c in p_vec)
        # one-hot of argmin(|p|)
        use_x = jnp.logical_and(ax <= ay, ax <= az)
        use_y = jnp.logical_and(~use_x, ay <= az)
        use_z = jnp.logical_and(~use_x, ~use_y)
        one = jnp.ones_like(ax)
        zero = jnp.zeros_like(ax)
        basis = (
            jnp.where(use_x, one, zero),
            jnp.where(use_y, one, zero),
            jnp.where(use_z, one, zero),
        )
        alt = _cross(p_vec, basis)
        inv = jax.lax.rsqrt(_dot(alt, alt))
        return tuple(c * inv for c in alt)

    if vectors_mode == "largest":
        # Only q3 (eigenvector of w_hi).  Where w_hi is (near-)degenerate
        # with w_mid, mirror the full mode's choice: an arbitrary unit vector
        # orthogonal to the well-conditioned w_lo eigenvector (stable_perp of
        # the primary) — identical to full mode's secondary fallback.
        v_hi_c, ok_hi = candidate(w_hi)
        v_lo_c, ok_lo = candidate(w_lo)
        one = jnp.ones_like(a00)
        zero = jnp.zeros_like(a00)
        primary = pick(ok_lo, v_lo_c, (one, zero, zero))
        v3 = pick(ok_hi, v_hi_c, stable_perp(primary))
        return w, v3
    if vectors_mode != "full":
        raise ValueError(f"unknown vectors_mode: {vectors_mode!r}")

    lam_lo = w_lo
    lam_hi = w_hi
    v_lo_c, ok_lo = candidate(lam_lo)
    v_hi_c, ok_hi = candidate(lam_hi)

    # The eigenvalue farther from the middle one has the better-conditioned
    # eigenvector; compute it first, then build the other orthogonally.  In a
    # two-fold degeneracy the primary is the isolated eigenvalue and the
    # degenerate pair gets an arbitrary orthonormal basis of its plane.
    # Triple degeneracy falls back to the canonical frame.
    lo_primary = (w_mid - w_lo) >= (w_hi - w_mid)

    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)
    ex = (one, zero, zero)

    # bool-valued selects as logical ops: Mosaic cannot lower a select
    # producing i1 ("unsupported target bitwidth for truncation"), and
    # (c & a) | (~c & b) is the same function
    primary = pick(lo_primary, v_lo_c, v_hi_c)
    primary_ok = (lo_primary & ok_lo) | (~lo_primary & ok_hi)
    primary = pick(primary_ok, primary, ex)

    secondary = pick(lo_primary, v_hi_c, v_lo_c)
    secondary_ok = (lo_primary & ok_hi) | (~lo_primary & ok_lo)
    dot = _dot(secondary, primary)
    sec_orth = tuple(s - dot * p for s, p in zip(secondary, primary))
    n_orth = _dot(sec_orth, sec_orth)
    sec_valid = jnp.logical_and(secondary_ok, n_orth > 0.25)
    inv = jax.lax.rsqrt(jnp.where(sec_valid, n_orth, 1.0))
    secondary = pick(
        sec_valid, tuple(c * inv for c in sec_orth), stable_perp(primary)
    )

    v_lo = pick(lo_primary, primary, secondary)
    v_hi = pick(lo_primary, secondary, primary)
    v_mid = _cross(v_hi, v_lo)

    # v[i][j]: component i of eigenvector j
    v = tuple(
        (v_lo[i], v_mid[i], v_hi[i]) for i in range(3)
    )
    return w, v


def sort_by_abs3(w) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort eigenvalue planes ``(w0, w1, w2)`` by |value| ascending, using the
    same 3-swap network as the reference (itkVEDMultigridImageFilter.hxx:266-268)."""
    l0, l1, l2 = w

    def swap(a, b):
        s = jnp.abs(a) > jnp.abs(b)
        return jnp.where(s, b, a), jnp.where(s, a, b)

    l0, l1 = swap(l0, l1)
    l1, l2 = swap(l1, l2)
    l0, l1 = swap(l0, l1)
    return l0, l1, l2
