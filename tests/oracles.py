"""Independent NumPy reference implementations ("oracles") of the discretized
operators, written as literal per-voxel loops directly from the math spec in
SURVEY.md §2 (DCA discretization, transfer stencil tables).  Used to validate
the vectorized JAX implementations on small grids."""

from __future__ import annotations

import itertools
from collections import defaultdict

import numpy as np

LEFT, INTERIOR, RIGHT = "left", "interior", "right"

# 1-D transfer stencil tables (offsets -1..1 for vertex, -2..2 for cell).
INTERP_VERTEX = {
    LEFT: [0.0, 1.0, 0.5],
    INTERIOR: [0.5, 1.0, 0.5],
    RIGHT: [0.5, 1.0, 0.0],
}
INTERP_CELL = {
    LEFT: [0.0, 0.0, 1.0, 0.75, 0.25],
    INTERIOR: [0.0, 0.25, 0.75, 0.75, 0.25],
    RIGHT: [0.0, 0.25, 0.75, 1.0, 0.0],
}
RESTRICT_VERTEX = {
    LEFT: [0.0, 1.0, 0.0],
    INTERIOR: [0.25, 0.5, 0.25],
    RIGHT: [0.0, 1.0, 0.0],
}
RESTRICT_CELL = {
    LEFT: [0.0, 0.0, 0.5, 0.375, 0.125],
    INTERIOR: [0.0, 0.125, 0.375, 0.375, 0.125],
    RIGHT: [0.0, 0.125, 0.375, 0.5, 0.0],
}


def _position(j, size):
    if j == 0:
        return LEFT
    if j == size - 1:
        return RIGHT
    return INTERIOR


def dca_oracle(tensor, spacing, dt):
    """Per-voxel assembly of A = Id - dt*L with Neumann reflection.

    Returns dict offset-tuple -> coefficient plane (np arrays)."""
    shape = tensor.shape[:-2]
    ndim = len(shape)
    coeff = defaultdict(lambda: np.zeros(shape))

    def refl(p, off):
        """Flip every offset component pointing outside the grid at voxel p."""
        out = list(off)
        for d in range(ndim):
            q = p[d] + off[d]
            if q < 0 or q >= shape[d]:
                out[d] = -off[d]
        return tuple(out)

    def m(p, d, d2):
        lo, hi = min(d, d2), max(d, d2)
        return tensor[p + (hi, lo)]

    def e(d, s=1):
        off = [0] * ndim
        off[d] = s
        return tuple(off)

    def add(p, off, v):
        coeff[refl(p, off)][p] += v

    center = (0,) * ndim
    for p in itertools.product(*map(range, shape)):
        coeff[center][p] += 1.0
        for d in range(ndim):
            w2 = -dt / spacing[d] ** 2
            v = m(p, d, d) * w2
            add(p, e(d, 1), v)
            add(p, e(d, -1), v)
            coeff[center][p] -= 2 * v
            for d2 in range(ndim):
                w = -dt / (4.0 * spacing[d] * spacing[d2])
                if d != d2:
                    v = m(p, d, d2) * w
                    add(p, tuple(a + b for a, b in zip(e(d, 1), e(d2, 1))), v)
                    add(p, tuple(a + b for a, b in zip(e(d, 1), e(d2, -1))), -v)
                    add(p, tuple(a + b for a, b in zip(e(d, -1), e(d2, 1))), -v)
                    add(p, tuple(a + b for a, b in zip(e(d, -1), e(d2, -1))), v)
                # transport term: derivative of M(d,d2) along d2
                pj = p[d2]
                step = e(d2)

                def shift(pp, k):
                    q = list(pp)
                    q[d2] += k
                    return tuple(q)

                if pj == 0:
                    dm = (
                        -3.0 * m(p, d, d2)
                        + 4.0 * m(shift(p, 1), d, d2)
                        - 1.0 * m(shift(p, 2), d, d2)
                    )
                elif pj == shape[d2] - 1:
                    dm = (
                        3.0 * m(p, d, d2)
                        - 4.0 * m(shift(p, -1), d, d2)
                        + 1.0 * m(shift(p, -2), d, d2)
                    )
                else:
                    dm = m(shift(p, 1), d, d2) - m(shift(p, -1), d, d2)
                v = dm * w
                add(p, e(d, 1), v)
                add(p, e(d, -1), -v)
    return dict(coeff)


def restrict_oracle(u, centering):
    """Tensor-product full-weighting restriction (gather form)."""
    ndim = u.ndim
    fine_shape = u.shape
    coarse_shape = tuple(
        n // 2 if c == "c" else (n - 1) // 2 + 1
        for n, c in zip(fine_shape, centering)
    )
    radii = tuple(2 if c == "c" else 1 for c in centering)
    out = np.zeros(coarse_shape, u.dtype)
    for j in itertools.product(*map(range, coarse_shape)):
        val = 0.0
        for off in itertools.product(*[range(-r, r + 1) for r in radii]):
            w = 1.0
            for d in range(ndim):
                tab = RESTRICT_CELL if centering[d] == "c" else RESTRICT_VERTEX
                w *= tab[_position(j[d], coarse_shape[d])][off[d] + radii[d]]
            if w == 0.0:
                continue
            i = tuple(2 * j[d] + off[d] for d in range(ndim))
            if all(0 <= i[d] < fine_shape[d] for d in range(ndim)):
                val += w * u[i]
        out[j] = val
    return out


def prolong_oracle(u, centering):
    """Tensor-product linear interpolation (scatter form)."""
    ndim = u.ndim
    coarse_shape = u.shape
    fine_shape = tuple(
        n * 2 if c == "c" else (n - 1) * 2 + 1
        for n, c in zip(coarse_shape, centering)
    )
    radii = tuple(2 if c == "c" else 1 for c in centering)
    out = np.zeros(fine_shape, u.dtype)
    for j in itertools.product(*map(range, coarse_shape)):
        for off in itertools.product(*[range(-r, r + 1) for r in radii]):
            w = 1.0
            for d in range(ndim):
                tab = INTERP_CELL if centering[d] == "c" else INTERP_VERTEX
                w *= tab[_position(j[d], coarse_shape[d])][off[d] + radii[d]]
            if w == 0.0:
                continue
            i = tuple(2 * j[d] + off[d] for d in range(ndim))
            if all(0 <= i[d] < fine_shape[d] for d in range(ndim)):
                out[i] += w * u[j]
    return out
