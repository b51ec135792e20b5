"""Intergrid transfer: full-weighting restriction and linear prolongation.

The reference builds D-dimensional transfer stencils as tensor products of 1-D
stencils with per-dimension vertex/cell variants and special border rows
(/root/reference/include/mad/itkInterGridOperators.h:101-127, .hxx:45-353).
Because the stencil factors exactly and the border-row selection depends only
on that dimension's index, the whole operator is *separable*: we apply a 1-D
operator along each axis in sequence.  Each 1-D operator is a handful of
strided slices — static shapes, no gather/scatter, ideal for XLA on TPU.

1-D stencils (coarse index j, fine index i = 2j + offset):

Restriction, vertex (fine n = 2c-1 -> coarse c)        [.hxx tables .h:115-120]
    interior:  out[j] = 1/4 u[2j-1] + 1/2 u[2j] + 1/4 u[2j+1]
    borders:   injection (out[0] = u[0], out[c-1] = u[2c-2])
Restriction, cell (fine n = 2c -> coarse c)            [.h:122-127]
    interior:  out[j] = 1/8 u[2j-1] + 3/8 u[2j] + 3/8 u[2j+1] + 1/8 u[2j+2]
    left:      out[0]   = 1/2 u[0] + 3/8 u[1] + 1/8 u[2]
    right:     out[c-1] = 1/8 u[2c-3] + 3/8 u[2c-2] + 1/2 u[2c-1]
Prolongation, vertex (coarse c -> fine 2c-1)           [.h:101-106]
    fine[2j] = u[j];  fine[2j+1] = (u[j] + u[j+1]) / 2
Prolongation, cell (coarse c -> fine 2c)               [.h:108-113]
    fine[0] = u[0];  fine[2c-1] = u[c-1]
    fine[2j]   = 3/4 u[j] + 1/4 u[j-1]   (j >= 1)
    fine[2j+1] = 3/4 u[j] + 1/4 u[j+1]   (j <= c-2)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..core.grids import CELL, VERTEX


def coarse_size(fine: int, centering: str) -> int:
    return fine // 2 if centering == CELL else (fine - 1) // 2 + 1


def fine_size(coarse: int, centering: str) -> int:
    return coarse * 2 if centering == CELL else (coarse - 1) * 2 + 1


def _restrict_1d_vertex(u: jnp.ndarray) -> jnp.ndarray:
    """Vertex restriction along the last axis (n = 2c-1 -> c)."""
    n = u.shape[-1]
    c = (n - 1) // 2 + 1
    left = u[..., :1]
    right = u[..., n - 1 :]
    if c <= 2:
        return jnp.concatenate([left, right], axis=-1)
    mid = (
        0.25 * u[..., 1 : n - 3 : 2]
        + 0.5 * u[..., 2 : n - 2 : 2]
        + 0.25 * u[..., 3 : n - 1 : 2]
    )
    return jnp.concatenate([left, mid, right], axis=-1)


def _restrict_1d_cell(u: jnp.ndarray) -> jnp.ndarray:
    """Cell restriction along the last axis (n = 2c -> c)."""
    n = u.shape[-1]
    c = n // 2
    left = 0.5 * u[..., :1] + 0.375 * u[..., 1:2] + 0.125 * u[..., 2:3]
    right = (
        0.125 * u[..., n - 3 : n - 2]
        + 0.375 * u[..., n - 2 : n - 1]
        + 0.5 * u[..., n - 1 :]
    )
    if c <= 2:
        return jnp.concatenate([left, right], axis=-1)
    mid = (
        0.125 * u[..., 1 : n - 4 : 2]
        + 0.375 * u[..., 2 : n - 3 : 2]
        + 0.375 * u[..., 3 : n - 2 : 2]
        + 0.125 * u[..., 4 : n - 1 : 2]
    )
    return jnp.concatenate([left, mid, right], axis=-1)


def _interleave_last(even: jnp.ndarray, odd: jnp.ndarray, n: int) -> jnp.ndarray:
    """Build an array whose even last-axis entries come from ``even`` and odd
    ones from ``odd`` (sizes may differ by one).

    Implemented as stack + reshape — a contiguous (c, 2) -> (2c) merge of
    adjacent dims — rather than ``zeros().at[::2].set``: the strided lane
    scatter lowers to shuffles on TPU (measured ~7x slower at 512^3; see the
    project notes on XLA minor-axis op efficiency)."""
    ne = even.shape[-1]
    if odd.shape[-1] < ne:  # vertex: one fewer odd entry
        pad = [(0, 0)] * (odd.ndim - 1) + [(0, ne - odd.shape[-1])]
        odd = jnp.pad(odd, pad)
    out = jnp.stack([even, odd], axis=-1).reshape(even.shape[:-1] + (2 * ne,))
    return out[..., :n]


def _prolong_1d_vertex(u: jnp.ndarray) -> jnp.ndarray:
    """Vertex prolongation along the last axis (c -> 2c-1)."""
    c = u.shape[-1]
    odd = 0.5 * (u[..., :-1] + u[..., 1:])
    return _interleave_last(u, odd, 2 * c - 1)


def _prolong_1d_cell(u: jnp.ndarray) -> jnp.ndarray:
    """Cell prolongation along the last axis (c -> 2c)."""
    c = u.shape[-1]
    even = jnp.concatenate([u[..., :1], 0.75 * u[..., 1:] + 0.25 * u[..., :-1]], axis=-1)
    odd = jnp.concatenate([0.75 * u[..., :-1] + 0.25 * u[..., 1:], u[..., c - 1 :]], axis=-1)
    return _interleave_last(even, odd, 2 * c)


def _apply_along_axis(fn, x: jnp.ndarray, axis: int) -> jnp.ndarray:
    x = jnp.moveaxis(x, axis, -1)
    x = fn(x)
    return jnp.moveaxis(x, -1, axis)


def _restrict_banded(x: jnp.ndarray, centering: Sequence[str]) -> jnp.ndarray:
    """Large-field restriction via the banded pair-kernel machinery: the
    1-D operator matrices (restrict_matrix_1d, parity-tested against the
    functions above) are analyzed into interior-stencil + border-row form
    and applied with conv interiors on minor axes.

    Measured on TPU: this form wins STANDALONE (36 -> 32 ms per 512^3
    restrict+prolong pair) but LOSES inside the fused V-cycle programs
    (256^3 DCA solve 0.077 -> 0.116 s — XLA already schedules the slice
    form well there and the banded concat breaks its fusions), so the
    cycles always use the slice form; reach this one with
    ``restrict(..., method='banded')`` for standalone/offline restriction
    work."""
    from .galerkin_direct import (
        analyze_banded,
        apply_banded,
        restrict_matrix_1d,
    )

    for d, cent in enumerate(centering):
        spec = analyze_banded(restrict_matrix_1d(x.shape[d], cent))
        x = apply_banded(x, spec, axis=d)
    return x


def restrict(
    x: jnp.ndarray, centering: Sequence[str], method: str = "slice"
) -> jnp.ndarray:
    """Full-weighting restriction of a fine-grid field.

    ``centering[d]`` is the coarse level's centering in dimension ``d``
    (the reference passes ``GetVertexCenteringAtLevel(l+1)``).

    ``method``: ``'slice'`` (default — the XLA strided-slice form, which
    fuses best inside the compiled cycle programs) or ``'banded'`` (the
    conv-emitter banded form — slightly faster standalone at >=512^3,
    slower inside fused cycles; see :func:`_restrict_banded`).
    """
    if method == "banded":
        return _restrict_banded(x, centering)
    if method != "slice":
        raise ValueError(f"unknown restrict method: {method!r}")
    for d, cent in enumerate(centering):
        fn = _restrict_1d_cell if cent == CELL else _restrict_1d_vertex
        x = _apply_along_axis(fn, x, d)
    return x


def prolong(x: jnp.ndarray, centering: Sequence[str]) -> jnp.ndarray:
    """Linear prolongation (interpolation) of a coarse-grid field."""
    for d, cent in enumerate(centering):
        fn = _prolong_1d_cell if cent == CELL else _prolong_1d_vertex
        x = _apply_along_axis(fn, x, d)
    return x


def restrict_tensor(tensor, centering: Sequence[str]):
    """Restrict a symmetric tensor field (canonical plane tuple, see
    core.symfield) componentwise — itkGridsHierarchy.hxx:149-188 restricts
    each coefficient image."""
    return tuple(restrict(plane, centering) for plane in tensor)
