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

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


# ---------------------------------------------------------------------------
# Axis-native forms.
#
# The last-axis functions above route every axis through moveaxis, which XLA
# fuses into the strided slices — and on TPU a minor-(lane-)axis stride-2
# gather/scatter is a lane-shuffle loop: measured ~120 GB/s for EVERY axis at
# 512^3 (the transpose turns major-axis strides into lane strides too).  The
# production path instead
#
#   * slices each non-minor axis natively (contiguous plane reads/writes —
#     no transpose, no lane shuffles), and
#   * handles the minor axis with 128x128 *band matmuls* on the MXU: tiling
#     the lane axis into 128-lane tiles, a coarse tile is a sum of (shifted)
#     fine tiles each multiplied by a static 128x128 block of the 1-D
#     transfer matrix — arbitrary within-tile index patterns (the stride-2
#     deinterleave/interleave) are absorbed into the matrix for free.
#     Eligible when the fine size is a multiple of 256 under cell centering
#     (512^3/256^3 production levels); everything else falls back to the
#     slice form.  Bit-faithful border rows come from the same 1-D operator
#     matrices the banded Galerkin assembler uses (restrict_matrix_1d /
#     prolong_matrix_1d, parity-tested).
# ---------------------------------------------------------------------------


def _sl(x: jnp.ndarray, axis: int, s: slice) -> jnp.ndarray:
    idx = [slice(None)] * x.ndim
    idx[axis] = s
    return x[tuple(idx)]


def _restrict_slice_ax(x: jnp.ndarray, axis: int, cent: str) -> jnp.ndarray:
    """1-D restriction, slicing natively along ``axis`` (no moveaxis)."""
    n = x.shape[axis]
    if cent == VERTEX:
        c = (n - 1) // 2 + 1
        left = _sl(x, axis, slice(0, 1))
        right = _sl(x, axis, slice(n - 1, n))
        if c <= 2:
            return jnp.concatenate([left, right], axis=axis)
        mid = (
            0.25 * _sl(x, axis, slice(1, n - 3, 2))
            + 0.5 * _sl(x, axis, slice(2, n - 2, 2))
            + 0.25 * _sl(x, axis, slice(3, n - 1, 2))
        )
        return jnp.concatenate([left, mid, right], axis=axis)
    c = n // 2
    left = (
        0.5 * _sl(x, axis, slice(0, 1))
        + 0.375 * _sl(x, axis, slice(1, 2))
        + 0.125 * _sl(x, axis, slice(2, 3))
    )
    right = (
        0.125 * _sl(x, axis, slice(n - 3, n - 2))
        + 0.375 * _sl(x, axis, slice(n - 2, n - 1))
        + 0.5 * _sl(x, axis, slice(n - 1, n))
    )
    if c <= 2:
        return jnp.concatenate([left, right], axis=axis)
    mid = (
        0.125 * _sl(x, axis, slice(1, n - 4, 2))
        + 0.375 * _sl(x, axis, slice(2, n - 3, 2))
        + 0.375 * _sl(x, axis, slice(3, n - 2, 2))
        + 0.125 * _sl(x, axis, slice(4, n - 1, 2))
    )
    return jnp.concatenate([left, mid, right], axis=axis)


def _interleave_ax(even: jnp.ndarray, odd: jnp.ndarray, n: int, axis: int):
    """Merge ``even``/``odd`` along ``axis`` (even first), truncated to n."""
    ne = even.shape[axis]
    if odd.shape[axis] < ne:  # vertex: one fewer odd entry
        pad = [(0, 0)] * odd.ndim
        pad[axis] = (0, ne - odd.shape[axis])
        odd = jnp.pad(odd, pad)
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = out.shape[:axis] + (2 * ne,) + out.shape[axis + 2:]
    return _sl(out.reshape(shape), axis, slice(0, n))


def _prolong_slice_ax(x: jnp.ndarray, axis: int, cent: str) -> jnp.ndarray:
    """1-D prolongation, slicing natively along ``axis``."""
    c = x.shape[axis]
    if cent == VERTEX:
        odd = 0.5 * (_sl(x, axis, slice(0, c - 1)) + _sl(x, axis, slice(1, c)))
        return _interleave_ax(x, odd, 2 * c - 1, axis)
    even = jnp.concatenate(
        [
            _sl(x, axis, slice(0, 1)),
            0.75 * _sl(x, axis, slice(1, c))
            + 0.25 * _sl(x, axis, slice(0, c - 1)),
        ],
        axis=axis,
    )
    odd = jnp.concatenate(
        [
            0.75 * _sl(x, axis, slice(0, c - 1))
            + 0.25 * _sl(x, axis, slice(1, c)),
            _sl(x, axis, slice(c - 1, c)),
        ],
        axis=axis,
    )
    return _interleave_ax(even, odd, 2 * c, axis)


_LANE = 128  # TPU lane-tile width


def _lane_mm_ok(n: int, cent: str) -> bool:
    """Lane-axis band-matmul eligibility: cell centering with the fine size a
    multiple of 256 (whole 128-lane tiles on both levels)."""
    return cent == CELL and n >= 256 and n % (2 * _LANE) == 0


@functools.lru_cache(maxsize=64)
def _lane_restrict_bands(n: int) -> Tuple[np.ndarray, ...]:
    """Band-block decomposition of the 1-D cell restriction matrix.

    ``bands[i]`` has shape (Tc, 128, 128): the contribution of fine lane-tile
    ``2t + delta_i`` to coarse tile ``t`` (deltas -1, 0, 1, 2), transposed for
    ``f_tile @ W -> c_tile``.  Border rows included exactly.
    """
    from .galerkin_direct import restrict_matrix_1d

    r = np.asarray(restrict_matrix_1d(n, CELL))
    tc = r.shape[0] // _LANE
    bands = []
    for delta in (-1, 0, 1, 2):
        w = np.zeros((tc, _LANE, _LANE))
        for t in range(tc):
            kf = 2 * t + delta
            if 0 <= kf < n // _LANE:
                w[t] = r[t * _LANE:(t + 1) * _LANE,
                         kf * _LANE:(kf + 1) * _LANE].T
        bands.append(w)
    return tuple(bands)


@functools.lru_cache(maxsize=64)
def _lane_prolong_bands(fine_n: int) -> Tuple[np.ndarray, ...]:
    """Band blocks of the 1-D cell prolongation: fine tile ``2t + p`` (parity
    p) reads coarse tiles ``t + delta``; returns (even deltas (-1, 0), odd
    deltas (0, 1)) as four (Tc, 128, 128) stacks for ``c_tile @ W``."""
    from .galerkin_direct import prolong_matrix_1d

    p = np.asarray(prolong_matrix_1d(fine_n, CELL))
    tc = p.shape[1] // _LANE
    out = []
    for parity, delta in ((0, -1), (0, 0), (1, 0), (1, 1)):
        w = np.zeros((tc, _LANE, _LANE))
        for t in range(tc):
            kc = t + delta
            if 0 <= kc < tc:
                w[t] = p[(2 * t + parity) * _LANE:(2 * t + parity + 1) * _LANE,
                         kc * _LANE:(kc + 1) * _LANE].T
        out.append(w)
    return tuple(out)


def _band_tiles(f: jnp.ndarray, delta: int, tc: int) -> jnp.ndarray:
    """(m, Tc, 128) view of fine tiles ``2t + delta``, zeros outside."""
    zero = jnp.zeros((f.shape[0], 1, f.shape[2]), f.dtype)
    if delta < 0:
        valid = f[:, 1::2][:, : tc - 1]
        return jnp.concatenate([zero, valid], axis=1)
    tiles = f[:, delta::2][:, :tc]
    if tiles.shape[1] < tc:
        pads = [zero] * (tc - tiles.shape[1])
        tiles = jnp.concatenate([tiles, *pads], axis=1)
    return tiles


def _restrict_lane_mm(x: jnp.ndarray) -> jnp.ndarray:
    """Cell restriction along the last axis via MXU band matmuls."""
    n = x.shape[-1]
    tc = (n // 2) // _LANE
    bands = _lane_restrict_bands(n)
    f = x.reshape(-1, n // _LANE, _LANE)
    out = None
    for delta, w in zip((-1, 0, 1, 2), bands):
        term = jnp.einsum(
            "mtl,tlc->mtc", _band_tiles(f, delta, tc),
            jnp.asarray(w, x.dtype), precision=jax.lax.Precision.HIGHEST,
        )
        out = term if out is None else out + term
    return out.reshape(x.shape[:-1] + (n // 2,))


def _prolong_lane_mm(x: jnp.ndarray) -> jnp.ndarray:
    """Cell prolongation along the last axis via MXU band matmuls."""
    c = x.shape[-1]
    tc = c // _LANE
    we_m1, we_0, wo_0, wo_1 = _lane_prolong_bands(2 * c)
    ct = x.reshape(-1, tc, _LANE)

    def mm(tiles, w):
        return jnp.einsum(
            "mtl,tlc->mtc", tiles, jnp.asarray(w, x.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )

    ct_prev = jnp.concatenate(
        [jnp.zeros_like(ct[:, :1]), ct[:, :-1]], axis=1
    )
    ct_next = jnp.concatenate(
        [ct[:, 1:], jnp.zeros_like(ct[:, :1])], axis=1
    )
    pe = mm(ct_prev, we_m1) + mm(ct, we_0)
    po = mm(ct, wo_0) + mm(ct_next, wo_1)
    out = jnp.stack([pe, po], axis=2).reshape(-1, 2 * tc, _LANE)
    return out.reshape(x.shape[:-1] + (2 * c,))


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
    x: jnp.ndarray, centering: Sequence[str], method: str = "slice",
    lane_mm: bool = True,
) -> jnp.ndarray:
    """Full-weighting restriction of a fine-grid field.

    ``centering[d]`` is the coarse level's centering in dimension ``d``
    (the reference passes ``GetVertexCenteringAtLevel(l+1)``).

    ``method``: ``'slice'`` (default — axis-native strided slices on
    non-minor axes + MXU band matmuls on the minor axis, see the
    axis-native section above) or ``'banded'`` (the conv-emitter banded
    form; see :func:`_restrict_banded`).

    ``lane_mm=False`` disables the minor-axis matmul path (used by the
    distributed solvers: under a sharded minor axis the tile reshape would
    force the SPMD partitioner to regather).
    """
    if method == "banded":
        return _restrict_banded(x, centering)
    if method != "slice":
        raise ValueError(f"unknown restrict method: {method!r}")
    if (
        lane_mm and x.ndim == 3
        and jnp.issubdtype(x.dtype, jnp.floating)
        and jax.default_backend() == "tpu"
    ):
        # fused Pallas kernel: ~13x the XLA slice form at 512^3 (the XLA
        # strided passes run ~6x off speed-of-light however formulated;
        # see ops.pallas_transfer)
        from .pallas_transfer import (
            pallas_restrict3d,
            pallas_restrict_supported,
        )

        if pallas_restrict_supported(
            tuple(x.shape), tuple(centering), jnp.dtype(x.dtype).itemsize
        ):
            return pallas_restrict3d(x)
    for d, cent in enumerate(centering):
        if (
            lane_mm and d == x.ndim - 1
            and _lane_mm_ok(x.shape[d], cent)
            and jnp.issubdtype(x.dtype, jnp.floating)
        ):
            x = _restrict_lane_mm(x)
        else:
            x = _restrict_slice_ax(x, d, cent)
    return x


def prolong(
    x: jnp.ndarray, centering: Sequence[str], lane_mm: bool = True
) -> jnp.ndarray:
    """Linear prolongation (interpolation) of a coarse-grid field.

    Axes are applied minor-first (the operators are separable, so order
    commutes) so the minor-axis step — the only one needing lane interleaves
    or matmuls — runs on the *coarse*-sized array.
    """
    if (
        lane_mm and x.ndim == 3
        and jnp.issubdtype(x.dtype, jnp.floating)
        and jax.default_backend() == "tpu"
    ):
        # fused Pallas kernel (see ops.pallas_transfer): the XLA interleave
        # form was the worst-SoL pass left in the V-cycle (~8.7% of SoL at
        # 512^3)
        from .pallas_transfer import (
            pallas_prolong3d,
            pallas_prolong_supported,
        )

        if pallas_prolong_supported(
            tuple(x.shape), tuple(centering), jnp.dtype(x.dtype).itemsize
        ):
            return pallas_prolong3d(x)
    for d in reversed(range(x.ndim)):
        cent = centering[d]
        if (
            lane_mm and d == x.ndim - 1
            and cent == CELL and x.shape[d] % _LANE == 0 and x.shape[d] >= _LANE
            and jnp.issubdtype(x.dtype, jnp.floating)
        ):
            x = _prolong_lane_mm(x)
        else:
            x = _prolong_slice_ax(x, d, cent)
    return x


def restrict_tensor(tensor, centering: Sequence[str], lane_mm: bool = True):
    """Restrict a symmetric tensor field (canonical plane tuple, see
    core.symfield) componentwise — itkGridsHierarchy.hxx:149-188 restricts
    each coefficient image."""
    return tuple(restrict(plane, centering, lane_mm=lane_mm) for plane in tensor)
