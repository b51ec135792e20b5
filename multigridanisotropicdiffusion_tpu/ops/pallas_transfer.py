"""Fused Pallas TPU kernel for 3D full-weighting restriction.

XLA's strided-slice formulation of the separable restriction runs ~6x off
HBM speed-of-light at 512^3 regardless of axis order or matmul tricks (each
axis pass re-streams the field and the stride-2 gathers defeat fusion;
measured ~18 ms per 512^3 field vs a ~2.5 ms traffic bound).  Mosaic cannot
lower strided slices at all (gathers are 2D-only), so the kernel avoids
strides entirely:

* **z** (grid axis): the four fine taps ``2k-1 .. 2k+2`` of coarse plane
  ``k`` arrive as separate index-map-clamped refs (the
  ``ops.pallas_smoothers`` pattern); border weights are switched by scalar
  selects on ``k`` (clamped duplicate planes get weight 0).
* **y** (sublane axis): the stride-2 row combination is one banded matmul
  ``W_y @ plane`` on the MXU — the matrix absorbs the deinterleave; the
  first/last coarse rows of the volume are patched in-kernel to the border
  stencil.  1-row y halos ride granule-row blocks exactly like the smoother
  kernels.
* **x** (lane axis): per 128-lane coarse tile, a sum of (up to) four static
  ``128 x 128`` band blocks of the 1-D restriction matrix
  (``ops.galerkin_direct.restrict_matrix_1d``, border rows included) applied
  with ``jnp.dot`` — lane mixing is free inside a matmul.

Restriction semantics are identical to ``ops.transfer.restrict`` (same 1-D
operator tables, reference itkInterGridOperators.h:115-127); parity is
tested in interpret mode on CPU and the production dispatch is gated to
all-cell-centered 3D fields with ``X % 256 == 0`` on the TPU backend.
Weights are exact binary fractions, so bf16-input MXU passes lose nothing
on the weights; dots run at HIGHEST precision for f32 inputs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..core.grids import CELL

_LANE = 128


def _sublane_granule(itemsize: int) -> int:
    return 8 * max(1, 4 // itemsize)


def pallas_restrict_supported(
    shape: Tuple[int, ...], centering, itemsize: int = 4,
    interpret: bool = False,
) -> bool:
    """All-cell 3D fields with whole coarse lane tiles and granule-aligned
    coarse y tiles.  ``interpret`` lifts the no-f64 restriction
    (Mosaic-only)."""
    if len(shape) != 3 or (itemsize > 4 and not interpret):
        return False
    if any(c != CELL for c in centering):
        return False
    z, y, x = shape
    if z < 4 or z % 2 or y % 2 or x % (2 * _LANE):
        return False
    g = _sublane_granule(itemsize)
    cy = y // 2
    ty = _pick_cy_tile(cy, g)
    return ty is not None


def _pick_cy_tile(cy: int, g: int) -> int | None:
    """Largest divisor of the coarse y extent that is a granule multiple,
    capped at 128 rows."""
    best = None
    for t in range(g, min(cy, 128) + 1, g):
        if cy % t == 0:
            best = t
    return best


@functools.lru_cache(maxsize=64)
def _x_bands(x: int, dtype_name: str) -> np.ndarray:
    """Stacked band blocks of the 1-D cell restriction along x:
    ``bands[4 * t + i]`` multiplies fine lane-tile ``2t + delta_i`` into
    coarse tile ``t`` (deltas -1, 0, 1, 2; zeros when out of range)."""
    from .galerkin_direct import restrict_matrix_1d

    r = np.asarray(restrict_matrix_1d(x, CELL))
    tc = (x // 2) // _LANE
    out = np.zeros((4 * tc, _LANE, _LANE), jnp.dtype(dtype_name))
    for t in range(tc):
        for i, delta in enumerate((-1, 0, 1, 2)):
            kf = 2 * t + delta
            if 0 <= kf < x // _LANE:
                out[4 * t + i] = r[t * _LANE:(t + 1) * _LANE,
                                   kf * _LANE:(kf + 1) * _LANE].T
    return out


@functools.lru_cache(maxsize=64)
def _y_base(ty: int, dtype_name: str) -> np.ndarray:
    """Interior rows of the banded y restriction matrix (plane-row indexed:
    one halo row above, so coarse row r reads plane rows 2r..2r+3)."""
    wy = np.zeros((ty, 2 * ty + 2), jnp.dtype(dtype_name))
    for r in range(ty):
        wy[r, 2 * r:2 * r + 4] = (0.125, 0.375, 0.375, 0.125)
    return wy


def _restrict_kernel(ty: int, cy: int, cz: int, x: int, hh: int,
                     precision, compute_dtype, *refs):
    """Kernel body: 4 z taps -> z-combine -> y band matmul -> x band dots."""
    k = pl.program_id(0)
    j = pl.program_id(1)

    cd = jnp.dtype(compute_dtype)

    def up(a):
        return a.astype(cd) if a.dtype != cd else a

    # refs: for each dz in (-1, 0, 1, 2): (main, top, bot); then the weight
    # inputs (y base matrix, stacked x band blocks) and the output.
    mains = [refs[3 * i] for i in range(4)]
    tops = [refs[3 * i + 1] for i in range(4)]
    bots = [refs[3 * i + 2] for i in range(4)]
    wy_ref, wx_ref, out = refs[12], refs[13], refs[14]

    # z-combine with border-switched weights: interior (1/8,3/8,3/8,1/8) on
    # fine z = 2k-1..2k+2; first/last coarse planes use the one-sided rows.
    interior = jnp.logical_and(k > 0, k < cz - 1)
    wz = [
        jnp.where(interior, 0.125, jnp.where(k == 0, 0.0, 0.125)),
        jnp.where(interior, 0.375, jnp.where(k == 0, 0.5, 0.375)),
        jnp.where(interior, 0.375, jnp.where(k == 0, 0.375, 0.5)),
        jnp.where(interior, 0.125, jnp.where(k == 0, 0.125, 0.0)),
    ]

    def stitched(i):
        # (2 ty + 2, x): one halo row above and below the main block
        top = tops[i][0, hh - 1:hh, :]
        bot = bots[i][0, 0:1, :]
        return jnp.concatenate([up(top), up(mains[i][0]), up(bot)], axis=0)

    plane = sum(wz[i] * stitched(i) for i in range(4))  # (2 ty + 2, x)

    # y band matmul: coarse row r reads plane rows 2r .. 2r+3 (plane row
    # index = global fine row + 1).  Border coarse rows (global 0 / cy-1)
    # patched to the one-sided stencil.
    n_in = 2 * ty + 2
    wy = up(wy_ref[...])
    rows = jax.lax.broadcasted_iota(jnp.int32, (ty, n_in), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ty, n_in), 1)
    # global first coarse row: weights (0, 1/2, 3/8, 1/8) on plane rows 0..3
    first = jnp.logical_and(j == 0, rows == 0)
    w_first = jnp.where(cols == 1, 0.5,
                        jnp.where(cols == 2, 0.375,
                                  jnp.where(cols == 3, 0.125, 0.0)))
    # global last coarse row: (1/8, 3/8, 1/2, 0) on its four plane rows
    last = jnp.logical_and(j == (cy // ty) - 1, rows == ty - 1)
    w_last = jnp.where(cols == n_in - 4, 0.125,
                       jnp.where(cols == n_in - 3, 0.375,
                                 jnp.where(cols == n_in - 2, 0.5, 0.0)))
    wy = jnp.where(first, w_first, jnp.where(last, w_last, wy))

    q = jax.lax.dot_general(
        wy, plane, (((1,), (0,)), ((), ())), precision=precision
    )  # (ty, x)

    # x band dots per coarse lane tile (out-of-range bands are zero blocks)
    tc = (x // 2) // _LANE
    pieces = []
    for t in range(tc):
        acc = None
        for i, delta in enumerate((-1, 0, 1, 2)):
            kf = 2 * t + delta
            if not 0 <= kf < x // _LANE:
                continue
            term = jax.lax.dot_general(
                q[:, kf * _LANE:(kf + 1) * _LANE], up(wx_ref[4 * t + i]),
                (((1,), (0,)), ((), ())), precision=precision,
            )
            acc = term if acc is None else acc + term
        pieces.append(acc)
    res = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
    out[...] = res[None].astype(out.dtype)


@functools.lru_cache(maxsize=64)
def _build_restrict(shape: Tuple[int, ...], dtype_name: str,
                    interpret: bool):
    z, y, x = shape
    dtype = jnp.dtype(dtype_name)
    cz, cy, cx = z // 2, y // 2, x // 2
    g = _sublane_granule(dtype.itemsize)
    ty = _pick_cy_tile(cy, g)
    assert ty is not None
    nyb = cy // ty
    fine_main = (1, 2 * ty, x)
    hh = g
    halo = (1, hh, x)
    nh = (2 * ty) // hh  # halo blocks per fine main tile

    def z_at(dz):
        return lambda k, j, dz=dz: jnp.clip(2 * k + dz, 0, z - 1)

    specs = []
    for dz in (-1, 0, 1, 2):
        zf = z_at(dz)
        specs.append(
            pl.BlockSpec(fine_main, lambda k, j, zf=zf: (zf(k, j), j, 0))
        )
        specs.append(
            pl.BlockSpec(
                halo, lambda k, j, zf=zf: (zf(k, j),
                                           jnp.maximum(j * nh - 1, 0), 0)
            )
        )
        specs.append(
            pl.BlockSpec(
                halo,
                lambda k, j, zf=zf: (zf(k, j),
                                     jnp.minimum((j + 1) * nh, y // hh - 1),
                                     0),
            )
        )

    precision = (
        jax.lax.Precision.HIGHEST if dtype.itemsize >= 4
        else jax.lax.Precision.DEFAULT
    )
    compute_dtype = "float64" if dtype == jnp.float64 else "float32"
    kernel = functools.partial(
        _restrict_kernel, ty, cy, cz, x, hh, precision, compute_dtype
    )
    n_in = 2 * ty + 2
    tc = cx // _LANE
    specs.append(pl.BlockSpec((ty, n_in), lambda k, j: (0, 0)))
    specs.append(pl.BlockSpec((4 * tc, _LANE, _LANE), lambda k, j: (0, 0, 0)))
    call = pl.pallas_call(
        kernel,
        grid=(cz, nyb),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, ty, cx), lambda k, j: (k, j, 0)),
        out_shape=jax.ShapeDtypeStruct((cz, cy, cx), dtype),
        interpret=interpret,
    )
    # keep the cached weights as NUMPY arrays: converting once and caching
    # the jnp.Array would capture the first caller's trace (leaked-tracer
    # error on every later jit); jnp.asarray per call constant-folds into
    # each trace instead.
    wy_np = _y_base(ty, compute_dtype)
    wx_np = _x_bands(x, compute_dtype)

    def run(xf):
        return call(*([xf] * 12), jnp.asarray(wy_np), jnp.asarray(wx_np))

    return run


def pallas_restrict3d(xf: jnp.ndarray, interpret: bool | None = None):
    """Fused all-cell 3D restriction (fine -> coarse, all axes halved)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    run = _build_restrict(tuple(xf.shape), jnp.dtype(xf.dtype).name,
                          bool(interpret))
    return run(xf)


# ---------------------------------------------------------------------------
# prolongation (coarse -> fine), the adjoint-direction kernel
# ---------------------------------------------------------------------------
#
# The V-cycle's correction interpolation was the worst-SoL pass left in the
# cycle (transfer pair 16.9 ms at 512^3, 8.7% of SoL — the XLA interleave
# form, while this restriction kernel runs in ~1.3 ms).  Same stride-free
# recipe in the opposite direction: grid over COARSE planes, each program
# emitting the two fine planes (2k, 2k+1); z taps as clamped refs with
# border-switched scalar weights; y expansion as one banded (2 ty, ty + 2)
# MXU matmul with in-kernel border patches; x expansion as static 128x128
# band blocks of the 1-D prolongation matrix (2 per fine lane tile).
# Semantics match ops.transfer.prolong / itkInterGridOperators.h:108-113.


def pallas_prolong_supported(
    coarse_shape: Tuple[int, ...], centering, itemsize: int = 4,
    interpret: bool = False,
) -> bool:
    """All-cell coarse 3D fields with whole fine lane tiles (cx % 128 == 0)
    and granule-aligned coarse y tiles."""
    if len(coarse_shape) != 3 or (itemsize > 4 and not interpret):
        return False
    if any(c != CELL for c in centering):
        return False
    cz, cy, cx = coarse_shape
    if cz < 2 or cx % _LANE:
        return False
    g = _sublane_granule(itemsize)
    return _pick_cy_tile(cy, g) is not None


@functools.lru_cache(maxsize=64)
def _x_prolong_bands(fine_x: int, dtype_name: str) -> np.ndarray:
    """Stacked band blocks of the 1-D cell prolongation along x:
    ``bands[2 * tf + i]`` multiplies coarse lane-tile ``tf // 2 + i - (tf
    odd ? 0 : 1)`` ... laid out as: for fine tile ``tf``, the two coarse
    tiles it can draw from are ``(tf - 1) // 2`` and ``tf // 2 (+1)``;
    blocks are transposed for ``q_tile @ W``."""
    from .galerkin_direct import prolong_matrix_1d

    p = np.asarray(prolong_matrix_1d(fine_x, CELL))  # (f, c)
    tf_count = fine_x // _LANE
    tc_count = (fine_x // 2) // _LANE
    out = np.zeros((2 * tf_count, _LANE, _LANE), jnp.dtype(dtype_name))
    for tf in range(tf_count):
        # coarse tiles overlapping fine cols [128 tf, 128 (tf+1))
        base = (tf - 1) // 2 if tf else 0
        for i in range(2):
            tcx = base + i
            if 0 <= tcx < tc_count:
                out[2 * tf + i] = p[tf * _LANE:(tf + 1) * _LANE,
                                    tcx * _LANE:(tcx + 1) * _LANE].T
    return out


def _x_prolong_tiles(fine_x: int) -> Tuple[Tuple[int, int], ...]:
    """Static (coarse tile index or -1) pairs per fine tile (mirrors
    :func:`_x_prolong_bands`)."""
    tf_count = fine_x // _LANE
    tc_count = (fine_x // 2) // _LANE
    pairs = []
    for tf in range(tf_count):
        base = (tf - 1) // 2 if tf else 0
        pair = tuple(
            (base + i) if 0 <= base + i < tc_count else -1 for i in range(2)
        )
        pairs.append(pair)
    return tuple(pairs)


@functools.lru_cache(maxsize=64)
def _y_prolong_base(ty: int, dtype_name: str) -> np.ndarray:
    """Interior rows of the banded y prolongation matrix: fine row 2r reads
    stitched coarse rows (r, r+1) [halo offset 1: stitched row s = coarse
    row j*ty + s - 1] with weights (1/4, 3/4); fine row 2r+1 reads (r+1,
    r+2) with (3/4, 1/4)."""
    wy = np.zeros((2 * ty, ty + 2), jnp.dtype(dtype_name))
    for r in range(ty):
        wy[2 * r, r:r + 2] = (0.25, 0.75)
        wy[2 * r + 1, r + 1:r + 3] = (0.75, 0.25)
    return wy


def _prolong_kernel(ty: int, cy: int, cz: int, fx: int, hh: int, nyb: int,
                    x_pairs, precision, compute_dtype, *refs):
    """3 clamped coarse z refs -> two fine planes; y then x banded matmuls."""
    k = pl.program_id(0)
    j = pl.program_id(1)
    cd = jnp.dtype(compute_dtype)

    def up(a):
        return a.astype(cd) if a.dtype != cd else a

    mains = [refs[3 * i] for i in range(3)]
    tops = [refs[3 * i + 1] for i in range(3)]
    bots = [refs[3 * i + 2] for i in range(3)]
    wy_ref, wx_ref, out = refs[9], refs[10], refs[11]

    def stitched(i):
        top = tops[i][0, hh - 1:hh, :]
        bot = bots[i][0, 0:1, :]
        return jnp.concatenate([up(top), up(mains[i][0]), up(bot)], axis=0)

    c_prev, c_mid, c_next = stitched(0), stitched(1), stitched(2)
    # fine plane 2k = 3/4 c[k] + 1/4 c[k-1]   (first fine plane: c[0])
    # fine plane 2k+1 = 3/4 c[k] + 1/4 c[k+1] (last fine plane: c[cz-1])
    w_even = jnp.where(k == 0, 0.0, 0.25)
    w_even_c = jnp.where(k == 0, 1.0, 0.75)
    w_odd = jnp.where(k == cz - 1, 0.0, 0.25)
    w_odd_c = jnp.where(k == cz - 1, 1.0, 0.75)
    p_even = w_even_c * c_mid + w_even * c_prev  # (ty + 2, cx)
    p_odd = w_odd_c * c_mid + w_odd * c_next

    # y band matmul with global border patches: global fine row 0 = c[0]
    # (weight 1 on stitched row 1), global fine row 2 cy - 1 = c[cy - 1].
    n_in = ty + 2
    wy = up(wy_ref[...])
    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * ty, n_in), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (2 * ty, n_in), 1)
    first = jnp.logical_and(j == 0, rows == 0)
    w_first = jnp.where(cols == 1, 1.0, 0.0)
    last = jnp.logical_and(j == nyb - 1, rows == 2 * ty - 1)
    w_last = jnp.where(cols == n_in - 2, 1.0, 0.0)
    wy = jnp.where(first, w_first, jnp.where(last, w_last, wy))

    q_even = jax.lax.dot_general(
        wy, p_even, (((1,), (0,)), ((), ())), precision=precision
    )  # (2 ty, cx)
    q_odd = jax.lax.dot_general(
        wy, p_odd, (((1,), (0,)), ((), ())), precision=precision
    )

    def expand_x(q):
        pieces = []
        for tf, pair in enumerate(x_pairs):
            acc = None
            for i, tcx in enumerate(pair):
                if tcx < 0:
                    continue
                term = jax.lax.dot_general(
                    q[:, tcx * _LANE:(tcx + 1) * _LANE],
                    up(wx_ref[2 * tf + i]),
                    (((1,), (0,)), ((), ())), precision=precision,
                )
                acc = term if acc is None else acc + term
            pieces.append(acc)
        return jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]

    out[0] = expand_x(q_even).astype(out.dtype)
    out[1] = expand_x(q_odd).astype(out.dtype)


@functools.lru_cache(maxsize=64)
def _build_prolong(coarse_shape: Tuple[int, ...], dtype_name: str,
                   interpret: bool):
    cz, cy, cx = coarse_shape
    dtype = jnp.dtype(dtype_name)
    fx = 2 * cx
    g = _sublane_granule(dtype.itemsize)
    ty = _pick_cy_tile(cy, g)
    assert ty is not None
    nyb = cy // ty
    main = (1, ty, cx)
    hh = g
    halo = (1, hh, cx)
    nh = ty // hh

    def z_at(dz):
        return lambda k, j, dz=dz: jnp.clip(k + dz, 0, cz - 1)

    specs = []
    for dz in (-1, 0, 1):
        zf = z_at(dz)
        specs.append(pl.BlockSpec(main, lambda k, j, zf=zf: (zf(k, j), j, 0)))
        specs.append(pl.BlockSpec(
            halo, lambda k, j, zf=zf: (zf(k, j), jnp.maximum(j * nh - 1, 0), 0)
        ))
        specs.append(pl.BlockSpec(
            halo,
            lambda k, j, zf=zf: (zf(k, j),
                                 jnp.minimum((j + 1) * nh, cy // hh - 1), 0),
        ))

    precision = (
        jax.lax.Precision.HIGHEST if dtype.itemsize >= 4
        else jax.lax.Precision.DEFAULT
    )
    compute_dtype = "float64" if dtype == jnp.float64 else "float32"
    x_pairs = _x_prolong_tiles(fx)
    kernel = functools.partial(
        _prolong_kernel, ty, cy, cz, fx, hh, nyb, x_pairs, precision,
        compute_dtype,
    )
    specs.append(pl.BlockSpec((2 * ty, ty + 2), lambda k, j: (0, 0)))
    specs.append(pl.BlockSpec((2 * (fx // _LANE), _LANE, _LANE),
                              lambda k, j: (0, 0, 0)))
    call = pl.pallas_call(
        kernel,
        grid=(cz, nyb),
        in_specs=specs,
        out_specs=pl.BlockSpec((2, 2 * ty, fx), lambda k, j: (k, j, 0)),
        out_shape=jax.ShapeDtypeStruct((2 * cz, 2 * cy, fx), dtype),
        interpret=interpret,
    )
    # numpy in the cache, jnp per call (leaked-tracer landmine — see above)
    wy_np = _y_prolong_base(ty, compute_dtype)
    wx_np = _x_prolong_bands(fx, compute_dtype)

    def run(xc):
        return call(*([xc] * 9), jnp.asarray(wy_np), jnp.asarray(wx_np))

    return run


def pallas_prolong3d(xc: jnp.ndarray, interpret: bool | None = None):
    """Fused all-cell 3D prolongation (coarse -> fine, all axes doubled)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    run = _build_prolong(tuple(xc.shape), jnp.dtype(xc.dtype).name,
                         bool(interpret))
    return run(xc)
