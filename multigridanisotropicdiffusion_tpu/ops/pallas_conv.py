"""Pallas TPU kernels for 1-D (separable) convolutions along each axis.

The VED pipeline's Gaussian/derivative passes (``ops.hessian._conv_axis``)
are XLA chains of shifted slices — measured ~6-7x off HBM speed-of-light at
512^3, the same strided-op inefficiency as the transfers.  Mosaic cannot
lower strided or shifted gathers directly, so each axis uses a stride-free
formulation (cf. ``ops.pallas_transfer``):

* **z** (major axis): each grid step reads three consecutive z blocks
  (index-clamped) and accumulates ``w[dz] * rows[i + dz]`` with static
  slices; the taps are static Python scalars baked into the kernel.
  Border replication is provided by an edge-pad of the input (skipped in
  the z-slab pipeline's *valid* mode, where the halos already exist).
* **y** (sublane axis): the windowed row combination is one banded
  ``W (ty, ty + 2r) @ window`` matmul on the MXU; the window is stitched
  from the neighboring y blocks, and edge replication is folded into
  per-tile-position variants of ``W`` (interior / first / last / both)
  selected in-kernel — no physical padding, no crops.
* **x** (lane axis): per 128-lane tile, a sum of static ``128 x 128`` band
  blocks of the full edge-folded 1-D convolution matrix (radius <= 128).

Semantics match ``ops.hessian._conv_axis`` exactly (correlation, ``k[j]``
multiplies ``u[pos + j - r]`` relative taps, edge-replicated borders);
parity is tested in interpret mode against it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANE = 128


def _granule(itemsize: int) -> int:
    return 8 * max(1, 4 // itemsize)


def _compute_dtype(dtype) -> str:
    return "float64" if jnp.dtype(dtype) == jnp.float64 else "float32"


def conv_matrix_1d(n: int, kernel: Tuple[float, ...]) -> np.ndarray:
    """Dense ``(n, n)`` matrix of the edge-replicated 1-D correlation:
    ``out[i] = sum_j k[j] u[clip(i + j - r, 0, n - 1)]``."""
    r = (len(kernel) - 1) // 2
    m = np.zeros((n, n))
    for i in range(n):
        for j, w in enumerate(kernel):
            m[i, min(max(i + j - r, 0), n - 1)] += w
    return m


def _pick_tile(extent: int, minimum: int, granule: int, cap: int = 256):
    """Largest granule-multiple divisor of ``extent`` in [minimum, cap]."""
    best = None
    lo = max(minimum, granule)
    for t in range(granule, min(extent, cap) + 1, granule):
        if extent % t == 0 and t >= lo:
            best = t
    return best


# ---------------------------------------------------------------------------
# z axis
# ---------------------------------------------------------------------------


def _conv_z_kernel(tz: int, weights: Tuple[float, ...], *refs):
    b0, b1, b2, out = refs
    cat = jnp.concatenate([b0[...], b1[...], b2[...]], axis=0)
    cd = jnp.float64 if cat.dtype.itemsize == 8 else jnp.float32
    cat = cat.astype(cd)
    acc = None
    for j, w in enumerate(weights):
        if w == 0.0:
            continue
        term = w * cat[j:j + tz]
        acc = term if acc is None else acc + term
    out[...] = acc.astype(out.dtype)


@functools.lru_cache(maxsize=256)
def _build_conv_z(pshape: Tuple[int, ...], dtype_name: str, tz: int,
                  z_out: int, weights: Tuple[float, ...], interpret: bool):
    """Conv along axis 0 of a pre-padded (zp, y, x) input; out (z_out, y, x).
    Grid step k reads padded z blocks k, k+1, k+2 of height tz (the pad
    guarantees they exist) and emits out rows [k tz, (k+1) tz)."""
    zp, y, x = pshape
    dtype = jnp.dtype(dtype_name)
    # VMEM budget: three (tz, ty, x) input blocks (DOUBLE-buffered by the
    # Pallas pipeline), the stitched 3tz-row concat temp, dtype-cast copies,
    # the f32 accumulator, and the (double-buffered) out block — measured
    # ~16x tz*ty*x*4 total (a 7x model still OOM'd the 16 MB scoped vmem:
    # 17.75M at tz=22, ty=32, x=512)
    ty_cap = max(
        _granule(dtype.itemsize),
        (10 * 1024 * 1024) // (16 * tz * x * max(dtype.itemsize, 4)),
    )
    ty = _pick_tile(y, 1, _granule(dtype.itemsize), cap=ty_cap)
    nzb = zp // tz

    def blk(dk):
        return pl.BlockSpec(
            (tz, ty, x),
            lambda k, j, dk=dk: (jnp.minimum(k + dk, nzb - 1), j, 0),
        )

    kernel = functools.partial(_conv_z_kernel, tz, weights)
    call = pl.pallas_call(
        kernel,
        grid=(z_out // tz, y // ty),
        in_specs=[blk(0), blk(1), blk(2)],
        out_specs=pl.BlockSpec((tz, ty, x), lambda k, j: (k, j, 0)),
        out_shape=jax.ShapeDtypeStruct((z_out, y, x), dtype),
        interpret=interpret,
    )
    return call


def pallas_conv_z(u: jnp.ndarray, kernel, valid: bool = False,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Correlate along axis 0 with edge replication (``valid=True``: the
    input already carries the r-thick z halos; output shrinks by 2r)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    z, y, x = u.shape
    weights = tuple(float(w) for w in np.asarray(kernel, np.float64))
    r = (len(weights) - 1) // 2
    z_out = z - 2 * r if valid else z
    tz = _pick_tile(z_out, r, 1, cap=max(32, r))
    if tz is None:
        raise ValueError(f"no z tile for z_out={z_out}, r={r}")
    # (K + 2) blocks so grid step K-1's three block fetches never clamp into
    # the needed window
    zp = (z_out // tz + 2) * tz
    if valid:
        up = jnp.pad(u, ((0, zp - z), (0, 0), (0, 0))) if zp > z else u
    else:
        up = jnp.pad(u, ((r, 0), (0, 0), (0, 0)), mode="edge")
        up = jnp.pad(up, ((0, zp - (z + r)), (0, 0), (0, 0)), mode="edge")
    call = _build_conv_z(tuple(up.shape), jnp.dtype(u.dtype).name, tz,
                         z_out, weights, bool(interpret))
    return call(up, up, up)


# ---------------------------------------------------------------------------
# y axis
# ---------------------------------------------------------------------------


def _conv_y_kernel(ty: int, r: int, nyb: int, *refs):
    b0, b1, b2, w_ref, out = refs
    j = pl.program_id(1)
    cd = jnp.float64 if b1.dtype.itemsize == 8 else jnp.float32
    cat = jnp.concatenate(
        [b0[0, ty - r:, :], b1[0], b2[0, :r, :]], axis=0
    ).astype(cd)  # (ty + 2r, x)
    # W variant by tile position: 0 interior, 1 first, 2 last, 3 both
    idx = jnp.where(j == 0, 1, 0) + jnp.where(j == nyb - 1, 2, 0)
    w = w_ref[idx].astype(cd)  # (ty, ty + 2r)
    out[...] = jax.lax.dot_general(
        w, cat, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )[None].astype(out.dtype)


@functools.lru_cache(maxsize=256)
def _y_band_variants(ty: int, kernel: Tuple[float, ...],
                     dtype_name: str) -> np.ndarray:
    """(4, ty, ty + 2r) window matrices: interior / first-tile / last-tile /
    both, with edge replication folded into the border variants (window col
    c maps to global row tile_start + c - r)."""
    nw = len(kernel)
    r = (nw - 1) // 2
    w_int = np.zeros((ty, ty + 2 * r))
    for i in range(ty):
        w_int[i, i:i + nw] += np.asarray(kernel)

    def fold_first(w):
        w = w.copy()
        w[:, r] += w[:, :r].sum(axis=1)
        w[:, :r] = 0.0
        return w

    def fold_last(w):
        w = w.copy()
        w[:, ty + r - 1] += w[:, ty + r:].sum(axis=1)
        w[:, ty + r:] = 0.0
        return w

    out = np.stack([
        w_int, fold_first(w_int), fold_last(w_int),
        fold_last(fold_first(w_int)),
    ]).astype(jnp.dtype(dtype_name))
    return out


@functools.lru_cache(maxsize=256)
def _build_conv_y(shape: Tuple[int, ...], dtype_name: str, ty: int, r: int,
                  interpret: bool):
    z, y, x = shape
    dtype = jnp.dtype(dtype_name)
    nyb = y // ty

    def blk(dj):
        return pl.BlockSpec(
            (1, ty, x),
            lambda k, j, dj=dj: (k, jnp.clip(j + dj, 0, nyb - 1), 0),
        )

    specs = [blk(-1), blk(0), blk(1),
             pl.BlockSpec((4, ty, ty + 2 * r), lambda k, j: (0, 0, 0))]
    kernel = functools.partial(_conv_y_kernel, ty, r, nyb)
    call = pl.pallas_call(
        kernel,
        grid=(z, nyb),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, ty, x), lambda k, j: (k, j, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=interpret,
    )
    return call


def pallas_conv_y(u: jnp.ndarray, kernel,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Correlate along axis 1 with edge replication."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    z, y, x = u.shape
    weights = tuple(float(w) for w in np.asarray(kernel, np.float64))
    r = (len(weights) - 1) // 2
    g = _granule(u.dtype.itemsize)
    ty = _pick_tile(y, r, g)
    if ty is None:
        raise ValueError(f"no y tile for y={y}, r={r}")
    w = jnp.asarray(_y_band_variants(ty, weights, _compute_dtype(u.dtype)))
    call = _build_conv_y(tuple(u.shape), jnp.dtype(u.dtype).name, ty, r,
                         bool(interpret))
    return call(u, u, u, w)


# ---------------------------------------------------------------------------
# x axis
# ---------------------------------------------------------------------------


def _conv_x_kernel(tcx: int, nbands: int, *refs):
    b, w_ref, out = refs
    v = b[0]
    cd = jnp.float64 if v.dtype.itemsize == 8 else jnp.float32
    v = v.astype(cd)
    pieces = []
    for t in range(tcx):
        acc = None
        for i in range(nbands):
            kf = t + i - (nbands // 2)
            if not 0 <= kf < tcx:
                continue
            term = jax.lax.dot_general(
                v[:, kf * _LANE:(kf + 1) * _LANE],
                w_ref[nbands * t + i].astype(cd),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            acc = term if acc is None else acc + term
        pieces.append(acc)
    res = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
    out[...] = res[None].astype(out.dtype)


@functools.lru_cache(maxsize=256)
def _x_conv_bands(x: int, kernel: Tuple[float, ...],
                  dtype_name: str) -> np.ndarray:
    """Stacked (nbands * tcx, 128, 128) band blocks of the edge-folded conv
    matrix along x, transposed for ``tile @ W``."""
    m = conv_matrix_1d(x, kernel)
    tcx = x // _LANE
    r = (len(kernel) - 1) // 2
    nb = 2 * ((r + _LANE - 1) // _LANE) + 1
    out = np.zeros((nb * tcx, _LANE, _LANE), jnp.dtype(dtype_name))
    for t in range(tcx):
        for i in range(nb):
            kf = t + i - nb // 2
            if 0 <= kf < tcx:
                out[nb * t + i] = m[t * _LANE:(t + 1) * _LANE,
                                    kf * _LANE:(kf + 1) * _LANE].T
    return out


@functools.lru_cache(maxsize=256)
def _build_conv_x(shape: Tuple[int, ...], dtype_name: str, nbands: int,
                  interpret: bool):
    z, y, x = shape
    dtype = jnp.dtype(dtype_name)
    ty = _pick_tile(y, 1, _granule(dtype.itemsize))
    tcx = x // _LANE
    specs = [
        pl.BlockSpec((1, ty, x), lambda k, j: (k, j, 0)),
        pl.BlockSpec((nbands * tcx, _LANE, _LANE), lambda k, j: (0, 0, 0)),
    ]
    kernel = functools.partial(_conv_x_kernel, tcx, nbands)
    call = pl.pallas_call(
        kernel,
        grid=(z, y // ty),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, ty, x), lambda k, j: (k, j, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=interpret,
    )
    return call


def pallas_conv_x(u: jnp.ndarray, kernel,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Correlate along axis 2 (lanes) with edge replication."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    z, y, x = u.shape
    weights = tuple(float(w) for w in np.asarray(kernel, np.float64))
    r = (len(weights) - 1) // 2
    nb = 2 * ((r + _LANE - 1) // _LANE) + 1
    wx = jnp.asarray(_x_conv_bands(x, weights, _compute_dtype(u.dtype)))
    call = _build_conv_x(tuple(u.shape), jnp.dtype(u.dtype).name, nb,
                         bool(interpret))
    return call(u, wx)


# ---------------------------------------------------------------------------
# fused y+x pass (both in-plane: one volume round-trip instead of two)
# ---------------------------------------------------------------------------


def _conv_yx_kernel(ty: int, r: int, nyb: int, tcx: int, nbands: int, *refs):
    b0, b1, b2, wy_ref, wx_ref, out = refs
    j = pl.program_id(1)
    cd = jnp.float64 if b1.dtype.itemsize == 8 else jnp.float32
    cat = jnp.concatenate(
        [b0[0, ty - r:, :], b1[0], b2[0, :r, :]], axis=0
    ).astype(cd)  # (ty + 2r, x)
    idx = jnp.where(j == 0, 1, 0) + jnp.where(j == nyb - 1, 2, 0)
    wy = wy_ref[idx].astype(cd)
    q = jax.lax.dot_general(
        wy, cat, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # (ty, x)
    pieces = []
    for t in range(tcx):
        acc = None
        for i in range(nbands):
            kf = t + i - (nbands // 2)
            if not 0 <= kf < tcx:
                continue
            term = jax.lax.dot_general(
                q[:, kf * _LANE:(kf + 1) * _LANE],
                wx_ref[nbands * t + i].astype(cd),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            acc = term if acc is None else acc + term
        pieces.append(acc)
    res = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
    out[...] = res[None].astype(out.dtype)


@functools.lru_cache(maxsize=256)
def _build_conv_yx(shape: Tuple[int, ...], dtype_name: str, ty: int, ry: int,
                   nbands: int, interpret: bool):
    z, y, x = shape
    dtype = jnp.dtype(dtype_name)
    nyb = y // ty
    tcx = x // _LANE

    def blk(dj):
        return pl.BlockSpec(
            (1, ty, x),
            lambda k, j, dj=dj: (k, jnp.clip(j + dj, 0, nyb - 1), 0),
        )

    specs = [blk(-1), blk(0), blk(1),
             pl.BlockSpec((4, ty, ty + 2 * ry), lambda k, j: (0, 0, 0)),
             pl.BlockSpec((nbands * tcx, _LANE, _LANE),
                          lambda k, j: (0, 0, 0))]
    kernel = functools.partial(_conv_yx_kernel, ty, ry, nyb, tcx, nbands)
    return pl.pallas_call(
        kernel,
        grid=(z, nyb),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, ty, x), lambda k, j: (k, j, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=interpret,
    )


def pallas_conv_yx_supported(shape: Tuple[int, ...], nwy: int, nwx: int,
                             itemsize: int, interpret: bool = False) -> bool:
    return (
        pallas_conv_supported(shape, 1, nwy, itemsize, interpret=interpret)
        and pallas_conv_supported(shape, 2, nwx, itemsize,
                                  interpret=interpret)
    )


def pallas_conv_yx(u: jnp.ndarray, kernel_y, kernel_x,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Fused edge-replicated correlation along axis 1 then axis 2 (one pass:
    the separate y and x kernels each stream the volume once)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    z, y, x = u.shape
    wy = tuple(float(w) for w in np.asarray(kernel_y, np.float64))
    wxk = tuple(float(w) for w in np.asarray(kernel_x, np.float64))
    ry = (len(wy) - 1) // 2
    rx = (len(wxk) - 1) // 2
    g = _granule(u.dtype.itemsize)
    ty = _pick_tile(y, ry, g)
    nb = 2 * ((rx + _LANE - 1) // _LANE) + 1
    wy_arr = jnp.asarray(_y_band_variants(ty, wy, _compute_dtype(u.dtype)))
    wx_arr = jnp.asarray(_x_conv_bands(x, wxk, _compute_dtype(u.dtype)))
    call = _build_conv_yx(tuple(u.shape), jnp.dtype(u.dtype).name, ty, ry,
                          nb, bool(interpret))
    return call(u, u, u, wy_arr, wx_arr)


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------


def pallas_conv_supported(shape: Tuple[int, ...], axis: int, nw: int,
                          itemsize: int, valid: bool = False,
                          interpret: bool = False) -> bool:
    """Eligibility for routing an ``ops.hessian._conv_axis`` call here.
    ``interpret`` lifts the no-f64 restriction (Mosaic-only)."""
    if len(shape) != 3 or (itemsize > 4 and not interpret):
        return False
    z, y, x = shape
    r = (nw - 1) // 2
    if r < 1:
        return False
    g = _granule(itemsize)
    if x % _LANE or y % g:
        return False
    if axis == 0:
        z_out = z - 2 * r if valid else z
        if z_out <= 0:
            return False
        return _pick_tile(z_out, r, 1, cap=max(32, r)) is not None
    if valid:
        return False  # valid mode is z-only (the slab pipeline)
    if axis == 1:
        return _pick_tile(y, r, g) is not None
    if axis == 2:
        return r <= _LANE
    return False


def pallas_conv_axis(u: jnp.ndarray, kernel, axis: int,
                     valid: bool = False,
                     interpret: bool | None = None) -> jnp.ndarray:
    if axis == 0:
        return pallas_conv_z(u, kernel, valid=valid, interpret=interpret)
    if axis == 1:
        return pallas_conv_y(u, kernel, interpret=interpret)
    if axis == 2:
        return pallas_conv_x(u, kernel, interpret=interpret)
    raise ValueError(f"bad axis {axis}")


# ---------------------------------------------------------------------------
# fused central-difference Hessian (the smooth_fd FD pass)
# ---------------------------------------------------------------------------


def _fd_plane_blocks(ty: int, x: int, nyb: int, facs, in_refs, j):
    """Six (ty, x) central-difference Hessian plane blocks (compute dtype)
    from 9 y-halo-stitched valid-z input refs at y-grid position ``j``.

    ``in_refs``: for dz in (0, 1, 2): (main, top, bot) blocks of the z rows
    ``k + dz`` of the valid-z input (1-thick z halo present).  ``facs`` are
    the static ``norm / h^2`` factors (canonical symmetric order).  Edge
    replication on y/x is patched in-kernel (global borders), matching the
    XLA pad(mode='edge') form.  Shared by the plain FD-Hessian kernel and
    the fused FD+vesselness+select kernel (ops.pallas_vesselness).
    """
    f00, f01, f02, f11, f12, f22 = facs

    def stitched(i):
        main, top, bot = in_refs[3 * i], in_refs[3 * i + 1], in_refs[3 * i + 2]
        cd = jnp.float64 if main.dtype.itemsize == 8 else jnp.float32
        m = main[0].astype(cd)  # (ty, x)
        hh = top.shape[1]
        t = top[0, hh - 1:hh, :].astype(cd)
        b = bot[0, 0:1, :].astype(cd)
        # global y borders: edge-replicate instead of the clamped garbage row
        t = jnp.where(j == 0, m[0:1], t)
        b = jnp.where(j == nyb - 1, m[ty - 1:ty], b)
        return jnp.concatenate([t, m, b], axis=0)  # (ty + 2, x)

    planes = (stitched(0), stitched(1), stitched(2))
    col = jax.lax.broadcasted_iota(jnp.int32, (ty, x), 1)

    def sh(dz, dy, dx):
        rows = planes[1 + dz][1 + dy:1 + dy + ty, :]
        if dx == 0:
            return rows
        shifted = jnp.roll(rows, -dx, axis=1)
        if dx > 0:  # last column replicates the edge, not the wraparound
            return jnp.where(col == x - 1, rows[:, x - 1:x], shifted)
        return jnp.where(col == 0, rows[:, 0:1], shifted)

    c = sh(0, 0, 0)
    return (
        (sh(1, 0, 0) - 2.0 * c + sh(-1, 0, 0)) * f00,
        (sh(1, 1, 0) - sh(1, -1, 0) - sh(-1, 1, 0) + sh(-1, -1, 0)) * f01,
        (sh(1, 0, 1) - sh(1, 0, -1) - sh(-1, 0, 1) + sh(-1, 0, -1)) * f02,
        (sh(0, 1, 0) - 2.0 * c + sh(0, -1, 0)) * f11,
        (sh(0, 1, 1) - sh(0, 1, -1) - sh(0, -1, 1) + sh(0, -1, -1)) * f12,
        (sh(0, 0, 1) - 2.0 * c + sh(0, 0, -1)) * f22,
    )


def _fd_kernel(ty: int, x: int, nyb: int, facs, *refs):
    """Six second-derivative planes from the smoothed field in one pass
    (see :func:`_fd_plane_blocks`)."""
    j = pl.program_id(1)
    outs = refs[9:]
    planes = _fd_plane_blocks(ty, x, nyb, facs, refs[:9], j)
    for o, p in zip(outs, planes):
        o[...] = p[None].astype(o.dtype)


def _fd_in_specs(y: int, x: int, ty: int, hh: int):
    """The 9 stitched valid-z input BlockSpecs of the FD-pass family: for each
    dz in (0, 1, 2) a (main, top-halo, bottom-halo) triple (halos fetched as
    ``hh``-row granule blocks, index-clamped at the global y borders)."""

    def main_at(dz):
        return pl.BlockSpec((1, ty, x), lambda k, j, dz=dz: (k + dz, j, 0))

    def top_at(dz):
        return pl.BlockSpec(
            (1, hh, x),
            lambda k, j, dz=dz: (k + dz,
                                 jnp.maximum(j * (ty // hh) - 1, 0), 0),
        )

    def bot_at(dz):
        return pl.BlockSpec(
            (1, hh, x),
            lambda k, j, dz=dz: (k + dz,
                                 jnp.minimum((j + 1) * (ty // hh),
                                             y // hh - 1), 0),
        )

    specs = []
    for dz in (0, 1, 2):
        specs += [main_at(dz), top_at(dz), bot_at(dz)]
    return specs


@functools.lru_cache(maxsize=256)
def _build_fd(shape: Tuple[int, ...], dtype_name: str,
              facs: Tuple[float, ...], interpret: bool):
    """``shape`` is the valid-z input (zo + 2, y, x); outputs are (zo, y, x)."""
    zp, y, x = shape
    zo = zp - 2
    dtype = jnp.dtype(dtype_name)
    g = _granule(dtype.itemsize)
    ty = _pick_tile(y, 1, g, cap=max(g, (6 * 1024 * 1024) // (30 * x * 4)))
    nyb = y // ty
    specs = _fd_in_specs(y, x, ty, g)
    out_spec = pl.BlockSpec((1, ty, x), lambda k, j: (k, j, 0))
    kernel = functools.partial(_fd_kernel, ty, x, nyb, facs)
    call = pl.pallas_call(
        kernel,
        grid=(zo, nyb),
        in_specs=specs,
        out_specs=[out_spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((zo, y, x), dtype)] * 6,
        interpret=interpret,
    )

    def run(us):
        return tuple(call(*([us] * 9)))

    return run


def pallas_fd_supported(shape: Tuple[int, ...], itemsize: int,
                        interpret: bool = False) -> bool:
    """Valid-z FD pass eligibility: (zo + 2, y, x) with whole lane tiles and
    granule-aligned y.  ``interpret`` lifts the no-f64 restriction."""
    if len(shape) != 3 or (itemsize > 4 and not interpret):
        return False
    zp, y, x = shape
    g = _granule(itemsize)
    if x % _LANE and not interpret:  # lane tiling is Mosaic-only
        return False
    return zp >= 3 and y % g == 0 and _pick_tile(y, 1, g) is not None


def pallas_fd_hessian(us: jnp.ndarray, facs: Tuple[float, ...],
                      interpret: bool | None = None):
    """Fused 6-plane central-difference Hessian of a valid-z smoothed field
    (1-thick z halo present; y/x edge-replicated in-kernel).  ``facs`` =
    (f00, f01, f02, f11, f12, f22) static normalization factors."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    run = _build_fd(tuple(us.shape), jnp.dtype(us.dtype).name,
                    tuple(float(f) for f in facs), bool(interpret))
    return run(us)
