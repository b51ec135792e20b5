"""Pallas TPU kernels for the hot V-cycle passes on the compressed DCA
operator (3D): red-black Gauss-Seidel half-sweeps and the residual.

The XLA path materializes a padded copy of ``x`` and a color-select per
half-sweep; these kernels fuse everything — neighbor access, the 18-term
coefficient contraction, and the parity select / residual combine — into one
VMEM-tiled pass.  Grid = (z-plane, y-tile): each program owns a ``(1, TY, X)``
block of the output.

Neighbor access:

* z neighbors: the three z-positions of ``x`` (z-1, z, z+1) arrive as separate
  inputs whose BlockSpec index maps *clamp* at the domain borders.
* x neighbors: pure lane rotations (``pltpu.roll`` — zero-padded shifts lower
  to unsupported offset-mismatched lane concats in Mosaic).
* y neighbors, full-plane tiles (TY == Y): sublane rotations, no extra inputs.
* y neighbors, tiled (TY < Y): two y-halo blocks per z-position covering
  global rows ``j*TY - 1`` and ``(j+1)*TY``.  Mosaic requires the
  second-to-last block dim to be a multiple of 8 (or the full axis), so halos
  are fetched as 8-row blocks — the top halo is the *last* row of the
  preceding 8-row block, the bottom halo the *first* row of the following one
  — and stitched around the main block in-kernel.

Clamped/wrapped reads are safe without masking because the compressed
operator is boundary-folded: every coefficient that would multiply an
out-of-domain value is exactly zero (``face_m[d]`` vanishes on the first
shell of dimension d, mixed planes vanish on all border shells), so whatever
a clamped or rotated read returns is multiplied by 0.

The y-tile height adapts to the ~16 MB/core VMEM budget (TY must divide Y);
grids whose planes cannot be tiled fall back to the XLA sweep.
Correctness-tested in interpreter mode on CPU and against the XLA path on
TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compressed import CompressedDCAOperator

#: VMEM budget for the ~15 double-buffered main blocks of the kernel.
_MAIN_BLOCK_BUDGET_BYTES = 12 * 1024 * 1024 // (15 * 2)


def _sublane_granule(itemsize: int) -> int:
    """Mosaic's minimum second-to-last block dim: 8 sublanes of 4 bytes —
    16 rows for 2-byte types (bf16), 8 for 4-byte."""
    return 16 if itemsize == 2 else 8


def pick_y_tile(y: int, x: int, itemsize: int = 4) -> int | None:
    """Largest valid y-tile TY whose (TY, X) block fits the VMEM budget.

    Mosaic constraint: a (1, TY, X) block needs TY % granule == 0 or TY == Y
    (the last dim always uses the full X; granule = 8 rows for 4-byte types,
    16 for bf16).  Tiled halos additionally need Y % granule == 0
    (granule-row halo blocks)."""
    g = _sublane_granule(itemsize)
    best = None
    for ty in range(1, y + 1):
        if y % ty != 0 or ty * x * itemsize > _MAIN_BLOCK_BUDGET_BYTES:
            continue
        if ty == y or (ty % g == 0 and y % g == 0):
            best = ty
    return best


def _roll(a: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """``out[..., i, ...] = a[..., i + shift, ...]`` as a pure rotation."""
    if shift == 0:
        return a
    return pltpu.roll(a, (-shift) % a.shape[axis], axis=axis)


def _offdiag_contraction(coeffs, sh):
    """The 18-term off-diagonal contraction of the compressed DCA operator.

    ``coeffs`` = (fpz, fmz, fpy, fmy, fpx, fmx, mzy, mzx, myx) blocks;
    ``sh(zpos, dy, dx)`` returns the x-block at z-offset ``zpos`` shifted by
    (dy, dx) within the plane."""
    fpz, fmz, fpy, fmy, fpx, fmx, mzy, mzx, myx = coeffs
    off = fpz * sh(1, 0, 0) + fmz * sh(-1, 0, 0)
    off += fpy * sh(0, 1, 0) + fmy * sh(0, -1, 0)
    off += fpx * sh(0, 0, 1) + fmx * sh(0, 0, -1)
    off += mzy * (sh(1, 1, 0) - sh(1, -1, 0) - sh(-1, 1, 0) + sh(-1, -1, 0))
    off += mzx * (sh(1, 0, 1) - sh(1, 0, -1) - sh(-1, 0, 1) + sh(-1, 0, -1))
    off += myx * (sh(0, 1, 1) - sh(0, 1, -1) - sh(0, -1, 1) + sh(0, -1, -1))
    return off


def _mask_local_shells(coeffs, diag_shape, nz: int, y: int, ty: int, k, j):
    """Zero each off-diagonal coefficient on the *local-block* boundary shells
    it reaches across: ``face_m[d]`` on the first shell of d, ``face_p[d]`` on
    the last, mixed planes on both shells of both of their dimensions.

    On a single device this is a no-op (Neumann folding already zeroed exactly
    these entries, ops/compressed.py), but on a shard-local block it removes
    every term that reads across a device boundary — the distributed path
    (parallel.halo) restores those terms by recomputing the 1-voxel boundary
    slabs from exchanged halos.  Pure VPU selects on VMEM-resident blocks.
    """
    fpz, fmz, fpy, fmy, fpx, fmx, mzy, mzx, myx = coeffs
    x_dim = diag_shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, diag_shape, 1) + j * ty
    col = jax.lax.broadcasted_iota(jnp.int32, diag_shape, 2)
    z_lo, z_hi = k > 0, k < nz - 1
    y_lo, y_hi = row > 0, row < y - 1
    x_lo, x_hi = col > 0, col < x_dim - 1

    def m(c, cond):
        return jnp.where(cond, c, jnp.zeros_like(c))

    return (
        m(fpz, z_hi), m(fmz, z_lo),
        m(fpy, y_hi), m(fmy, y_lo),
        m(fpx, x_hi), m(fmx, x_lo),
        m(mzy, jnp.logical_and(jnp.logical_and(z_lo, z_hi),
                               jnp.logical_and(y_lo, y_hi))),
        m(mzx, jnp.logical_and(jnp.logical_and(z_lo, z_hi),
                               jnp.logical_and(x_lo, x_hi))),
        m(myx, jnp.logical_and(jnp.logical_and(y_lo, y_hi),
                               jnp.logical_and(x_lo, x_hi))),
    )


def _stencil_kernel(
    emit,
    ty: int,
    hh: int,
    aligned: bool,
    full_plane: bool,
    y: int,
    nz: int,
    local_mask: bool,
    *refs,
):
    """Shared kernel body: assemble shifted x-views, contract, emit output.

    ``emit(off, xc_blk, coeff_refs, b_ref, out_ref, k, j)`` writes the block.
    """
    k = pl.program_id(0)
    j = pl.program_id(1)

    # Low-precision (bf16) blocks are upcast at load and downcast at store:
    # the contraction and division always run in f32 on the VPU.
    def up(a):
        return a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a

    coeff_refs = refs[:10]
    if full_plane:
        xzm, xc, xzp, b, out = refs[10:]
        planes = {-1: up(xzm[...]), 0: up(xc[...]), 1: up(xzp[...])}

        def sh(zpos, dy, dx):
            return _roll(_roll(planes[zpos], dy, 1), dx, 2)

        xc_blk = planes[0]
    else:
        (xzm, xzm_t, xzm_b, xc, xc_t, xc_b, xzp, xzp_t, xzp_b, b, out) = refs[10:]

        if aligned:
            # granule-row halo blocks: the top block's LAST row is global row
            # j*ty - 1, the bottom block's FIRST row is (j+1)*ty.  At domain
            # borders the blocks are index-clamped and carry garbage, which
            # every use multiplies by an exactly-zero folded coefficient.
            top_row = lambda t: t[:, hh - 1 : hh, :]
            bot_row = lambda t: t[:, 0:1, :]
        else:
            # full-axis halo blocks (y not granule-aligned, interpret/fallback
            # path): pick the exact global rows dynamically
            top_row = lambda t: jax.lax.dynamic_slice_in_dim(
                t[...], jnp.maximum(j * ty - 1, 0), 1, axis=1
            )
            bot_row = lambda t: jax.lax.dynamic_slice_in_dim(
                t[...], jnp.minimum((j + 1) * ty, y - 1), 1, axis=1
            )

        def padded(main, top, bot):
            # (1, TY + 2, X): y-halo rows stitched around the main block
            return up(
                jnp.concatenate([top_row(top), main[...], bot_row(bot)], axis=1)
            )

        planes = {
            -1: padded(xzm, xzm_t, xzm_b),
            0: padded(xc, xc_t, xc_b),
            1: padded(xzp, xzp_t, xzp_b),
        }

        def sh(zpos, dy, dx):
            return _roll(planes[zpos][:, 1 + dy : 1 + dy + ty, :], dx, 2)

        xc_blk = planes[0][:, 1 : 1 + ty, :]

    coeffs = tuple(up(r[...]) for r in coeff_refs[:9])
    diag = up(coeff_refs[9][...])
    if local_mask:
        coeffs = _mask_local_shells(coeffs, diag.shape, nz, y, ty, k, j)
    b_val = up(b[...])
    off = _offdiag_contraction(coeffs, sh)
    emit(off, xc_blk, diag, b_val, out, k, j)


def _emit_halfsweep(color: int, ty: int, off, xc_blk, diag, b_val, out, k, j):
    upd = (b_val - off) / diag
    shp = xc_blk.shape
    row = jax.lax.broadcasted_iota(jnp.int32, shp, 1) + j * ty
    col = jax.lax.broadcasted_iota(jnp.int32, shp, 2)
    parity = (row + col + k) % 2
    out[...] = jnp.where(parity == color, upd, xc_blk).astype(out.dtype)


def _emit_residual(off, xc_blk, diag, b_val, out, k, j):
    out[...] = (b_val - diag * xc_blk - off).astype(out.dtype)


@functools.lru_cache(maxsize=64)
def _build_stencil_pass(shape: Tuple[int, ...], dtype_name: str, kind: str,
                        color: int, ty: int, interpret: bool,
                        local_mask: bool = False):
    """Compile one grid pass over the compressed operator.

    ``kind``: 'halfsweep' (uses ``color``) or 'residual'.  ``local_mask``
    zeroes coefficients reaching across the block border in-kernel (the
    shard-local form used by the distributed path, see
    :func:`_mask_local_shells`)."""
    z, y, x = shape
    dtype = jnp.dtype(dtype_name)
    ny = y // ty
    main = (1, ty, x)
    full_plane = ty == y
    # Halo block height: granule-row blocks when the grid is aligned (Mosaic's
    # minimum non-full second-to-last dim: 8 rows f32, 16 rows bf16), else the
    # full axis.
    g = _sublane_granule(dtype.itemsize)
    aligned = ty % g == 0 and y % g == 0
    hh = g if aligned else y
    halo = (1, hh, x)
    nh = ty // hh if aligned else 0  # halo blocks per tile (8-aligned case)

    def zc(k):
        return k

    def zm(k):
        return jnp.maximum(k - 1, 0)

    def zp(k):
        return jnp.minimum(k + 1, z - 1)

    def main_at(zf):
        return pl.BlockSpec(main, lambda k, j, zf=zf: (zf(k), j, 0))

    def top_at(zf):
        # the hh-row block whose LAST row is global row j*ty - 1 (block
        # index j*ty/hh - 1), clamped into range at the j == 0 border
        return pl.BlockSpec(
            halo, lambda k, j, zf=zf: (zf(k), jnp.maximum(j * nh - 1, 0), 0)
        )

    def bot_at(zf):
        # the hh-row block whose FIRST row is global row (j+1)*ty, clamped
        return pl.BlockSpec(
            halo,
            lambda k, j, zf=zf: (zf(k), jnp.minimum((j + 1) * nh, y // hh - 1), 0),
        )

    coeff_spec = pl.BlockSpec(main, lambda k, j: (k, j, 0))
    if full_plane:
        x_specs = [main_at(zm), main_at(zc), main_at(zp)]
        n_x = 3
    else:
        x_specs = [
            main_at(zm), top_at(zm), bot_at(zm),
            main_at(zc), top_at(zc), bot_at(zc),
            main_at(zp), top_at(zp), bot_at(zp),
        ]
        n_x = 9
    specs = [coeff_spec] * 10 + x_specs + [coeff_spec]  # + b

    if kind == "halfsweep":
        emit = functools.partial(_emit_halfsweep, color, ty)
    elif kind == "residual":
        emit = _emit_residual
    else:
        raise ValueError(f"unknown kind: {kind!r}")

    kernel = functools.partial(
        _stencil_kernel, emit, ty, hh, aligned, full_plane, y, z, local_mask
    )
    call = pl.pallas_call(
        kernel,
        grid=(z, ny),
        in_specs=specs,
        out_specs=coeff_spec,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=interpret,
    )

    def run(comp: CompressedDCAOperator, xf, b):
        planes = (
            comp.face_p[0], comp.face_m[0],
            comp.face_p[1], comp.face_m[1],
            comp.face_p[2], comp.face_m[2],
            comp.mixed[0], comp.mixed[1], comp.mixed[2],
            comp.diag_plane,
        )
        return call(*planes, *([xf] * n_x), b)

    return run


def _resolve_ty(shape, itemsize, ty):
    if ty is None:
        ty = pick_y_tile(shape[1], shape[2], itemsize)
    return ty


def pallas_supports(shape: Tuple[int, ...], itemsize: int = 4) -> bool:
    """Whether a 3D grid shape has a y-tiling that fits the VMEM budget."""
    return len(shape) == 3 and pick_y_tile(shape[1], shape[2], itemsize) is not None


def pallas_rbgs_halfsweep(
    comp: CompressedDCAOperator,
    x: jnp.ndarray,
    b: jnp.ndarray,
    color: int,
    interpret: bool = False,
    ty: int | None = None,
    local_mask: bool = False,
) -> jnp.ndarray:
    """One GS half-sweep updating cells of parity ``color`` (static 0/1).

    Building block of the distributed smoother (parallel.halo): with
    ``local_mask`` the contraction drops every cross-block term, which the
    caller restores via halo-exchanged boundary slabs.  Raises if the shape
    has no valid y-tiling (check :func:`pallas_supports` first)."""
    shape = tuple(x.shape)
    ty = _resolve_ty(shape, x.dtype.itemsize, ty)
    if ty is None:
        raise ValueError(f"no y-tiling fits VMEM for shape {shape}")
    half = _build_stencil_pass(shape, str(x.dtype), "halfsweep", color, ty,
                               interpret, local_mask)
    return half(comp, x, b)


def pallas_rbgs_sweep(
    comp: CompressedDCAOperator,
    x: jnp.ndarray,
    b: jnp.ndarray,
    interpret: bool = False,
    ty: int | None = None,
) -> jnp.ndarray:
    """One red-black GS sweep (red then black half-sweep) via Pallas.

    3D only; operator must be a :class:`CompressedDCAOperator`.  Falls back to
    the XLA sweep when no y-tiling fits the VMEM budget.  ``ty`` overrides the
    automatic y-tile height (must divide Y).
    """
    if comp.ndim != 3:
        raise ValueError("pallas_rbgs_sweep supports 3D grids only")
    shape = tuple(x.shape)
    ty = _resolve_ty(shape, x.dtype.itemsize, ty)
    if ty is None:
        from .smoothers import rb_gauss_seidel_sweep

        return rb_gauss_seidel_sweep(comp, x, b)
    dtype_name = str(x.dtype)
    for color in (0, 1):
        half = _build_stencil_pass(shape, dtype_name, "halfsweep", color, ty,
                                   interpret)
        x = half(comp, x, b)
    return x


def pallas_residual(
    comp: CompressedDCAOperator,
    x: jnp.ndarray,
    b: jnp.ndarray,
    interpret: bool = False,
    ty: int | None = None,
    local_mask: bool = False,
) -> jnp.ndarray:
    """Fused residual ``r = b - A x`` on the compressed operator via Pallas.

    Falls back to the XLA apply when no y-tiling fits the VMEM budget (the
    ``local_mask`` shard-local form has no fallback — check
    :func:`pallas_supports`)."""
    if comp.ndim != 3:
        raise ValueError("pallas_residual supports 3D grids only")
    shape = tuple(x.shape)
    ty = _resolve_ty(shape, x.dtype.itemsize, ty)
    if ty is None:
        if local_mask:
            raise ValueError(f"no y-tiling fits VMEM for shape {shape}")
        return b - comp.apply(x)
    run = _build_stencil_pass(shape, str(x.dtype), "residual", 0, ty,
                              interpret, local_mask)
    return run(comp, x, b)
