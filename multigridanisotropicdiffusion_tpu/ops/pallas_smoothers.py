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

from ..core.stencil import StencilOperator
from .compressed import CompressedDCAOperator

#: total double-buffered VMEM budget for the kernel's blocks.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024

#: block count of the compressed-operator kernel (10 coeffs + 3 x + b + out).
_N_BLOCKS_COMPRESSED = 15


def _sublane_granule(itemsize: int) -> int:
    """Mosaic's minimum second-to-last block dim: 8 sublanes of 4 bytes —
    16 rows for 2-byte types (bf16), 8 for 4-byte."""
    return 16 if itemsize == 2 else 8


def pick_y_tile(
    y: int, x: int, itemsize: int = 4, n_blocks: int = _N_BLOCKS_COMPRESSED
) -> int | None:
    """Largest valid y-tile TY whose (TY, X) block fits the VMEM budget
    (``n_blocks`` double-buffered blocks share ~12 MB).

    Mosaic constraint: a (1, TY, X) block needs TY % granule == 0 or TY == Y
    (the last dim always uses the full X; granule = 8 rows for 4-byte types,
    16 for bf16).  Tiled halos additionally need Y % granule == 0
    (granule-row halo blocks)."""
    g = _sublane_granule(itemsize)
    budget = _VMEM_BUDGET_BYTES // (n_blocks * 2)
    best = None
    for ty in range(1, y + 1):
        if y % ty != 0 or ty * x * itemsize > budget:
            continue
        if ty == y or (ty % g == 0 and y % g == 0):
            best = ty
    return best


def _n_blocks_stored(n_offsets: int, rz: int = 1) -> int:
    """Block count of the stored-operator kernel: K coefficient planes
    (incl. diag) + (2 rz + 1) x z-positions + b + out (full-plane case; the
    tiled case adds 2 halo blocks per z-position — small, covered by the
    12 MB headroom)."""
    return n_offsets + (2 * rz + 1) + 2


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


def _offdiag_contraction_stored(offsets, coeffs, sh):
    """Generic off-diagonal contraction over a static radius-1 offset table
    (non-center offsets, one coefficient block each)."""
    out = None
    for off, c in zip(offsets, coeffs):
        term = c * sh(off[0], off[1], off[2])
        out = term if out is None else out + term
    return out


def _mask_local_shells_stored(offsets, coeffs, diag_shape, nz, y, ty, k, j):
    """Stored-operator form of :func:`_mask_local_shells`: zero each
    coefficient on the local-block boundary shells its offset crosses."""
    x_dim = diag_shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, diag_shape, 1) + j * ty
    col = jax.lax.broadcasted_iota(jnp.int32, diag_shape, 2)
    bounds = (
        (k > 0, k < nz - 1),
        (row > 0, row < y - 1),
        (col > 0, col < x_dim - 1),
    )
    out = []
    for off, c in zip(offsets, coeffs):
        cond = None
        for d, o in enumerate(off):
            if o == 0:
                continue
            term = bounds[d][1] if o > 0 else bounds[d][0]
            cond = term if cond is None else jnp.logical_and(cond, term)
        out.append(c if cond is None else jnp.where(cond, c, jnp.zeros_like(c)))
    return tuple(out)


def _stencil_kernel(
    emit,
    contract,
    mask_fn,
    n_coeff: int,
    ty: int,
    hh: int,
    aligned: bool,
    full_plane: bool,
    y: int,
    nz: int,
    local_mask: bool,
    rz: int,
    ry: int,
    *refs,
):
    """Shared kernel body: assemble shifted x-views, contract, emit output.

    ``refs[:n_coeff]`` are the coefficient blocks (diag LAST); ``contract``
    computes the off-diagonal sum from the non-diag coefficients and the
    shifted-view accessor ``sh``; ``mask_fn`` is the local-shell masking for
    the shard-local (distributed) form.  ``rz``/``ry`` are the z/y stencil
    radii (1 for the compressed/radius-1 forms, up to 2 for exact Galerkin
    coarse operators); x shifts are pure lane rotations at any radius.
    ``emit(off, xc_blk, coeff_refs, b_ref, out_ref, k, j)`` writes the block.
    """
    k = pl.program_id(0)
    j = pl.program_id(1)

    # Low-precision (bf16) blocks are upcast at load and downcast at store:
    # the contraction and division always run in f32 on the VPU.
    def up(a):
        return a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a

    coeff_refs = refs[:n_coeff]
    zrange = range(-rz, rz + 1)
    if full_plane:
        xz = refs[n_coeff : n_coeff + len(zrange)]
        b, out = refs[n_coeff + len(zrange) :]
        planes = {dz: up(r[...]) for dz, r in zip(zrange, xz)}

        def sh(zpos, dy, dx):
            return _roll(_roll(planes[zpos], dy, 1), dx, 2)

        xc_blk = planes[0]
    else:
        xz = refs[n_coeff : n_coeff + 3 * len(zrange)]
        b, out = refs[n_coeff + 3 * len(zrange) :]

        if aligned:
            # granule-row halo blocks: the top block's LAST ry rows are the
            # global rows j*ty - ry .. j*ty - 1, the bottom block's FIRST ry
            # rows are (j+1)*ty ...  At domain borders the blocks are
            # index-clamped and carry garbage, which every use multiplies by
            # an exactly-zero folded/structural coefficient.
            top_rows = lambda t: t[:, hh - ry : hh, :]
            bot_rows = lambda t: t[:, 0:ry, :]
        else:
            # full-axis halo blocks (y not granule-aligned, interpret/fallback
            # path): pick the exact global rows dynamically
            top_rows = lambda t: jax.lax.dynamic_slice_in_dim(
                t[...], jnp.maximum(j * ty - ry, 0), ry, axis=1
            )
            bot_rows = lambda t: jax.lax.dynamic_slice_in_dim(
                t[...], jnp.minimum((j + 1) * ty, y - ry), ry, axis=1
            )

        def padded(main, top, bot):
            # (1, TY + 2 ry, X): y-halo rows stitched around the main block
            return up(
                jnp.concatenate(
                    [top_rows(top), main[...], bot_rows(bot)], axis=1
                )
            )

        planes = {
            dz: padded(xz[3 * i], xz[3 * i + 1], xz[3 * i + 2])
            for i, dz in enumerate(zrange)
        }

        def sh(zpos, dy, dx):
            return _roll(planes[zpos][:, ry + dy : ry + dy + ty, :], dx, 2)

        xc_blk = planes[0][:, ry : ry + ty, :]

    coeffs = tuple(up(r[...]) for r in coeff_refs[: n_coeff - 1])
    diag = up(coeff_refs[n_coeff - 1][...])
    if local_mask:
        coeffs = mask_fn(coeffs, diag.shape, nz, y, ty, k, j)
    b_val = up(b[...])
    off = contract(coeffs, sh)
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
                        local_mask: bool = False,
                        offsets: Tuple[Tuple[int, ...], ...] | None = None):
    """Compile one grid pass over the compressed operator (``offsets=None``)
    or a generic radius-1 stored operator (``offsets`` = its static
    non-center offset table).

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

    if offsets is None:
        radii = (1, 1, 1)
    else:
        radii = tuple(
            max(abs(off[d]) for off in offsets) for d in range(3)
        )
    rz, ry = radii[0], radii[1]
    if local_mask and radii != (1, 1, 1):
        raise ValueError(
            "local_mask (the shard-local distributed form) supports radius-1 "
            f"operators only (got per-dim radii {radii})"
        )

    def z_at(dz):
        return lambda k, j, dz=dz: jnp.clip(k + dz, 0, z - 1)

    def main_at(dz):
        zf = z_at(dz)
        return pl.BlockSpec(main, lambda k, j, zf=zf: (zf(k, j), j, 0))

    def top_at(dz):
        # the hh-row block whose LAST ry rows are global rows j*ty - ry ..
        # j*ty - 1 (block index j*ty/hh - 1), clamped into range at j == 0
        zf = z_at(dz)
        return pl.BlockSpec(
            halo, lambda k, j, zf=zf: (zf(k, j), jnp.maximum(j * nh - 1, 0), 0)
        )

    def bot_at(dz):
        # the hh-row block whose FIRST ry rows start at global row (j+1)*ty
        zf = z_at(dz)
        return pl.BlockSpec(
            halo,
            lambda k, j, zf=zf: (
                zf(k, j), jnp.minimum((j + 1) * nh, y // hh - 1), 0
            ),
        )

    coeff_spec = pl.BlockSpec(main, lambda k, j: (k, j, 0))
    zrange = range(-rz, rz + 1)
    if full_plane:
        x_specs = [main_at(dz) for dz in zrange]
    else:
        x_specs = []
        for dz in zrange:
            x_specs += [main_at(dz), top_at(dz), bot_at(dz)]
    n_x = len(x_specs)

    if offsets is None:
        n_coeff = 10
        contract = _offdiag_contraction
        mask_fn = _mask_local_shells
    else:
        offdiag = tuple(off for off in offsets if any(o != 0 for o in off))
        n_coeff = len(offdiag) + 1
        contract = functools.partial(_offdiag_contraction_stored, offdiag)
        mask_fn = functools.partial(_mask_local_shells_stored, offdiag)
    specs = [coeff_spec] * n_coeff + x_specs + [coeff_spec]  # + b

    if kind == "halfsweep":
        emit = functools.partial(_emit_halfsweep, color, ty)
    elif kind == "residual":
        emit = _emit_residual
    else:
        raise ValueError(f"unknown kind: {kind!r}")

    kernel = functools.partial(
        _stencil_kernel, emit, contract, mask_fn, n_coeff, ty, hh, aligned,
        full_plane, y, z, local_mask, rz, ry,
    )
    call = pl.pallas_call(
        kernel,
        grid=(z, ny),
        in_specs=specs,
        out_specs=coeff_spec,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=interpret,
    )

    def run(op, xf, b):
        if offsets is None:
            planes = (
                op.face_p[0], op.face_m[0],
                op.face_p[1], op.face_m[1],
                op.face_p[2], op.face_m[2],
                op.mixed[0], op.mixed[1], op.mixed[2],
                op.diag_plane,
            )
        else:
            center = op.center_index
            planes = tuple(
                c for k, c in enumerate(op.coeffs) if k != center
            ) + (op.diag,)
        return call(*planes, *([xf] * n_x), b)

    return run


# ---------------------------------------------------------------------------
# 2D kernels — the reference's own primary test workloads (lena 2D diffusion,
# test/itk2DDiffusionTest_GS.cxx) ran the XLA sweep at ~50% of HBM
# speed-of-light; same fused structure as 3D minus the z machinery:
# grid (y/ty,), (ty, x) blocks, y halos as granule-row blocks, x as rolls.
# ---------------------------------------------------------------------------


def _offdiag_contraction_2d(coeffs, sh):
    """The 8-term off-diagonal contraction of the 2D compressed DCA operator
    (coeffs = (fpy, fmy, fpx, fmx, myx))."""
    fpy, fmy, fpx, fmx, myx = coeffs
    off = fpy * sh(1, 0) + fmy * sh(-1, 0)
    off += fpx * sh(0, 1) + fmx * sh(0, -1)
    off += myx * (sh(1, 1) - sh(1, -1) - sh(-1, 1) + sh(-1, -1))
    return off


def _offdiag_contraction_stored_2d(offsets, coeffs, sh):
    out = None
    for off, c in zip(offsets, coeffs):
        term = c * sh(off[0], off[1])
        out = term if out is None else out + term
    return out


def _stencil_kernel_2d(
    emit, contract, n_coeff: int, ty: int, hh: int, full_plane: bool,
    y: int, *refs,
):
    j = pl.program_id(0)

    def up(a):
        return a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a

    coeff_refs = refs[:n_coeff]
    if full_plane:
        xm, b, out = refs[n_coeff:]
        plane = up(xm[...])

        def sh(dy, dx):
            return _roll(_roll(plane, dy, 0), dx, 1)

        xc = plane
    else:
        xm, xt, xb, b, out = refs[n_coeff:]
        # granule-row halo blocks: top's LAST row is global row j*ty - 1,
        # bottom's FIRST row is (j+1)*ty; domain-border clamps are garbage
        # multiplied by exactly-zero folded coefficients
        padded = jnp.concatenate(
            [up(xt[hh - 1:hh, :]), up(xm[...]), up(xb[0:1, :])], axis=0
        )

        def sh(dy, dx):
            return _roll(padded[1 + dy:1 + dy + ty, :], dx, 1)

        xc = padded[1:1 + ty]

    coeffs = tuple(up(r[...]) for r in coeff_refs[: n_coeff - 1])
    diag = up(coeff_refs[n_coeff - 1][...])
    b_val = up(b[...])
    off = contract(coeffs, sh)
    emit(off, xc, diag, b_val, out, j)


def _emit_halfsweep_2d(color: int, ty: int, off, xc, diag, b_val, out, j):
    upd = (b_val - off) / diag
    row = jax.lax.broadcasted_iota(jnp.int32, xc.shape, 0) + j * ty
    col = jax.lax.broadcasted_iota(jnp.int32, xc.shape, 1)
    parity = (row + col) % 2
    out[...] = jnp.where(parity == color, upd, xc).astype(out.dtype)


def _emit_residual_2d(off, xc, diag, b_val, out, j):
    out[...] = (b_val - diag * xc - off).astype(out.dtype)


#: block count of the 2D compressed kernel (6 coeffs + 3 x + b + out).
_N_BLOCKS_COMPRESSED_2D = 11


@functools.lru_cache(maxsize=64)
def _build_stencil_pass_2d(shape: Tuple[int, ...], dtype_name: str, kind: str,
                           color: int, ty: int, interpret: bool,
                           offsets: Tuple[Tuple[int, ...], ...] | None = None):
    y, x = shape
    dtype = jnp.dtype(dtype_name)
    full_plane = ty == y
    g = _sublane_granule(dtype.itemsize)
    hh = g
    nh = ty // hh if not full_plane else 0

    main = pl.BlockSpec((ty, x), lambda j: (j, 0))
    if full_plane:
        x_specs = [main]
    else:
        x_specs = [
            main,
            pl.BlockSpec((hh, x), lambda j: (jnp.maximum(j * nh - 1, 0), 0)),
            pl.BlockSpec(
                (hh, x), lambda j: (jnp.minimum((j + 1) * nh, y // hh - 1), 0)
            ),
        ]

    if offsets is None:
        n_coeff = 6
        contract = _offdiag_contraction_2d
    else:
        offdiag = tuple(off for off in offsets if any(o != 0 for o in off))
        n_coeff = len(offdiag) + 1
        contract = functools.partial(_offdiag_contraction_stored_2d, offdiag)
    specs = [main] * n_coeff + x_specs + [main]  # + b

    if kind == "halfsweep":
        emit = functools.partial(_emit_halfsweep_2d, color, ty)
    elif kind == "residual":
        emit = _emit_residual_2d
    else:
        raise ValueError(f"unknown kind: {kind!r}")

    kernel = functools.partial(
        _stencil_kernel_2d, emit, contract, n_coeff, ty, hh, full_plane, y
    )
    call = pl.pallas_call(
        kernel,
        grid=(y // ty,),
        in_specs=specs,
        out_specs=main,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=interpret,
    )

    def run(op, xf, b):
        if offsets is None:
            planes = (
                op.face_p[0], op.face_m[0],
                op.face_p[1], op.face_m[1],
                op.mixed[0],
                op.diag_plane,
            )
        else:
            center = op.center_index
            planes = tuple(
                c for k, c in enumerate(op.coeffs) if k != center
            ) + (op.diag,)
        n_x = 1 if full_plane else 3
        return call(*planes, *([xf] * n_x), b)

    return run


def _pick_y_tile_2d(y: int, x: int, itemsize: int, n_blocks: int) -> int | None:
    """Largest granule-multiple (or full-plane) y tile fitting VMEM."""
    g = _sublane_granule(itemsize)
    budget = _VMEM_BUDGET_BYTES // (n_blocks * 2)
    best = None
    for ty in range(1, y + 1):
        if y % ty != 0 or ty * x * itemsize > budget:
            continue
        if ty == y or (ty % g == 0 and y % g == 0):
            best = ty
    return best


def _op_n_blocks_2d(op) -> int:
    if isinstance(op, CompressedDCAOperator):
        return _N_BLOCKS_COMPRESSED_2D
    return len(op.offsets) + 4  # coeffs (incl diag) + 3 x + b + out


def _kernel_offsets(op):
    """Static offset table for the kernel: None selects the fixed compressed
    form, a tuple the generic stored form."""
    return None if isinstance(op, CompressedDCAOperator) else op.offsets


def _op_n_blocks(op) -> int:
    if isinstance(op, CompressedDCAOperator):
        return _N_BLOCKS_COMPRESSED
    rz = max(abs(off[0]) for off in op.offsets)
    return _n_blocks_stored(len(op.offsets), rz)


def pallas_compatible(op, max_radius: int = 2) -> bool:
    """Whether ``op`` has a fused-kernel form: the compressed DCA operator
    (2D or 3D) or a stored operator of per-dim radius <= ``max_radius``
    (collapsed Galerkin levels are radius 1; exact Galerkin 3D levels reach
    radius 2 and run the radius-2 kernel variant; stored 2D is radius-1
    only).  The distributed shard-local form supports 3D radius 1 only —
    pass ``max_radius=1`` there and gate on ndim at the call site.  Tiling
    feasibility is a separate, shape-level check (:func:`pallas_supports`)."""
    if isinstance(op, CompressedDCAOperator):
        return op.ndim in (2, 3)
    if not isinstance(op, StencilOperator):
        return False
    if op.ndim == 3:
        return 1 <= op.radius <= max_radius
    return op.ndim == 2 and op.radius == 1


def _resolve_ty(op, shape, itemsize, ty):
    if ty is not None:
        return ty
    if len(shape) == 2:
        return _pick_y_tile_2d(shape[0], shape[1], itemsize,
                               _op_n_blocks_2d(op))
    return pick_y_tile(shape[1], shape[2], itemsize, _op_n_blocks(op))


def pallas_supports(
    shape, itemsize: int = 4, op=None
) -> bool:
    """Whether a 2D/3D grid shape has a y-tiling that fits the VMEM budget
    (for ``op``'s block count; the compressed operator's when ``op`` is
    None)."""
    if len(shape) == 2:
        n_blocks = (
            _N_BLOCKS_COMPRESSED_2D if op is None else _op_n_blocks_2d(op)
        )
        return _pick_y_tile_2d(shape[0], shape[1], itemsize,
                               n_blocks) is not None
    n_blocks = _N_BLOCKS_COMPRESSED if op is None else _op_n_blocks(op)
    return (
        len(shape) == 3
        and pick_y_tile(shape[1], shape[2], itemsize, n_blocks) is not None
    )


def pallas_rbgs_halfsweep(
    op,
    x: jnp.ndarray,
    b: jnp.ndarray,
    color: int,
    interpret: bool = False,
    ty: int | None = None,
    local_mask: bool = False,
) -> jnp.ndarray:
    """One GS half-sweep updating cells of parity ``color`` (static 0/1).

    ``op`` is a :class:`CompressedDCAOperator` or a radius-1 3D stored
    :class:`StencilOperator` (check :func:`pallas_compatible`).  Building
    block of the distributed smoother (parallel.halo): with ``local_mask``
    the contraction drops every cross-block term, which the caller restores
    via halo-exchanged boundary slabs.  Raises if the shape has no valid
    y-tiling (check :func:`pallas_supports` first)."""
    shape = tuple(x.shape)
    ty = _resolve_ty(op, shape, x.dtype.itemsize, ty)
    if ty is None:
        raise ValueError(f"no y-tiling fits VMEM for shape {shape}")
    if len(shape) == 2:
        if local_mask:
            raise ValueError("the shard-local masked form is 3D-only")
        half = _build_stencil_pass_2d(shape, str(x.dtype), "halfsweep",
                                      color, ty, interpret,
                                      _kernel_offsets(op))
        return half(op, x, b)
    half = _build_stencil_pass(shape, str(x.dtype), "halfsweep", color, ty,
                               interpret, local_mask, _kernel_offsets(op))
    return half(op, x, b)


def pallas_rbgs_sweep(
    op,
    x: jnp.ndarray,
    b: jnp.ndarray,
    interpret: bool = False,
    ty: int | None = None,
) -> jnp.ndarray:
    """One red-black GS sweep (red then black half-sweep) via Pallas.

    3D only; ``op`` must be :func:`pallas_compatible` (compressed DCA or
    stored with per-dim radius <= 2: collapsed Galerkin levels are radius 1,
    exact Galerkin levels radius 2).  Falls back to the XLA sweep when no
    y-tiling fits the VMEM budget.  ``ty`` overrides the automatic y-tile
    height (must divide Y)."""
    if not pallas_compatible(op):
        raise ValueError(
            "pallas_rbgs_sweep needs a compressed or radius<=2 stored "
            f"operator (got {op!r})"
        )
    shape = tuple(x.shape)
    ty = _resolve_ty(op, shape, x.dtype.itemsize, ty)
    if ty is None:
        from .smoothers import rb_gauss_seidel_sweep

        return rb_gauss_seidel_sweep(op, x, b)
    dtype_name = str(x.dtype)
    offsets = _kernel_offsets(op)
    build = (
        _build_stencil_pass_2d if len(shape) == 2
        else functools.partial(_build_stencil_pass, local_mask=False)
    )
    for color in (0, 1):
        half = build(shape, dtype_name, "halfsweep", color, ty,
                     interpret, offsets=offsets)
        x = half(op, x, b)
    return x


def pallas_residual(
    op,
    x: jnp.ndarray,
    b: jnp.ndarray,
    interpret: bool = False,
    ty: int | None = None,
    local_mask: bool = False,
) -> jnp.ndarray:
    """Fused residual ``r = b - A x`` via Pallas (operators as in
    :func:`pallas_rbgs_sweep`).

    Falls back to the XLA apply when no y-tiling fits the VMEM budget (the
    ``local_mask`` shard-local form has no fallback — check
    :func:`pallas_supports` first)."""
    if not pallas_compatible(op):
        raise ValueError(
            "pallas_residual needs a compressed or radius<=2 stored "
            f"operator (got {op!r})"
        )
    shape = tuple(x.shape)
    ty = _resolve_ty(op, shape, x.dtype.itemsize, ty)
    if ty is None:
        if local_mask:
            raise ValueError(f"no y-tiling fits VMEM for shape {shape}")
        return b - op.apply(x)
    if len(shape) == 2:
        if local_mask:
            raise ValueError("the shard-local masked form is 3D-only")
        run = _build_stencil_pass_2d(shape, str(x.dtype), "residual", 0, ty,
                                     interpret, _kernel_offsets(op))
        return run(op, x, b)
    run = _build_stencil_pass(shape, str(x.dtype), "residual", 0, ty,
                              interpret, local_mask, _kernel_offsets(op))
    return run(op, x, b)
