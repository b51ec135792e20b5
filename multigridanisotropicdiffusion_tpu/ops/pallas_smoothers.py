"""Pallas TPU kernels for the red-black Gauss-Seidel smoother (3D, compressed
DCA operator).

The XLA path materializes a padded copy of ``x`` and a color-select per
half-sweep; this kernel fuses everything — neighbor access, the 18-term
coefficient contraction, the parity select and the Jacobi-style update — into
one VMEM-tiled pass.  Grid = one program per z-plane; the three z-neighbor
planes of ``x`` arrive as separate inputs whose index maps clamp at the domain
borders.  Clamping is *safe without masking* because the compressed operator
is boundary-folded: every coefficient that would multiply an out-of-domain
value is exactly zero (``face_m[0]`` vanishes on the first shell, mixed planes
vanish on all border shells), so whatever the clamped read returns is
multiplied by 0.

In-plane (y/x) neighbor access is done by shifting inside the VMEM block with
zero padding — again safe because folded border coefficients are zero.

The kernel is correctness-tested in interpreter mode on CPU and used on TPU
via the standard Mosaic pipeline.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .compressed import CompressedDCAOperator


def _shift_yx(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift a (1, Y, X) block by (dy, dx) with zero fill: element (y, x)
    receives a[y + dy, x + dx]."""
    if dy == 0 and dx == 0:
        return a
    padded = jnp.pad(a, ((0, 0), (1, 1), (1, 1)))
    _, y, x = a.shape
    return padded[:, 1 + dy : 1 + dy + y, 1 + dx : 1 + dx + x]


def _rbgs_halfsweep_kernel(
    color: int,
    # refs: 6 face planes, 3 mixed planes, diag, x_zm, x_c, x_zp, b -> out
    fpz, fmz, fpy, fmy, fpx, fmx, mzy, mzx, myx, diag,
    x_zm, x_c, x_p, b, out,
):
    k = pl.program_id(0)
    xc = x_c[...]
    xm = x_zm[...]
    xp = x_p[...]

    off = fpz[...] * xp + fmz[...] * xm
    off += fpy[...] * _shift_yx(xc, 1, 0) + fmy[...] * _shift_yx(xc, -1, 0)
    off += fpx[...] * _shift_yx(xc, 0, 1) + fmx[...] * _shift_yx(xc, 0, -1)
    off += mzy[...] * (
        _shift_yx(xp, 1, 0) - _shift_yx(xp, -1, 0)
        - _shift_yx(xm, 1, 0) + _shift_yx(xm, -1, 0)
    )
    off += mzx[...] * (
        _shift_yx(xp, 0, 1) - _shift_yx(xp, 0, -1)
        - _shift_yx(xm, 0, 1) + _shift_yx(xm, 0, -1)
    )
    off += myx[...] * (
        _shift_yx(xc, 1, 1) - _shift_yx(xc, 1, -1)
        - _shift_yx(xc, -1, 1) + _shift_yx(xc, -1, -1)
    )

    upd = (b[...] - off) / diag[...]

    shp = xc.shape
    row = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, shp, 2)
    parity = (row + col + k) % 2
    out[...] = jnp.where(parity == color, upd, xc)


@functools.lru_cache(maxsize=8)
def _build_halfsweep(shape: Tuple[int, ...], dtype_name: str, color: int,
                     interpret: bool):
    z, y, x = shape
    dtype = jnp.dtype(dtype_name)
    plane = (1, y, x)

    def at_k(k):
        return (k, 0, 0)

    def at_km(k):
        return (jnp.maximum(k - 1, 0), 0, 0)

    def at_kp(k):
        return (jnp.minimum(k + 1, z - 1), 0, 0)

    plane_spec = pl.BlockSpec(plane, at_k)
    specs = [plane_spec] * 10 + [
        pl.BlockSpec(plane, at_km),   # x at z-1 (clamped)
        plane_spec,                   # x at z
        pl.BlockSpec(plane, at_kp),   # x at z+1 (clamped)
        plane_spec,                   # b
    ]

    kernel = functools.partial(_rbgs_halfsweep_kernel, color)
    call = pl.pallas_call(
        kernel,
        grid=(z,),
        in_specs=specs,
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        interpret=interpret,
    )

    def halfsweep(comp: CompressedDCAOperator, xf, b):
        planes = (
            comp.face_p[0], comp.face_m[0],
            comp.face_p[1], comp.face_m[1],
            comp.face_p[2], comp.face_m[2],
            comp.mixed[0], comp.mixed[1], comp.mixed[2],
            comp.diag_plane,
        )
        return call(*planes, xf, xf, xf, b)

    return halfsweep


def pallas_rbgs_sweep(
    comp: CompressedDCAOperator,
    x: jnp.ndarray,
    b: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """One red-black GS sweep (red then black half-sweep) via Pallas.

    3D only; operator must be a :class:`CompressedDCAOperator`.
    """
    if comp.ndim != 3:
        raise ValueError("pallas_rbgs_sweep supports 3D grids only")
    shape = tuple(x.shape)
    dtype_name = str(x.dtype)
    for color in (0, 1):
        half = _build_halfsweep(shape, dtype_name, color, interpret)
        x = half(comp, x, b)
    return x
