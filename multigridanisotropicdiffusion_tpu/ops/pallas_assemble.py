"""Fused Pallas TPU kernel for compressed-DCA operator assembly (3D).

``ops.compressed.assemble_compressed_dca`` is the setup-phase whale at
512^3 (~58 ms device-side): nine tensor-derivative passes built from
concatenated strided slices plus twelve strided ``at[].add/set`` folding
updates — exactly the shifted-slice XLA patterns measured ~6x off HBM
speed-of-light.  This kernel emits all 10 compressed planes (diag, 6 folded
face planes, 3 masked mixed planes) in ONE pass over the 6 tensor planes
(reference discretization: itkGridsHierarchy.hxx:298-516; compressed
structure: ops/compressed.py).

In-kernel (FD-family structure — grid ``(z, y/ty)``, ``(1, ty, x)`` blocks):

* z derivatives from index-clamped z-position refs (central form — WRONG on
  the two global z-border planes, patched exactly by the XLA caller),
* y derivatives from the stitched ``(ty+2, x)`` window with the one-sided
  border rows selected by global-row iota (exact),
* x derivatives from lane rolls with double-roll one-sided border columns
  (exact),
* the Neumann folds along y and x as in-block selects (exact), the z fold
  applied by the caller on the two patched planes,
* the mixed-plane border masks from iota / program position.

Only components that are differentiated along an axis carry that axis's
neighbor refs: a00 needs z only, a01 z+y, a02 z(+x rolls), a11 y, a12 y(+x),
a22 x — 18 input refs total.  Parity with the XLA assembly is exact
(interpret-tested to f64 round-off).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _granule(itemsize: int) -> int:
    return 8 * max(1, 4 // itemsize)


def _pick_ty(y: int, x: int, itemsize: int) -> int | None:
    g = _granule(itemsize)
    best = None
    cap = max(g, (6 * 1024 * 1024) // (40 * x * 4))
    for t in range(g, min(y, cap) + 1, g):
        if y % t == 0 and t >= 3:
            best = t
    return best


def pallas_assemble_supported(
    shape: Tuple[int, ...], itemsize: int, interpret: bool = False
) -> bool:
    if len(shape) != 3 or (itemsize > 4 and not interpret):
        return False
    z, y, x = shape
    if z < 3 or x % _LANE:
        return False
    g = _granule(itemsize)
    return y % g == 0 and _pick_ty(y, x, itemsize) is not None


def _roll(a, shift):
    """out[..., i] = a[..., i + shift] as a pure lane rotation."""
    if shift == 0:
        return a
    return pltpu.roll(a, (-shift) % a.shape[-1], axis=a.ndim - 1)


def _assemble_kernel(ty, z, y, x, nyb, w2, wd, interpret, *refs):
    """refs: a00 z-mains(3); a01 z-mains(3) + y-halos(2); a02 z-mains(3);
    a11 main + y-halos(2); a12 main + y-halos(2); a22 main; then the 10
    outputs (diag, fp_z, fm_z, fp_y, fm_y, fp_x, fm_x, m_zy, m_zx, m_yx)."""
    k = pl.program_id(0)
    j = pl.program_id(1)
    (a00_m, a00_p, a00_c,
     a01_m, a01_p, a01_c, a01_t, a01_b,
     a02_m, a02_p, a02_c,
     a11_c, a11_t, a11_b,
     a12_c, a12_t, a12_b,
     a22_c) = refs[:18]
    outs = refs[18:]
    cd = jnp.float64 if a00_c.dtype.itemsize == 8 else jnp.float32

    def up(r):
        return r[0].astype(cd)

    row = jax.lax.broadcasted_iota(jnp.int32, (ty, x), 0) + j * ty
    col = jax.lax.broadcasted_iota(jnp.int32, (ty, x), 1)

    # -- z derivatives: central (clamped) — global z borders patched in XLA
    def dz(minus, plus):
        return up(plus) - up(minus)

    dz_a00 = dz(a00_m, a00_p)
    dz_a01 = dz(a01_m, a01_p)
    dz_a02 = dz(a02_m, a02_p)

    # -- y derivatives: stitched window + exact one-sided border rows
    hh = a01_t.shape[1]

    def stitched(main, top, bot):
        t = top[0, hh - 1:hh, :].astype(cd)
        b = bot[0, 0:1, :].astype(cd)
        m = main[0].astype(cd)
        return jnp.concatenate([t, m, b], axis=0)  # (ty + 2, x)

    def dy(main, top, bot):
        w = stitched(main, top, bot)
        center = w[1:1 + ty]
        central = w[2:2 + ty] - w[0:ty]
        # one-sided rows need rows 0..2 / y-3..y-1 — inside the main block
        # (ty >= 3); only valid when this tile holds the global border row
        left = -3.0 * center + 4.0 * w[2:2 + ty] - _rows(w, 2, ty)
        right = 3.0 * center - 4.0 * w[0:ty] + _rows(w, -2, ty)
        out = jnp.where(row == 0, left, central)
        return jnp.where(row == y - 1, right, out)

    def _rows(w, shift, ty):
        # w[1+shift : 1+shift+ty] — row +2 / -2 neighbors for the one-sided
        # forms; rows outside the stitched window only matter where the
        # select keeps them, which is only at the true border rows where
        # they ARE in range (ty >= 3 guarantees rows 2/3 and ty-4.. exist
        # for the border tiles)
        lo = 1 + shift
        if lo < 0:
            pad = -lo
            return jnp.concatenate([w[0:1]] * pad + [w[0:ty - pad]], axis=0)
        if lo + ty > w.shape[0]:
            pad = lo + ty - w.shape[0]
            return jnp.concatenate(
                [w[lo:w.shape[0]]] + [w[-1:]] * pad, axis=0
            )
        return w[lo:lo + ty]

    dy_a01 = dy(a01_c, a01_t, a01_b)
    dy_a11 = dy(a11_c, a11_t, a11_b)
    dy_a12 = dy(a12_c, a12_t, a12_b)

    # -- x derivatives: lane rolls + exact one-sided border columns
    def dx(ref):
        v = up(ref)
        p1, m1 = _roll(v, 1), _roll(v, -1)
        p2, m2 = _roll(v, 2), _roll(v, -2)
        central = p1 - m1
        left = -3.0 * v + 4.0 * p1 - p2
        right = 3.0 * v - 4.0 * m1 + m2
        out = jnp.where(col == 0, left, central)
        return jnp.where(col == x - 1, right, out)

    dx_a02 = dx(a02_c)
    dx_a12 = dx(a12_c)
    dx_a22 = dx(a22_c)

    a00 = up(a00_c)
    a01 = up(a01_c)
    a02 = up(a02_c)
    a11 = up(a11_c)
    a12 = up(a12_c)
    a22 = up(a22_c)

    w2z, w2y, w2x = w2
    (wzz, wzy, wzx), (wyz, wyy, wyx), (wxz, wxy, wxx) = wd

    v2_z = w2z * a00
    v2_y = w2y * a11
    v2_x = w2x * a22
    t_z = wzz * dz_a00 + wzy * dy_a01 + wzx * dx_a02
    t_y = wyz * dz_a01 + wyy * dy_a11 + wyx * dx_a12
    t_x = wxz * dz_a02 + wxy * dy_a12 + wxx * dx_a22

    diag = 1.0 - 2.0 * (v2_z + v2_y + v2_x)

    fp_z, fm_z = v2_z + t_z, v2_z - t_z  # z fold applied by the caller
    fp_y, fm_y = v2_y + t_y, v2_y - t_y
    fp_x, fm_x = v2_x + t_x, v2_x - t_x

    # Neumann folds along y and x (itkGridsHierarchy.hxx:362-363): first
    # shell's -e coefficient folds onto +e, last shell's +e onto -e
    fp_y, fm_y = (
        jnp.where(row == 0, fp_y + fm_y, fp_y),
        jnp.where(row == 0, 0.0, jnp.where(row == y - 1, fm_y + fp_y, fm_y)),
    )
    fp_y = jnp.where(row == y - 1, 0.0, fp_y)
    fp_x, fm_x = (
        jnp.where(col == 0, fp_x + fm_x, fp_x),
        jnp.where(col == 0, 0.0, jnp.where(col == x - 1, fm_x + fp_x, fm_x)),
    )
    fp_x = jnp.where(col == x - 1, 0.0, fp_x)

    # mixed planes with border masks (zero on every border shell of both
    # participating dims)
    z_int = jnp.logical_and(k > 0, k < z - 1)
    y_int = jnp.logical_and(row > 0, row < y - 1)
    x_int = jnp.logical_and(col > 0, col < x - 1)
    m_zy = jnp.where(jnp.logical_and(z_int, y_int), 2.0 * wzy * a01, 0.0)
    m_zx = jnp.where(jnp.logical_and(z_int, x_int), 2.0 * wzx * a02, 0.0)
    m_yx = jnp.where(jnp.logical_and(y_int, x_int), 2.0 * wyx * a12, 0.0)

    for o, v in zip(outs, (diag, fp_z, fm_z, fp_y, fm_y, fp_x, fm_x,
                           m_zy, m_zx, m_yx)):
        o[...] = v[None].astype(o.dtype)


@functools.lru_cache(maxsize=64)
def _build_assemble(shape: Tuple[int, ...], dtype_name: str,
                    w2: Tuple[float, ...], wd: Tuple[Tuple[float, ...], ...],
                    interpret: bool):
    z, y, x = shape
    dtype = jnp.dtype(dtype_name)
    g = _granule(dtype.itemsize)
    ty = _pick_ty(y, x, dtype.itemsize)
    nyb = y // ty
    main = pl.BlockSpec((1, ty, x), lambda k, j: (k, j, 0))
    halo = (1, g, x)
    nh = ty // g

    def z_at(dz):
        return pl.BlockSpec(
            (1, ty, x), lambda k, j, dz=dz: (jnp.clip(k + dz, 0, z - 1), j, 0)
        )

    top = pl.BlockSpec(halo, lambda k, j: (k, jnp.maximum(j * nh - 1, 0), 0))
    bot = pl.BlockSpec(
        halo, lambda k, j: (k, jnp.minimum((j + 1) * nh, y // g - 1), 0)
    )

    specs = (
        [z_at(-1), z_at(1), main]                     # a00
        + [z_at(-1), z_at(1), main, top, bot]         # a01
        + [z_at(-1), z_at(1), main]                   # a02
        + [main, top, bot]                            # a11
        + [main, top, bot]                            # a12
        + [main]                                      # a22
    )
    kernel = functools.partial(
        _assemble_kernel, ty, z, y, x, nyb, w2, wd, interpret
    )
    call = pl.pallas_call(
        kernel,
        grid=(z, nyb),
        in_specs=specs,
        out_specs=[main] * 10,
        out_shape=[jax.ShapeDtypeStruct(shape, dtype)] * 10,
        interpret=interpret,
    )

    def run(a00, a01, a02, a11, a12, a22):
        return call(
            a00, a00, a00,
            a01, a01, a01, a01, a01,
            a02, a02, a02,
            a11, a11, a11,
            a12, a12, a12,
            a22,
        )

    return run


def _xla_z_border_faces(tensor, spacing, dt, side):
    """Exact (unfolded) face pairs on the global z-border plane ``side``
    (0 = first, -1 = last), computed on a 3-plane slab with the one-sided z
    derivative — the in-kernel central form is wrong only there."""
    from ..core.symfield import sym_component
    from .dca import _tensor_derivative

    sl = slice(0, 3) if side == 0 else slice(-3, None)
    slab = tuple(p[sl] for p in tensor)
    pick = 0 if side == 0 else -1
    out = []
    for d in range(3):
        m_dd = sym_component(slab, 3, d, d)
        v2 = (-dt / (spacing[d] * spacing[d])) * m_dd
        t = None
        for d2 in range(3):
            w = -dt / (4.0 * spacing[d] * spacing[d2])
            dm = _tensor_derivative(sym_component(slab, 3, d, d2), d2) * w
            t = dm if t is None else t + dm
        out.append((
            (v2 + t)[pick:pick + 1 or None],
            (v2 - t)[pick:pick + 1 or None],
        ))
    return out


def pallas_assemble_compressed_dca(
    tensor, spacing, time_step: float, interpret: bool | None = None
):
    """Drop-in fused assembly of the 3D compressed DCA operator (see
    :func:`ops.compressed.assemble_compressed_dca` for semantics)."""
    from .compressed import CompressedDCAOperator

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    a00, a01, a02, a11, a12, a22 = tensor
    shape = tuple(a00.shape)
    z = shape[0]
    dt = float(time_step)
    h = tuple(float(s) for s in spacing)
    w2 = tuple(-dt / (h[d] * h[d]) for d in range(3))
    wd = tuple(
        tuple(-dt / (4.0 * h[d] * h[d2]) for d2 in range(3)) for d in range(3)
    )
    run = _build_assemble(shape, jnp.dtype(a00.dtype).name, w2, wd,
                          bool(interpret))
    (diag, fp_z, fm_z, fp_y, fm_y, fp_x, fm_x,
     m_zy, m_zx, m_yx) = run(a00, a01, a02, a11, a12, a22)

    # exact z-border planes (central z-derivative is wrong there), then the
    # z Neumann fold — both contiguous leading-axis updates
    faces = {0: (fp_z, fm_z), 1: (fp_y, fm_y), 2: (fp_x, fm_x)}
    first = _xla_z_border_faces(tensor, h, dt, 0)
    last = _xla_z_border_faces(tensor, h, dt, -1)
    patched = {}
    for d in range(3):
        fp, fm = faces[d]
        fp = fp.at[0:1].set(first[d][0])
        fm = fm.at[0:1].set(first[d][1])
        fp = fp.at[z - 1:z].set(last[d][0])
        fm = fm.at[z - 1:z].set(last[d][1])
        if d != 0:
            # re-apply the y/x folds on the two patched planes (the kernel
            # folded its own — wrong — border values)
            yx = d  # 1 -> row axis, 2 -> col axis
            n = shape[yx]
            ids = jax.lax.broadcasted_iota(jnp.int32, fp[0:1].shape, yx)
            for plane_idx in (0, z - 1):
                p = fp[plane_idx:plane_idx + 1]
                m = fm[plane_idx:plane_idx + 1]
                p2 = jnp.where(ids == 0, p + m, p)
                m2 = jnp.where(ids == 0, 0.0,
                               jnp.where(ids == n - 1, m + p, m))
                p2 = jnp.where(ids == n - 1, 0.0, p2)
                fp = fp.at[plane_idx:plane_idx + 1].set(p2)
                fm = fm.at[plane_idx:plane_idx + 1].set(m2)
        patched[d] = (fp, fm)

    fp_z, fm_z = patched[0]
    # z fold: first plane's -e_z folds onto +e_z, last plane's +e_z onto -e_z
    fp_z = fp_z.at[0:1].add(fm_z[0:1])
    fm_z = fm_z.at[0:1].set(0.0)
    fm_z = fm_z.at[z - 1:z].add(fp_z[z - 1:z])
    fp_z = fp_z.at[z - 1:z].set(0.0)
    fp_y, fm_y = patched[1]
    fp_x, fm_x = patched[2]

    return CompressedDCAOperator(
        (fp_z, fp_y, fp_x), (fm_z, fm_y, fm_x), (m_zy, m_zx, m_yx), diag, 3
    )
