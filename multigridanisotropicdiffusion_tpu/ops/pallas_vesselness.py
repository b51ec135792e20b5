"""Fused Pallas TPU kernels for the VED vesselness pipeline's per-scale body.

The reference iterates scales, computing a Hessian volume, a per-voxel 3x3
eigendecomposition, a Frangi-style vesselness, and a running best-response
select (/root/reference/include/itkVEDMultigridImageFilter.hxx:215-299).  The
XLA formulation of the post-Hessian stages (models/ved.py) streams ~20 full
planes per scale through HBM (write 6 Hessian planes, re-read them for the
eigenvalues, read + write the 7 running-best planes); measured ~45 ms/scale
at 512^3 — ~6x the streamed-bytes bound.  These kernels collapse the whole
per-scale body into ONE pass over the smoothed field:

* :func:`pallas_fd_vesselness` — the valid-z central-difference Hessian
  (sharing the stencil code of ``ops.pallas_conv._fd_plane_blocks``), the
  analytic 3x3 eigenvalues (``ops.eigen3`` with the polynomial arccos —
  Mosaic has no acos/atan2 primitive), |value|-ascending sort, the vesselness
  measure, and the running-best select of (response, 6 Hessian planes), all
  in VMEM.  Per-scale HBM traffic drops to: read the smoothed field (3 z-row
  streams), read 7 best planes, write 7.

* :func:`pallas_tensor_assembly` — the final once-per-volume stage: the full
  eigendecomposition (with vectors) of the winning Hessian and the diffusion
  tensor ``T = Q D Q^T`` (identity where V <= 0), 7 planes in, 6 out.

The vesselness measure and tensor-assembly math are injected by the caller
(``models/ved.py``) so the single sources of the formulas stay there; the
kernels only fuse them.  The running response plane stays float32 even in
bf16-storage pipelines (select decisions match the XLA path); Hessian planes
are rounded to the storage dtype *before* the eigensolve, exactly like the
XLA path stores them.  Parity vs the XLA formulation is limited only by the
polynomial arccos (~2e-8) — tested in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .eigen3 import acos_poly, eigh3, sort_by_abs3
from .pallas_conv import (
    _fd_in_specs,
    _fd_plane_blocks,
    _granule,
    _pick_tile,
    pallas_fd_supported,
)


def _pick_fdv_tile(y: int, x: int, itemsize: int) -> int | None:
    """y-tile for the fused kernels: ~24 blocks + ~40 live (ty, x) f32
    temporaries of eigenvalue math share the VMEM budget."""
    g = _granule(itemsize)
    return _pick_tile(y, 1, g, cap=max(g, (6 * 1024 * 1024) // (80 * x * 4)))


def pallas_fd_vesselness_supported(
    shape: Tuple[int, ...], itemsize: int, interpret: bool = False
) -> bool:
    """Eligibility of the valid-z fused pass for a smoothed-field shape
    (zo + 2, y, x)."""
    if not pallas_fd_supported(shape, itemsize, interpret):
        return False
    _, y, x = shape
    return _pick_fdv_tile(y, x, itemsize) is not None


def _fdv_kernel(ty, x, nyb, facs, params, first, measure_fn, acos_fn, *refs):
    """refs: 9 stitched smoothed-field refs, then (unless ``first``) the
    running best (resp f32, 6 Hessian planes), then the 7 outputs."""
    j = pl.program_id(1)
    alpha, beta, gamma = params
    n_in = 9 if first else 16
    outs = refs[n_in:]
    resp_out, h_outs = outs[0], outs[1:]

    h_f32 = _fd_plane_blocks(ty, x, nyb, facs, refs[:9], j)
    # stored planes are rounded to the storage dtype; the eigensolve uses the
    # UNROUNDED compute-dtype planes (the XLA path eigensolves its stored
    # bf16 planes — a ~0.4% relative difference well inside the bf16
    # pipeline's accuracy class; skipping the round-trip avoids 6 per-voxel
    # bf16<->f32 tile relayouts in the hot kernel)
    h_store = tuple(p.astype(h_outs[0].dtype) for p in h_f32)

    w, _ = eigh3(h_f32, compute_vectors=False, acos_fn=acos_fn)
    resp = measure_fn(sort_by_abs3(w), alpha, beta, gamma).astype(
        resp_out.dtype
    )

    if first:
        resp_out[...] = resp[None]
        for o, h in zip(h_outs, h_store):
            o[...] = h[None].astype(o.dtype)
    else:
        best_resp = refs[9][0]
        best_h = refs[10:16]
        better = resp > best_resp
        resp_out[...] = jnp.where(better, resp, best_resp)[None]
        for o, h, bh in zip(h_outs, h_store, best_h):
            o[...] = jnp.where(better, h, bh[0])[None].astype(o.dtype)


@functools.lru_cache(maxsize=256)
def _build_fdv(shape: Tuple[int, ...], dtype_name: str, resp_dtype_name: str,
               facs: Tuple[float, ...], params: Tuple[float, ...],
               first: bool, measure_fn, acos_fn, interpret: bool):
    """``shape`` is the valid-z smoothed field (zo + 2, y, x)."""
    zp, y, x = shape
    zo = zp - 2
    dtype = jnp.dtype(dtype_name)
    resp_dtype = jnp.dtype(resp_dtype_name)
    g = _granule(dtype.itemsize)
    ty = _pick_fdv_tile(y, x, dtype.itemsize)
    nyb = y // ty
    main = pl.BlockSpec((1, ty, x), lambda k, j: (k, j, 0))

    in_specs = _fd_in_specs(y, x, ty, g)
    if not first:
        in_specs = in_specs + [main] * 7
    out_specs = [main] * 7
    out_shape = [jax.ShapeDtypeStruct((zo, y, x), resp_dtype)] + [
        jax.ShapeDtypeStruct((zo, y, x), dtype)
    ] * 6

    kernel = functools.partial(
        _fdv_kernel, ty, x, nyb, facs, params, first, measure_fn, acos_fn
    )
    call = pl.pallas_call(
        kernel,
        grid=(zo, nyb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    def run(us, best):
        args = [us] * 9
        if not first:
            args.append(best[0])
            args.extend(best[1])
        outs = call(*args)
        return outs[0], tuple(outs[1:])

    return run


def pallas_fd_vesselness(
    us: jnp.ndarray,
    facs: Tuple[float, ...],
    params: Tuple[float, float, float],
    best=None,
    measure_fn=None,
    acos_fn=acos_poly,
    interpret: bool | None = None,
):
    """One fused per-scale vesselness step over a valid-z smoothed field.

    ``us``: the Gaussian-smoothed field with a 1-thick z halo
    (ops.hessian.smoothed_field_valid_z); ``facs``: the static FD
    normalization factors (ops.hessian.fd_factors); ``params``:
    (alpha, beta, gamma); ``best``: the running ``(response, hessian_planes)``
    from previous scales, or None for the first scale (which always
    initializes the running maximum, itkVEDMultigridImageFilter.hxx:272).
    ``measure_fn(sorted_eigenvalue_planes, alpha, beta, gamma)`` is the
    vesselness measure (models/ved.vesselness_measure — injected to keep the
    formula single-sourced).

    Returns the updated ``(response, hessian_planes)``: response float32
    (float64 under x64 interpret), Hessian planes in ``us.dtype``.
    """
    if measure_fn is None:
        raise ValueError("measure_fn is required (models/ved.vesselness_measure)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = jnp.dtype(us.dtype)
    resp_dtype = jnp.dtype(
        jnp.float64 if dtype == jnp.float64 else jnp.float32
    )
    run = _build_fdv(
        tuple(us.shape), dtype.name, resp_dtype.name,
        tuple(float(f) for f in facs), tuple(float(p) for p in params),
        best is None, measure_fn, acos_fn, bool(interpret),
    )
    return run(us, best)


# ---------------------------------------------------------------------------
# final tensor assembly (once per volume, after the scale loop)
# ---------------------------------------------------------------------------


def _assembly_kernel(assemble_fn, acos_fn, *refs):
    resp_ref = refs[0]
    h_refs = refs[1:7]
    outs = refs[7:]
    cd = jnp.float64 if resp_ref.dtype.itemsize == 8 else jnp.float32
    resp = resp_ref[0].astype(cd)
    h = tuple(r[0].astype(cd) for r in h_refs)
    planes = assemble_fn(resp, h, acos_fn)
    for o, p in zip(outs, planes):
        o[...] = p[None].astype(o.dtype)


@functools.lru_cache(maxsize=64)
def _build_assembly(shape: Tuple[int, ...], dtype_name: str,
                    resp_dtype_name: str, assemble_fn, acos_fn,
                    interpret: bool):
    z, y, x = shape
    dtype = jnp.dtype(dtype_name)
    out_dtype = jnp.dtype(resp_dtype_name)
    ty = _pick_fdv_tile(y, x, dtype.itemsize)
    main = pl.BlockSpec((1, ty, x), lambda k, j: (k, j, 0))
    kernel = functools.partial(_assembly_kernel, assemble_fn, acos_fn)
    call = pl.pallas_call(
        kernel,
        grid=(z, y // ty),
        in_specs=[main] * 7,
        out_specs=[main] * 6,
        out_shape=[jax.ShapeDtypeStruct(shape, out_dtype)] * 6,
        interpret=interpret,
    )
    return call


def pallas_tensor_assembly_supported(
    shape: Tuple[int, ...], itemsize: int, interpret: bool = False
) -> bool:
    if len(shape) != 3 or (itemsize > 4 and not interpret):
        return False
    _, y, x = shape
    from .pallas_conv import _LANE

    if x % _LANE and not interpret:  # lane tiling is Mosaic-only
        return False
    g = _granule(itemsize)
    return y % g == 0 and _pick_fdv_tile(y, x, itemsize) is not None


def pallas_tensor_assembly(
    resp: jnp.ndarray,
    h,
    assemble_fn,
    acos_fn=acos_poly,
    interpret: bool | None = None,
):
    """Fused final VED stage: per-voxel eigendecomposition of the winning
    Hessian + diffusion-tensor assembly.

    ``assemble_fn(resp_plane, hessian_planes, acos_fn)`` must return the 6
    canonical tensor planes (models/ved injects its eigh3 + tensor math).
    Output planes are in the response dtype (the pipeline's math dtype).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = jnp.dtype(h[0].dtype)
    call = _build_assembly(
        tuple(resp.shape), dtype.name, jnp.dtype(resp.dtype).name,
        assemble_fn, acos_fn, bool(interpret),
    )
    return tuple(call(resp, *h))
