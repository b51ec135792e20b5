"""Distributed (shard_map) fast path for the VED vesselness pipeline.

Round-4 gated the Pallas conv/FD kernels out of mesh-sharded programs (GSPMD
cannot partition a ``pallas_call``), so a meshed VED ran the Hessian/conv
stages in the slow XLA form.  This module restores the kernel path under a
mesh with the same pattern as the distributed smoother (parallel.halo): run
the kernels per shard inside ``shard_map`` and exchange what they need via
``lax.ppermute``.

Unlike the radius-1 smoother, the pipeline needs scale-dependent halos
(Gaussian radius + 1) along every sharded axis, and the kernels' alignment
constraints (lane tiles along x, granule tiles along y) would be destroyed
by halo-extending those axes.  So the pipeline *reshards internally to a
1-D z-slab decomposition* over the same devices — axis 0 is the kernels'
valid-mode axis, where arbitrary-thickness halos are native:

1. the input volume is laid out as contiguous z slabs (the compiler inserts
   the all-to-all from the solver's mesh),
2. each shard ppermutes its max-radius z faces (edge-replicated at the
   global borders, matching the single-device pad),
3. the full single-device kernel pipeline (``models.ved._fused_scales_kernel``
   — fused smoothing, FD+eig+vesselness+select, tensor assembly) runs on the
   extended block in valid-z mode,
4. the outputs are re-constrained to the solver's sharding by the caller.

Falls back (returns ``None``) when the z extent does not divide by the
device count with at least halo-thick local slabs, or the per-shard shape is
not kernel-eligible.  On CPU meshes the kernels run in interpret mode (the
dryrun / test path).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _pipeline_halo(scales, spacing) -> int:
    from ..ops.hessian import kernel_radius

    return max(kernel_radius(float(s), float(spacing[0])) for s in scales) + 1


def make_sharded_vesselness_pipeline(
    shape: Tuple[int, ...],
    dtype,
    mesh: Mesh,
    scales: Sequence[float],
    spacing: Sequence[float],
    alpha: float,
    beta: float,
    gamma: float,
    epsilon: float,
    omega: float,
    sensitivity: float,
    pipeline_dtype=None,
):
    """Build the jitted shard_map pipeline, or return ``None`` when the
    (shape, mesh) pair is not eligible for the kernel path."""
    from ..models.ved import _fused_scales_kernel
    from ..ops.pallas_vesselness import pallas_fd_vesselness_supported

    if len(shape) != 3:
        return None
    interpret = jax.default_backend() != "tpu"
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    nz, y, x = shape
    halo = _pipeline_halo(scales, spacing)
    if n < 1 or nz % n or nz // n < halo:
        return None
    local = nz // n
    run_dtype = jnp.dtype(pipeline_dtype) if pipeline_dtype else jnp.dtype(dtype)
    us_shape = (local + 2, y, x)
    if not pallas_fd_vesselness_supported(
        us_shape, run_dtype.itemsize, interpret
    ):
        return None

    zmesh = Mesh(np.asarray(mesh.devices).reshape(-1), ("zslab",))
    spec = P("zslab", None, None)

    def local_fn(u_blk):
        idx = lax.axis_index("zslab")
        lo = u_blk[local - halo:local]
        hi = u_blk[0:halo]
        halo_lo = lax.ppermute(
            lo, "zslab", [(i, i + 1) for i in range(n - 1)]
        )
        halo_hi = lax.ppermute(
            hi, "zslab", [(i + 1, i) for i in range(n - 1)]
        )
        # global borders: edge-replicate (the single-device pipeline pads the
        # global volume with mode='edge')
        top = jnp.where(
            idx == 0, jnp.broadcast_to(u_blk[0:1], halo_lo.shape), halo_lo
        )
        bot = jnp.where(
            idx == n - 1, jnp.broadcast_to(u_blk[local - 1:local],
                                           halo_hi.shape), halo_hi
        )
        u_ext = jnp.concatenate([top, u_blk, bot], axis=0)
        out = _fused_scales_kernel(
            u_ext, tuple(scales), tuple(spacing), alpha, beta, gamma,
            epsilon, omega, sensitivity, halo, interpret=interpret,
        )
        assert out is not None, "eligibility pre-checked"
        resp, t = out
        return (resp, *t)

    try:
        # jax >= 0.8 API (check_vma replaced check_rep)
        sharded = shard_map(
            local_fn, mesh=zmesh, in_specs=(spec,),
            out_specs=(spec,) * 7, check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax
        sharded = shard_map(
            local_fn, mesh=zmesh, in_specs=(spec,),
            out_specs=(spec,) * 7, check_rep=False,
        )

    @jax.jit
    def pipeline(u):
        if pipeline_dtype is not None:
            u = u.astype(run_dtype)
        outs = sharded(u)
        return outs[0], tuple(outs[1:])

    return pipeline
