"""Explicit halo-exchange smoothers: shard_map + ppermute, with optional
interior/boundary overlap.

The default distribution path (:mod:`.sharding`) writes global-view ops and
lets XLA's SPMD partitioner insert halo exchanges.  This module is the
hand-scheduled alternative: each device owns a block, one-voxel face halos
move between ICI neighbors via ``lax.ppermute``, and the smoother runs on the
local block with its halo ring.

With ``overlap=True`` the sweep is restructured for communication/compute
overlap: the full-block stencil contraction is computed against *zero* halos
— carrying no data dependency on any collective, so XLA's latency-hiding
scheduler runs it concurrently with the ppermutes — and once the halos
arrive, only the 1-voxel boundary slabs of the sharded dimensions are
recomputed with the true neighbor values and spliced in.  The slab recompute
is O(surface) vs the O(volume) interior, so the exposed communication cost is
just the splice.

Semantics: ghost values outside the *global* domain are zero — exactly the
contract of the boundary-folded operators (out-of-range coefficients are
zero), and ``ppermute`` conveniently delivers zeros to shards with no source
neighbor.  Red-black parity is computed from *global* coordinates so coloring
is partition-invariant.

Requires every sharded axis to divide evenly (the same restriction as
:func:`..parallel.sharding.level_spec`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec

from ..core.stencil import StencilOperator

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _exchange_halos(x_local: jnp.ndarray, mesh: Mesh, spec: PartitionSpec):
    """Pad the local block by 1 in every dimension: neighbor faces via
    ppermute along sharded axes, zeros at global-domain borders."""
    ndim = x_local.ndim
    for d in range(ndim):
        axis_name = spec[d] if d < len(spec) else None
        if axis_name is None:
            pad = [(0, 0)] * ndim
            pad[d] = (1, 1)
            x_local = jnp.pad(x_local, pad)
            continue
        n = mesh.shape[axis_name]
        idx_lo = [slice(None)] * ndim
        idx_lo[d] = slice(0, 1)
        idx_hi = [slice(None)] * ndim
        idx_hi[d] = slice(x_local.shape[d] - 1, x_local.shape[d])
        # halo from the left neighbor = its last face, shifted rightwards
        halo_lo = lax.ppermute(
            x_local[tuple(idx_hi)], axis_name,
            [(i, i + 1) for i in range(n - 1)],
        )
        halo_hi = lax.ppermute(
            x_local[tuple(idx_lo)], axis_name,
            [(i + 1, i) for i in range(n - 1)],
        )
        x_local = jnp.concatenate([halo_lo, x_local, halo_hi], axis=d)
    return x_local


def _local_offdiag(op_local: StencilOperator, x_pad: jnp.ndarray) -> jnp.ndarray:
    """Off-diagonal stencil contraction on a halo-padded local block."""
    shape = op_local.shape
    c = op_local.center_index
    out = None
    for k, off in enumerate(op_local.offsets):
        if k == c:
            continue
        sl = tuple(slice(1 + o, 1 + o + s) for o, s in zip(off, shape))
        term = op_local.coeffs[k] * x_pad[sl]
        out = term if out is None else out + term
    return out


def _sharded_dims(mesh: Mesh, spec: PartitionSpec, ndim: int):
    """Dimensions whose halos actually cross device boundaries."""
    out = []
    for d in range(ndim):
        axis_name = spec[d] if d < len(spec) else None
        if axis_name is not None and mesh.shape[axis_name] > 1:
            out.append(d)
    return tuple(out)


def _local_offdiag_slab(
    op_local: StencilOperator, x_pad: jnp.ndarray, d: int, lo: bool
) -> jnp.ndarray:
    """Off-diagonal contraction for the 1-thick boundary slab of dim ``d``
    (low or high side), read from the *fully halo-padded* local block — the
    complete, correct value for those cells (including corner terms that
    reference halos of other dimensions)."""
    shape = op_local.shape
    ndim = len(shape)
    c = op_local.center_index
    pos = 0 if lo else shape[d] - 1
    coeff_sl = tuple(
        slice(pos, pos + 1) if dd == d else slice(None) for dd in range(ndim)
    )
    out = None
    for k, off in enumerate(op_local.offsets):
        if k == c:
            continue
        sl = tuple(
            slice(1 + pos + o, 2 + pos + o)
            if dd == d
            else slice(1 + o, 1 + o + s)
            for dd, (o, s) in enumerate(zip(off, shape))
        )
        term = op_local.coeffs[k][coeff_sl] * x_pad[sl]
        out = term if out is None else out + term
    return out


def _offdiag_exchange(
    op_local: StencilOperator,
    x_l: jnp.ndarray,
    mesh: Mesh,
    spec: PartitionSpec,
    overlap: bool,
) -> jnp.ndarray:
    """Off-diagonal contraction of the local block with true neighbor halos.

    ``overlap=False``: exchange first, then one contraction over the padded
    block (compute waits on communication).  ``overlap=True``: contract
    against zero halos immediately (correct everywhere except the boundary
    slabs of device-sharded dims, since unsharded/global borders have
    exactly-zero folded coefficients), then recompute just those slabs from
    the received halos and splice them in.
    """
    ndim = x_l.ndim
    if not overlap:
        return _local_offdiag(op_local, _exchange_halos(x_l, mesh, spec))

    # interior compute: zero halos, no collective in the dependency chain
    off = _local_offdiag(op_local, jnp.pad(x_l, 1))
    x_pad = _exchange_halos(x_l, mesh, spec)
    for d in _sharded_dims(mesh, spec, ndim):
        for lo in (True, False):
            slab = _local_offdiag_slab(op_local, x_pad, d, lo)
            start = [0] * ndim
            start[d] = 0 if lo else x_l.shape[d] - 1
            off = lax.dynamic_update_slice(off, slab, tuple(start))
    return off


def _global_parity(shape_local: Tuple[int, ...], mesh: Mesh, spec: PartitionSpec):
    """Checkerboard parity from global coordinates (True = even sum)."""
    acc = None
    for d, s in enumerate(shape_local):
        ids = lax.broadcasted_iota(jnp.int32, shape_local, d)
        axis_name = spec[d] if d < len(spec) else None
        if axis_name is not None:
            ids = ids + lax.axis_index(axis_name) * s
        acc = ids if acc is None else acc + ids
    return acc % 2 == 0


def _specs(mesh: Mesh, spec: PartitionSpec):
    return dict(mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
                check_vma=False)


@functools.lru_cache(maxsize=64)
def make_halo_rbgs_sweep(mesh: Mesh, spec: PartitionSpec, overlap: bool = False):
    """Build a jittable red-black GS sweep with explicit halo exchange.

    Returns ``sweep(op, x, b) -> x'`` where all arrays (and operator planes)
    are sharded according to ``spec`` over ``mesh``.  Two exchanges per sweep:
    the black half-sweep needs the freshly updated red halos.  With
    ``overlap`` each half-sweep's interior contraction runs concurrently with
    its exchange (see :func:`_offdiag_exchange`).
    """

    def sweep(op, x, b):
        def local(op_local, x_l, b_l):
            red = _global_parity(x_l.shape, mesh, spec)
            diag = op_local.diag
            for color in (True, False):
                off = _offdiag_exchange(op_local, x_l, mesh, spec, overlap)
                upd = (b_l - off) / diag
                x_l = jnp.where(red == color, upd, x_l)
            return x_l

        return _shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
        )(op, x, b)

    return sweep


@functools.lru_cache(maxsize=64)
def make_halo_jacobi_sweep(
    mesh: Mesh, spec: PartitionSpec, omega: float = 2.0 / 3.0,
    overlap: bool = False,
):
    """Damped-Jacobi sweep with explicit halo exchange (one exchange/sweep)."""

    def sweep(op, x, b):
        def local(op_local, x_l, b_l):
            off = _offdiag_exchange(op_local, x_l, mesh, spec, overlap)
            upd = (b_l - off) / op_local.diag
            return (1.0 - omega) * x_l + omega * upd

        return _shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
        )(op, x, b)

    return sweep


@functools.lru_cache(maxsize=64)
def make_halo_residual(mesh: Mesh, spec: PartitionSpec, overlap: bool = False):
    """``r = b - A x`` with explicit halo exchange."""

    def res(op, x, b):
        def local(op_local, x_l, b_l):
            off = _offdiag_exchange(op_local, x_l, mesh, spec, overlap)
            return b_l - off - op_local.diag * x_l

        return _shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
        )(op, x, b)

    return res
