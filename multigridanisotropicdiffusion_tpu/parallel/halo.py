"""Explicit halo-exchange smoothers: shard_map + ppermute.

The default distribution path (:mod:`.sharding`) writes global-view ops and
lets XLA's SPMD partitioner insert halo exchanges.  This module is the
hand-scheduled alternative: each device owns a block, one-voxel face halos
move between ICI neighbors via ``lax.ppermute``, and the smoother runs on the
local block with its halo ring.  This is the foundation for overlapping halo
transfer with interior compute (issue the ppermute, sweep the interior,
then finish the one-voxel boundary shell) and for Pallas kernels that fold
the exchange into the sweep via ``make_async_remote_copy``.

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


@functools.lru_cache(maxsize=32)
def make_halo_rbgs_sweep(mesh: Mesh, spec: PartitionSpec):
    """Build a jittable red-black GS sweep with explicit halo exchange.

    Returns ``sweep(op, x, b) -> x'`` where all arrays (and operator planes)
    are sharded according to ``spec`` over ``mesh``.  Two exchanges per sweep:
    the black half-sweep needs the freshly updated red halos.
    """

    def sweep(op, x, b):
        def local(op_local, x_l, b_l):
            red = _global_parity(x_l.shape, mesh, spec)
            diag = op_local.diag
            for color in (True, False):
                x_pad = _exchange_halos(x_l, mesh, spec)
                upd = (b_l - _local_offdiag(op_local, x_pad)) / diag
                x_l = jnp.where(red == color, upd, x_l)
            return x_l

        return _shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
        )(op, x, b)

    return sweep


@functools.lru_cache(maxsize=32)
def make_halo_jacobi_sweep(mesh: Mesh, spec: PartitionSpec, omega: float = 2.0 / 3.0):
    """Damped-Jacobi sweep with explicit halo exchange (one exchange/sweep)."""

    def sweep(op, x, b):
        def local(op_local, x_l, b_l):
            x_pad = _exchange_halos(x_l, mesh, spec)
            upd = (b_l - _local_offdiag(op_local, x_pad)) / op_local.diag
            return (1.0 - omega) * x_l + omega * upd

        return _shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
        )(op, x, b)

    return sweep


@functools.lru_cache(maxsize=32)
def make_halo_residual(mesh: Mesh, spec: PartitionSpec):
    """``r = b - A x`` with explicit halo exchange."""

    def res(op, x, b):
        def local(op_local, x_l, b_l):
            x_pad = _exchange_halos(x_l, mesh, spec)
            full = _local_offdiag(op_local, x_pad) + op_local.diag * x_l
            return b_l - full

        return _shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
        )(op, x, b)

    return res
