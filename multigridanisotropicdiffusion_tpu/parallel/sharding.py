"""SPMD distribution of the multigrid solve over a TPU device mesh.

The reference is strictly single-threaded (SURVEY.md §2: no threads, no MPI,
no GPU); distribution is a pure addition mandated by the north star.  The
TPU-idiomatic design: solver math stays *global-view* (pad/slice stencils,
separable transfers), arrays carry ``NamedSharding``s that block-partition the
spatial dimensions over mesh axes, and XLA's SPMD partitioner inserts the
one-voxel halo exchanges (ICI collectives) implied by the shifted slices.
``with_sharding_constraint`` at level boundaries implements *coarse-grid
agglomeration*: once a level's per-device block drops below ``min_local``
points per axis, the level is replicated (gathered onto every chip) and the
coarsest dense LU solve runs replicated — the multigrid analog of reducing
parallelism as grids shrink.

An explicitly scheduled halo-exchange smoother (shard_map + ppermute with
interior/boundary overlap) is the hand-optimized alternative; this module is
the compiler-driven baseline that any such kernel must beat.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..core.grids import GridLevel
from ..core.stencil import StencilOperator

#: Below this many points per axis per device, stop sharding that axis.
DEFAULT_MIN_LOCAL = 8


def factorize_devices(n: int, ndim: int) -> Tuple[int, ...]:
    """Split ``n`` devices into an ``ndim``-dimensional mesh shape, as square
    as possible (e.g. 8 -> (4, 2) in 2D, (2, 2, 2) in 3D)."""
    dims = [1] * ndim
    remaining = n
    # greedy: repeatedly give the smallest prime factor to the smallest dim
    factors = []
    m = remaining
    d = 2
    while d * d <= m:
        while m % d == 0:
            factors.append(d)
            m //= d
        d += 1
    if m > 1:
        factors.append(m)
    for f in sorted(factors, reverse=True):
        i = int(np.argmin(dims))
        dims[i] *= f
    return tuple(sorted(dims, reverse=True))


def make_grid_mesh(
    ndim: int,
    devices: Sequence[jax.Device] | None = None,
    mesh_shape: Tuple[int, ...] | None = None,
) -> Mesh:
    """Create a spatial device mesh with axes named 'x', 'y'[, 'z']."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = factorize_devices(n, ndim)
    if len(mesh_shape) != ndim:
        raise ValueError(f"mesh_shape rank {len(mesh_shape)} != ndim {ndim}")
    if math.prod(mesh_shape) != n:
        raise ValueError(f"mesh shape {mesh_shape} != device count {n}")
    axis_names = ("x", "y", "z")[:ndim]
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime for a multi-host pod slice.

    Thin wrapper over ``jax.distributed.initialize`` (no-op when already
    initialized or single-process): on Cloud TPU pods all three arguments are
    auto-detected from the metadata server, so the 2-host launch is just

        # on every host, same program:
        initialize_multihost()              # or explicit coordinator/count/id
        mesh = make_multihost_grid_mesh(3)  # DCN-major slab decomposition
        res = mad_diffusion(vol, tensor, config=cfg, mesh=mesh)

    Elsewhere pass ``coordinator_address='host0:port'``, ``num_processes``
    and ``process_id`` explicitly (e.g. from SLURM/MPI ranks).  The solver
    code is unchanged: global-view arrays + shardings; halo exchanges on the
    host-boundary faces ride DCN, everything else ICI (see
    :func:`make_multihost_grid_mesh`).
    """
    import jax._src.distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if not kwargs and jax.process_count() == 1:
        return  # single-process, nothing to do
    jax.distributed.initialize(**kwargs)


def make_multihost_grid_mesh(
    ndim: int,
    allow_split_physical_axes: bool = False,
) -> Mesh:
    """Spatial mesh for a multi-host pod: DCN-major slab decomposition.

    Hosts partition the FIRST spatial axis ('x'): each host owns a contiguous
    slab, so exactly one halo face pair per host boundary crosses DCN; all
    other halo traffic (and the within-slab partitioning over the remaining
    axes) rides ICI.  Built with ``mesh_utils.create_hybrid_device_mesh`` so
    device order respects physical ICI topology within each host and DCN
    connectivity across hosts — the layout BASELINE.md's ">=80% weak scaling
    at 2 hosts" target assumes (per-host work fixed, one extra DCN face).

    Single-process: equivalent to :func:`make_grid_mesh`.  Backends whose
    devices carry no slice topology (e.g. multi-process CPU — the 2-process
    test harness) fall back to an explicit process-major layout with the
    same guarantee: devices of each process form a contiguous block of the
    first mesh axis.
    """
    n_proc = jax.process_count()
    local = jax.local_device_count()
    if n_proc == 1:
        return make_grid_mesh(ndim)
    axis_names = ("x", "y", "z")[:ndim]
    ici_shape = factorize_devices(local, ndim)
    try:
        from jax.experimental import mesh_utils

        dcn_shape = (n_proc,) + (1,) * (ndim - 1)
        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=ici_shape,
            dcn_mesh_shape=dcn_shape,
            allow_split_physical_axes=allow_split_physical_axes,
        )
    except ValueError:
        # no slice topology (CPU / single-slice backends): process-major
        # stacking along the first axis keeps each host's devices a
        # contiguous slab, so host-boundary halos still cross exactly one
        # face pair per neighbor
        devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        blocks = []
        for p in range(n_proc):
            mine = [d for d in devices if d.process_index == p]
            blocks.append(np.asarray(mine).reshape(ici_shape))
        dev_array = np.concatenate(blocks, axis=0)
    return Mesh(dev_array, axis_names)


def level_spec(
    mesh: Mesh, shape: Tuple[int, ...], min_local: int = DEFAULT_MIN_LOCAL
) -> PartitionSpec:
    """PartitionSpec for a field of ``shape``: spatial axis d maps to mesh axis
    d while (a) the size divides evenly over the mesh axis (JAX requires
    divisible shardings; pad odd volumes to mesh-divisible sizes for full
    distribution) and (b) the per-device block stays >= ``min_local``;
    otherwise the axis is replicated (agglomeration)."""
    axes = mesh.axis_names
    spec = []
    for d, s in enumerate(shape):
        if d < len(axes):
            per = mesh.shape[axes[d]]
            if per > 1 and s % per == 0 and s // per >= min_local:
                spec.append(axes[d])
                continue
        spec.append(None)
    return PartitionSpec(*spec)


def field_sharding(
    mesh: Mesh, shape: Tuple[int, ...], min_local: int = DEFAULT_MIN_LOCAL
) -> NamedSharding:
    return NamedSharding(mesh, level_spec(mesh, shape, min_local))


def operator_sharding(
    mesh: Mesh, shape: Tuple[int, ...], min_local: int = DEFAULT_MIN_LOCAL
) -> NamedSharding:
    """Sharding for a StencilOperator coefficient plane (same block
    partitioning as the fields it multiplies)."""
    return field_sharding(mesh, shape, min_local)


def _reshard(x, sharding: NamedSharding):
    """Reshard an array, supporting unevenly divisible dimensions (GSPMD pads
    internally; plain ``device_put`` rejects non-divisible shapes)."""
    return jax.jit(lambda a: a, out_shardings=sharding)(x)


def shard_field(x, mesh: Mesh, min_local: int = DEFAULT_MIN_LOCAL):
    return _reshard(x, field_sharding(mesh, tuple(x.shape), min_local))


def shard_hierarchy(hierarchy, levels: Tuple[GridLevel, ...], mesh: Mesh,
                    min_local: int = DEFAULT_MIN_LOCAL):
    """Reshard a built Hierarchy: fine-level coefficient planes block-partitioned,
    agglomerated levels and the coarsest LU replicated."""
    from ..models.mad import Hierarchy

    ops = []
    for op in hierarchy.operators:
        # works for stored / compressed / matrix-free operators: every pytree
        # leaf is a full-resolution spatial plane (possibly padded to a
        # mesh-divisible embedding, parallel.padding — hence the shape is
        # read off the leaf, not the level descriptor)
        ops.append(
            jax.tree.map(
                lambda c: _reshard(
                    c, operator_sharding(mesh, tuple(c.shape), min_local)
                ),
                op,
            )
        )
    replicated = NamedSharding(mesh, PartitionSpec())
    solver = jax.tree.map(
        lambda a: _reshard(a, replicated), hierarchy.solver
    )
    return Hierarchy(operators=tuple(ops), solver=solver)
