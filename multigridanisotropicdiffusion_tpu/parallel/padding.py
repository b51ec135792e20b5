"""Pad-to-divisible distribution: fully shard odd-sized volumes.

JAX's shard_map (and the explicit halo path built on it, :mod:`.halo`)
requires every sharded axis to divide evenly over its mesh axis; the plain
:func:`.sharding.level_spec` rule therefore *replicates* any non-divisible
axis, silently losing parallelism exactly on real-world shapes (the reference
VED volume is 69x77x69; 513^3 is a vertex-centered power-of-two-plus-one).

This module embeds each level into a mesh-divisible padded domain instead:

* operator planes are zero-padded, the diagonal is padded with **ones** —
  pad cells solve the decoupled identity equation ``1 * x = 0``;
* fields (rhs, iterates) are zero-padded;
* the original boundary-folded operator has exactly-zero coefficients
  pointing outward at the true domain border, so no real cell ever reads a
  pad cell, and pad cells (zero rhs, identity row) stay exactly zero through
  every smoother sweep and residual;
* inter-level transfers and the coarsest direct solve crop to the true
  shape, apply the standard operator, and re-pad — so the padded solve is
  numerically *identical* to the unpadded one on the interior, and global
  L2 norms are unchanged (pad cells contribute zeros).

No reference counterpart (the reference is single-threaded; SURVEY.md §2) —
this is part of the mandated distribution layer.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax.sharding import Mesh

from ..core.stencil import StencilOperator
from ..ops.compressed import CompressedDCAOperator
from .sharding import DEFAULT_MIN_LOCAL


def padded_level_shape(
    mesh: Mesh, shape: Tuple[int, ...], min_local: int = DEFAULT_MIN_LOCAL
) -> Tuple[int, ...]:
    """The mesh-divisible embedding shape for a level of ``shape``.

    Axis d is padded up to ``ceil(s/per) * per`` when sharding it is
    worthwhile (mesh axis > 1 and the per-device block stays >= ``min_local``
    points); otherwise it keeps its size (the axis will be replicated, same
    as the plain rule)."""
    axes = mesh.axis_names
    out = []
    for d, s in enumerate(shape):
        if d < len(axes):
            per = mesh.shape[axes[d]]
            if per > 1 and s // per >= min_local:
                out.append(-(-s // per) * per)
                continue
        out.append(s)
    return tuple(out)


def pad_field(x: jnp.ndarray, pshape: Tuple[int, ...],
              value: float = 0.0) -> jnp.ndarray:
    """Embed ``x`` at the origin of a ``pshape`` array filled with ``value``."""
    if tuple(x.shape) == tuple(pshape):
        return x
    pads = [(0, p - s) for s, p in zip(x.shape, pshape)]
    return jnp.pad(x, pads, constant_values=value)


def crop_field(x: jnp.ndarray, shape: Tuple[int, ...]) -> jnp.ndarray:
    """Inverse of :func:`pad_field`: the leading ``shape`` block."""
    if tuple(x.shape) == tuple(shape):
        return x
    return x[tuple(slice(0, s) for s in shape)]


def pad_operator(op, pshape: Tuple[int, ...]):
    """Embed an operator into the padded domain: off-diagonal planes padded
    with zeros, the diagonal with ones (pad rows = identity equations)."""
    if tuple(op.shape) == tuple(pshape):
        return op
    if isinstance(op, CompressedDCAOperator):
        return CompressedDCAOperator(
            tuple(pad_field(p, pshape) for p in op.face_p),
            tuple(pad_field(p, pshape) for p in op.face_m),
            tuple(pad_field(p, pshape) for p in op.mixed),
            pad_field(op.diag_plane, pshape, 1.0),
            op.ndim,
        )
    if isinstance(op, StencilOperator):
        c = op.center_index
        planes = tuple(
            pad_field(p, pshape, 1.0 if k == c else 0.0)
            for k, p in enumerate(op.coeffs)
        )
        return StencilOperator(planes, op.offsets)
    raise TypeError(
        f"pad_operator supports stored/compressed operators, got {type(op)}"
    )


def pad_hierarchy(hierarchy, pshapes: Tuple[Tuple[int, ...], ...]):
    """Pad every level's operator (the coarsest LU stays on the true shape —
    the padded solve crops before the direct solve)."""
    from ..models.mad import Hierarchy

    ops = tuple(
        pad_operator(op, ps) for op, ps in zip(hierarchy.operators, pshapes)
    )
    return Hierarchy(operators=ops, solver=hierarchy.solver)
