"""DCA (discretization coarse-grid approximation) operator assembly.

Builds the implicit-Euler matrix ``A = Id - dt * L`` where ``L`` is the
second-order finite-difference discretization of ``div(M grad u)`` with
homogeneous Neumann boundary conditions, for a per-voxel symmetric diffusion
tensor ``M``.  Semantics follow the reference
``mad::GridsHierarchy::GenerateDCA``
(/root/reference/include/mad/itkGridsHierarchy.hxx:298-516):

* center coefficient initialized to 1 (the identity term),
* per dimension ``d``: second-derivative term ``-dt/h_d^2 * M_dd`` on the
  ``±e_d`` offsets and ``+2 dt/h_d^2 * M_dd`` on the center,
* per ordered pair ``(d, d2)``, ``d != d2``: mixed-derivative term with weight
  ``-dt/(4 h_d h_d2) * M_dd2`` on the four diagonal offsets (so each unordered
  pair contributes twice — that double counting is the correct 2*M_dd2 cross
  term),
* per ordered pair ``(d, d2)`` *including* ``d2 == d``: first-derivative
  transport term ``(∂_d2 M_dd2) ∂_d u`` via a central difference of the tensor
  field (one-sided second-order ``(∓3, ±4, ∓1)`` at the d2 borders) applied to
  the ``±e_d`` offsets,
* Neumann BCs by offset reflection: at a border, the sign of every offset
  component that points outside the grid is flipped, folding the ghost-cell
  weight onto its mirror image inside the grid.

Unlike the reference's per-voxel iterator sweep, everything here is a fixed set
of whole-grid array ops: contributions are accumulated into per-offset
coefficient planes, and the boundary reflection is a handful of one-voxel-thick
slice moves.  The result is a :class:`~..core.stencil.StencilOperator` with a
9-point stencil in 2D and a 19-point stencil in 3D (corner offsets are never
populated and are dropped, itkGridsHierarchy.hxx:492-513).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..core.stencil import Offset, StencilOperator, stencil_offsets
from ..core.symfield import sym_component


def _axis_slice(x: jnp.ndarray, axis: int, start, stop) -> jnp.ndarray:
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(start, stop)
    return x[tuple(sl)]


def _tensor_derivative(m: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Per-voxel derivative surrogate of a tensor-coefficient plane along
    ``axis``: interior ``M[i+1] - M[i-1]`` (2h times the central difference),
    borders ``-3 M[0] + 4 M[1] - M[2]`` / ``3 M[-1] - 4 M[-2] + M[-3]``
    (itkGridsHierarchy.hxx:451-470).  The 1/(2h) factors are folded into the
    caller's weight."""
    left = (
        -3.0 * _axis_slice(m, axis, 0, 1)
        + 4.0 * _axis_slice(m, axis, 1, 2)
        - 1.0 * _axis_slice(m, axis, 2, 3)
    )
    interior = _axis_slice(m, axis, 2, None) - _axis_slice(m, axis, 0, -2)
    right = (
        3.0 * _axis_slice(m, axis, -1, None)
        - 4.0 * _axis_slice(m, axis, -2, -1)
        + 1.0 * _axis_slice(m, axis, -3, -2)
    )
    return jnp.concatenate([left, interior, right], axis=axis)


def _flip_component(off: Offset, d: int) -> Offset:
    out = list(off)
    out[d] = -out[d]
    return tuple(out)


def _reflect_boundaries(
    contrib: Dict[Offset, jnp.ndarray], shape: Tuple[int, ...]
) -> Dict[Offset, jnp.ndarray]:
    """Fold out-of-range stencil entries onto their mirror offsets.

    For each dimension ``d``: at the first slice (index_d == 0) every offset
    with a ``-1`` d-component points outside the grid, so its coefficient moves
    to the offset with that component flipped to ``+1``; symmetrically at the
    last slice.  Processing dimensions sequentially composes the flips exactly
    as the reference's per-voxel offset rewriting does for edge/corner voxels
    (itkGridsHierarchy.hxx:388-430).
    """
    ndim = len(shape)
    for d in range(ndim):
        first = [slice(None)] * ndim
        first[d] = slice(0, 1)
        first = tuple(first)
        last = [slice(None)] * ndim
        last[d] = slice(shape[d] - 1, shape[d])
        last = tuple(last)

        for sign, sl in ((-1, first), (1, last)):
            moves = []
            for off, plane in contrib.items():
                if off[d] == sign:
                    moves.append((off, _flip_component(off, d)))
            for src, dst in moves:
                src_plane = contrib[src]
                patch = src_plane[sl]
                if dst not in contrib:
                    contrib[dst] = jnp.zeros_like(src_plane)
                contrib[dst] = contrib[dst].at[sl].add(patch)
                contrib[src] = src_plane.at[sl].set(0.0)
    return contrib


def assemble_dca(
    tensor,
    spacing: Tuple[float, ...],
    time_step: float,
) -> StencilOperator:
    """Assemble ``A = Id - dt*L`` as a StencilOperator.

    Args:
      tensor: symmetric diffusion tensor field as the canonical plane tuple
        (see :mod:`..core.symfield`; length D(D+1)/2, each plane of
        ``grid_shape``).
      spacing: grid spacing per dimension (length D).
      time_step: implicit-Euler time step ``dt``.
    """
    ndim = len(spacing)
    shape = tuple(tensor[0].shape)
    dtype = tensor[0].dtype

    def _tensor_plane(t, d, d2):
        return sym_component(t, ndim, d, d2)

    dt = jnp.asarray(time_step, dtype)
    center: Offset = (0,) * ndim

    def e(d: int, s: int = 1) -> Offset:
        off = [0] * ndim
        off[d] = s
        return tuple(off)

    contrib: Dict[Offset, jnp.ndarray] = {
        center: jnp.ones(shape, dtype)  # the identity term
    }

    def add(off: Offset, value: jnp.ndarray) -> None:
        if off in contrib:
            contrib[off] = contrib[off] + value
        else:
            contrib[off] = jnp.broadcast_to(value, shape).astype(dtype)

    for d in range(ndim):
        h_d = spacing[d]
        # Second-derivative term (itkGridsHierarchy.hxx:356-369).
        w2 = -dt / (h_d * h_d)
        v2 = _tensor_plane(tensor, d, d) * w2
        add(e(d, +1), v2)
        add(e(d, -1), v2)
        add(center, -2.0 * v2)

        for d2 in range(ndim):
            w = -dt / (4.0 * h_d * spacing[d2])

            # Mixed-derivative term on the four diagonal offsets
            # (itkGridsHierarchy.hxx:433-444). Visited for both (d,d2) and
            # (d2,d), yielding the full 2*M_dd2 cross coefficient.
            if d != d2:
                vm = _tensor_plane(tensor, d, d2) * w
                pp = tuple(a + b for a, b in zip(e(d, +1), e(d2, +1)))
                pm = tuple(a + b for a, b in zip(e(d, +1), e(d2, -1)))
                mp = tuple(a + b for a, b in zip(e(d, -1), e(d2, +1)))
                mm = tuple(a + b for a, b in zip(e(d, -1), e(d2, -1)))
                add(pp, vm)
                add(pm, -vm)
                add(mp, -vm)
                add(mm, vm)

            # First-derivative transport term (∂_d2 M_dd2) ∂_d u applied to
            # ±e_d (itkGridsHierarchy.hxx:447-473); includes d2 == d.
            dm = _tensor_derivative(_tensor_plane(tensor, d, d2), d2) * w
            add(e(d, +1), dm)
            add(e(d, -1), -dm)

    contrib = _reflect_boundaries(contrib, shape)

    offsets = stencil_offsets(ndim, radius=1)
    zeros = jnp.zeros(shape, dtype)
    coeffs = tuple(contrib.get(off, zeros) for off in offsets)
    return StencilOperator(coeffs, offsets)
