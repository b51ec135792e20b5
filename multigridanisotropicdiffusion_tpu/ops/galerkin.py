"""Galerkin (GCA) coarse-grid operator construction: ``A_c = R A_f P``.

The reference's (vestigial) ``CoarseGridOperatorsGenerator`` computed the
Galerkin operator column-by-column by interpolating a one-voxel impulse,
applying the fine operator, and restricting — with ~300 lines of hand-rolled
border cases (doc/html/itk_coarse_grid_operators_generator_8hxx_source.html:
370-780; cell-centered coarsening grows the stencil radius 1 -> 2, doc
hxx:410-427).

TPU-native approach: **comb probing**.  ``A_c`` is a stencil operator whose
per-dimension radius is 1 under vertex centering and 2 under cell centering
(support of R (.) A (.) P per dim: vertex 1+1+1 fine cells -> coarse +-1; cell
{-1..2}+{-1..1}+{-1..2} -> coarse {-2..2}).  Probing with comb vectors — 1 on
every coarse point congruent to a phase modulo ``m_d = 2 r_d + 1`` per dim —
makes the columns of ``A_c`` non-overlapping, so ONE application of
``restrict(apply(prolong(comb)))`` recovers one entry of every row exactly:

    w_phase[J] = sum_{J' == phase (mod m)} A_c[J, J' - J]  =  A_c[J, O]
    with O = the unique offset in [-r, r] with (J + O) == phase (mod m).

Out-of-range couplings contribute nothing (no comb point there), so boundary
rows come out exactly right with no special-casing — every border subtlety is
inherited from the production ``restrict``/``prolong``/``apply_stencil``.
Cost: prod(m_d) probes (27 in 3D vertex, 125 in 3D cell) of one fine-level
stencil apply each — setup-only, amortized over all smoother sweeps.
"""

from __future__ import annotations

import itertools
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..core.grids import CELL
from ..core.stencil import StencilOperator
from ..ops.transfer import coarse_size, prolong, restrict


def galerkin_offsets(centering: Sequence[str]):
    """Offset table for the Galerkin coarse operator: per-dim radius 1
    (vertex) or 2 (cell), full product (no corner dropping — mixed R/P terms
    populate them)."""
    radii = tuple(2 if c == CELL else 1 for c in centering)
    return tuple(
        itertools.product(*[range(-r, r + 1) for r in radii])
    ), radii


def assemble_galerkin(
    fine_op: StencilOperator, centering: Sequence[str]
) -> StencilOperator:
    """Build ``A_c = R A_f P`` on the next-coarser grid."""
    fine_shape = fine_op.shape
    ndim = fine_op.ndim
    dtype = fine_op.dtype
    coarse_shape = tuple(
        coarse_size(s, c) for s, c in zip(fine_shape, centering)
    )

    offsets, radii = galerkin_offsets(centering)
    moduli = tuple(2 * r + 1 for r in radii)

    # One probe per phase: w[phase_index] has shape coarse_shape.
    probes = []
    # index grids for phase arithmetic, built once
    coords = [
        jnp.arange(s).reshape([-1 if d == i else 1 for i in range(ndim)])
        for d, s in enumerate(coarse_shape)
    ]
    for phase in itertools.product(*[range(m) for m in moduli]):
        comb = None
        for d in range(ndim):
            hit = (coords[d] % moduli[d]) == phase[d]
            comb = hit if comb is None else jnp.logical_and(comb, hit)
        v = comb.astype(dtype)
        w = restrict(fine_op.apply(prolong(v, centering)), centering)
        probes.append(w)

    # Stack phases and gather: plane_O[J] = W[phase(J + O)][J].
    w_stack = jnp.stack(probes)  # (prod(m), *coarse_shape)

    # phase index of coarse point J: sum_d ((J_d) % m_d) * stride_d
    strides = []
    acc = 1
    for m in reversed(moduli):
        strides.append(acc)
        acc *= m
    strides = tuple(reversed(strides))

    planes = []
    for off in offsets:
        idx = None
        for d in range(ndim):
            ph = (coords[d] + off[d]) % moduli[d]
            term = ph * strides[d]
            idx = term if idx is None else idx + term
        idx = jnp.broadcast_to(idx, coarse_shape)
        plane = jnp.take_along_axis(w_stack, idx[None], axis=0)[0]
        planes.append(plane)

    return StencilOperator(tuple(planes), offsets)
