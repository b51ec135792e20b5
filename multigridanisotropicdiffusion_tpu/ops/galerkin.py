"""Galerkin (GCA) coarse-grid operator construction: ``A_c = R A_f P``.

The reference's (vestigial) ``CoarseGridOperatorsGenerator`` computed the
Galerkin operator column-by-column by interpolating a one-voxel impulse,
applying the fine operator, and restricting — with ~300 lines of hand-rolled
border cases (doc/html/itk_coarse_grid_operators_generator_8hxx_source.html:
370-780; cell-centered coarsening grows the stencil radius 1 -> 2, doc
hxx:410-427).

Two TPU-native assembly paths: **closed-form direct plane arithmetic**
(:mod:`.galerkin_direct` — per-dim banded pair kernels with
sum-factorization; the production path for large grids, ~20x faster than
probing at 256^3) and **comb probing** (below — the compact oracle used for
small grids and as the cross-check the direct path is tested against).

Comb probing: ``A_c`` is a stencil operator whose
per-dimension radius follows from the 1-D supports: with fine radius ``r_A``,
vertex coarsening gives ``(2 + r_A) // 2`` (1 for a 1-radius fine operator)
and cell coarsening ``(3 + r_A) // 2`` (2): the path identity is
``2*O = p + a - q`` with ``p``/``q`` in the prolongation/restriction fine
supports ({-1,0,1} vertex, {-1,0,1,2} cell relative to ``2J``) and
``a`` in the fine-operator offsets.  Radii therefore stabilize at 2 down any
level chain (cell of 2 -> 2, vertex of 2 -> 2) — a vertex coarsening of a
radius-2 operator genuinely has radius 2, NOT 1 (using 1 aliases offset -2
onto +1 modulo 3 and corrupts deep levels of mixed-centering chains).

Probing with comb vectors — 1 on every coarse point congruent to a phase
modulo ``m_d = 2 r_d + 1`` per dim — makes the columns of ``A_c``
non-overlapping, so ONE application of ``restrict(apply(prolong(comb)))``
recovers one entry of every row exactly:

    w_phase[J] = sum_{J' == phase (mod m)} A_c[J, J' - J]  =  A_c[J, O]
    with O = the unique offset in [-r, r] with (J + O) == phase (mod m).

Out-of-range couplings contribute nothing (no comb point there), so boundary
rows come out exactly right with no special-casing — every border subtlety is
inherited from the production ``restrict``/``prolong``/``apply_stencil``.
Cost: prod(m_d) probes (27 in 3D vertex, 125 in 3D cell) of one fine-level
stencil apply each — setup-only, amortized over all smoother sweeps.  Probes
run in vmapped batches (``lax.map(..., batch_size)``) so the fine operator's
coefficient planes stream from HBM once per *batch* instead of once per
probe (~10x less setup traffic than one-at-a-time probing).
"""

from __future__ import annotations

import itertools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grids import CELL
from ..core.stencil import StencilOperator, stencil_offsets
from ..ops.transfer import coarse_size, prolong, restrict

#: probes per vmapped batch: bounds peak memory at batch * fine-volume
#: while amortizing the fine-plane HBM reads across the batch.
PROBE_BATCH = 16

#: fine grids at or above this voxel count use the closed-form direct
#: assembly (ops.galerkin_direct) under method='auto': probing costs
#: prod(2r+1) full fine-grid applies and dominates setup at scale, while the
#: direct path is O(K) strided plane contractions; below the threshold the
#: compact probe program compiles faster and runtime is negligible.
#: (64^3 = 262144 still gains ~4x from direct assembly on TPU — the 256^3
#: hierarchy's level-2 transition probes at ~160 ms vs ~40 ms direct.)
DIRECT_MIN_FINE_VOXELS = 1 << 18


def galerkin_offsets(centering: Sequence[str], fine_radii: Sequence[int]):
    """Offset table for the Galerkin coarse operator.

    Per-dim coarse radius from the path identity ``2 O = p + a - q``
    (module docstring): ``(2 + r_A) // 2`` under vertex centering,
    ``(3 + r_A) // 2`` under cell.  Full product (no corner dropping —
    mixed R/P terms populate them)."""
    radii = tuple(
        (3 + r) // 2 if c == CELL else (2 + r) // 2
        for c, r in zip(centering, fine_radii)
    )
    return tuple(
        itertools.product(*[range(-r, r + 1) for r in radii])
    ), radii


def _structural_offsets(centering: Sequence[str], fine_offsets, radii):
    """Drop coarse offsets that are *structurally* zero: ``O`` is reachable
    iff some fine offset ``a`` satisfies ``2 O_d - a_d`` within the combined
    P/R 1-D support for every dim jointly ([-3, 3] cell, [-2, 2] vertex).
    The joint condition matters: the fine 19-point operator has no corners,
    so e.g. coarse (+-2, +-2, +-2) — which would need a fine corner — never
    receives a contribution (8 planes pruned in 3D, exactly).  Static in the
    offset table, hence jit-compatible (no data-dependent pruning)."""
    ndim = len(radii)
    span = tuple(3 if c == CELL else 2 for c in centering)
    out = []
    for off in itertools.product(*[range(-r, r + 1) for r in radii]):
        for a in fine_offsets:
            if all(abs(2 * off[d] - a[d]) <= span[d] for d in range(ndim)):
                out.append(off)
                break
    return tuple(out)


def _per_dim_radii(op: StencilOperator):
    return tuple(
        max(abs(off[d]) for off in op.offsets) for d in range(op.ndim)
    )


class _SpatialPart:
    """View of ``S = I - A`` (the ``dt*L`` part of ``A = I - dt*L``) as an
    applyable operator, for probing: same offsets/shape/dtype as ``A``."""

    def __init__(self, op):
        self._op = op
        self.offsets = op.offsets
        self.shape = op.shape
        self.ndim = op.ndim
        self.dtype = op.dtype

    def apply(self, v):
        return v - self._op.apply(v)


def stored_plane_terms(op):
    """``(offsets, planes)`` with one materialized coefficient plane per
    offset, for any operator with a plane form (stored, compressed, or the
    spatial-part view).  Raises TypeError for matrix-free operators (direct
    Galerkin assembly needs planes; callers fall back to probing)."""
    from .compressed import CompressedDCAOperator

    if isinstance(op, StencilOperator):
        return op.offsets, op.coeffs
    if isinstance(op, _SpatialPart):
        offsets, planes = stored_plane_terms(op._op)
        center = offsets.index((0,) * len(offsets[0]))
        out = [-p for p in planes]
        out[center] = 1.0 + out[center]
        return offsets, tuple(out)
    if isinstance(op, CompressedDCAOperator):
        ndim = op.ndim
        terms = {(0,) * ndim: op.diag_plane}
        for d in range(ndim):
            e = [0] * ndim
            e[d] = 1
            terms[tuple(e)] = op.face_p[d]
            e[d] = -1
            terms[tuple(e)] = op.face_m[d]
        k = 0
        for d in range(ndim):
            for d2 in range(d + 1, ndim):
                for s1 in (1, -1):
                    for s2 in (1, -1):
                        off = [0] * ndim
                        off[d] = s1
                        off[d2] = s2
                        terms[tuple(off)] = float(s1 * s2) * op.mixed[k]
                k += 1
        offsets = op.offsets  # stencil_offsets order
        return offsets, tuple(terms[off] for off in offsets)
    raise TypeError(
        f"no stored plane form for {type(op).__name__} (matrix-free "
        "operators must use the probe path)"
    )


def collapse_to_radius1(op: StencilOperator) -> StencilOperator:
    """Collapse a wider stencil onto radius-1 support by lumping every
    coefficient onto the component-wise clipped offset (AMG-style stencil
    collapsing).  Row sums are preserved exactly, and the boundary invariant
    — coefficients of out-of-range offsets are exactly zero — survives: if
    ``J + clip(O)`` leaves the grid in some dim, so does ``J + O``, so the
    lumped contribution was already zero there.  The result is a full
    radius-1 stencil (27-point in 3D: clipped mixed terms populate corners).

    This is the ``galerkin_variant='collapsed'`` fast path: radius-1 coarse
    operators keep 19->27 planes per level instead of up to 125, stay on the
    1-voxel halo exchange, and qualify for the fused Pallas sweep; the
    perturbation is the (small) radius-2 Galerkin mass, moved one cell
    inward with its row sum intact.  Convergence parity with the exact
    operator is regression-tested (tests/test_galerkin_direct.py)."""
    ndim = op.ndim
    if op.radius <= 1:
        return op
    acc = {}
    for off, plane in zip(op.offsets, op.coeffs):
        tgt = tuple(max(-1, min(1, o)) for o in off)
        acc[tgt] = plane if tgt not in acc else acc[tgt] + plane
    offsets = stencil_offsets(ndim, 1, drop_corners=False)
    offsets = tuple(off for off in offsets if off in acc)
    return StencilOperator(tuple(acc[off] for off in offsets), offsets)


def prune_stored_operator(op: StencilOperator, tol: float) -> StencilOperator:
    """Drop coefficient planes whose ``max |c| < tol * max |diag|``, lumping
    each dropped plane onto its component-wise clipped radius-1 offset — row
    sums are preserved exactly and the boundary invariant survives (the
    :func:`collapse_to_radius1` argument).  ``tol=0`` returns ``op``.

    Data-dependent: the keep decision reads the per-plane maxima on the host
    (a K-scalar transfer), so this runs OUTSIDE jit — downstream jitted
    consumers retrace per resulting offset structure.  Measured on random
    SPD hierarchies: the exact Galerkin operator has NO numerically-zero
    planes (none below 1e-8 relative), so pruning is a lossy speed/accuracy
    knob, not free lunch — at 1e-4 it keeps 57-80% of the planes, and
    matching the collapsed variant's cost needs 1e-2-level lumping.
    """
    if tol <= 0 or op.radius <= 1:
        return op
    import numpy as np

    maxes = np.asarray(
        jax.jit(lambda cs: jnp.stack([jnp.max(jnp.abs(c)) for c in cs]))(
            op.coeffs
        )
    )
    center = op.center_index
    floor = float(tol) * float(maxes[center])
    acc = {}
    zero = (0,) * op.ndim

    def add(off, plane):
        acc[off] = plane if off not in acc else acc[off] + plane

    for k, (off, plane) in enumerate(zip(op.offsets, op.coeffs)):
        if k == center or off == zero or maxes[k] >= floor:
            add(off, plane)
        else:
            add(tuple(max(-1, min(1, o)) for o in off), plane)
    # deterministic order: original offsets first, then any new lump targets
    offsets = [off for off in op.offsets if off in acc]
    offsets += [off for off in acc if off not in set(offsets)]
    return StencilOperator(tuple(acc[off] for off in offsets), tuple(offsets))


def _resolve_method(fine_op, method: str) -> str:
    if method == "auto":
        try:
            stored_plane_terms(fine_op)
        except TypeError:
            return "probe"
        voxels = 1
        for s in fine_op.shape:
            voxels *= s
        return "direct" if voxels >= DIRECT_MIN_FINE_VOXELS else "probe"
    if method not in ("probe", "direct"):
        raise ValueError(f"unknown Galerkin assembly method: {method!r}")
    return method


def assemble_galerkin_parabolic(
    fine_op,
    centering: Sequence[str],
    probe_batch: int = PROBE_BATCH,
    method: str = "auto",
    collapse: bool = False,
) -> StencilOperator:
    """Galerkin-coarsen the *spatial* part of the implicit-Euler operator:
    ``A_c = I - R (I - A_f) P`` (exact identity + Galerkin ``dt*L``).

    The literal triple product ``R A_f P`` of ``A = I - dt*L`` degrades down
    deep chains: the identity's Galerkin image ``R P`` is a mass-matrix-like
    smearing whose off-diagonal weight compounds per level, and by the 5th
    coarsening the operator has sum|offdiag|/diag ~ 4-5.  Parallel colored
    Gauss-Seidel/Jacobi smoothers (which treat same-color couplings
    Jacobi-style) DIVERGE on such operators (~2.5x residual growth per sweep,
    measured on the 256^3 six-level chain) even though sequential
    lexicographic GS — the reference's smoother — would still converge on the
    SPD system.  Coarsening only ``dt*L`` and keeping the time-stepping
    identity exact on every level is the standard parabolic-multigrid cure:
    row sums stay 1, off-diagonal mass stays bounded by the (shrinking)
    coarse-grid ``dt*L``, smoothers stay contractive, and the correction
    quality matches Galerkin on the smooth modes that matter (``R P = I`` on
    the constants/linears the transfers reproduce exactly).

    Accepts any operator with ``apply``/``offsets`` (stored, compressed,
    matrix-free); returns a stored :class:`StencilOperator`.

    ``method``: 'probe' (comb probing), 'direct' (closed-form plane
    arithmetic, ops.galerkin_direct), or 'auto' (direct above
    DIRECT_MIN_FINE_VOXELS).  ``collapse`` lumps the coarsened ``dt*L`` onto
    radius-1 support (:func:`collapse_to_radius1`) before re-adding the exact
    identity — the fast-sweep variant.
    """
    s_c = assemble_galerkin(_SpatialPart(fine_op), centering, probe_batch,
                            method)
    if collapse:
        s_c = collapse_to_radius1(s_c)
    planes = [-p for p in s_c.coeffs]
    center = s_c.offsets.index((0,) * s_c.ndim)
    planes[center] = planes[center] + 1.0
    return StencilOperator(tuple(planes), s_c.offsets)


def assemble_galerkin(
    fine_op: StencilOperator,
    centering: Sequence[str],
    probe_batch: int = PROBE_BATCH,
    method: str = "auto",
) -> StencilOperator:
    """Build the literal triple product ``A_c = R A_f P`` on the next-coarser
    grid (use :func:`assemble_galerkin_parabolic` for implicit-Euler
    hierarchies — see its docstring for why the literal product diverges under
    colored smoothers on deep chains)."""
    fine_shape = fine_op.shape
    ndim = fine_op.ndim
    dtype = fine_op.dtype
    coarse_shape = tuple(
        coarse_size(s, c) for s, c in zip(fine_shape, centering)
    )

    offsets, radii = galerkin_offsets(centering, _per_dim_radii(fine_op))
    offsets = _structural_offsets(centering, fine_op.offsets, radii)

    if _resolve_method(fine_op, method) == "direct":
        from .galerkin_direct import assemble_galerkin_direct

        fine_offsets, fine_planes = stored_plane_terms(fine_op)
        return assemble_galerkin_direct(
            fine_offsets, fine_planes, tuple(centering), offsets, radii
        )

    moduli = tuple(2 * r + 1 for r in radii)

    # index grids for phase arithmetic, built once
    coords = [
        jnp.arange(s).reshape([-1 if d == i else 1 for i in range(ndim)])
        for d, s in enumerate(coarse_shape)
    ]

    # One probe per phase, in vmapped batches: each batch streams the fine
    # coefficient planes once for `probe_batch` probes.
    phases = np.asarray(
        list(itertools.product(*[range(m) for m in moduli])), dtype=np.int32
    )

    def probe(phase):
        comb = None
        for d in range(ndim):
            hit = (coords[d] % moduli[d]) == phase[d]
            comb = hit if comb is None else jnp.logical_and(comb, hit)
        v = comb.astype(dtype)
        # lane_mm=False: the probe path must stay partitionable (a lane-mm /
        # Pallas transfer is an unpartitionable pallas_call under GSPMD), and
        # assembly-time probes are not a hot path.
        return restrict(
            fine_op.apply(prolong(v, centering, lane_mm=False)),
            centering, lane_mm=False,
        )

    w_stack = jax.lax.map(
        probe, jnp.asarray(phases), batch_size=min(probe_batch, len(phases))
    )  # (prod(m), *coarse_shape)

    # Gather planes: plane_O[J] = W[phase(J + O)][J].
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
