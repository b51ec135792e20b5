"""Explicit halo-exchange smoothers: shard_map + ppermute, with optional
interior/boundary overlap and fused Pallas block kernels.

The default distribution path (:mod:`.sharding`) writes global-view ops and
lets XLA's SPMD partitioner insert halo exchanges.  This module is the
hand-scheduled alternative: each device owns a block, one-voxel face halos
move between ICI neighbors via ``lax.ppermute``, and the smoother runs on the
local block with its halo ring.  Both the generic stored
:class:`~..core.stencil.StencilOperator` and the compressed DCA operator
(:mod:`..ops.compressed`) are supported, the latter optionally through the
fused Pallas TPU kernels (:mod:`..ops.pallas_smoothers`).

With ``overlap=True`` the sweep is restructured for communication/compute
overlap: the full-block stencil contraction is computed against *zero* halos
— carrying no data dependency on any collective, so XLA's latency-hiding
scheduler runs it concurrently with the ppermutes — and once the halos
arrive, only the 1-voxel boundary slabs of the sharded dimensions are
recomputed with the true neighbor values and spliced in.  The slab recompute
is O(surface) vs the O(volume) interior, so the exposed communication cost is
just the splice.  The Pallas path is *always* overlapped: the kernel runs
with in-kernel shard-locally-masked coefficients (every cross-block term
dropped — see ``ops.pallas_smoothers._mask_local_shells``) and therefore
depends on no collective; the boundary slabs are then recomputed in XLA from
the exchanged halos and spliced in.

Semantics: ghost values outside the *global* domain are zero — exactly the
contract of the boundary-folded operators (out-of-range coefficients are
zero), and ``ppermute`` conveniently delivers zeros to shards with no source
neighbor.  Red-black parity is computed from *global* coordinates so coloring
is partition-invariant.

Requires every sharded axis to divide evenly (the same restriction as
:func:`..parallel.sharding.level_spec`; see :mod:`.padding` for the
pad-to-divisible wrapper).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec

from ..core.stencil import StencilOperator
from ..ops.compressed import CompressedDCAOperator

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _offdiag_terms(op):
    """The off-diagonal part of ``op`` as ``(offset, plane, sign)`` triples.

    Uniform term-list view over both operator representations: the stored
    operator contributes one plane per non-center offset; the compressed DCA
    operator contributes its face planes and four signed copies of each mixed
    plane (ops/compressed.py docstring)."""
    if isinstance(op, CompressedDCAOperator):
        ndim = op.ndim
        terms = []
        for d in range(ndim):
            e = [0] * ndim
            e[d] = 1
            terms.append((tuple(e), op.face_p[d], 1.0))
            e = [0] * ndim
            e[d] = -1
            terms.append((tuple(e), op.face_m[d], 1.0))
        k = 0
        for d in range(ndim):
            for d2 in range(d + 1, ndim):
                for s1 in (1, -1):
                    for s2 in (1, -1):
                        off = [0] * ndim
                        off[d] = s1
                        off[d2] = s2
                        terms.append((tuple(off), op.mixed[k], float(s1 * s2)))
                k += 1
        return tuple(terms)
    c = op.center_index
    return tuple(
        (off, op.coeffs[k], 1.0)
        for k, off in enumerate(op.offsets)
        if k != c
    )


def _op_radii(op) -> Tuple[int, ...]:
    """Per-dim stencil radius (static): 1 for the compressed DCA form, the
    max |offset| per dim for a stored operator (Galerkin coarse operators
    reach radius 2 under cell centering — the halo thickness must follow)."""
    if isinstance(op, CompressedDCAOperator):
        return (1,) * op.ndim
    return tuple(
        max(abs(off[d]) for off in op.offsets) for d in range(op.ndim)
    )


def _exchange_halos(
    x_local: jnp.ndarray, mesh: Mesh, spec: PartitionSpec,
    radii: Tuple[int, ...] = None,
):
    """Pad the local block by the stencil radius in every dimension:
    ``radii[d]``-thick neighbor faces via ppermute along sharded axes, zeros
    at global-domain borders.  Requires each sharded local dim >= its radius
    (one-hop exchange).  Nothing upstream ties ``min_local`` to the operator
    radius, so the trace-time check below is the real guard (reachable with
    min_local < 2 on an exact-Galerkin hierarchy); models.mad additionally
    validates the config combination early."""
    ndim = x_local.ndim
    if radii is None:
        radii = (1,) * ndim
    for d in range(ndim):
        r = radii[d]
        axis_name = spec[d] if d < len(spec) else None
        if axis_name is None:
            pad = [(0, 0)] * ndim
            pad[d] = (r, r)
            x_local = jnp.pad(x_local, pad)
            continue
        if x_local.shape[d] < r:
            raise ValueError(
                f"local block dim {d} ({x_local.shape[d]}) smaller than the "
                f"stencil radius {r}: raise min_local"
            )
        n = mesh.shape[axis_name]
        idx_lo = [slice(None)] * ndim
        idx_lo[d] = slice(0, r)
        idx_hi = [slice(None)] * ndim
        idx_hi[d] = slice(x_local.shape[d] - r, x_local.shape[d])
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


def _local_offdiag(
    op_local, x_pad: jnp.ndarray, radii: Tuple[int, ...] = None
) -> jnp.ndarray:
    """Off-diagonal stencil contraction on a halo-padded local block."""
    shape = op_local.shape
    if radii is None:
        radii = (1,) * len(shape)
    out = None
    for off, plane, sign in _offdiag_terms(op_local):
        sl = tuple(
            slice(r + o, r + o + s) for r, o, s in zip(radii, off, shape)
        )
        term = (sign * plane) * x_pad[sl] if sign != 1.0 else plane * x_pad[sl]
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


def _slab_slice(shape, d: int, lo: bool, t: int = 1):
    """Slice of the ``t``-thick boundary slab of dim ``d`` + its start pos."""
    pos = 0 if lo else shape[d] - t
    return tuple(
        slice(pos, pos + t) if dd == d else slice(None)
        for dd in range(len(shape))
    ), pos


def _local_offdiag_slab(
    op_local, x_pad: jnp.ndarray, d: int, lo: bool,
    radii: Tuple[int, ...] = None,
) -> jnp.ndarray:
    """Off-diagonal contraction for the ``radii[d]``-thick boundary slab of
    dim ``d`` (low or high side), read from the *fully halo-padded* local
    block — the complete, correct value for those cells (including corner
    terms that reference halos of other dimensions)."""
    shape = op_local.shape
    if radii is None:
        radii = (1,) * len(shape)
    t = radii[d]
    coeff_sl, pos = _slab_slice(shape, d, lo, t)
    out = None
    for off, plane, sign in _offdiag_terms(op_local):
        sl = tuple(
            slice(radii[dd] + pos + o, radii[dd] + pos + t + o)
            if dd == d
            else slice(radii[dd] + o, radii[dd] + o + s)
            for dd, (o, s) in enumerate(zip(off, shape))
        )
        term = sign * plane[coeff_sl] * x_pad[sl]
        out = term if out is None else out + term
    return out


def _offdiag_exchange(
    op_local,
    x_l: jnp.ndarray,
    mesh: Mesh,
    spec: PartitionSpec,
    overlap: bool,
) -> jnp.ndarray:
    """Off-diagonal contraction of the local block with true neighbor halos.

    ``overlap=False``: exchange first, then one contraction over the padded
    block (compute waits on communication).  ``overlap=True``: contract
    against zero halos immediately (correct everywhere except the radius-thick
    boundary slabs of device-sharded dims, since unsharded/global borders have
    exactly-zero folded coefficients — true for DCA *and* Galerkin operators,
    whose out-of-domain couplings receive no comb-point contribution), then
    recompute just those slabs from the received halos and splice them in.

    The halo thickness follows the operator's per-dim stencil radius
    (:func:`_op_radii`): 1 on DCA levels, 2 on cell-centered Galerkin levels.
    """
    ndim = x_l.ndim
    radii = _op_radii(op_local)
    if not overlap:
        return _local_offdiag(
            op_local, _exchange_halos(x_l, mesh, spec, radii), radii
        )

    # interior compute: zero halos, no collective in the dependency chain
    off = _local_offdiag(
        op_local, jnp.pad(x_l, [(r, r) for r in radii]), radii
    )
    x_pad = _exchange_halos(x_l, mesh, spec, radii)
    for d in _sharded_dims(mesh, spec, ndim):
        for lo in (True, False):
            slab = _local_offdiag_slab(op_local, x_pad, d, lo, radii)
            start = [0] * ndim
            start[d] = 0 if lo else x_l.shape[d] - radii[d]
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


def _origin_parity(shape_local: Tuple[int, ...], mesh: Mesh, spec: PartitionSpec):
    """Parity of the local block's global origin-coordinate sum (traced)."""
    acc = jnp.int32(0)
    for d, s in enumerate(shape_local):
        axis_name = spec[d] if d < len(spec) else None
        if axis_name is not None:
            acc = acc + lax.axis_index(axis_name) * s
    return acc % 2


def _shmap(mesh: Mesh, spec: PartitionSpec, fn):
    return _shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )


@functools.lru_cache(maxsize=64)
def make_halo_rbgs_sweep(mesh: Mesh, spec: PartitionSpec, overlap: bool = False):
    """Build a jittable red-black GS sweep with explicit halo exchange.

    Returns ``sweep(op, x, b) -> x'`` where all arrays (and operator planes)
    are sharded according to ``spec`` over ``mesh``.  ``op`` may be a stored
    :class:`StencilOperator` or a :class:`CompressedDCAOperator`.  Two
    exchanges per sweep: the black half-sweep needs the freshly updated red
    halos.  With ``overlap`` each half-sweep's interior contraction runs
    concurrently with its exchange (see :func:`_offdiag_exchange`).
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

        return _shmap(mesh, spec, local)(op, x, b)

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

        return _shmap(mesh, spec, local)(op, x, b)

    return sweep


@functools.lru_cache(maxsize=64)
def make_halo_chebyshev_smoother(
    mesh: Mesh, spec: PartitionSpec, degree: int | None = None,
    eig_ratio: float | None = None, overlap: bool = False,
):
    """Chebyshev polynomial smoother with explicit halo exchange.

    The easiest smoother to distribute: ``degree + 1`` full stencil applies,
    each one halo exchange (optionally overlapped), no coloring.  The only
    collective beyond the halos is a ``pmax`` making the Gershgorin bound
    ``lmax`` global — without it each shard would damp a *different*
    spectral band and the smoother would no longer equal its single-device
    counterpart (ops.smoothers.chebyshev_smoother)."""
    from ..ops.smoothers import CHEBYSHEV_DEGREE, CHEBYSHEV_EIG_RATIO

    degree = CHEBYSHEV_DEGREE if degree is None else degree
    eig_ratio = CHEBYSHEV_EIG_RATIO if eig_ratio is None else eig_ratio

    def smooth(op, x, b):
        def local(op_local, x_l, b_l):
            diag = op_local.diag
            lmax = jnp.max(1.0 + op_local.offdiag_abs_rowsum() / diag)
            for axis_name in mesh.axis_names:
                lmax = lax.pmax(lmax, axis_name)
            lmin = lmax / eig_ratio
            theta = 0.5 * (lmax + lmin)
            delta = 0.5 * (lmax - lmin)
            sigma = theta / delta

            def apply_full(v):
                off = _offdiag_exchange(op_local, v, mesh, spec, overlap)
                return diag * v + off

            r = b_l - apply_full(x_l)
            d = (r / diag) / theta
            rho = 1.0 / sigma
            x_out = x_l
            for _ in range(degree):
                x_out = x_out + d
                r = r - apply_full(d)
                rho_new = 1.0 / (2.0 * sigma - rho)
                d = rho_new * rho * d + (2.0 * rho_new / delta) * (r / diag)
                rho = rho_new
            return x_out + d

        return _shmap(mesh, spec, local)(op, x, b)

    return smooth


@functools.lru_cache(maxsize=64)
def make_halo_residual(mesh: Mesh, spec: PartitionSpec, overlap: bool = False):
    """``r = b - A x`` with explicit halo exchange."""

    def res(op, x, b):
        def local(op_local, x_l, b_l):
            off = _offdiag_exchange(op_local, x_l, mesh, spec, overlap)
            return b_l - off - op_local.diag * x_l

        return _shmap(mesh, spec, local)(op, x, b)

    return res


# ---------------------------------------------------------------------------
# Fused Pallas block kernels inside shard_map (the distributed fast path)
# ---------------------------------------------------------------------------

def _pallas_ok(op, x_l) -> bool:
    # max_radius=1: the shard-local masked kernels and the slab splice are
    # radius-1 only (exact-Galerkin radius-2 levels use the XLA halo path);
    # 3D only — the 2D kernels have no shard-local masked form
    from ..ops.pallas_smoothers import pallas_compatible, pallas_supports

    return x_l.ndim == 3 and pallas_compatible(op, max_radius=1) and \
        pallas_supports(tuple(x_l.shape), x_l.dtype.itemsize, op)


def _halfsweep_slab_fix(
    op_l, x_new, x_l, x_pad, b_l, red, color: int, mesh: Mesh,
    spec: PartitionSpec,
):
    """Recompute the half-sweep on the 1-voxel boundary slabs of sharded dims
    from exchanged halos and splice into the kernel output (whose masked
    contraction dropped every cross-block term there).  Overlapping slabs
    (block edges/corners) write identical full-contraction values, so the
    overwrites are idempotent.

    Radius-1 operators only (1-voxel halos/slabs are hardcoded); callers are
    gated by the dispatch, and the assert below makes the cross-module
    invariant fail loudly if ever reached with a wider stencil."""
    assert _op_radii(op_l) == (1,) * x_l.ndim, _op_radii(op_l)
    ndim = x_l.ndim
    for d in _sharded_dims(mesh, spec, ndim):
        for lo in (True, False):
            off = _local_offdiag_slab(op_l, x_pad, d, lo)
            sl, pos = _slab_slice(x_l.shape, d, lo)
            upd = (b_l[sl] - off) / op_l.diag[sl]
            # kernel color 0 updates global-even cells (red == True)
            new = jnp.where(red[sl] == (color == 0), upd, x_l[sl])
            start = [0] * ndim
            start[d] = pos
            x_new = lax.dynamic_update_slice(x_new, new, tuple(start))
    return x_new


@functools.lru_cache(maxsize=64)
def make_halo_pallas_rbgs_sweep(
    mesh: Mesh, spec: PartitionSpec, interpret: bool = False
):
    """Red-black GS sweep running the fused Pallas kernel on each local block.

    Per half-sweep: the kernel contracts with shard-locally-masked
    coefficients (no dependency on any collective — always overlapped with
    the ppermute exchange), then the boundary slabs are recomputed in XLA
    from the received halos and spliced in.  The kernel's local parity is
    rebased to global parity by flipping the color on odd-origin blocks.
    Blocks with no valid y-tiling (tiny coarse levels, 2D) fall back to the
    XLA halo contraction within the same shard_map.
    """
    from ..ops.pallas_smoothers import pallas_rbgs_halfsweep

    def sweep(op, x, b):
        def local(op_local, x_l, b_l):
            red = _global_parity(x_l.shape, mesh, spec)
            if not _pallas_ok(op_local, x_l):
                diag = op_local.diag
                for color in (True, False):
                    off = _offdiag_exchange(op_local, x_l, mesh, spec, True)
                    x_l = jnp.where(red == color, (b_l - off) / diag, x_l)
                return x_l

            flip = _origin_parity(x_l.shape, mesh, spec)
            for color in (0, 1):
                x_pad = _exchange_halos(x_l, mesh, spec)
                x_new = lax.cond(
                    flip == 0,
                    lambda x_=x_l, b_=b_l, c=color: pallas_rbgs_halfsweep(
                        op_local, x_, b_, c, interpret=interpret,
                        local_mask=True),
                    lambda x_=x_l, b_=b_l, c=color: pallas_rbgs_halfsweep(
                        op_local, x_, b_, 1 - c, interpret=interpret,
                        local_mask=True),
                )
                x_l = _halfsweep_slab_fix(
                    op_local, x_new, x_l, x_pad, b_l, red, color, mesh, spec
                )
            return x_l

        return _shmap(mesh, spec, local)(op, x, b)

    return sweep


@functools.lru_cache(maxsize=64)
def make_halo_pallas_residual(
    mesh: Mesh, spec: PartitionSpec, interpret: bool = False
):
    """``r = b - A x`` via the fused Pallas kernel on each local block, with
    boundary slabs recomputed from exchanged halos (see the sweep above)."""
    from ..ops.pallas_smoothers import pallas_residual

    def res(op, x, b):
        def local(op_local, x_l, b_l):
            if not _pallas_ok(op_local, x_l):
                off = _offdiag_exchange(op_local, x_l, mesh, spec, True)
                return b_l - off - op_local.diag * x_l

            # radius-1 halos/slabs are hardcoded below (see _halfsweep_slab_fix)
            assert _op_radii(op_local) == (1,) * x_l.ndim, _op_radii(op_local)
            r = pallas_residual(
                op_local, x_l, b_l, interpret=interpret, local_mask=True
            )
            x_pad = _exchange_halos(x_l, mesh, spec)
            ndim = x_l.ndim
            for d in _sharded_dims(mesh, spec, ndim):
                for lo in (True, False):
                    off = _local_offdiag_slab(op_local, x_pad, d, lo)
                    sl, pos = _slab_slice(x_l.shape, d, lo)
                    slab = b_l[sl] - off - op_local.diag[sl] * x_l[sl]
                    start = [0] * ndim
                    start[d] = pos
                    r = lax.dynamic_update_slice(r, slab, tuple(start))
            return r

        return _shmap(mesh, spec, local)(op, x, b)

    return res
