"""Multigrid anisotropic-diffusion solver (the MAD filter).

TPU-native counterpart of
``itk::MultigridAnisotropicDiffusionImageFilter``
(/root/reference/include/itkMultigridAnisotropicDiffusionImageFilter.h:123-160,
.hxx:104-515): implicit-Euler time stepping for ``∂t u = div(M ∇u)``, where
each time step solves ``A u^{n+1} = u^n`` with ``A = Id - dt*L`` by geometric
multigrid.

Architecture differences from the reference (deliberate, TPU-first):

* The level list is static host-side metadata; the V-cycle recursion is
  *unrolled* at trace time, so the entire solve — all levels, smoother sweeps,
  transfers, the coarsest LU solve, and the outer tolerance loop — compiles to
  a single XLA program per (shape, config).
* The outer convergence loop is a ``lax.while_loop`` carrying the solution and
  a preallocated residual-history buffer; the residual is computed once per
  cycle (the reference recomputes residual + norm after *every* smoother
  iteration purely for verbose logging, .hxx:389-399 — wasteful, not
  replicated).
* Gauss-Seidel is red-black (two parallel half-sweeps) instead of
  lexicographic; the convergence contract (relative residual below tolerance
  within max_cycles) is unchanged.
* Precision is configurable: float64 reproduces the reference's all-double
  numerics (tests), float32/bfloat16 are the TPU performance path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.grids import GridLevel, build_level_descriptors
from ..core.symfield import as_sym_planes
from ..core.stencil import StencilOperator, l2_norm, residual
from ..ops.coarse import CoarseSolver, build_coarse_solver, coarse_solve
from ..ops.dca import assemble_dca
from ..ops.galerkin import assemble_galerkin_parabolic
from ..ops.smoothers import DEFAULT_JACOBI_WEIGHT, make_residual, make_smoother
from ..ops.transfer import prolong, restrict, restrict_tensor

VCYCLE = "vcycle"
FMG = "fmg"
SMOOTHER = "smoother"

DCA = "dca"
GALERKIN = "galerkin"


@dataclasses.dataclass(frozen=True)
class MADConfig:
    """Solver parameters, mirroring the reference's setter surface and defaults
    (itkMultigridAnisotropicDiffusionImageFilter.hxx:38-49)."""

    time_step: float = 0.01
    number_of_steps: int = 1
    cycle: str = VCYCLE
    iterations_per_grid: int = 2
    tolerance: float = 1e-6
    max_cycles: int = 100
    smoother: str = "gauss_seidel"
    jacobi_weight: float = DEFAULT_JACOBI_WEIGHT
    coarse_operator: str = DCA
    #: Galerkin coarse-operator variant (coarse_operator='galerkin' only):
    #:   'collapsed' — each level's coarsened dt*L is lumped onto radius-1
    #:                 support with exact row sums (ops.galerkin.
    #:                 collapse_to_radius1) before re-adding the identity:
    #:                 27 planes per level, 1-voxel halos, Pallas-eligible
    #:                 sweeps — the production default (solve ~1.1x the DCA
    #:                 hierarchy at 256^3 vs ~1.7x for 'exact').  Convergence
    #:                 parity with 'exact' is regression-tested
    #:                 (tests/test_galerkin_direct.py).
    #:   'exact'     — the full R (I - A_f) P product (radius grows to 2
    #:                 under cell centering: up to 117/125 coefficient
    #:                 planes per coarse level); the oracle-grade variant,
    #:                 bit-faithful to the reference's documented GCA option.
    galerkin_variant: str = "collapsed"
    #: exact-Galerkin plane pruning (galerkin_variant='exact' only): drop
    #: coarse-level coefficient planes below this fraction of the diagonal's
    #: maximum, lumping each onto its clipped radius-1 offset (row sums
    #: exact; ops.galerkin.prune_stored_operator).  0 (default) keeps the
    #: operator bit-exact.  Measured: no plane of the exact operator is
    #: numerically zero (none below 1e-8 relative), so this is a
    #: speed/accuracy knob — 1e-4 trims 20-55% of the planes with
    #: convergence parity (regression-tested).
    galerkin_prune_tol: float = 0.0
    #: DCA operator representation per level (coarse_operator='galerkin'
    #: levels are always stored):
    #:   'stored'      — K coefficient planes (19 in 3D), the general form;
    #:   'compressed'  — 10 planes in 3D exploiting DCA structure, ~1.6x less
    #:                   HBM traffic per sweep (see ops.compressed);
    #:   'matrix_free' — apply from the 6 tensor planes, minimal memory
    #:                   (see ops.matfree).
    #: All three are numerically identical up to summation order.
    operator_repr: str = "stored"
    #: deprecated alias for operator_repr='matrix_free'.
    matrix_free: bool = False
    #: route 3D Gauss-Seidel sweeps through the fused Pallas TPU kernels
    #: (~2.3x the XLA sweep): the compressed DCA operator and any radius-1
    #: stored operator (collapsed Galerkin levels) qualify.  With a mesh,
    #: applies on the
    #: halo='shard_map'/'overlap' path (per-block kernels inside shard_map,
    #: overlapped with the ppermute exchange); ignored under halo='gspmd'
    #: (the compiler-partitioned path cannot host hand-written kernels).
    use_pallas: bool = False
    #: distribution strategy when a mesh is given (ignored otherwise):
    #:   'gspmd'     — global-view ops + sharding constraints; XLA's SPMD
    #:                 partitioner inserts the halo exchanges;
    #:   'shard_map' — explicit per-block sweeps, ppermute halo exchange
    #:                 before each contraction (parallel.halo);
    #:   'overlap'   — like shard_map, but the interior contraction runs
    #:                 concurrently with the exchange and only the 1-voxel
    #:                 boundary slabs wait on the halos.
    #: shard_map/overlap require operator_repr='stored' or 'compressed' and a
    #: GS/Jacobi/Chebyshev smoother (compressed + use_pallas = the
    #: distributed fast path).
    halo: str = "gspmd"
    #: print the per-cycle relative-residual trace to stdout (reference
    #: SetVerbose, itkMultigridAnisotropicDiffusionImageFilter.h:154-158).
    #: Pure logging — never changes the computation: the production solver
    #: records one residual per outer cycle (already returned in
    #: ``MADResult.residual_history``) and prints it host-side after each
    #: step.  The reference's full per-level/per-iteration trace is the
    #: eager :func:`..models.trace.mad_diffusion_verbose` path.
    verbose: bool = False
    #: mixed-precision defect correction: when set (e.g. 'bfloat16'), each
    #: outer cycle computes the residual in the solve dtype against the exact
    #: operator and runs the entire inner V-cycle/FMG/smoother on the defect
    #: in this dtype with a low-precision copy of the hierarchy.  The inner
    #: precision only caps the per-cycle contraction factor (~1e-3 for bf16);
    #: convergence is to the full-precision solution.  bf16 halves the
    #: smoother's HBM traffic.
    defect_dtype: str | None = None
    #: precision schedule for the defect cycles: once the relative residual
    #: drops below ``tolerance * defect_switch_factor``, inner cycles run in
    #: the full solve precision instead of ``defect_dtype`` — a
    #: full-precision cycle contracts ~5-10x harder than a bf16 one near the
    #: end, often finishing in one cycle where bf16 would need two (measured
    #: 512^3: 3 bf16 cycles -> 1 bf16 + 1 f32, ~14% faster).  0 disables the
    #: switch (pure low-precision inner cycles).  Ignored without
    #: ``defect_dtype``.
    defect_switch_factor: float = 2000.0

    def __post_init__(self):
        if self.cycle not in (VCYCLE, FMG, SMOOTHER):
            raise ValueError(f"unknown cycle type: {self.cycle!r}")
        if self.coarse_operator not in (DCA, GALERKIN):
            raise ValueError(f"unknown coarse operator: {self.coarse_operator!r}")
        if self.galerkin_variant not in ("exact", "collapsed"):
            raise ValueError(
                f"unknown galerkin_variant: {self.galerkin_variant!r}"
            )
        if self.operator_repr not in ("stored", "compressed", "matrix_free"):
            raise ValueError(f"unknown operator_repr: {self.operator_repr!r}")
        if self.halo not in ("gspmd", "shard_map", "overlap"):
            raise ValueError(f"unknown halo mode: {self.halo!r}")
        if self.defect_dtype is not None:
            jnp.dtype(self.defect_dtype)  # must name a dtype

    @property
    def effective_operator_repr(self) -> str:
        return "matrix_free" if self.matrix_free else self.operator_repr

    @classmethod
    def tpu(cls, mixed_precision: bool = True, **kw) -> "MADConfig":
        """The TPU fast path: compressed operator + fused Pallas sweeps
        (+ bf16 inner defect cycles unless ``mixed_precision=False``).  With a
        mesh the sweeps run per-block inside shard_map, overlapped with the
        ppermute halo exchange (halo='overlap').  Keyword overrides pass
        through to the constructor."""
        kw.setdefault("operator_repr", "compressed")
        kw.setdefault("use_pallas", True)
        kw.setdefault("halo", "overlap")
        if mixed_precision:
            kw.setdefault("defect_dtype", "bfloat16")
        return cls(**kw)


class Hierarchy(NamedTuple):
    """Device-resident multigrid setup products: one stencil operator per
    level plus the cached coarsest-level LU factorization."""

    operators: Tuple[StencilOperator, ...]
    solver: CoarseSolver


def build_hierarchy(
    tensor,
    levels: Tuple[GridLevel, ...],
    time_step: float,
    coarse_operator: str = DCA,
    operator_repr: str = "stored",
    galerkin_variant: str = "collapsed",
    lane_mm: bool = True,
) -> Hierarchy:
    """Assemble the per-level operators (setup phase — runs once per tensor).

    DCA re-discretizes from level-wise restricted tensor coefficients
    (itkGridsHierarchy.hxx:110-201); Galerkin computes ``A_c = R A_f P``
    directly from the fine operator (the reference's documented GCA option,
    doc/html/itk_coarse_grid_operators_generator_8hxx_source.html).

    ``operator_repr`` selects how DCA levels are represented (stored /
    compressed / matrix_free, see MADConfig); the coarsest level is always
    additionally materialized in stored form to build the dense LU.
    """
    if operator_repr == "matrix_free":
        from ..ops.matfree import MatrixFreeDCAOperator

        make_op = lambda t, lvl: MatrixFreeDCAOperator(t, lvl.spacing, time_step)
    elif operator_repr == "compressed":
        from ..ops.compressed import assemble_compressed_dca

        def make_op(t, lvl):
            # fused Pallas assembly: the setup whale at 512^3 (~6x the XLA
            # shifted-slice form).  lane_mm doubles as the "single device"
            # flag — a pallas_call cannot be partitioned by GSPMD.
            if lane_mm and jax.default_backend() == "tpu" and len(lvl.shape) == 3:
                from ..ops.pallas_assemble import (
                    pallas_assemble_compressed_dca,
                    pallas_assemble_supported,
                )

                if pallas_assemble_supported(
                    tuple(lvl.shape), jnp.dtype(t[0].dtype).itemsize
                ):
                    return pallas_assemble_compressed_dca(
                        t, lvl.spacing, time_step
                    )
            return assemble_compressed_dca(t, lvl.spacing, time_step)
    else:
        make_op = lambda t, lvl: assemble_dca(t, lvl.spacing, time_step)

    ops = [make_op(tensor, levels[0])]
    if coarse_operator == GALERKIN:
        # A_c = I - R (I - A_f) P: Galerkin dt*L + exact time-stepping
        # identity per level.  The literal R A P of the full operator loses
        # diagonal dominance down deep chains and makes colored smoothers
        # diverge (see ops.galerkin.assemble_galerkin_parabolic).
        collapse = galerkin_variant == "collapsed"
        for lvl in levels[1:]:
            ops.append(
                assemble_galerkin_parabolic(
                    ops[-1], lvl.centering, collapse=collapse
                )
            )
        coarsest_stored = ops[-1]
        if not isinstance(coarsest_stored, StencilOperator):
            coarsest_stored = assemble_dca(tensor, levels[-1].spacing, time_step)
    else:
        t = tensor
        for lvl in levels[1:]:
            t = restrict_tensor(t, lvl.centering, lane_mm=lane_mm)
            ops.append(make_op(t, lvl))
        if operator_repr == "stored":
            coarsest_stored = ops[-1]
        else:
            coarsest_stored = assemble_dca(t, levels[-1].spacing, time_step)
    solver = build_coarse_solver(coarsest_stored)
    return Hierarchy(operators=tuple(ops), solver=solver)


def _no_constraint(level: int, x: jnp.ndarray) -> jnp.ndarray:
    return x


class Transfers(NamedTuple):
    """Level-aware inter-grid hooks used by the cycles.

    ``restrict(r, fine_level)`` maps a field at ``fine_level`` down one
    level; ``prolong(ec, fine_level)`` maps a field at ``fine_level + 1`` up;
    ``solve_coarse(solver, b, level)`` runs the coarsest direct solve.  The
    standard implementation applies ops.transfer / ops.coarse directly; the
    padded-distribution variant (parallel.padding) crops to the true level
    shape, applies the standard operator, and re-pads.
    """

    restrict: object
    prolong: object
    solve_coarse: object


def _standard_transfers(
    levels: Tuple[GridLevel, ...], lane_mm: bool = True
) -> Transfers:
    """``lane_mm=False`` keeps the minor-axis transfers in pure slice form —
    required under a mesh, where the lane-tile reshape of the matmul path
    would make the SPMD partitioner regather the sharded minor axis."""
    return Transfers(
        restrict=lambda r, fl: restrict(
            r, levels[fl + 1].centering, lane_mm=lane_mm
        ),
        prolong=lambda ec, fl: prolong(
            ec, levels[fl + 1].centering, lane_mm=lane_mm
        ),
        solve_coarse=lambda solver, b, level: coarse_solve(solver, b),
    )


def _padded_transfers(
    levels: Tuple[GridLevel, ...], pshapes: Tuple[Tuple[int, ...], ...]
) -> Transfers:
    """Transfers for the pad-to-divisible distributed solve: every level
    array lives in its mesh-divisible embedding (parallel.padding); transfers
    crop to the true shape, apply the standard operator, and re-pad (pad
    cells are exactly zero throughout, so this is the unpadded math)."""
    from ..parallel.padding import crop_field, pad_field

    def rest(r, fl):
        rc = restrict(crop_field(r, levels[fl].shape), levels[fl + 1].centering,
                      lane_mm=False)
        return pad_field(rc, pshapes[fl + 1])

    def prol(ec, fl):
        e = prolong(
            crop_field(ec, levels[fl + 1].shape), levels[fl + 1].centering,
            lane_mm=False,
        )
        return pad_field(e, pshapes[fl])

    def solvec(solver, b, level):
        x = coarse_solve(solver, crop_field(b, levels[level].shape))
        return pad_field(x, pshapes[level])

    return Transfers(restrict=rest, prolong=prol, solve_coarse=solvec)


def v_cycle(
    hier: Hierarchy,
    levels: Tuple[GridLevel, ...],
    smooth,
    iterations_per_grid: int,
    x: jnp.ndarray,
    b: jnp.ndarray,
    level: int = 0,
    constrain=_no_constraint,
    resid=residual,
    transfers: Transfers | None = None,
) -> jnp.ndarray:
    """One V-cycle starting at ``level`` (reference VCycle, .hxx:341-493).

    At the coarsest level the initial guess is ignored and the rhs is solved
    directly (.hxx:356-370).  ``constrain(level, array)`` optionally pins the
    per-level sharding (SPMD distribution / coarse-grid agglomeration).
    """
    if transfers is None:
        transfers = _standard_transfers(levels)
    coarsest = len(levels) - 1
    if level == coarsest:
        return constrain(level, transfers.solve_coarse(hier.solver, b, level))

    op = hier.operators[level]
    for _ in range(iterations_per_grid):
        x = smooth(op, x, b)
    r = resid(op, x, b)

    rc = constrain(level + 1, transfers.restrict(r, level))
    ec = v_cycle(
        hier, levels, smooth, iterations_per_grid, jnp.zeros_like(rc), rc,
        level + 1, constrain, resid, transfers,
    )
    x = constrain(level, x + transfers.prolong(ec, level))

    for _ in range(iterations_per_grid):
        x = smooth(op, x, b)
    return x


def full_multigrid(
    hier: Hierarchy,
    levels: Tuple[GridLevel, ...],
    smooth,
    iterations_per_grid: int,
    b: jnp.ndarray,
    level: int = 0,
    constrain=_no_constraint,
    resid=residual,
    transfers: Transfers | None = None,
) -> jnp.ndarray:
    """Full multigrid initialization (reference FullMultiGrid, .hxx:300-338)."""
    if transfers is None:
        transfers = _standard_transfers(levels)
    coarsest = len(levels) - 1
    if level == coarsest:
        x = jnp.zeros_like(b)
        for _ in range(iterations_per_grid):
            x = v_cycle(hier, levels, smooth, iterations_per_grid, x, b, level,
                        constrain, resid, transfers)
        return x

    bc = constrain(level + 1, transfers.restrict(b, level))
    xc = full_multigrid(hier, levels, smooth, iterations_per_grid, bc, level + 1,
                        constrain, resid, transfers)
    x = constrain(level, transfers.prolong(xc, level))
    for _ in range(iterations_per_grid):
        x = v_cycle(hier, levels, smooth, iterations_per_grid, x, b, level,
                    constrain, resid, transfers)
    return x


class MADResult(NamedTuple):
    output: jnp.ndarray
    #: (number_of_steps, max_cycles) relative residual after each cycle
    #: (entries past the converged cycle repeat the final value's padding 0).
    residual_history: jnp.ndarray
    #: (number_of_steps,) cycles used per time step.
    num_cycles: jnp.ndarray
    #: (number_of_steps,) final relative residual per time step.
    final_residual: jnp.ndarray


def _solve_time_step(
    hier: Hierarchy,
    levels: Tuple[GridLevel, ...],
    config: MADConfig,
    b: jnp.ndarray,
    constrain=_no_constraint,
    smooth=None,
    resid=None,
    transfers: Transfers | None = None,
):
    """One implicit time step: iterate cycles until the relative L2 residual
    falls below tolerance or max_cycles is hit (do-while, .hxx:207-246)."""
    pallas_ok = config.use_pallas and constrain is _no_constraint
    if smooth is None:
        smooth = make_smoother(
            config.smoother, config.jacobi_weight, use_pallas=pallas_ok
        )
    if resid is None:
        resid = make_residual(use_pallas=pallas_ok)
    if transfers is None:
        # single-device solves get the minor-axis matmul transfers; under a
        # mesh (constrain pins shardings) stay in slice form — the matmul
        # path's lane-tile reshape would regather the sharded minor axis
        transfers = _standard_transfers(
            levels, lane_mm=constrain is _no_constraint
        )
    if config.defect_dtype is not None:
        return _solve_time_step_defect(
            hier, levels, config, b, constrain, smooth, resid, transfers
        )
    op0 = hier.operators[0]
    dtype = b.dtype

    b = constrain(0, b)
    rhs_norm = l2_norm(b)

    if config.cycle == FMG:
        x0 = full_multigrid(
            hier, levels, smooth, config.iterations_per_grid, b, 0, constrain,
            resid, transfers,
        )
    else:
        x0 = b  # previous step's solution as initial guess (.hxx:180-201)

    def one_cycle(x):
        if config.cycle == SMOOTHER:
            return smooth(op0, x, b)
        return v_cycle(
            hier, levels, smooth, config.iterations_per_grid, x, b, 0,
            constrain, resid, transfers,
        )

    def cond(carry):
        x, k, relres, hist = carry
        return jnp.logical_and(relres > config.tolerance, k < config.max_cycles)

    def body(carry):
        x, k, _, hist = carry
        x = one_cycle(x)
        relres = l2_norm(resid(op0, x, b)) / rhs_norm
        hist = hist.at[k].set(relres)
        return x, k + 1, relres, hist

    hist0 = jnp.zeros((config.max_cycles,), dtype)
    init = (x0, jnp.int32(0), jnp.asarray(jnp.inf, dtype), hist0)
    x, k, relres, hist = jax.lax.while_loop(cond, body, init)
    return x, k, relres, hist


def _cast_operators(hier: Hierarchy, dtype) -> Hierarchy:
    """Low-precision copy of the per-level operators (the coarsest LU stays in
    the factorization precision; coarse_solve casts at its boundary)."""
    ops = tuple(
        jax.tree.map(lambda a: a.astype(dtype), op) for op in hier.operators
    )
    return Hierarchy(operators=ops, solver=hier.solver)


def _solve_time_step_defect(
    hier: Hierarchy,
    levels: Tuple[GridLevel, ...],
    config: MADConfig,
    b: jnp.ndarray,
    constrain,
    smooth,
    resid,
    transfers: Transfers | None = None,
):
    """Mixed-precision defect correction: ``x += cycle_lo(0, b - A x)``.

    The outer residual uses the exact full-precision operator, so the inner
    cycle's precision (``config.defect_dtype``) only bounds the per-cycle
    error-contraction factor, not the attainable residual — the standard
    low/high-precision multigrid structure for accelerators.  Note the plain
    path's ``V(x, b)`` and this ``x + V(0, b - A x)`` are the same linear
    iteration in exact arithmetic.
    """
    lo = jnp.dtype(config.defect_dtype)
    dtype = b.dtype
    op0 = hier.operators[0]
    hier_lo = _cast_operators(hier, lo)
    op0_lo = hier_lo.operators[0]

    b = constrain(0, b)
    rhs_norm = l2_norm(b)

    def inner_lo(r):
        r_lo = constrain(0, r.astype(lo))
        if config.cycle == SMOOTHER:
            d = smooth(op0_lo, jnp.zeros_like(r_lo), r_lo)
        else:
            d = v_cycle(
                hier_lo, levels, smooth, config.iterations_per_grid,
                jnp.zeros_like(r_lo), r_lo, 0, constrain, resid, transfers,
            )
        return d.astype(dtype)

    def inner_hi(r):
        if config.cycle == SMOOTHER:
            return smooth(hier.operators[0], jnp.zeros_like(r), r)
        return v_cycle(
            hier, levels, smooth, config.iterations_per_grid,
            jnp.zeros_like(r), r, 0, constrain, resid, transfers,
        )

    switch = float(config.defect_switch_factor)

    def inner(r, relres):
        if switch <= 0.0:
            return inner_lo(r)
        # precision schedule: a full-precision cycle contracts ~5-10x harder
        # than a bf16 one, so spend it exactly when it can FINISH the solve
        # and a low-precision cycle cannot — i.e. when the residual sits in
        # the window (tol * switch/20, tol * switch].  Below the window a
        # cheap low-precision cycle already reaches tolerance; above it even
        # a full-precision cycle will not, so save the cost.
        use_hi = jnp.logical_and(
            relres <= config.tolerance * switch,
            relres > config.tolerance * (switch / 20.0),
        )
        return jax.lax.cond(use_hi, inner_hi, inner_lo, r)

    if config.cycle == FMG:
        x0 = full_multigrid(
            hier_lo, levels, smooth, config.iterations_per_grid,
            constrain(0, b.astype(lo)), 0, constrain, resid, transfers,
        ).astype(dtype)
    else:
        x0 = b  # previous step's solution as initial guess (.hxx:180-201)

    def cond(carry):
        x, r, k, relres, hist = carry
        return jnp.logical_and(relres > config.tolerance, k < config.max_cycles)

    def body(carry):
        x, r, k, relres_prev, hist = carry
        x = constrain(0, x + inner(r, relres_prev))
        r = resid(op0, x, b)
        relres = l2_norm(r) / rhs_norm
        hist = hist.at[k].set(relres)
        return x, r, k + 1, relres, hist

    hist0 = jnp.zeros((config.max_cycles,), dtype)
    r0 = resid(op0, x0, b)
    init = (x0, r0, jnp.int32(0), jnp.asarray(jnp.inf, dtype), hist0)
    x, _, k, relres, hist = jax.lax.while_loop(cond, body, init)
    return x, k, relres, hist


def _solve_all_steps(hier, levels, config, b, constrain=_no_constraint,
                     smooth=None, resid=None, transfers=None):
    hists, counts, finals = [], [], []
    for _ in range(config.number_of_steps):
        b, k, relres, hist = _solve_time_step(
            hier, levels, config, b, constrain, smooth, resid, transfers
        )
        hists.append(hist)
        counts.append(k)
        finals.append(relres)
    return MADResult(
        output=b,
        residual_history=jnp.stack(hists),
        num_cycles=jnp.stack(counts),
        final_residual=jnp.stack(finals),
    )


def _make_constraint(mesh, shapes: Tuple[Tuple[int, ...], ...],
                     min_local: int):
    """Per-level sharding constraint: block-partition fine levels over the
    mesh, replicate agglomerated coarse levels (see parallel.sharding).
    ``shapes`` are the per-level array shapes (padded shapes on the
    pad-to-divisible path)."""
    if mesh is None:
        return _no_constraint
    from ..parallel.sharding import field_sharding

    shardings = tuple(
        field_sharding(mesh, shape, min_local) for shape in shapes
    )

    def constrain(level, x):
        return jax.lax.with_sharding_constraint(x, shardings[level])

    return constrain


def _make_halo_ops(mesh, shapes: Tuple[Tuple[int, ...], ...], min_local: int,
                   config: MADConfig):
    """Explicit shard_map halo-exchange smoother/residual (halo='shard_map' /
    'overlap'), dispatching the per-level PartitionSpec on array shape.

    Stored and compressed operator representations are supported; with
    ``use_pallas`` the compressed 3D levels run the fused Pallas block kernels
    inside shard_map (the distributed fast path — kernel overlapped with the
    halo exchange, boundary slabs spliced in after; parallel.halo)."""
    from ..parallel.halo import (
        make_halo_chebyshev_smoother,
        make_halo_jacobi_sweep,
        make_halo_pallas_rbgs_sweep,
        make_halo_pallas_residual,
        make_halo_rbgs_sweep,
        make_halo_residual,
    )
    from ..parallel.sharding import level_spec

    if config.effective_operator_repr == "matrix_free":
        raise ValueError(
            "halo='shard_map'/'overlap' requires operator_repr='stored' or "
            "'compressed' (matrix-free operators have no plane form to "
            "exchange halos for)"
        )
    overlap = config.halo == "overlap"
    use_pallas = config.use_pallas
    # Mosaic is TPU-only; interpret elsewhere so the path stays functional
    # (if slow) on CPU meshes (tests, dryrun_multichip).
    interpret = jax.default_backend() != "tpu"
    specs = {
        shape: level_spec(mesh, shape, min_local) for shape in shapes
    }

    def _pallas_dispatch(op, x) -> bool:
        # max_radius=1: the shard-local masked kernels are radius-1 only;
        # exact-Galerkin radius-2 levels take the XLA halo path here
        from ..ops.pallas_smoothers import pallas_compatible

        return use_pallas and pallas_compatible(op, max_radius=1)

    if config.smoother in ("gauss_seidel", "gs", "rbgs"):
        def smooth(op, x, b):
            spec = specs[tuple(x.shape)]
            if _pallas_dispatch(op, x):
                return make_halo_pallas_rbgs_sweep(mesh, spec, interpret)(
                    op, x, b
                )
            return make_halo_rbgs_sweep(mesh, spec, overlap)(op, x, b)
    elif config.smoother in ("weighted_jacobi", "wj", "jacobi"):
        def smooth(op, x, b):
            return make_halo_jacobi_sweep(
                mesh, specs[tuple(x.shape)], config.jacobi_weight, overlap
            )(op, x, b)
    elif config.smoother in ("chebyshev", "cheby"):
        def smooth(op, x, b):
            return make_halo_chebyshev_smoother(
                mesh, specs[tuple(x.shape)], overlap=overlap
            )(op, x, b)
    else:
        raise ValueError(
            "halo='shard_map'/'overlap' supports gauss_seidel / "
            f"weighted_jacobi / chebyshev smoothers (got {config.smoother!r})"
        )

    def resid(op, x, b):
        spec = specs[tuple(x.shape)]
        if _pallas_dispatch(op, x):
            return make_halo_pallas_residual(mesh, spec, interpret)(op, x, b)
        return make_halo_residual(mesh, spec, overlap)(op, x, b)

    return smooth, resid


@functools.lru_cache(maxsize=32)
def _compiled_hierarchy_builder(
    levels: Tuple[GridLevel, ...],
    time_step: float,
    coarse_operator: str,
    operator_repr: str = "stored",
    galerkin_variant: str = "collapsed",
    lane_mm: bool = True,
):
    """Jitted setup: tensor -> Hierarchy (DCA assembly at every level, tensor
    restriction chain, dense coarsest LU) as one compiled program.
    ``lane_mm=False`` for mesh-sharded input tensors (the minor-axis matmul
    restriction is a pallas_call, which GSPMD cannot partition)."""

    def build(tensor):
        return build_hierarchy(
            tensor, levels, time_step, coarse_operator, operator_repr,
            galerkin_variant, lane_mm,
        )

    return jax.jit(build)


def _padded_shapes(mesh, levels: Tuple[GridLevel, ...], min_local: int,
                   config: MADConfig):
    """Per-level array shapes on the explicit-halo path: mesh-divisible
    embeddings when any axis needs padding (parallel.padding), else the true
    level shapes.  Returns (shapes, padded: bool)."""
    shapes = tuple(lvl.shape for lvl in levels)
    if mesh is None or config.halo == "gspmd":
        return shapes, False
    from ..parallel.padding import padded_level_shape

    pshapes = tuple(
        padded_level_shape(mesh, lvl.shape, min_local) for lvl in levels
    )
    return pshapes, pshapes != shapes


@functools.lru_cache(maxsize=32)
def _compiled_solver(
    levels: Tuple[GridLevel, ...],
    config: MADConfig,
    mesh=None,
    min_local: int = 8,
):
    shapes, padded = _padded_shapes(mesh, levels, min_local, config)
    constrain = _make_constraint(mesh, shapes, min_local)
    smooth = resid = transfers = None
    if mesh is not None and config.halo != "gspmd":
        smooth, resid = _make_halo_ops(mesh, shapes, min_local, config)
    if padded:
        transfers = _padded_transfers(levels, shapes)

    def run(hier, b):
        return _solve_all_steps(
            hier, levels, config, b, constrain, smooth, resid, transfers
        )

    return jax.jit(run)


def mad_diffusion(
    image: jnp.ndarray,
    tensor: jnp.ndarray,
    spacing: Sequence[float] | None = None,
    config: MADConfig | None = None,
    dtype=None,
    hierarchy: Hierarchy | None = None,
    mesh=None,
    min_local: int = 8,
) -> MADResult:
    """Run the full MAD filter: setup + ``number_of_steps`` implicit steps.

    Args:
      image: input field, shape ``(*grid_shape)`` (2D or 3D).
      tensor: symmetric diffusion tensor field — a canonical plane tuple
        (core.symfield order, the layout-safe TPU representation), or an
        array in ``(D, D, *shape)`` / ``(*shape, D, D)`` layout (only the
        lower triangle is read, like the reference).
      spacing: physical voxel spacing (defaults to 1.0 per dim).
      config: solver parameters (defaults mirror the reference).
      dtype: internal precision (defaults to float64 when x64 is enabled,
        else float32; the reference computes in double).
      hierarchy: optionally reuse a prebuilt :class:`Hierarchy` (e.g. across
        repeated solves with the same tensor, as the VED filter does).
      mesh: optional ``jax.sharding.Mesh`` with spatial axes ('x', 'y'[, 'z']);
        when given, the solve is SPMD-distributed: fine levels block-partitioned
        over the mesh (XLA inserts halo exchanges), levels whose per-device
        block would drop below ``min_local`` points per axis replicated
        (coarse-grid agglomeration).
    """
    config = config or MADConfig()
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if (
        mesh is not None
        and config.halo != "gspmd"
        and config.coarse_operator == GALERKIN
        and config.galerkin_variant == "exact"
        and min_local < 2
    ):
        # exact Galerkin levels reach stencil radius 2; the one-hop halo
        # exchange needs local blocks at least that thick
        raise ValueError(
            "halo='shard_map'/'overlap' with exact Galerkin coarse operators "
            f"needs min_local >= 2 (got {min_local}); raise min_local or use "
            "galerkin_variant='collapsed'"
        )

    shape = tuple(image.shape)
    tensor = as_sym_planes(tensor, shape)
    levels = build_level_descriptors(shape, spacing)
    b = jnp.asarray(image, dtype)

    if hierarchy is None:
        builder = _compiled_hierarchy_builder(
            levels, config.time_step, config.coarse_operator,
            config.effective_operator_repr, config.galerkin_variant,
            mesh is None,
        )
        hierarchy = builder(tuple(jnp.asarray(p, dtype) for p in tensor))
        if (
            config.coarse_operator == GALERKIN
            and config.galerkin_variant == "exact"
            and config.galerkin_prune_tol > 0
        ):
            # host-driven (the keep decision reads per-plane maxima); the
            # solver retraces for the pruned offset structure
            from ..ops.galerkin import prune_stored_operator

            ops = (hierarchy.operators[0],) + tuple(
                prune_stored_operator(op, config.galerkin_prune_tol)
                for op in hierarchy.operators[1:]
            )
            hierarchy = Hierarchy(operators=ops, solver=hierarchy.solver)

    if mesh is not None:
        from ..parallel.sharding import shard_field, shard_hierarchy

        shapes, padded = _padded_shapes(mesh, levels, min_local, config)
        if padded:
            # pad-to-divisible: embed every level in its mesh-divisible
            # shape so the explicit-halo path fully shards odd volumes
            # (parallel.padding; pad cells stay exactly zero)
            from ..parallel.padding import crop_field, pad_hierarchy, pad_field

            hierarchy = jax.jit(
                functools.partial(pad_hierarchy, pshapes=shapes)
            )(hierarchy)
            b = jax.jit(functools.partial(pad_field, pshape=shapes[0]))(b)
        hierarchy = shard_hierarchy(hierarchy, levels, mesh, min_local)
        b = shard_field(b, mesh, min_local)

    # verbose is host-side logging only — strip it so the compiled-solver
    # cache doesn't hold two copies of an identical program
    solver = _compiled_solver(
        levels, dataclasses.replace(config, verbose=False), mesh, min_local
    )
    result = solver(hierarchy, b)
    if mesh is not None and padded:
        out = jax.jit(functools.partial(crop_field, shape=shape))(result.output)
        result = result._replace(output=out)
    if config.verbose:
        print_residual_trace(result, config)
    return result


def print_residual_trace(result: MADResult, config: MADConfig,
                         print_fn=print) -> None:
    """Host-side per-cycle residual trace (the ``verbose`` output).

    Prints one line per outer cycle per time step from the already-recorded
    ``MADResult.residual_history`` — the TPU-native counterpart of the
    reference's m_Verbose stdout reporting (.hxx:363-369, 441-448); the
    per-level/per-iteration detail lives in models.trace."""
    label = {VCYCLE: "VCycle", FMG: "VCycle", SMOOTHER: "Smoother iteration"}[
        config.cycle
    ]
    hist = jax.device_get(result.residual_history)
    counts = jax.device_get(result.num_cycles)
    for step in range(hist.shape[0]):
        if hist.shape[0] > 1:
            print_fn(
                f"------------ Time step n. {step + 1} / {hist.shape[0]} "
                "------------"
            )
        for k in range(int(counts[step])):
            print_fn(
                f"{label} n. {k + 1}: relative residual = {hist[step, k]}"
            )
