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
from ..core.stencil import StencilOperator, l2_norm, residual
from ..ops.coarse import CoarseSolver, build_coarse_solver, coarse_solve
from ..ops.dca import assemble_dca
from ..ops.galerkin import assemble_galerkin
from ..ops.smoothers import DEFAULT_JACOBI_WEIGHT, make_smoother
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

    def __post_init__(self):
        if self.cycle not in (VCYCLE, FMG, SMOOTHER):
            raise ValueError(f"unknown cycle type: {self.cycle!r}")
        if self.coarse_operator not in (DCA, GALERKIN):
            raise ValueError(f"unknown coarse operator: {self.coarse_operator!r}")


class Hierarchy(NamedTuple):
    """Device-resident multigrid setup products: one stencil operator per
    level plus the cached coarsest-level LU factorization."""

    operators: Tuple[StencilOperator, ...]
    solver: CoarseSolver


def build_hierarchy(
    tensor: jnp.ndarray,
    levels: Tuple[GridLevel, ...],
    time_step: float,
    coarse_operator: str = DCA,
) -> Hierarchy:
    """Assemble the per-level operators (setup phase — runs once per tensor).

    DCA re-discretizes from level-wise restricted tensor coefficients
    (itkGridsHierarchy.hxx:110-201); Galerkin computes ``A_c = R A_f P``
    directly from the fine operator (the reference's documented GCA option,
    doc/html/itk_coarse_grid_operators_generator_8hxx_source.html).
    """
    ops = [assemble_dca(tensor, levels[0].spacing, time_step)]
    if coarse_operator == GALERKIN:
        for lvl in levels[1:]:
            ops.append(assemble_galerkin(ops[-1], lvl.centering))
    else:
        t = tensor
        for lvl in levels[1:]:
            t = restrict_tensor(t, lvl.centering)
            ops.append(assemble_dca(t, lvl.spacing, time_step))
    solver = build_coarse_solver(ops[-1])
    return Hierarchy(operators=tuple(ops), solver=solver)


def v_cycle(
    hier: Hierarchy,
    levels: Tuple[GridLevel, ...],
    smooth,
    iterations_per_grid: int,
    x: jnp.ndarray,
    b: jnp.ndarray,
    level: int = 0,
) -> jnp.ndarray:
    """One V-cycle starting at ``level`` (reference VCycle, .hxx:341-493).

    At the coarsest level the initial guess is ignored and the rhs is solved
    directly (.hxx:356-370).
    """
    coarsest = len(levels) - 1
    if level == coarsest:
        return coarse_solve(hier.solver, b)

    op = hier.operators[level]
    for _ in range(iterations_per_grid):
        x = smooth(op, x, b)
    r = residual(op, x, b)

    child_centering = levels[level + 1].centering
    rc = restrict(r, child_centering)
    ec = v_cycle(
        hier, levels, smooth, iterations_per_grid, jnp.zeros_like(rc), rc, level + 1
    )
    x = x + prolong(ec, child_centering)

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
) -> jnp.ndarray:
    """Full multigrid initialization (reference FullMultiGrid, .hxx:300-338)."""
    coarsest = len(levels) - 1
    if level == coarsest:
        x = jnp.zeros_like(b)
        for _ in range(iterations_per_grid):
            x = v_cycle(hier, levels, smooth, iterations_per_grid, x, b, level)
        return x

    child_centering = levels[level + 1].centering
    bc = restrict(b, child_centering)
    xc = full_multigrid(hier, levels, smooth, iterations_per_grid, bc, level + 1)
    x = prolong(xc, child_centering)
    for _ in range(iterations_per_grid):
        x = v_cycle(hier, levels, smooth, iterations_per_grid, x, b, level)
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
):
    """One implicit time step: iterate cycles until the relative L2 residual
    falls below tolerance or max_cycles is hit (do-while, .hxx:207-246)."""
    smooth = make_smoother(config.smoother, config.jacobi_weight)
    op0 = hier.operators[0]
    dtype = b.dtype

    rhs_norm = l2_norm(b)

    if config.cycle == FMG:
        x0 = full_multigrid(hier, levels, smooth, config.iterations_per_grid, b)
    else:
        x0 = b  # previous step's solution as initial guess (.hxx:180-201)

    def one_cycle(x):
        if config.cycle == SMOOTHER:
            return smooth(op0, x, b)
        return v_cycle(hier, levels, smooth, config.iterations_per_grid, x, b)

    def cond(carry):
        x, k, relres, hist = carry
        return jnp.logical_and(relres > config.tolerance, k < config.max_cycles)

    def body(carry):
        x, k, _, hist = carry
        x = one_cycle(x)
        relres = l2_norm(residual(op0, x, b)) / rhs_norm
        hist = hist.at[k].set(relres)
        return x, k + 1, relres, hist

    hist0 = jnp.zeros((config.max_cycles,), dtype)
    init = (x0, jnp.int32(0), jnp.asarray(jnp.inf, dtype), hist0)
    x, k, relres, hist = jax.lax.while_loop(cond, body, init)
    return x, k, relres, hist


def _solve_all_steps(hier, levels, config, b):
    hists, counts, finals = [], [], []
    for _ in range(config.number_of_steps):
        b, k, relres, hist = _solve_time_step(hier, levels, config, b)
        hists.append(hist)
        counts.append(k)
        finals.append(relres)
    return MADResult(
        output=b,
        residual_history=jnp.stack(hists),
        num_cycles=jnp.stack(counts),
        final_residual=jnp.stack(finals),
    )


@functools.lru_cache(maxsize=32)
def _compiled_solver(levels: Tuple[GridLevel, ...], config: MADConfig):
    def run(hier, b):
        return _solve_all_steps(hier, levels, config, b)

    return jax.jit(run)


def mad_diffusion(
    image: jnp.ndarray,
    tensor: jnp.ndarray,
    spacing: Sequence[float] | None = None,
    config: MADConfig | None = None,
    dtype=None,
    hierarchy: Hierarchy | None = None,
) -> MADResult:
    """Run the full MAD filter: setup + ``number_of_steps`` implicit steps.

    Args:
      image: input field, shape ``(*grid_shape)`` (2D or 3D).
      tensor: symmetric diffusion tensor field ``(*grid_shape, D, D)``; only
        the lower triangle is read.
      spacing: physical voxel spacing (defaults to 1.0 per dim).
      config: solver parameters (defaults mirror the reference).
      dtype: internal precision (defaults to float64 when x64 is enabled,
        else float32; the reference computes in double).
      hierarchy: optionally reuse a prebuilt :class:`Hierarchy` (e.g. across
        repeated solves with the same tensor, as the VED filter does).
    """
    config = config or MADConfig()
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    shape = tuple(image.shape)
    ndim = len(shape)
    if tensor.shape != (*shape, ndim, ndim):
        raise ValueError(
            f"tensor shape {tuple(tensor.shape)} does not match image: expected "
            f"{(*shape, ndim, ndim)} (per-voxel symmetric {ndim}x{ndim} tensors)"
        )
    levels = build_level_descriptors(shape, spacing)
    b = jnp.asarray(image, dtype)

    if hierarchy is None:
        hierarchy = build_hierarchy(
            jnp.asarray(tensor, dtype), levels, config.time_step, config.coarse_operator
        )

    solver = _compiled_solver(levels, config)
    return solver(hierarchy, b)
