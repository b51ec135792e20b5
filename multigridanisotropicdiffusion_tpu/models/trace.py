"""Verbose/debug solve path: per-level residual reporting like the reference.

The reference's ``m_Verbose`` flag prints the relative residual after every
smoother iteration at every level with depth indentation
(itkMultigridAnisotropicDiffusionImageFilter.hxx:363-369, 393-399, 441-448,
469-475).  Doing that inside a jitted TPU program would force a host sync per
iteration, so the production solver (:mod:`.mad`) records one residual per
outer cycle instead.  This module provides the observability path: an eager
re-implementation of the same cycle that reports everything the reference
reports — intended for debugging, convergence studies and golden comparisons,
not for production throughput.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.grids import build_level_descriptors
from ..core.stencil import l2_norm, residual
from ..core.symfield import as_sym_planes
from ..ops.coarse import coarse_solve
from ..ops.smoothers import make_smoother
from ..ops.transfer import prolong, restrict
from ..utils.benchlog import ResidualTraceLogger
from .mad import (
    FMG,
    SMOOTHER,
    MADConfig,
    build_hierarchy,
    full_multigrid,
)


def mad_diffusion_verbose(
    image,
    tensor,
    spacing: Sequence[float] | None = None,
    config: MADConfig | None = None,
    dtype=None,
    print_fn: Callable[[str], None] = print,
    logger: ResidualTraceLogger | None = None,
    mesh=None,
    min_local: int = 8,
):
    """Eager MAD solve with the reference's verbose per-level residual trace.

    Returns ``(output, trace)`` where ``trace`` is the list of emitted lines.

    With ``mesh`` the trace runs the *distributed* configuration the user
    actually runs: the hierarchy and fields are sharded over the mesh, and
    with ``halo='shard_map'/'overlap'`` the smoother/residual are the same
    explicit halo-exchange (and Pallas) ops as the production solver — each
    eagerly dispatched so the per-level residuals can be reported.  Volumes
    needing pad-to-divisible embeddings are not supported here (use a
    mesh-divisible shape or ``halo='gspmd'`` for tracing).
    """
    import jax

    config = config or MADConfig()
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    shape = tuple(image.shape)
    tensor = as_sym_planes(tensor, shape)
    levels = build_level_descriptors(shape, spacing)
    coarsest = len(levels) - 1
    # same representation/kernel choices as the production solver, so the
    # verbose path traces the configuration the user actually runs
    hier = build_hierarchy(
        tuple(jnp.asarray(p, dtype) for p in tensor), levels, config.time_step,
        config.coarse_operator, config.effective_operator_repr,
        config.galerkin_variant,
    )
    smooth = make_smoother(
        config.smoother, config.jacobi_weight, use_pallas=config.use_pallas
    )
    resid = residual
    if mesh is not None:
        from ..parallel.sharding import shard_field, shard_hierarchy
        from .mad import _make_halo_ops, _padded_shapes

        shapes, padded = _padded_shapes(mesh, levels, min_local, config)
        if padded:
            raise ValueError(
                "mad_diffusion_verbose does not support pad-to-divisible "
                f"volumes (shape {shape} on this mesh); use a mesh-divisible "
                "shape or halo='gspmd'"
            )
        hier = shard_hierarchy(hier, levels, mesh, min_local)
        image = shard_field(jnp.asarray(image, dtype), mesh, min_local)
        if config.halo != "gspmd":
            smooth, resid = _make_halo_ops(mesh, shapes, min_local, config)
            # the eager loop calls these hundreds of times: jit so the
            # shard_map programs compile once per level shape, not per call
            smooth = jax.jit(smooth)
            resid = jax.jit(resid)

    lines = []

    def emit(depth: int, text: str) -> None:
        line = " " * depth + text
        lines.append(line)
        print_fn(line)

    def rel(op, x, b, bnorm):
        return float(l2_norm(resid(op, x, b)) / bnorm)

    def v_cycle(x, b, level):
        bnorm = float(l2_norm(b))
        if level == coarsest:
            x = coarse_solve(hier.solver, b)
            emit(
                level + 1,
                f"Level {level}, direct solver: relative residual = "
                f"{rel(hier.operators[level], x, b, bnorm)}",
            )
            return x
        op = hier.operators[level]
        for n in range(config.iterations_per_grid):
            x = smooth(op, x, b)
            r = rel(op, x, b, bnorm)
            emit(level + 1, f"Level {level}, iteration {n + 1}: relative residual = {r}")
            if level == 0 and logger is not None:
                logger.log(r)
        rc = restrict(resid(op, x, b), levels[level + 1].centering,
                      lane_mm=mesh is None)
        ec = v_cycle(jnp.zeros_like(rc), rc, level + 1)
        x = x + prolong(ec, levels[level + 1].centering, lane_mm=mesh is None)
        r = rel(op, x, b, bnorm)
        emit(level + 1, f"Level {level}, initial relative residual = {r}")
        if level == 0 and logger is not None:
            logger.log(r)
        for n in range(config.iterations_per_grid):
            x = smooth(op, x, b)
            r = rel(op, x, b, bnorm)
            emit(level + 1, f"Level {level}, iteration {n + 1}: relative residual = {r}")
            if level == 0 and logger is not None:
                logger.log(r)
        return x

    b = jnp.asarray(image, dtype)
    op0 = hier.operators[0]
    for step in range(config.number_of_steps):
        if logger is not None:
            logger.restart()
        if config.number_of_steps > 1:
            emit(0, f"------------ Time step n. {step + 1} / {config.number_of_steps} ------------")
        rhs_norm = float(l2_norm(b))
        if config.cycle == FMG:
            emit(0, "|--- Full Multigrid Cycle ---|")
            x = full_multigrid(hier, levels, smooth, config.iterations_per_grid,
                               b, resid=resid)
        else:
            x = b
        k = 0
        while True:
            if config.cycle == SMOOTHER:
                x = smooth(op0, x, b)
                r = rel(op0, x, b, rhs_norm)
                emit(0, f"Smoother iteration n. {k + 1}: relative residual = {r}")
                if logger is not None:
                    logger.log(r)
            else:
                emit(0, f"|--- VCycle n. {k + 1} ---|")
                x = v_cycle(x, b, 0)
                r = rel(op0, x, b, rhs_norm)
            k += 1
            if r <= config.tolerance or k >= config.max_cycles:
                break
        b = x

    return b, lines
