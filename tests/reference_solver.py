"""Reference-semantics solver: the exact algorithm of the upstream filter,
with lexicographic Gauss-Seidel supplied by the native C++ library.

This is the golden-generation path (SURVEY.md §4c): it reproduces the
reference's ``GenerateData`` control flow (build hierarchy once; per time
step iterate V-cycles until the relative residual drops below tolerance,
itkMultigridAnisotropicDiffusionImageFilter.hxx:104-297) using

* the package's level rule / DCA assembly / transfer operators (all oracle-
  tested against literal transcriptions of the reference in tests/oracles.py),
* the native library's **sequential lexicographic** GS sweep and residual
  (native/madref.cpp — the reference's smoother semantics, which the
  TPU-native red-black smoother deliberately does not replicate), and
* a dense LU coarsest solve in float64.

The goldens produced from this path (tests/make_goldens.py) pin the whole
pipeline against an independently-ordered solve: any assembly/transfer/solver
regression shows up as a loose-norm mismatch in test_goldens.py.
"""

from __future__ import annotations

import numpy as np


def reference_mad_solve(
    image,
    tensor_planes,
    spacing,
    time_step: float,
    number_of_steps: int = 1,
    iterations_per_grid: int = 2,
    tolerance: float = 1e-10,
    max_cycles: int = 100,
    cycle: str = "vcycle",
):
    """f64 MAD solve with lexicographic GS (native) — reference semantics."""
    import jax.numpy as jnp

    from multigridanisotropicdiffusion_tpu.core.grids import (
        build_level_descriptors,
    )
    from multigridanisotropicdiffusion_tpu.core.stencil import densify
    from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
    from multigridanisotropicdiffusion_tpu.ops.transfer import (
        prolong,
        restrict,
        restrict_tensor,
    )
    from multigridanisotropicdiffusion_tpu.utils import native

    assert native.is_available(), "native library required for goldens"

    shape = tuple(image.shape)
    levels = build_level_descriptors(shape, spacing)
    ops = []
    t = tuple(jnp.asarray(p, jnp.float64) for p in tensor_planes)
    ops.append(assemble_dca(t, levels[0].spacing, time_step))
    for lvl in levels[1:]:
        t = restrict_tensor(t, lvl.centering)
        ops.append(assemble_dca(t, lvl.spacing, time_step))
    coarsest = len(levels) - 1
    a_dense = np.asarray(densify(ops[coarsest]), dtype=np.float64)

    def solve_coarse(b):
        return np.linalg.solve(a_dense, b.ravel()).reshape(b.shape)

    def l2(v):
        return float(np.sqrt(np.sum(v * v)))

    def v_cycle(x, b, level):
        if level == coarsest:
            return solve_coarse(b)
        op = ops[level]
        for _ in range(iterations_per_grid):
            x = native.gs_sweep(op, x, b)
        r = native.residual(op, x, b)
        cent = levels[level + 1].centering
        rc = np.asarray(restrict(jnp.asarray(r), cent))
        ec = v_cycle(np.zeros_like(rc), rc, level + 1)
        x = x + np.asarray(prolong(jnp.asarray(ec), cent))
        for _ in range(iterations_per_grid):
            x = native.gs_sweep(op, x, b)
        return x

    def full_multigrid(b, level):
        if level == coarsest:
            x = np.zeros_like(b)
            for _ in range(iterations_per_grid):
                x = v_cycle(x, b, level)
            return x
        cent = levels[level + 1].centering
        bc = np.asarray(restrict(jnp.asarray(b), cent))
        xc = full_multigrid(bc, level + 1)
        x = np.asarray(prolong(jnp.asarray(xc), cent))
        for _ in range(iterations_per_grid):
            x = v_cycle(x, b, level)
        return x

    b = np.asarray(image, dtype=np.float64)
    op0 = ops[0]
    for _ in range(number_of_steps):
        rhs_norm = l2(b)
        x = full_multigrid(b, 0) if cycle == "fmg" else b.copy()
        for _ in range(max_cycles):
            x = v_cycle(x, b, 0)
            if l2(native.residual(op0, x, b)) / rhs_norm <= tolerance:
                break
        b = x
    return b


def reference_ved(
    volume,
    spacing,
    config,
):
    """Reference-semantics VED: the package's (oracle-tested) vesselness/
    tensor pipeline per outer iteration + the lexicographic-GS diffusion
    solve above (itkVEDMultigridImageFilter.hxx:63-155 control flow)."""
    import jax.numpy as jnp

    from multigridanisotropicdiffusion_tpu.models.ved import (
        fused_vesselness_tensor,
    )

    u = np.asarray(volume, dtype=np.float64)
    for _ in range(config.iterations):
        _, tensor = fused_vesselness_tensor(
            jnp.asarray(u), config.scales, spacing, config.alpha, config.beta,
            config.gamma, config.epsilon, config.omega, config.sensitivity,
        )
        u = reference_mad_solve(
            u, tensor, spacing, config.time_step,
            number_of_steps=config.diffusion_iterations,
            iterations_per_grid=config.diffusion_iterations_per_grid,
            tolerance=config.tolerance, max_cycles=config.max_cycles,
            cycle=config.cycle,
        )
    return u
