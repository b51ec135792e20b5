"""Benchmark driver: prints ONE JSON line for the round harness.

Headline metric (BASELINE.json): red-black Gauss-Seidel smoother throughput in
voxel-updates/s/chip on a 3D 19-point-stencil operator, plus the V-cycle
wall-clock to a 1e-6 relative residual on the largest volume that fits.

``vs_baseline`` is the fraction of the HBM-bandwidth speed-of-light for the
sweep on this chip: one RBGS sweep = two half-sweeps, each streaming the 19
coefficient planes + x + b and writing x (~2*(19+3)*4 = 176 bytes/voxel in
f32), against the chip's nominal HBM bandwidth (v5e: ~819 GB/s).  A value of
1.0 means the smoother is memory-bound at full bandwidth — the speed of light
for this kernel.
"""

from __future__ import annotations

import json
import time

import numpy as np

HBM_GBPS = 819.0  # TPU v5e nominal
BYTES_PER_VOXEL_SWEEP = 2 * (19 + 3) * 4  # two colored half-sweeps, f32


def run_size(n: int) -> str:
    import jax
    import jax.numpy as jnp

    from multigridanisotropicdiffusion_tpu.core.grids import build_level_descriptors
    from multigridanisotropicdiffusion_tpu.models.mad import (
        MADConfig,
        _compiled_hierarchy_builder,
        _compiled_solver,
    )
    from multigridanisotropicdiffusion_tpu.ops.smoothers import rb_gauss_seidel_sweep

    dtype = jnp.float32
    extra = {"device": str(jax.devices()[0])}

    def build_problem(n):
        shape = (n, n, n)
        key = jax.random.PRNGKey(0)

        @jax.jit
        def make_inputs(key):
            # SPD tensor field as the canonical plane tuple (layout-safe):
            # T = A A^T + 2 I built plane-by-plane from 9 random scalar fields
            # (never an array with a small leading/trailing component dim).
            ks = jax.random.split(key, 10)
            rows = [
                [jax.random.normal(ks[3 * i + k], shape, dtype) for k in range(3)]
                for i in range(3)
            ]

            def dot(i, j):
                return sum(rows[i][k] * rows[j][k] for k in range(3))

            tensor = (
                dot(0, 0) + 2.0, dot(0, 1), dot(0, 2),
                dot(1, 1) + 2.0, dot(1, 2),
                dot(2, 2) + 2.0,
            )
            b = jax.random.uniform(ks[9], shape, dtype, 0.0, 255.0)
            return tensor, b

        tensor, b = make_inputs(key)
        levels = build_level_descriptors(shape, (1.0, 1.0, 1.0))
        config = MADConfig(
            time_step=0.1, tolerance=1e-6, max_cycles=50, smoother="gauss_seidel"
        )
        t0 = time.perf_counter()
        hier = _compiled_hierarchy_builder(levels, config.time_step, "dca")(tensor)
        jax.block_until_ready(hier.operators[0].coeffs[0])
        setup_s = time.perf_counter() - t0
        del tensor
        return shape, levels, config, hier, b, setup_s

    shape, levels, config, hier, b, setup_s = build_problem(n)

    # --- smoother throughput ---------------------------------------------
    op0 = hier.operators[0]
    SWEEPS = 10

    @jax.jit
    def sweeps(x, b):
        for _ in range(SWEEPS):
            x = rb_gauss_seidel_sweep(op0, x, b)
        return x

    x = jnp.zeros_like(b)
    sweeps(x, b).block_until_ready()  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sweeps(x, b).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    voxels = float(np.prod(shape))
    updates_per_s = voxels * SWEEPS / best

    # --- V-cycle solve to 1e-6 ---------------------------------------------
    solver = _compiled_solver(levels, config)
    res = solver(hier, b)
    jax.block_until_ready(res.output)  # compile + run
    t0 = time.perf_counter()
    res = solver(hier, b)
    jax.block_until_ready(res.output)
    solve_s = time.perf_counter() - t0

    sol = HBM_GBPS * 1e9 / BYTES_PER_VOXEL_SWEEP
    extra.update(
        {
            "grid": list(shape),
            "sweep_s": best / SWEEPS,
            "setup_s": setup_s,
            "vcycle_solve_to_1e-6_s": solve_s,
            "vcycle_cycles": int(res.num_cycles[0]),
            "final_relres": float(res.final_residual[0]),
            "sol_updates_per_s": sol,
        }
    )
    return json.dumps(
        {
            "metric": f"rbgs_smoother_voxel_updates_per_s_per_chip_{n}^3",
            "value": updates_per_s,
            "unit": "voxel_updates/s",
            "vs_baseline": updates_per_s / sol,
            "extra": extra,
        }
    )


def main():
    """Try sizes largest-first, each in a fresh subprocess so a failed (OOM)
    attempt cannot leak device buffers into the next one."""
    import subprocess
    import sys

    sizes = [int(s) for s in sys.argv[1:] if s.isdigit()] or [384, 256, 128]
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        print(run_size(int(sys.argv[2])))
        return
    last = None
    for n in sizes:
        proc = subprocess.run(
            [sys.executable, __file__, "--single", str(n)],
            capture_output=True, text=True, timeout=1800,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
        last = (proc.stdout + proc.stderr)[-2000:]
    raise SystemExit(f"bench failed at all sizes; last output:\n{last}")


if __name__ == "__main__":
    main()
