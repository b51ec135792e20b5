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


def main():
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
            k1, k2 = jax.random.split(key)
            # component-first (3, 3, *shape): spatial dims last for TPU tiling
            a = jax.random.normal(k1, (3, 3, *shape), dtype)
            tensor = jnp.einsum("ik...,jk...->ij...", a, a)
            tensor = tensor + 2.0 * jnp.expand_dims(
                jnp.eye(3, dtype=dtype), tuple(range(2, 2 + len(shape)))
            )
            b = jax.random.uniform(k2, shape, dtype, 0.0, 255.0)
            return tensor, b

        tensor, b = make_inputs(key)
        levels = build_level_descriptors(shape, (1.0, 1.0, 1.0))
        config = MADConfig(
            time_step=0.1, tolerance=1e-6, max_cycles=50, smoother="gauss_seidel"
        )
        t0 = time.perf_counter()
        hier = _compiled_hierarchy_builder(levels, config.time_step, "dca")(tensor)
        jax.block_until_ready(hier.operators[0].coeffs)
        setup_s = time.perf_counter() - t0
        del tensor
        return shape, levels, config, hier, b, setup_s

    last_err = None
    for n in (512, 384, 256):
        try:
            shape, levels, config, hier, b, setup_s = build_problem(n)

            # --- smoother throughput -------------------------------------
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

            # --- V-cycle solve to 1e-6 -----------------------------------
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
            print(
                json.dumps(
                    {
                        "metric": f"rbgs_smoother_voxel_updates_per_s_per_chip_{n}^3",
                        "value": updates_per_s,
                        "unit": "voxel_updates/s",
                        "vs_baseline": updates_per_s / sol,
                        "extra": extra,
                    }
                )
            )
            return
        except Exception as e:  # OOM or compile failure: try smaller
            last_err = e
            continue
    raise SystemExit(f"bench failed at all sizes: {last_err}")


if __name__ == "__main__":
    main()
