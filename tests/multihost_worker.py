"""Worker process for the 2-process multi-host test (tests/test_multihost.py).

Launched by the parent test with JAX_PLATFORMS=cpu and 4 virtual devices per
process in the environment (set BEFORE interpreter start — the installed
sitecustomize imports jax immediately).  Each rank initializes the JAX
distributed runtime against a localhost coordinator, builds the DCN-major
multi-host mesh, runs the same small MAD solve on the gspmd and overlap halo
paths, gathers the outputs, and rank 0 writes a JSON verdict comparing both
against the single-device solve computed in-process.

This executes the exact launch recipe documented on
``parallel.sharding.initialize_multihost`` with more than one process —
the coverage VERDICT r2 item 3 required.
"""

import json
import sys


def _make_inputs(shape):
    import numpy as np

    rng = np.random.default_rng(0)
    n = int(np.prod(shape))
    a = rng.normal(size=(n, 3, 3))
    m = np.einsum("nij,nkj->nik", a, a) + np.eye(3) * 1.0
    tensor = m.reshape(*shape, 3, 3)
    image = rng.normal(size=shape) * 10.0
    return tensor, image


def main() -> None:
    coordinator, num_processes, process_id, out_path = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )

    import jax

    # the installed sitecustomize pins a remote-TPU platform; the config API
    # (before first backend use) is the reliable override (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from multigridanisotropicdiffusion_tpu.parallel.sharding import (
        initialize_multihost,
        make_multihost_grid_mesh,
    )

    initialize_multihost(coordinator, num_processes, process_id)
    info = {
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "global_devices": len(jax.devices()),
        "local_devices": jax.local_device_count(),
    }

    import numpy as np
    from jax.experimental import multihost_utils

    from multigridanisotropicdiffusion_tpu.models.mad import (
        MADConfig,
        mad_diffusion,
    )

    shape = (32, 16, 16)
    tensor, image = _make_inputs(shape)

    # single-device reference, computed identically on every rank (local)
    base = MADConfig(time_step=0.1, tolerance=1e-9, max_cycles=40)
    ref = mad_diffusion(image, tensor, config=base)
    ref_out = np.asarray(ref.output)

    mesh = make_multihost_grid_mesh(3)
    info["mesh_shape"] = {k: int(v) for k, v in mesh.shape.items()}

    results = {}
    for halo in ("gspmd", "overlap"):
        import dataclasses

        cfg = dataclasses.replace(base, halo=halo)
        got = mad_diffusion(image, tensor, config=cfg, mesh=mesh, min_local=4)
        # gather the sharded output onto every process for comparison
        full = np.asarray(
            multihost_utils.process_allgather(got.output, tiled=True)
        )
        results[halo] = {
            "num_cycles": int(got.num_cycles[0]),
            "final_relres": float(got.final_residual[0]),
            "max_abs_diff_vs_single": float(np.max(np.abs(full - ref_out))),
        }
    info["ref_num_cycles"] = int(ref.num_cycles[0])
    info["results"] = results

    # VED across both processes (VERDICT r4 item 7): the sharded vesselness
    # pipeline (interpret-mode Pallas kernels inside shard_map, z-slab
    # resharding, DCN halo ppermutes) + the mesh-sharded diffusion solve,
    # compared against the in-process single-device run.
    from multigridanisotropicdiffusion_tpu.models.ved import VEDConfig, ved
    from multigridanisotropicdiffusion_tpu.parallel.pipeline import (
        make_sharded_vesselness_pipeline,
    )

    vshape = (9 * len(jax.devices()), 16, 16)
    vrng = np.random.default_rng(1)
    zz, yy, xx = np.meshgrid(
        *[np.arange(s, dtype=float) for s in vshape], indexing="ij"
    )
    vol = 80.0 * np.exp(-(((yy - 8.0) ** 2) + (xx - 8.0) ** 2) / 4.0)
    vol += vrng.normal(scale=1.0, size=vshape)
    vcfg = VEDConfig(
        iterations=1, diffusion_iterations=1, scales=(1.0, 2.0),
        time_step=0.1, tolerance=1e-8,
    )
    kernel_path = make_sharded_vesselness_pipeline(
        vshape, vol.dtype, mesh, vcfg.scales, (1.0, 1.0, 1.0), vcfg.alpha,
        vcfg.beta, vcfg.gamma, vcfg.epsilon, vcfg.omega, vcfg.sensitivity,
    ) is not None
    vref = ved(vol, config=vcfg)
    vgot = ved(vol, config=vcfg, mesh=mesh, min_local=4)
    vfull = np.asarray(
        multihost_utils.process_allgather(vgot.output, tiled=True)
    )
    info["ved"] = {
        "kernel_pipeline_engaged": bool(kernel_path),
        "final_relres": float(
            np.asarray(vgot.diffusion.final_residual).ravel()[-1]
        ),
        "max_abs_diff_vs_single": float(
            np.max(np.abs(vfull - np.asarray(vref.output)))
        ),
        "out_scale": float(np.max(np.abs(np.asarray(vref.output)))),
    }

    if process_id == 0:
        with open(out_path, "w") as f:
            json.dump(info, f)
    # all ranks exit together so the coordinator shuts down cleanly
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
