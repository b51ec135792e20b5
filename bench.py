"""Benchmark driver for the round harness.

Output contract: the LAST stdout line is the compact headline dict
``{"metric", "value", "unit", "vs_baseline"}`` (small enough for any
tail-truncating capture); the full record with ``extra`` is printed on the
preceding line and written to ``BENCH_extra.json`` alongside this file.

Headline metric (BASELINE.json north star): ONE measured warm end-to-end run
of the full 512^3 VED workload (bf16 vesselness pipeline + hierarchy setup +
implicit diffusion solve to a 1e-6 relative residual) in seconds on one
chip; ``vs_baseline`` = 1.0 s target / measured (>1 = beating the 8-chip
target on one chip).  The red-black Gauss-Seidel smoother throughput study
(voxel-updates/s/chip on a 3D 19-point-stencil operator, below) rides along
in ``extra`` and becomes the headline if the VED run fails.

``vs_baseline`` is the fraction of the HBM-bandwidth speed-of-light for the
sweep on this chip: one RBGS sweep = two half-sweeps, each streaming the 19
coefficient planes + x + b and writing x (~2*(19+3)*4 = 176 bytes/voxel in
f32), against the chip's nominal HBM bandwidth (v5e: ~819 GB/s).  A value of
1.0 means the smoother is memory-bound at full bandwidth — the speed of light
for this kernel.

The synthetic operator is random with a dominant diagonal — the smoother's
cost is data-independent, so this measures exactly what a DCA/Galerkin
operator of the same shape would.  ``--solve`` additionally times a full
V-cycle solve to 1e-6 on a real DCA hierarchy (adds two large compiles, slow
through a remote-compile tunnel).  Each size runs in its own subprocess so a
failed (OOM) attempt cannot leak device buffers into the next.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent compilation cache: repeated bench runs (and the round driver's
# run) skip recompilation of unchanged programs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_madtpu")

HBM_GBPS = 819.0  # TPU v5e nominal
#: stored-coefficient sweep: two colored half-sweeps, each streaming 19
#: coefficient planes + x + b and writing x (f32)
BYTES_STORED = 2 * (19 + 3) * 4
#: matrix-free sweep: two half-sweeps streaming 6 tensor planes + x + b
BYTES_MATFREE = 2 * (6 + 3) * 4
#: compressed sweep: two half-sweeps streaming 10 planes + x + b
BYTES_COMPRESSED = 2 * (10 + 3) * 4
#: same sweep with every plane in bf16 (mixed-precision defect cycles)
BYTES_COMPRESSED_BF16 = 2 * (10 + 3) * 2
SWEEPS = 50  # amortize per-dispatch overhead


def run_size(n: int, with_solve: bool = False) -> str:
    import jax
    import jax.numpy as jnp

    from multigridanisotropicdiffusion_tpu.core.stencil import (
        StencilOperator,
        stencil_offsets,
    )
    from multigridanisotropicdiffusion_tpu.ops.smoothers import rb_gauss_seidel_sweep

    dtype = jnp.float32
    shape = (n, n, n)
    extra = {"device": str(jax.devices()[0]), "grid": list(shape)}
    offsets = stencil_offsets(3)  # 19-point
    K = len(offsets)

    @jax.jit
    def make_inputs(key):
        # one random field, K derived coefficient planes (cheap program; the
        # sweep cost is data-independent)
        k1, k2 = jax.random.split(key)
        base = jax.random.uniform(k1, shape, dtype, -1.0, 0.0)
        planes = []
        diag_guard = None
        for k in range(K):
            c = base * (0.5 + 0.4 * jnp.cos(float(k)))
            planes.append(c)
            a = jnp.abs(c)
            diag_guard = a if diag_guard is None else diag_guard + a
        center = offsets.index((0, 0, 0))
        planes[center] = diag_guard + 1.0  # strictly diagonally dominant
        x = base * 3.0 + 1.0
        b = jax.random.uniform(k2, shape, dtype, 0.0, 255.0)
        return tuple(planes), x, b

    planes, x, b = make_inputs(jax.random.PRNGKey(0))
    op = StencilOperator(planes, offsets)

    # The operator is a jit ARGUMENT, never a closure: closed-over arrays are
    # embedded as HLO constants and explode compile time.
    @jax.jit
    def sweeps(op, x, b):
        return jax.lax.fori_loop(
            0, SWEEPS, lambda i, x: rb_gauss_seidel_sweep(op, x, b), x
        )

    def timed_call(fn, *a):
        """Wall-clock a call, forcing completion with a host transfer of one
        element (block_until_ready is unreliable through the remote tunnel)."""
        t0 = time.perf_counter()
        y = fn(*a)
        probe = float(np.asarray(y.ravel()[0]))
        return time.perf_counter() - t0, probe

    # RPC/dispatch overhead estimate: trivial program + 1-element transfer.
    @jax.jit
    def _noop(v):
        return v + 1.0

    tiny = jnp.zeros((8, 128), dtype)
    timed_call(_noop, tiny)  # compile
    overhead = min(timed_call(_noop, tiny)[0] for _ in range(3))
    extra["dispatch_overhead_s"] = overhead

    t0 = time.perf_counter()
    timed_call(sweeps, op, x, b)  # compile + first run
    extra["compile_plus_first_s"] = time.perf_counter() - t0
    best = min(timed_call(sweeps, op, x, b)[0] for _ in range(3))
    net = max(best - overhead, 1e-9)
    voxels = float(np.prod(shape))
    stored_ups = voxels * SWEEPS / net
    extra["stored_sweep_s"] = net / SWEEPS
    extra["stored_updates_per_s"] = stored_ups
    extra["stored_pct_sol"] = stored_ups / (HBM_GBPS * 1e9 / BYTES_STORED)

    # --- matrix-free sweep (6 tensor planes, coefficients on the fly) ------
    from multigridanisotropicdiffusion_tpu.ops.matfree import MatrixFreeDCAOperator

    @jax.jit
    def make_tensor(key):
        ks = jax.random.split(key, 7)
        diag0 = jax.random.uniform(ks[0], shape, dtype, 1.0, 3.0)
        diag1 = jax.random.uniform(ks[1], shape, dtype, 1.0, 3.0)
        diag2 = jax.random.uniform(ks[2], shape, dtype, 1.0, 3.0)
        off = [jax.random.uniform(ks[3 + i], shape, dtype, -0.3, 0.3) for i in range(3)]
        return (diag0, off[0], off[1], diag1, off[2], diag2)

    mf = MatrixFreeDCAOperator(make_tensor(jax.random.PRNGKey(1)), (1.0,) * 3, 0.1)

    @jax.jit
    def mf_sweeps(mf, x, b):
        return jax.lax.fori_loop(
            0, SWEEPS, lambda i, x: rb_gauss_seidel_sweep(mf, x, b), x
        )

    t0 = time.perf_counter()
    timed_call(mf_sweeps, mf, x, b)  # compile + first run
    extra["mf_compile_plus_first_s"] = time.perf_counter() - t0
    best_mf = min(timed_call(mf_sweeps, mf, x, b)[0] for _ in range(3))
    net_mf = max(best_mf - overhead, 1e-9)
    mf_ups = voxels * SWEEPS / net_mf
    extra["matfree_sweep_s"] = net_mf / SWEEPS
    extra["matfree_updates_per_s"] = mf_ups
    extra["matfree_pct_sol"] = mf_ups / (HBM_GBPS * 1e9 / BYTES_MATFREE)

    # --- compressed sweep (10-plane folded DCA form) -----------------------
    from multigridanisotropicdiffusion_tpu.ops.compressed import (
        assemble_compressed_dca,
    )

    @jax.jit
    def make_compressed(tensor):
        return assemble_compressed_dca(tensor, (1.0,) * 3, 0.1)

    comp = make_compressed(mf.tensor)

    @jax.jit
    def comp_sweeps(comp, x, b):
        return jax.lax.fori_loop(
            0, SWEEPS, lambda i, x: rb_gauss_seidel_sweep(comp, x, b), x
        )

    t0 = time.perf_counter()
    timed_call(comp_sweeps, comp, x, b)  # compile + first run
    extra["comp_compile_plus_first_s"] = time.perf_counter() - t0
    best_c = min(timed_call(comp_sweeps, comp, x, b)[0] for _ in range(3))
    net_c = max(best_c - overhead, 1e-9)
    comp_ups = voxels * SWEEPS / net_c
    extra["compressed_sweep_s"] = net_c / SWEEPS
    extra["compressed_updates_per_s"] = comp_ups
    extra["compressed_pct_sol"] = comp_ups / (HBM_GBPS * 1e9 / BYTES_COMPRESSED)

    # --- Pallas fused half-sweep kernel on the compressed operator ---------
    from multigridanisotropicdiffusion_tpu.ops.pallas_smoothers import (
        pallas_rbgs_sweep,
    )

    @jax.jit
    def pallas_sweeps(comp, x, b):
        return jax.lax.fori_loop(
            0, SWEEPS, lambda i, x: pallas_rbgs_sweep(comp, x, b), x
        )

    t0 = time.perf_counter()
    timed_call(pallas_sweeps, comp, x, b)  # compile + first run
    extra["pallas_compile_plus_first_s"] = time.perf_counter() - t0
    best_p = min(timed_call(pallas_sweeps, comp, x, b)[0] for _ in range(3))
    net_p = max(best_p - overhead, 1e-9)
    pallas_ups = voxels * SWEEPS / net_p
    extra["pallas_sweep_s"] = net_p / SWEEPS
    extra["pallas_updates_per_s"] = pallas_ups
    extra["pallas_pct_sol"] = pallas_ups / (HBM_GBPS * 1e9 / BYTES_COMPRESSED)

    # --- Pallas half-sweeps on bf16 blocks (mixed-precision defect path) ----
    comp16 = jax.tree.map(lambda t: t.astype(jnp.bfloat16), comp)
    x16 = x.astype(jnp.bfloat16)
    b16 = b.astype(jnp.bfloat16)

    t0 = time.perf_counter()
    timed_call(pallas_sweeps, comp16, x16, b16)  # compile + first run
    extra["pallas_bf16_compile_plus_first_s"] = time.perf_counter() - t0
    best_p16 = min(timed_call(pallas_sweeps, comp16, x16, b16)[0] for _ in range(3))
    net_p16 = max(best_p16 - overhead, 1e-9)
    pallas16_ups = voxels * SWEEPS / net_p16
    extra["pallas_bf16_sweep_s"] = net_p16 / SWEEPS
    extra["pallas_bf16_updates_per_s"] = pallas16_ups
    extra["pallas_bf16_pct_sol"] = pallas16_ups / (HBM_GBPS * 1e9 / BYTES_COMPRESSED_BF16)

    if with_solve:
        extra.update(_run_solve(n))

    candidates = {
        "stored": (stored_ups, BYTES_STORED),
        "matfree": (mf_ups, BYTES_MATFREE),
        "compressed": (comp_ups, BYTES_COMPRESSED),
        "pallas": (pallas_ups, BYTES_COMPRESSED),
        "pallas_bf16": (pallas16_ups, BYTES_COMPRESSED_BF16),
    }
    kind = max(candidates, key=lambda k: candidates[k][0])
    updates_per_s, bytes_per = candidates[kind]
    sol = HBM_GBPS * 1e9 / bytes_per
    return json.dumps(
        {
            "metric": f"rbgs_smoother_voxel_updates_per_s_per_chip_{n}^3_{kind}",
            "value": updates_per_s,
            "unit": "voxel_updates/s",
            "vs_baseline": updates_per_s / sol,
            "extra": extra,
        }
    )


def _run_solve(n: int) -> dict:
    """Full DCA hierarchy build + V-cycle solve to 1e-6 (two large compiles)."""
    import jax
    import jax.numpy as jnp

    from multigridanisotropicdiffusion_tpu.core.grids import build_level_descriptors
    from multigridanisotropicdiffusion_tpu.models.mad import (
        MADConfig,
        _compiled_hierarchy_builder,
        _compiled_solver,
    )

    dtype = jnp.float32
    shape = (n, n, n)

    @jax.jit
    def make_inputs(key):
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

    tensor, b = make_inputs(jax.random.PRNGKey(0))
    levels = build_level_descriptors(shape, (1.0, 1.0, 1.0))
    config = MADConfig(
        time_step=0.1, tolerance=1e-6, max_cycles=50,
        operator_repr="compressed", use_pallas=True,
    )

    def force(tree):
        """Force completion with a 1-element host transfer
        (block_until_ready is unreliable through the remote tunnel)."""
        leaf = jax.tree.leaves(tree)[0]
        return float(np.asarray(leaf.ravel()[0]))

    builder = _compiled_hierarchy_builder(
        levels, config.time_step, "dca", "compressed"
    )
    t0 = time.perf_counter()
    hier = builder(tensor)
    force(hier)
    setup_s = time.perf_counter() - t0  # compile + first run
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        hier = builder(tensor)
        force(hier)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    setup_warm_s = best
    del tensor

    solver = _compiled_solver(levels, config)

    def run_once():
        t0 = time.perf_counter()
        res = solver(hier, b)
        float(np.asarray(res.output.ravel()[0]))  # force completion
        return time.perf_counter() - t0, res

    run_once()  # compile + first
    solve_s, res = min((run_once() for _ in range(3)), key=lambda t: t[0])
    out = {
        "setup_s": setup_s,
        "setup_warm_s": setup_warm_s,
        "vcycle_solve_to_1e-6_s": solve_s,
        "vcycle_cycles": int(res.num_cycles[0]),
        "final_relres": float(res.final_residual[0]),
    }
    res = None

    # Galerkin coarse operators (BASELINE config: "256^3 V-cycle with
    # Galerkin coarse operators"): compressed fine level + closed-form direct
    # assembly (ops.galerkin_direct) of the coarse chain.  Two variants:
    # 'exact' (radius-2, up to 117/125 planes per level) and 'collapsed'
    # (radius-1 lumping, Pallas-eligible levels — the production fast path).
    # Headline fields: galerkin_setup_warm_s = exact assembly (the oracle
    # operator), galerkin_solve_to_1e-6_s = collapsed solve, with the exact
    # solve and both cycle counts alongside for convergence-parity evidence.
    hier = None
    tensor2 = make_inputs(jax.random.PRNGKey(0))[0]
    for variant in ("exact", "collapsed"):
        tag = "galerkin" if variant == "exact" else "galerkin_collapsed"
        cfg_g = MADConfig(
            time_step=0.1, tolerance=1e-6, max_cycles=50,
            operator_repr="compressed", use_pallas=True,
            coarse_operator="galerkin", galerkin_variant=variant,
        )
        builder_g = _compiled_hierarchy_builder(
            levels, cfg_g.time_step, "galerkin", "compressed", variant
        )
        hier = None
        t0 = time.perf_counter()
        hier = builder_g(tensor2)
        force(hier)
        out[f"{tag}_setup_s"] = time.perf_counter() - t0  # compile + first
        hier = None
        t0 = time.perf_counter()
        hier = builder_g(tensor2)
        force(hier)
        out[f"{tag}_setup_warm_s"] = time.perf_counter() - t0
        solver_g = _compiled_solver(levels, cfg_g)

        def run_g():
            t0 = time.perf_counter()
            r = solver_g(hier, b)
            float(np.asarray(r.output.ravel()[0]))
            return time.perf_counter() - t0, r

        run_g()
        g_s, res = min((run_g() for _ in range(3)), key=lambda t: t[0])
        out[f"{tag}_solve_to_1e-6_s"] = g_s
        out[f"{tag}_cycles"] = int(res.num_cycles[0])
        out[f"{tag}_relres"] = float(res.final_residual[0])
        hier = None
    # pruned exact variant (VERDICT r4 item 8): drop sub-1e-4-relative
    # planes with row-sum-preserving lumping.  The measured irreducibility
    # fact: NO plane of the exact operator is numerically zero (none below
    # 1e-8 relative), so exact cannot be made collapsed-cheap losslessly —
    # plane counts per level are recorded alongside.
    import dataclasses as _dc

    from multigridanisotropicdiffusion_tpu.models.mad import mad_diffusion

    cfg_p = _dc.replace(cfg_g, galerkin_variant="exact",
                        galerkin_prune_tol=1e-4)
    builder_e = _compiled_hierarchy_builder(
        levels, cfg_p.time_step, "galerkin", "compressed", "exact"
    )
    hier = builder_e(tensor2)
    force(hier)
    from multigridanisotropicdiffusion_tpu.ops.galerkin import (
        prune_stored_operator,
    )

    kept = []
    pruned_ops = [hier.operators[0]]
    for op in hier.operators[1:]:
        p = prune_stored_operator(op, cfg_p.galerkin_prune_tol)
        kept.append([len(p.offsets), len(op.offsets)])
        pruned_ops.append(p)
    from multigridanisotropicdiffusion_tpu.models.mad import Hierarchy

    hier_p = Hierarchy(operators=tuple(pruned_ops), solver=hier.solver)
    out["galerkin_pruned_planes_kept"] = kept
    solver_p = _compiled_solver(levels, cfg_p)

    def run_p():
        t0 = time.perf_counter()
        r = solver_p(hier_p, b)
        float(np.asarray(r.output.ravel()[0]))
        return time.perf_counter() - t0, r

    run_p()
    p_s, res = min((run_p() for _ in range(3)), key=lambda t: t[0])
    out["galerkin_pruned_solve_to_1e-6_s"] = p_s
    out["galerkin_pruned_cycles"] = int(res.num_cycles[0])
    out["galerkin_pruned_relres"] = float(res.final_residual[0])
    hier = None
    hier_p = None
    tensor2 = None
    # the production Galerkin number: collapsed solve over the DCA solve
    out["galerkin_solve_over_dca"] = (
        out["galerkin_collapsed_solve_to_1e-6_s"] / out["vcycle_solve_to_1e-6_s"]
    )
    out["galerkin_exact_solve_over_dca"] = (
        out["galerkin_solve_to_1e-6_s"] / out["vcycle_solve_to_1e-6_s"]
    )
    out["galerkin_pruned_solve_over_dca"] = (
        out["galerkin_pruned_solve_to_1e-6_s"] / out["vcycle_solve_to_1e-6_s"]
    )
    return out


def _run_ved(n: int) -> dict:
    """Full VED workload at n^3 (the BASELINE.json north star): vesselness
    pipeline (5 default scales: Hessian + analytic eig + Frangi + tensor),
    hierarchy setup, and one implicit diffusion solve to 1e-6."""
    import jax
    import jax.numpy as jnp

    from multigridanisotropicdiffusion_tpu.core.grids import build_level_descriptors
    from multigridanisotropicdiffusion_tpu.models.mad import (
        MADConfig,
        _compiled_hierarchy_builder,
        _compiled_solver,
    )
    from multigridanisotropicdiffusion_tpu.models.ved import (
        VEDConfig,
        _compiled_vesselness_pipeline,
    )

    dtype = jnp.float32
    shape = (n, n, n)
    spacing = (1.0, 1.0, 1.0)
    cfg = VEDConfig()  # reference defaults: 5 scales, alpha=beta=0.5, ...
    out = {}

    @jax.jit
    def make_volume(key):
        # a few bright tubes along different axes + noise: a vesselness
        # workload with non-trivial eigenstructure everywhere
        axes = [
            jnp.arange(s, dtype=dtype) for s in shape
        ]
        zz = axes[0][:, None, None]
        yy = axes[1][None, :, None]
        xx = axes[2][None, None, :]
        c1, c2, c3 = n * 0.3, n * 0.55, n * 0.75
        r2 = 2.0 * 2.0**2
        vol = 80.0 * jnp.exp(-(((yy - c1) ** 2) + (xx - c2) ** 2) / r2)
        vol += 70.0 * jnp.exp(-(((zz - c2) ** 2) + (xx - c3) ** 2) / r2)
        vol += 90.0 * jnp.exp(-(((zz - c1) ** 2) + (yy - c3) ** 2) / r2)
        vol += 5.0 * jax.random.normal(key, shape, dtype)
        return vol

    u = make_volume(jax.random.PRNGKey(0))

    from multigridanisotropicdiffusion_tpu.models.ved import _auto_z_slab

    z_slab = _auto_z_slab(shape, cfg.pipeline_z_slab)
    out["ved_pipeline_z_slab"] = z_slab
    pipeline = _compiled_vesselness_pipeline(
        shape, spacing, tuple(cfg.scales), cfg.alpha, cfg.beta, cfg.gamma,
        cfg.epsilon, cfg.omega, cfg.sensitivity, z_slab,
    )

    # Timed loops free the previous run's outputs (tensor: 3 GB at 512^3)
    # BEFORE re-running — two live copies of the pipeline products plus the
    # run's internals do not fit 16 GB HBM at 512^3.
    tensor = None
    times = []
    for _ in range(3):
        tensor = None  # free the previous run's buffers
        t0 = time.perf_counter()
        resp, tensor = pipeline(u)
        resp = None
        float(np.asarray(tensor[0].ravel()[0]))  # force completion
        times.append(time.perf_counter() - t0)
    out["ved_pipeline_compile_plus_first_s"] = times[0]
    out["ved_pipeline_s"] = min(times[1:])

    # fast Hessian variant: smooth once + central differences (~3x fewer
    # long-kernel conv passes; see ops.hessian mode docs)
    pipeline_fd = _compiled_vesselness_pipeline(
        shape, spacing, tuple(cfg.scales), cfg.alpha, cfg.beta, cfg.gamma,
        cfg.epsilon, cfg.omega, cfg.sensitivity, z_slab, "smooth_fd",
    )
    times = []
    for _ in range(3):
        tensor = None
        t0 = time.perf_counter()
        resp, tensor = pipeline_fd(u)
        resp = None
        float(np.asarray(tensor[0].ravel()[0]))
        times.append(time.perf_counter() - t0)
    out["ved_pipeline_fd_compile_plus_first_s"] = times[0]
    out["ved_pipeline_fd_s"] = min(times[1:])

    # bf16-storage pipeline (smooth_fd + pipeline_dtype='bfloat16'): streamed
    # volumes in bf16, all math in f32 — mean tensor deviation ~0.2% vs f32
    # (tests/test_ved.py::test_ved_bf16_pipeline_close_to_f32)
    pipeline_bf16 = _compiled_vesselness_pipeline(
        shape, spacing, tuple(cfg.scales), cfg.alpha, cfg.beta, cfg.gamma,
        cfg.epsilon, cfg.omega, cfg.sensitivity, z_slab, "smooth_fd",
        "bfloat16",
    )
    times = []
    for _ in range(3):
        tensor = None
        t0 = time.perf_counter()
        resp, tensor = pipeline_bf16(u)
        resp = None
        float(np.asarray(tensor[0].ravel()[0]))
        times.append(time.perf_counter() - t0)
    out["ved_pipeline_bf16_compile_plus_first_s"] = times[0]
    out["ved_pipeline_bf16_s"] = min(times[1:])
    # distributed kernel pipeline on a 1-device mesh (VERDICT r4 item 3):
    # the shard_map z-slab resharding + in-shard Pallas kernels must cost
    # ~nothing vs the plain pipeline on one real chip
    from multigridanisotropicdiffusion_tpu.parallel.pipeline import (
        make_sharded_vesselness_pipeline,
    )
    from multigridanisotropicdiffusion_tpu.parallel.sharding import (
        make_grid_mesh,
    )

    mesh1 = make_grid_mesh(3, devices=jax.devices()[:1])
    pipe_dist = make_sharded_vesselness_pipeline(
        shape, jnp.float32, mesh1, tuple(cfg.scales), spacing, cfg.alpha,
        cfg.beta, cfg.gamma, cfg.epsilon, cfg.omega, cfg.sensitivity,
        "bfloat16",
    )
    if pipe_dist is not None:
        times = []
        for _ in range(3):
            tensor = None
            t0 = time.perf_counter()
            resp, tensor = pipe_dist(u)
            resp = None
            float(np.asarray(tensor[0].ravel()[0]))
            times.append(time.perf_counter() - t0)
        out["ved_pipeline_dist_bf16_compile_plus_first_s"] = times[0]
        out["ved_pipeline_dist_bf16_s"] = min(times[1:])
        out["ved_pipeline_dist_over_plain"] = (
            out["ved_pipeline_dist_bf16_s"] / out["ved_pipeline_bf16_s"]
        )
        tensor = None

    # round 5: the *default* config is smooth_fd (the gaussian_derivative
    # measurement above stays as the reference-exact mode's datum)
    out["ved_pipeline_default_mode"] = cfg.hessian_mode
    out["ved_pipeline_default_compile_plus_first_s"] = (
        out["ved_pipeline_fd_compile_plus_first_s"]
        if cfg.hessian_mode == "smooth_fd"
        else out["ved_pipeline_compile_plus_first_s"]
    )

    # the solve below uses the default (gaussian_derivative) tensor
    tensor = None
    resp, tensor = pipeline(u)
    resp = None

    levels = build_level_descriptors(shape, spacing)
    mad_cfg = MADConfig(
        time_step=cfg.time_step, tolerance=1e-6, max_cycles=50,
        operator_repr="compressed", use_pallas=True,
    )

    builder = _compiled_hierarchy_builder(
        levels, mad_cfg.time_step, "dca", "compressed"
    )
    hier = None
    times = []
    for _ in range(3):
        hier = None
        t0 = time.perf_counter()
        hier = builder(tensor)
        float(np.asarray(hier.operators[0].diag_plane.ravel()[0]))
        times.append(time.perf_counter() - t0)
    out["ved_setup_compile_plus_first_s"] = times[0]
    out["ved_setup_s"] = min(times[1:])
    tensor = None  # the solve needs only (hier, u)

    solver = _compiled_solver(levels, mad_cfg)

    res = None
    times = []
    for _ in range(3):
        res = None
        t0 = time.perf_counter()
        res = solver(hier, u)
        float(np.asarray(res.output.ravel()[0]))
        times.append(time.perf_counter() - t0)
    out["ved_solve_compile_plus_first_s"] = times[0]
    out["ved_solve_to_1e-6_s"] = min(times[1:])
    out["ved_solve_cycles"] = int(res.num_cycles[0])
    out["ved_final_relres"] = float(res.final_residual[0])

    # mixed-precision variant: inner cycles on a bf16 hierarchy copy
    import dataclasses

    solver16 = _compiled_solver(
        levels, dataclasses.replace(mad_cfg, defect_dtype="bfloat16")
    )
    res = None
    times = []
    for _ in range(3):
        res = None
        t0 = time.perf_counter()
        res = solver16(hier, u)
        float(np.asarray(res.output.ravel()[0]))
        times.append(time.perf_counter() - t0)
    out["ved_solve_bf16_compile_plus_first_s"] = times[0]
    out["ved_solve_bf16_to_1e-6_s"] = min(times[1:])
    out["ved_solve_bf16_cycles"] = int(res.num_cycles[0])
    out["ved_solve_bf16_relres"] = float(res.final_residual[0])

    # FMG datum (VERDICT r4 item 5): full-multigrid initialization + cycles.
    # Measured slower than V-cycles at 512^3 (the FMG init costs more than
    # the cycle it saves at this tolerance), so V-cycle stays the default.
    solver_fmg = _compiled_solver(
        levels, dataclasses.replace(
            mad_cfg, defect_dtype="bfloat16", cycle="fmg"
        )
    )
    res = None
    times = []
    for _ in range(3):
        res = None
        t0 = time.perf_counter()
        res = solver_fmg(hier, u)
        float(np.asarray(res.output.ravel()[0]))
        times.append(time.perf_counter() - t0)
    out["ved_e2e_fmg_compile_plus_first_s"] = times[0]
    out["ved_e2e_fmg_solve_to_1e-6_s"] = min(times[1:])
    out["ved_e2e_fmg_cycles"] = int(res.num_cycles[0])
    out["ved_e2e_fmg_relres"] = float(res.final_residual[0])
    out["ved_e2e_fmg_adopted"] = bool(
        out["ved_e2e_fmg_solve_to_1e-6_s"] < out["ved_solve_bf16_to_1e-6_s"]
    )

    out["ved_total_s"] = (
        out["ved_pipeline_s"] + out["ved_setup_s"]
        + min(out["ved_solve_to_1e-6_s"], out["ved_solve_bf16_to_1e-6_s"])
    )
    # best supported configuration (smooth_fd Hessian + bf16-storage
    # pipeline + bf16 defect cycles), composed from the per-phase times
    out["ved_total_best_s"] = (
        min(out["ved_pipeline_s"], out["ved_pipeline_fd_s"],
            out["ved_pipeline_bf16_s"])
        + out["ved_setup_s"]
        + min(out["ved_solve_to_1e-6_s"], out["ved_solve_bf16_to_1e-6_s"])
    )

    # --- the HEADLINE number (VERDICT r2 item 4): ONE warm end-to-end run of
    # the full claimed configuration — bf16-storage smooth_fd vesselness
    # pipeline -> compressed hierarchy build -> Pallas + bf16-defect solve —
    # where the solve consumes THIS run's tensor and only the final output
    # forces a host transfer.  The composed per-phase sum above stays as the
    # cross-check (ved_e2e_over_phase_sum ~ 1).
    hier = None
    res = None

    def e2e_once():
        t0 = time.perf_counter()
        resp, t = pipeline_bf16(u)
        resp = None
        h = builder(t)
        t = None  # free the tensor before the solve's working set peaks
        r = solver16(h, u)
        float(np.asarray(r.output.ravel()[0]))  # force completion
        return time.perf_counter() - t0, r

    times = []
    for _ in range(3):
        res = None
        dt, res = e2e_once()
        times.append(dt)
    out["ved_e2e_compile_plus_first_s"] = times[0]
    out["ved_e2e_single_call_s"] = min(times[1:])
    out["ved_e2e_cycles"] = int(res.num_cycles[0])
    out["ved_e2e_relres"] = float(res.final_residual[0])
    phase_sum = (
        out["ved_pipeline_bf16_s"] + out["ved_setup_s"]
        + out["ved_solve_bf16_to_1e-6_s"]
    )
    out["ved_e2e_over_phase_sum"] = out["ved_e2e_single_call_s"] / phase_sum
    return out


def _run_weak_scaling(per_chip_sizes=(64, 128), max_devices: int = 8) -> dict:
    """Weak-scaling study on the virtual CPU device mesh: a fixed per-chip
    block (per_chip^3), 1 -> max_devices chips along one axis, timing a FULL
    MAD V-cycle solve (fixed 2 cycles: smoothing, transfers, coarse solve,
    residuals) on the gspmd and explicit-halo (overlap) paths — not bare
    sweeps, whose ~100 us duration at 32^3 only measured fixed dispatch
    overhead (VERDICT r2 weak #3).  On virtual devices all "chips" share the
    host's cores, so perfect weak scaling is t_c = c * t_1 and the plumbing
    efficiency is t_1 * c / t_c; on real hardware (c real chips) the
    conventional t_1 / t_c applies.  Must run in a process where
    JAX_PLATFORMS=cpu and xla_force_host_platform_device_count are set."""
    import jax
    import jax.numpy as jnp

    from multigridanisotropicdiffusion_tpu.core.grids import (
        build_level_descriptors,
    )
    from multigridanisotropicdiffusion_tpu.models.mad import (
        MADConfig,
        _compiled_hierarchy_builder,
        mad_diffusion,
    )
    from multigridanisotropicdiffusion_tpu.parallel.sharding import make_grid_mesh

    out = {
        "per_chip_blocks": list(per_chip_sizes),
        "platform": jax.default_backend(),
        "workload": "2 V-cycles of the full MAD solve (compressed operator)",
    }
    n_avail = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8) if c <= min(max_devices, n_avail)]
    # exactly 2 cycles: tolerance 0 can't be met, max_cycles stops the loop
    base = dict(time_step=0.1, tolerance=0.0, max_cycles=2,
                operator_repr="compressed")
    for per_chip in per_chip_sizes:
        results = {}
        for c in counts:
            shape = (per_chip * c, per_chip, per_chip)
            rng = np.random.default_rng(0)
            a = rng.normal(size=(3, 3, *shape)).astype(np.float32)
            full = np.einsum("ik...,jk...->ij...", a, a)
            for d in range(3):
                full[d, d] += 2.0
            tensor = tuple(
                jnp.asarray(full[i, j])
                for i, j in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
            )
            del a, full
            img = jnp.asarray(
                rng.normal(size=shape).astype(np.float32) * 10.0
            )
            levels = build_level_descriptors(shape, (1.0,) * 3)
            builder = _compiled_hierarchy_builder(levels, 0.1, "dca",
                                                  "compressed")
            hier = builder(tensor)
            mesh = make_grid_mesh(
                3, devices=jax.devices()[:c], mesh_shape=(c, 1, 1)
            )
            from multigridanisotropicdiffusion_tpu.models.mad import (
                _compiled_solver,
            )
            from multigridanisotropicdiffusion_tpu.parallel.sharding import (
                shard_field,
                shard_hierarchy,
            )

            hier_s = shard_hierarchy(hier, levels, mesh, 8)
            b = shard_field(img, mesh, 8)
            for halo in ("gspmd", "overlap"):
                cfg = MADConfig(halo=halo, **base)
                solver = _compiled_solver(levels, cfg, mesh, 8)

                def run():
                    t0 = time.perf_counter()
                    r = solver(hier_s, b)
                    r.output.block_until_ready()
                    return time.perf_counter() - t0

                run()  # compile + warm
                results.setdefault(halo, {})[c] = min(run() for _ in range(2))
            hier = hier_s = tensor = img = b = None
        block = {"solve_s_by_chips": results}
        for halo, res in results.items():
            if 1 in res:
                block[f"{halo}_plumbing_efficiency_by_chips"] = {
                    c: res[1] * c / res[c] for c in res
                }
        out[f"block_{per_chip}"] = block
    out["breakdown"] = _weak_breakdown(max(per_chip_sizes), counts)
    return out


def _weak_breakdown(per_chip: int, counts) -> dict:
    """Where the virtual-mesh weak-scaling time goes (VERDICT r3 #3): ablate
    the fine-level RBGS sweep at ``per_chip``^3 blocks into (a) the production
    overlap path, (b) the plain exchange-then-contract shard_map path, (c)
    compute only — zero halos, NO collectives, no splice — and (d) exchange
    only, plus the partitioner-op census of the gspmd sweep's compiled HLO.

    Measured on the 2-core host (8 sweeps, 128^3 blocks, 1..8 virtual
    devices): the ppermute exchange is <1% of the sweep; even the
    zero-communication compute-only path drops to ~0.77 plumbing efficiency
    at 8 devices — 8 device threads timeshare 2 cores while the 1-device
    baseline uses both via intra-op threading, so host-silicon contention,
    not halo machinery, is the floor.  The overlap restructure (interior
    contraction + slab recompute + dynamic_update_slice splices) costs ~12%
    more than the plain path here because there is no real communication to
    hide; on a real chip the identical machinery measures dist_over_plain
    ~0.99 (see dist_overhead_one_chip).  The gspmd CPU partitioner emits
    ~4.5x the hand-path's collective-permutes (18/sweep vs 4) plus a
    dynamic-slice/pad/fusion census several times larger — the '0.18
    efficiency' is partitioner program structure, not the solver."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec

    from multigridanisotropicdiffusion_tpu.ops.compressed import (
        assemble_compressed_dca,
    )
    from multigridanisotropicdiffusion_tpu.ops.smoothers import (
        rb_gauss_seidel_sweep,
    )
    from multigridanisotropicdiffusion_tpu.parallel import halo as H
    from multigridanisotropicdiffusion_tpu.parallel.sharding import (
        make_grid_mesh,
    )

    REPS = 8
    out = {
        "per_chip_block": per_chip,
        "workload": f"{REPS} fine-level RBGS sweeps, compressed operator",
    }

    def make_inputs(c):
        shape = (per_chip * c, per_chip, per_chip)
        rng = np.random.default_rng(0)
        a = rng.normal(size=(3, 3, *shape)).astype(np.float32)
        full = np.einsum("ik...,jk...->ij...", a, a)
        for d in range(3):
            full[d, d] += 2.0
        tensor = tuple(
            jnp.asarray(full[i, j])
            for i, j in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
        )
        del a, full
        op = assemble_compressed_dca(tensor, (1.0,) * 3, 0.1)
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        b = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        return op, x, b

    def timeit(fn, *args):
        jax.block_until_ready(fn(*args))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    times = {}
    for c in counts:
        mesh = make_grid_mesh(3, devices=jax.devices()[:c],
                              mesh_shape=(c, 1, 1))
        spec = PartitionSpec("x", None, None)
        sh = NamedSharding(mesh, spec)
        op, x, b = jax.tree.map(
            lambda t: jax.device_put(t, sh), make_inputs(c)
        )

        def many(f):
            def run(op, x, b):
                for _ in range(REPS):
                    x = f(op, x, b)
                return x

            return jax.jit(run)

        sweep_ov = H.make_halo_rbgs_sweep(mesh, spec, overlap=True)
        sweep_no = H.make_halo_rbgs_sweep(mesh, spec, overlap=False)

        def compute_only(op, xx, bb):
            def local(op_l, x_l, b_l):
                red = H._global_parity(x_l.shape, mesh, spec)
                radii = H._op_radii(op_l)
                for color in (True, False):
                    off = H._local_offdiag(
                        op_l, jnp.pad(x_l, [(r, r) for r in radii]), radii
                    )
                    x_l = jnp.where(red == color, (b_l - off) / op_l.diag, x_l)
                return x_l

            return H._shmap(mesh, spec, local)(op, xx, bb)

        def exchange_only(op, xx, bb):
            def local(op_l, x_l, b_l):
                for _ in range(2):  # two exchanges/sweep like RBGS
                    x_pad = H._exchange_halos(x_l, mesh, spec, (1, 1, 1))
                    x_l = x_l + 0.0 * x_pad[1:-1, 1:-1, 1:-1]
                return x_l

            return H._shmap(mesh, spec, local)(op, xx, bb)

        row = {
            "overlap": timeit(many(sweep_ov), op, x, b),
            "shard_map": timeit(many(sweep_no), op, x, b),
            "compute_only_no_comm": timeit(many(compute_only), op, x, b),
            "exchange_only": timeit(many(exchange_only), op, x, b),
        }
        # gspmd: same sweeps through the SPMD partitioner + HLO op census
        gs = many(rb_gauss_seidel_sweep)
        lowered = gs.lower(op, x, b).compile()
        hlo = lowered.as_text()
        row["gspmd"] = timeit(gs, op, x, b)
        row["gspmd_hlo_ops"] = {
            k: hlo.count(p)
            for k, p in (
                ("collective_permute", "collective-permute"),
                ("dynamic_slice", "dynamic-slice"),
                ("dynamic_update_slice", "dynamic-update-slice"),
                ("pad", "pad("),
                ("fusion", "fusion"),
                ("copy", "copy("),
            )
        }
        times[c] = row
    out["sweep_s_by_chips"] = times
    if 1 in times:
        out["plumbing_efficiency_by_chips"] = {
            k: {c: times[1][k] * c / times[c][k] for c in times}
            for k in ("overlap", "shard_map", "compute_only_no_comm", "gspmd")
        }
    out["where_the_time_goes"] = (
        "ppermute exchange <1% of sweep time; the zero-communication "
        "compute-only ablation already drops to the same efficiency floor as "
        "the plain shard_map path (8 device threads timesharing the host's "
        "cores vs the 1-device baseline's intra-op threading), so the "
        "virtual-mesh efficiency is host-silicon contention, not halo "
        "machinery.  The overlap restructure pays its slab-splice cost "
        "without real communication to hide (on-chip: dist_over_plain~0.99)."
        "  gspmd: the CPU partitioner emits ~4.5x the collective-permutes of "
        "the hand path plus a much larger dynamic-slice/fusion census (see "
        "gspmd_hlo_ops)."
    )
    return out


def _run_dist_overhead(n: int = 256) -> dict:
    """Distributed-path overhead on ONE real chip: the shard_map-wrapped
    Pallas sweep (local masking + slab splice machinery, 1-device mesh — no
    actual communication) vs the plain single-chip Pallas sweep.  The ratio
    bounds the per-chip cost the 8-chip north-star config pays on top of the
    single-chip kernel (VERDICT r1 item 1's <=1.3x criterion, minus ICI)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec

    from multigridanisotropicdiffusion_tpu.ops.compressed import (
        assemble_compressed_dca,
    )
    from multigridanisotropicdiffusion_tpu.ops.pallas_smoothers import (
        pallas_rbgs_sweep,
    )
    from multigridanisotropicdiffusion_tpu.parallel.halo import (
        make_halo_pallas_rbgs_sweep,
    )
    from multigridanisotropicdiffusion_tpu.parallel.sharding import make_grid_mesh

    dtype = jnp.float32
    shape = (n, n, n)
    out = {"grid": list(shape), "device": str(jax.devices()[0])}

    @jax.jit
    def make(key):
        ks = jax.random.split(key, 7)
        t = tuple(
            jax.random.uniform(ks[i], shape, dtype, 1.0, 3.0) if i in (0, 3, 5)
            else jax.random.uniform(ks[i], shape, dtype, -0.3, 0.3)
            for i in range(6)
        )
        x = jax.random.normal(ks[6], shape, dtype)
        return t, x

    tensor, x = make(jax.random.PRNGKey(0))
    comp = jax.jit(lambda t: assemble_compressed_dca(t, (1.0,) * 3, 0.1))(tensor)
    b = x + 1.0
    mesh = make_grid_mesh(3, devices=jax.devices()[:1], mesh_shape=(1, 1, 1))
    spec = PartitionSpec("x", "y", "z")
    interpret = jax.default_backend() != "tpu"
    dist_sweep = make_halo_pallas_rbgs_sweep(mesh, spec, interpret)

    def timed(fn):
        @jax.jit
        def many(comp, x, b):
            return jax.lax.fori_loop(0, SWEEPS, lambda i, x: fn(comp, x, b), x)

        t0 = time.perf_counter()
        float(np.asarray(many(comp, x, b).ravel()[0]))
        compile_s = time.perf_counter() - t0
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(many(comp, x, b).ravel()[0]))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return compile_s, best / SWEEPS

    out["plain_compile_s"], out["plain_sweep_s"] = timed(pallas_rbgs_sweep)
    out["dist_compile_s"], out["dist_sweep_s"] = timed(dist_sweep)
    out["dist_over_plain"] = out["dist_sweep_s"] / out["plain_sweep_s"]
    return out


def _run_cycle_breakdown(n: int = 256) -> dict:
    """Per-phase roofline of the production V-cycle at n^3 (VERDICT r3 #6):
    time each phase standalone per level (fori_loop-amortized) — smoother
    sweep, residual, restrict+prolong transfer pair, coarsest LU, norm —
    then compose the one-V-cycle model (iterations_per_grid=2: 4 sweeps +
    1 residual + 1 transfer pair per non-coarsest level + 1 LU + the outer
    residual/norm) and report every phase's share and achieved HBM fraction,
    cross-checked against a directly-timed full V-cycle."""
    import jax
    import jax.numpy as jnp

    from multigridanisotropicdiffusion_tpu.core.grids import (
        build_level_descriptors,
    )
    from multigridanisotropicdiffusion_tpu.models.mad import (
        _compiled_hierarchy_builder,
        v_cycle,
    )
    from multigridanisotropicdiffusion_tpu.ops.coarse import coarse_solve
    from multigridanisotropicdiffusion_tpu.ops.smoothers import (
        make_residual,
        make_smoother,
    )
    from multigridanisotropicdiffusion_tpu.ops.transfer import prolong, restrict

    dtype = jnp.float32
    shape = (n, n, n)
    out = {"grid": list(shape), "device": str(jax.devices()[0]),
           "iterations_per_grid": 2}

    @jax.jit
    def make_inputs(key):
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

    tensor, b0 = make_inputs(jax.random.PRNGKey(0))
    levels = build_level_descriptors(shape, (1.0,) * 3)
    builder = _compiled_hierarchy_builder(levels, 0.1, "dca", "compressed")
    hier = builder(tensor)
    jax.block_until_ready(jax.tree.leaves(hier)[0])
    del tensor

    smooth = make_smoother("gauss_seidel", use_pallas=True)
    resid = make_residual(use_pallas=True)
    REPS = 30

    @jax.jit
    def _noop(v):
        return v + 1.0

    tiny = jnp.zeros((8, 128), dtype)
    float(np.asarray(_noop(tiny).ravel()[0]))
    overhead = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(_noop(tiny).ravel()[0]))
        dt = time.perf_counter() - t0
        overhead = dt if overhead is None else min(overhead, dt)

    def timed_loop(body, x0, *args):
        """min wall-clock of REPS fori_loop iterations, dispatch-corrected."""
        fn = jax.jit(
            lambda x, *a: jax.lax.fori_loop(
                0, REPS, lambda i, x_: body(x_, *a), x
            )
        )
        float(np.asarray(fn(x0, *args).ravel()[0]))  # compile + warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fn(x0, *args).ravel()[0]))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return max(best - overhead, 1e-9) / REPS

    rng = np.random.default_rng(0)
    per_level = []
    coarsest = len(levels) - 1
    for l, lvl in enumerate(levels):
        op = hier.operators[l]
        x = jnp.asarray(rng.normal(size=lvl.shape).astype(np.float32))
        b = jnp.asarray(rng.normal(size=lvl.shape).astype(np.float32))
        rec = {"level": l, "shape": list(lvl.shape)}
        voxels = float(np.prod(lvl.shape))
        if l == coarsest:
            rec["lu_solve_s"] = timed_loop(
                lambda y, s: coarse_solve(s, y), b, hier.solver
            )
        else:
            rec["sweep_s"] = timed_loop(
                lambda y, o, bb: smooth(o, y, bb), x, op, b
            )
            rec["resid_s"] = timed_loop(
                lambda y, o, bb: resid(o, y, bb), x, op, b
            )
            cent = levels[l + 1].centering
            rec["transfer_pair_s"] = timed_loop(
                lambda y: prolong(restrict(y, cent), cent), x
            )
            # achieved HBM fractions (f32 byte models per voxel of this level)
            rec["sweep_pct_sol"] = (
                voxels * BYTES_COMPRESSED / rec["sweep_s"] / (HBM_GBPS * 1e9)
            )
            rec["resid_pct_sol"] = (
                voxels * (10 + 2 + 1) * 4 / rec["resid_s"] / (HBM_GBPS * 1e9)
            )
            rec["transfer_pct_sol"] = (
                voxels * (1 + 0.125 + 0.125 + 1) * 4
                / rec["transfer_pair_s"] / (HBM_GBPS * 1e9)
            )
        per_level.append(rec)

    # norm of the fine-level residual (the outer tolerance check)
    r0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    norm_s = timed_loop(
        lambda s, r: jnp.linalg.norm(r + s).astype(dtype).reshape(()),
        jnp.zeros((), dtype), r0
    )
    out["norm_s"] = norm_s

    # compose the one-V-cycle model
    ipg = 2
    phases = {"smoother": 0.0, "residual": 0.0, "transfer": 0.0, "coarse_lu": 0.0}
    for rec in per_level:
        if "lu_solve_s" in rec:
            phases["coarse_lu"] += rec["lu_solve_s"]
        else:
            phases["smoother"] += 2 * ipg * rec["sweep_s"]
            phases["residual"] += rec["resid_s"]
            phases["transfer"] += rec["transfer_pair_s"]
    # the outer loop adds one fine-level residual + the norm per cycle
    phases["residual"] += per_level[0]["resid_s"]
    phases["norm"] = norm_s
    total = sum(phases.values())
    out["per_level"] = per_level
    out["phase_s_per_cycle"] = phases
    out["phase_share"] = {k: v / total for k, v in phases.items()}
    out["cycle_model_s"] = total

    # cross-check: a directly-timed full V-cycle (same smoother/residual)
    x0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    out["cycle_measured_s"] = timed_loop(
        lambda x, h, bb: v_cycle(h, levels, smooth, ipg, x, bb, 0,
                                 resid=resid),
        x0, hier, b0,
    )
    out["model_over_measured"] = total / out["cycle_measured_s"]
    worst = max(
        (k for k in phases if k != "coarse_lu"), key=lambda k: phases[k]
    )
    out["next_bottleneck"] = (
        f"{worst} ({phases[worst] * 1e3:.1f} ms/cycle, "
        f"{100 * phases[worst] / total:.0f}% of the cycle)"
    )
    return out


def _run_2d(n: int = 4096) -> dict:
    """The reference's own 2D workload class at scale (VERDICT r3 #7): RBGS
    sweep throughput on a 4096^2 9-point DCA operator (stored 9-plane vs
    compressed 6-plane) plus a full implicit diffusion step (V-cycles to
    1e-6) with the lena-test tensor diag(50, 30)
    (test/itk2DDiffusionTest_GS.cxx:66-70, scaled up)."""
    import jax
    import jax.numpy as jnp

    from multigridanisotropicdiffusion_tpu.core.grids import (
        build_level_descriptors,
    )
    from multigridanisotropicdiffusion_tpu.models.mad import (
        MADConfig,
        _compiled_hierarchy_builder,
        _compiled_solver,
    )
    from multigridanisotropicdiffusion_tpu.ops.compressed import (
        assemble_compressed_dca,
    )
    from multigridanisotropicdiffusion_tpu.ops.dca import assemble_dca
    from multigridanisotropicdiffusion_tpu.ops.smoothers import (
        rb_gauss_seidel_sweep,
    )

    dtype = jnp.float32
    shape = (n, n)
    out = {"grid": list(shape), "device": str(jax.devices()[0])}
    voxels = float(np.prod(shape))

    @jax.jit
    def make_inputs(key):
        ks = jax.random.split(key, 2)
        tensor = (
            jnp.full(shape, 50.0, dtype),
            jnp.zeros(shape, dtype),
            jnp.full(shape, 30.0, dtype),
        )
        x = jax.random.normal(ks[0], shape, dtype)
        b = jax.random.uniform(ks[1], shape, dtype, 0.0, 255.0)
        return tensor, x, b

    tensor, x, b = make_inputs(jax.random.PRNGKey(0))

    @jax.jit
    def _noop(v):
        return v + 1.0

    tiny = jnp.zeros((8, 128), dtype)
    float(np.asarray(_noop(tiny).ravel()[0]))
    overhead = min(
        _timed(lambda: float(np.asarray(_noop(tiny).ravel()[0])))
        for _ in range(3)
    )

    def sweep_study(op, tag, bytes_per_voxel):
        @jax.jit
        def many(op, x, b):
            return jax.lax.fori_loop(
                0, SWEEPS, lambda i, x: rb_gauss_seidel_sweep(op, x, b), x
            )

        float(np.asarray(many(op, x, b).ravel()[0]))  # compile + warm
        best = min(
            _timed(lambda: float(np.asarray(many(op, x, b).ravel()[0])))
            for _ in range(3)
        )
        net = max(best - overhead, 1e-9) / SWEEPS
        out[f"{tag}_sweep_s"] = net
        out[f"{tag}_updates_per_s"] = voxels / net
        out[f"{tag}_pct_sol"] = (
            voxels * bytes_per_voxel / net / (HBM_GBPS * 1e9)
        )

    # 9-point stored form: 2 half-sweeps x (9 planes + x + b read, x write)
    op_s = jax.jit(lambda t: assemble_dca(t, (1.0, 1.0), 0.1))(tensor)
    sweep_study(op_s, "stored", 2 * (9 + 3) * 4)
    op_s = None
    # compressed 2D form: 6 planes
    op_c = jax.jit(lambda t: assemble_compressed_dca(t, (1.0, 1.0), 0.1))(tensor)
    sweep_study(op_c, "compressed", 2 * (6 + 3) * 4)

    # round-5 fused 2D Pallas sweep on the compressed operator
    from multigridanisotropicdiffusion_tpu.ops.pallas_smoothers import (
        pallas_rbgs_sweep,
    )

    @jax.jit
    def many_pallas(op, x, b):
        return jax.lax.fori_loop(
            0, SWEEPS, lambda i, x: pallas_rbgs_sweep(op, x, b), x
        )

    float(np.asarray(many_pallas(op_c, x, b).ravel()[0]))
    best = min(
        _timed(lambda: float(np.asarray(many_pallas(op_c, x, b).ravel()[0])))
        for _ in range(3)
    )
    net = max(best - overhead, 1e-9) / SWEEPS
    out["pallas_sweep_s"] = net
    out["pallas_updates_per_s"] = voxels / net
    out["pallas_pct_sol"] = voxels * 2 * (6 + 3) * 4 / net / (HBM_GBPS * 1e9)
    op_c = None

    # full implicit diffusion step (the lena workload at 4096^2), Pallas 2D
    # sweeps + residual
    levels = build_level_descriptors(shape, (1.0, 1.0))
    cfg = MADConfig(time_step=0.1, tolerance=1e-6, max_cycles=50,
                    operator_repr="compressed", use_pallas=True)
    builder = _compiled_hierarchy_builder(levels, 0.1, "dca", "compressed")
    t0 = time.perf_counter()
    hier = builder(tensor)
    float(np.asarray(jax.tree.leaves(hier)[0].ravel()[0]))
    out["setup_compile_plus_first_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    hier = builder(tensor)
    float(np.asarray(jax.tree.leaves(hier)[0].ravel()[0]))
    out["setup_warm_s"] = time.perf_counter() - t0
    solver = _compiled_solver(levels, cfg)

    def run_once():
        t0 = time.perf_counter()
        res = solver(hier, b)
        float(np.asarray(res.output.ravel()[0]))
        return time.perf_counter() - t0, res

    t0 = time.perf_counter()
    run_once()
    out["solve_compile_plus_first_s"] = time.perf_counter() - t0
    solve_s, res = min((run_once() for _ in range(3)), key=lambda t: t[0])
    out["solve_to_1e-6_s"] = solve_s
    out["solve_cycles"] = int(res.num_cycles[0])
    out["solve_relres"] = float(res.final_residual[0])
    return out


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import subprocess
    import sys

    args = sys.argv[1:]
    if args and args[0] == "--single":
        if "--solve-only" in args:
            print(json.dumps({"solve_only": int(args[1]), **_run_solve(int(args[1]))}))
            return
        if "--ved-only" in args:
            print(json.dumps({"ved_only": int(args[1]), **_run_ved(int(args[1]))}))
            return
        if "--weak-only" in args:
            # force the local-CPU virtual mesh: the env pins a remote-TPU
            # platform and a sitecustomize imports jax at startup, so the
            # config API (not env vars) is the only reliable override
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=8"
            ).strip()
            import jax

            jax.config.update("jax_platforms", "cpu")
            print(json.dumps({"weak_only": 1, **_run_weak_scaling()}))
            return
        if "--dist-only" in args:
            print(json.dumps({"dist_only": int(args[1]), **_run_dist_overhead(int(args[1]))}))
            return
        if "--breakdown-only" in args:
            print(json.dumps({"breakdown_only": int(args[1]),
                              **_run_cycle_breakdown(int(args[1]))}))
            return
        if "--2d-only" in args:
            print(json.dumps({"flat_only": int(args[1]), **_run_2d(int(args[1]))}))
            return
        with_solve = "--solve" in args
        print(run_size(int(args[1]), with_solve))
        return
    if args and args[0] == "--ved":
        # VED north-star workload in its own subprocess per size
        for n in [int(s) for s in args[1:] if s.isdigit()] or [256]:
            cmd = [sys.executable, __file__, "--single", str(n), "--ved-only"]
            subprocess.run(cmd, timeout=3000)
        return

    sizes = [int(s) for s in args if s.isdigit()] or [256, 128]
    import tempfile

    def run_sub(cmd, timeout, env=None):
        """Run a bench subprocess, return (parsed JSON line or None, output).

        Output goes to a temp FILE: backend helper processes can inherit a
        stdout pipe and keep it open past child exit, deadlocking a
        pipe-based capture."""
        with tempfile.NamedTemporaryFile("w+", suffix=".log", delete=False) as f:
            log_path = f.name
        full_env = None
        if env is not None:
            full_env = dict(os.environ)
            full_env.update(env)
        try:
            with open(log_path, "w") as f:
                subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                               timeout=timeout, env=full_env)
        except subprocess.TimeoutExpired:
            return None, open(log_path).read() + "\n[TIMEOUT]"
        out = open(log_path).read()
        for line in out.splitlines():
            if line.startswith("{") and (
                '"metric"' in line or '"ved_only"' in line
                or '"solve_only"' in line or '"weak_only"' in line
                or '"dist_only"' in line or '"breakdown_only"' in line
                or '"flat_only"' in line
            ):
                return json.loads(line), out
        return None, out

    errors = {}

    # 1) Headline = the BASELINE.json north star: full 512^3 VED workload
    # (vesselness pipeline + hierarchy setup + diffusion solve to 1e-6) on one
    # chip; target is <1 s on EIGHT chips (v5e-8), so vs_baseline =
    # target_s / measured_s (>1 = beating the 8-chip target on one chip).
    # Cold 512^3 compiles through the remote tunnel can exceed any single
    # timeout, but every finished compile lands in the persistent cache
    # (JAX_COMPILATION_CACHE_DIR), so a retry RESUMES where the previous
    # attempt died — run up to 3 attempts before falling back, and record the
    # failure loudly instead of silently dropping the headline (VERDICT r1).
    ved = None
    for attempt in range(3):
        ved, out = run_sub(
            [sys.executable, __file__, "--single", "512", "--ved-only"], 2400
        )
        if ved is not None and "ved_total_best_s" in ved:
            break
        errors[f"ved_attempt_{attempt}"] = out[-1500:]
        ved = None

    # 2) smoother-throughput study (rides in extra; fallback headline).
    # NOTE: never pass --solve here — the solve/Galerkin study runs in its
    # own subprocess below (step 3); combining both in one process OOMs the
    # 16 GB chip at 256^3 (smoother operands + Galerkin assembly transients).
    smoother = None
    for n in sizes:
        cmd = [sys.executable, __file__, "--single", str(n)]
        smoother, out = run_sub(cmd, 3000)
        if smoother is not None:
            break
        errors[f"smoother_{n}"] = out[-1500:]
    if smoother is None and ved is None:
        raise SystemExit(f"bench failed everywhere: {json.dumps(errors)[:4000]}")

    # 3) full-solve + Galerkin study at 256^3 (setup & solve times)
    solve_info, out = run_sub(
        [sys.executable, __file__, "--single", "256", "--solve-only"], 2400
    )
    if solve_info is None:
        errors["solve_256"] = out[-1500:]

    # 4) weak-scaling study (full V-cycle solves) on the virtual CPU mesh
    weak, out = run_sub(
        [sys.executable, __file__, "--single", "0", "--weak-only"], 2400,
        env={
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8").strip(),
        },
    )
    if weak is None:
        errors["weak_scaling"] = out[-1500:]

    # 5) distributed-path overhead on a 1-chip mesh (real chip)
    dist, out = run_sub(
        [sys.executable, __file__, "--single", "256", "--dist-only"], 1800
    )
    if dist is None:
        errors["dist_overhead"] = out[-1500:]

    # 6) per-phase V-cycle roofline at 256^3 (real chip)
    breakdown, out = run_sub(
        [sys.executable, __file__, "--single", "256", "--breakdown-only"], 2400
    )
    if breakdown is None:
        errors["cycle_breakdown"] = out[-1500:]

    # 7) the reference's 2D workload class at 4096^2 (real chip)
    flat2d, out = run_sub(
        [sys.executable, __file__, "--single", "4096", "--2d-only"], 2400
    )
    if flat2d is None:
        errors["solve_2d"] = out[-1500:]

    extra = {
        "smoother": smoother,
        "solve_galerkin_256": solve_info,
        "weak_scaling": weak,
        "dist_overhead_one_chip": dist,
        "cycle_breakdown": breakdown,
        "solve_2d_4096": flat2d,
        "errors": errors or None,
    }
    if ved is not None:
        # headline = ONE measured warm end-to-end run (bf16 pipeline ->
        # setup -> Pallas bf16-defect solve); the composed phase sum rides
        # along in extra for the cross-check
        total = ved.get("ved_e2e_single_call_s", ved["ved_total_best_s"])
        extra["north_star"] = ("BASELINE.json: 512^3 VED to 1e-6 in <1 s on "
                               "v5e-8; this measurement uses ONE chip")
        extra["ved"] = ved
        headline = {
            "metric": "ved_512^3_solve_to_1e-6_total_s_one_chip",
            "value": total,
            "unit": "s",
            "vs_baseline": 1.0 / total,
        }
    else:
        headline = {k: smoother[k] for k in
                    ("metric", "value", "unit", "vs_baseline")}
        extra = {**smoother.get("extra", {}), **extra}

    # Full record: side file + a PRECEDING stdout line.  The compact headline
    # dict goes LAST so any tail-truncating/line-parsing driver captures it
    # (VERDICT r2 weak #1: the ~4.4 kB single-line form outgrew the driver's
    # tail twice).
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_extra.json"), "w") as f:
        json.dump({**headline, "extra": extra}, f)
    print(json.dumps({**headline, "extra": extra}))
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
