"""Two-process multi-host execution test (VERDICT r2 item 3).

Spawns 2 worker processes on localhost (CPU backend, 4 virtual devices each),
which initialize ``jax.distributed`` against a local coordinator, build the
DCN-major ``make_multihost_grid_mesh``, and run a small MAD solve on both the
gspmd and explicit-halo (overlap) paths.  The parent asserts rank 0's verdict:
8 global devices across 2 processes, convergence, and equality with the
single-process solve — the first executed evidence for the multi-host entry
points in ``parallel/sharding.py``.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_solve(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    out_path = tmp_path / "verdict.json"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

    env = dict(os.environ)
    # must be set before interpreter start: the installed sitecustomize
    # imports jax immediately (CLAUDE.md) — env-var config is the only lever
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        p for p in flags.split() if "host_platform_device_count" not in p
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # APPEND to PYTHONPATH (replacing it would drop the sitecustomize dir)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    logs = []
    for rank in range(2):
        log = open(tmp_path / f"rank{rank}.log", "w")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, coordinator, "2", str(rank),
                 str(out_path)],
                env=env, stdout=log, stderr=subprocess.STDOUT,
                cwd=repo_root,
            )
        )
    try:
        for p in procs:
            p.wait(timeout=800)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    def rank_log(rank):
        return (tmp_path / f"rank{rank}.log").read_text()[-3000:]

    for rank, p in enumerate(procs):
        assert p.returncode == 0, f"rank {rank} failed:\n{rank_log(rank)}"
    assert out_path.exists(), f"no verdict written:\n{rank_log(0)}"
    verdict = json.loads(out_path.read_text())

    assert verdict["process_count"] == 2
    assert verdict["global_devices"] == 8
    assert verdict["local_devices"] == 4
    # DCN-major: hosts partition the first spatial axis
    assert verdict["mesh_shape"]["x"] % 2 == 0
    for halo in ("gspmd", "overlap"):
        res = verdict["results"][halo]
        assert res["final_relres"] <= 1e-9, (halo, res)
        assert res["num_cycles"] == verdict["ref_num_cycles"], (halo, res)
        assert res["max_abs_diff_vs_single"] < 1e-9, (halo, res)
    # VED end to end across both processes (sharded kernel pipeline + solve)
    v = verdict["ved"]
    assert v["kernel_pipeline_engaged"], v
    assert v["final_relres"] <= 1e-8, v
    # interpret-kernel arccos polynomial (~2e-8 rel) is the accuracy floor
    assert v["max_abs_diff_vs_single"] < 1e-5 * max(v["out_scale"], 1.0), v
