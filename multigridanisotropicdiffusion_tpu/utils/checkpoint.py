"""Checkpoint / resume for long diffusion runs.

The reference has no checkpointing (SURVEY.md §5); its closest analog is
reusing setup products across time steps.  For long multi-step or multi-VED
runs on preemptible TPU pools, this module snapshots the outer solver state —
the current field, step index, and config fingerprint — so a run can resume
mid-time-stepping.  Setup products (hierarchy, LU) are cheap to rebuild from
the tensor, so only the minimal state is persisted.

Plain ``.npz`` files: portable, dependency-free, and the state is a handful of
arrays (orbax would be warranted for sharded multi-host state; the arrays here
are gathered to host first).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Any, Tuple

import numpy as np


def _config_fingerprint(config) -> str:
    payload = json.dumps(dataclasses.asdict(config), sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save_checkpoint(path: str, field, step: int, config, extra: dict | None = None) -> None:
    """Snapshot the solver state after completing ``step`` time steps."""
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp + ".npz",
        field=np.asarray(field),
        step=np.int64(step),
        fingerprint=np.bytes_(_config_fingerprint(config).encode()),
        extra=np.bytes_(json.dumps(extra or {}).encode()),
    )
    src = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(src, path)


def load_checkpoint(path: str, config=None) -> Tuple[np.ndarray, int, dict]:
    """Load a snapshot; verifies the config fingerprint when given."""
    with np.load(path) as data:
        field = data["field"]
        step = int(data["step"])
        fp = bytes(data["fingerprint"]).decode()
        extra = json.loads(bytes(data["extra"]).decode())
    if config is not None and fp != _config_fingerprint(config):
        raise ValueError(
            "checkpoint was written with a different solver config "
            f"(fingerprint {fp})"
        )
    return field, step, extra


def resume_mad_diffusion(image, tensor, config, checkpoint_path: str, **kwargs):
    """Run (or resume) a multi-step MAD diffusion with checkpointing after
    every time step.  Returns the final MADResult of the last executed step."""
    from ..models.mad import mad_diffusion

    # Fingerprint the per-step config: resuming with a larger
    # number_of_steps is the intended use, so it must not invalidate.
    one_step = dataclasses.replace(config, number_of_steps=1)

    start_step = 0
    field = image
    if os.path.exists(checkpoint_path):
        field, start_step, _ = load_checkpoint(checkpoint_path, one_step)
        if start_step >= config.number_of_steps:
            raise ValueError(
                f"checkpoint already contains all {config.number_of_steps} steps"
            )

    result = None
    for step in range(start_step, config.number_of_steps):
        result = mad_diffusion(field, tensor, config=one_step, **kwargs)
        field = result.output
        save_checkpoint(checkpoint_path, field, step + 1, one_step)
    return result
