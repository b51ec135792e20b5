import dataclasses

import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.models.mad import MADConfig, mad_diffusion
from multigridanisotropicdiffusion_tpu.utils.checkpoint import (
    load_checkpoint,
    resume_mad_diffusion,
    save_checkpoint,
)

from .conftest import make_spd_tensor_field


def test_save_load_roundtrip(tmp_path, rng):
    cfg = MADConfig(time_step=0.05, number_of_steps=3)
    field = rng.normal(size=(8, 9))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, field, 2, cfg, extra={"note": "hi"})
    f2, step, extra = load_checkpoint(path, cfg)
    np.testing.assert_array_equal(f2, field)
    assert step == 2 and extra == {"note": "hi"}


def test_fingerprint_mismatch(tmp_path, rng):
    cfg = MADConfig(time_step=0.05)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, rng.normal(size=(4, 4)), 1, cfg)
    with pytest.raises(ValueError):
        load_checkpoint(path, MADConfig(time_step=0.06))


def test_resume_matches_uninterrupted(tmp_path, rng):
    shape = (17, 16)
    tensor = make_spd_tensor_field(rng, shape, 2, hi=2.0)
    image = rng.normal(size=shape)
    cfg = MADConfig(time_step=0.05, number_of_steps=3, tolerance=1e-10)

    # uninterrupted run
    ref = mad_diffusion(image, tensor, config=cfg)

    # run with checkpointing, interrupt after 2 steps, then resume
    path = str(tmp_path / "run.npz")
    partial_cfg = dataclasses.replace(cfg, number_of_steps=2)
    resume_mad_diffusion(image, tensor, partial_cfg, path)
    # pretend a new process resumes the full 3-step run from the checkpoint
    field, step, _ = load_checkpoint(path)
    assert step == 2
    res = resume_mad_diffusion(image, tensor, cfg, path)

    np.testing.assert_allclose(
        np.asarray(res.output), np.asarray(ref.output), rtol=1e-9, atol=1e-9
    )
