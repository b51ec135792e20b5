"""Generate the checked-in golden outputs (tests/goldens/*.npz).

Run from the repo root:  python -m tests.make_goldens

Goldens are produced by the reference-semantics solver (lexicographic GS via
the native C++ library, float64 — tests/reference_solver.py) on the
reference's own ctest workloads (SURVEY.md §4):

* lena.jpg, constant tensor diag(50, 30), dt=0.1, 1 step, 2 its/grid,
  tol 1e-10, V-cycle (test/itk2DDiffusionTest_GS.cxx:61-97);
* ved_test.mhd (69x77x69 int16 angiography), GS, 3 its/grid, 5 default
  scales, omega=1.5, 1 iteration, 4 diffusion steps, dt=0.1, tol 1e-10
  (test/itkVEDTest_GS.cxx:60-92).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
REFERENCE_DATA = os.environ.get(
    "MAD_REFERENCE_DATA", "/root/reference/test/test_data"
)


def make_lena_golden():
    import jax.numpy as jnp

    from multigridanisotropicdiffusion_tpu.utils.io import read_image_2d

    from .reference_solver import reference_mad_solve

    img = np.asarray(read_image_2d(os.path.join(REFERENCE_DATA, "lena.jpg")),
                     dtype=np.float64)
    shape = img.shape
    tensor = (
        jnp.full(shape, 50.0), jnp.zeros(shape), jnp.full(shape, 30.0)
    )
    out = reference_mad_solve(
        img, tensor, (1.0, 1.0), time_step=0.1, number_of_steps=1,
        iterations_per_grid=2, tolerance=1e-10, max_cycles=100,
    )
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "lena_gs_v.npz"),
        input=img.astype(np.float32),
        output=out.astype(np.float64),
    )
    print("lena golden:", out.shape, "mean", out.mean())


def make_ved_golden():
    from multigridanisotropicdiffusion_tpu.models.ved import VEDConfig
    from multigridanisotropicdiffusion_tpu.utils.io import read_meta_image

    from .reference_solver import reference_ved

    mi = read_meta_image(os.path.join(REFERENCE_DATA, "ved_test.mhd"))
    vol, spacing = mi.data, mi.spacing
    cfg = VEDConfig(
        omega=1.5, iterations=1, diffusion_iterations=4, time_step=0.1,
        tolerance=1e-10, diffusion_iterations_per_grid=3,
    )
    out = reference_ved(np.asarray(vol, np.float64), tuple(spacing), cfg)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "ved_gs_v.npz"),
        output=out.astype(np.float64),
        spacing=np.asarray(spacing, np.float64),
    )
    print("ved golden:", out.shape, "mean", out.mean())


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    make_lena_golden()
    make_ved_golden()
