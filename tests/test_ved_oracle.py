"""Independent Hessian/vesselness oracle on real data (VERDICT r3 missing #1).

Pins the *composed* production vesselness pipeline (Hessian -> eig ->
vesselness -> tensor, models/ved.py + ops/hessian.py) against
tests/ved_oracle.py — a dense NumPy/scipy float64 transcription of
itkVEDMultigridImageFilter.hxx:158-378 sharing no code with production —
on a crop of the reference's real 69x77x69 angiography volume.  This closes
the blind spot of tests/test_goldens.py (whose VED golden reuses the
production vesselness stages, so a shared bug passes).

Three layers:

* Hessian alone vs scipy.ndimage Gaussian derivatives: few-percent norm bar
  (the FIR discretizations differ; measured rel-L2 <= 0.008 per plane).
* Post-Hessian stages (eig + |value|-sort + vesselness + scale loop +
  tensor) on a SHARED Hessian input: tight (measured ~1e-13; the production
  analytic eigensolver vs LAPACK).
* Full pipeline: measured rel-L2(response) = 0.016, tensor planes <= 0.09
  (the tensor's vessel-axis frame is genuinely ill-conditioned where the
  spectral gap closes, so its bar is looser).

Sensitivity is *executable*: seeding deliberate bugs into the production
pipeline (vesselness alpha, Hessian scale-normalization, a cross-derivative
plane scale) must push the comparison far past the clean bars.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.models import ved as ved_mod
from multigridanisotropicdiffusion_tpu.models.ved import fused_vesselness_tensor
from multigridanisotropicdiffusion_tpu.ops.hessian import hessian as prod_hessian
from multigridanisotropicdiffusion_tpu.utils.io import read_meta_image

from .ved_oracle import oracle_hessian, oracle_pipeline

REFERENCE_DATA = os.environ.get(
    "MAD_REFERENCE_DATA", "/root/reference/test/test_data"
)
VOLUME = os.path.join(REFERENCE_DATA, "ved_test.mhd")
needs_volume = pytest.mark.skipif(
    not os.path.isfile(VOLUME), reason="reference data missing"
)

SCALES = (0.775, 1.245, 2.000)
PARAMS = dict(alpha=0.5, beta=0.5, gamma=5.0, epsilon=0.01, omega=5.0,
              sensitivity=10.0)

# measured clean-vs-bug separation (32^3 crop, f64): clean full-pipeline
# response rel-L2 = 0.016; seeded bugs >= 0.18.
RESP_BAR = 0.04


def _rel(a, b):
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-300))


@pytest.fixture(scope="module")
def crop():
    mi = read_meta_image(VOLUME)
    vol = np.asarray(mi.data, np.float64)
    return vol[18:50, 22:54, 18:50], tuple(mi.spacing)


@pytest.fixture(scope="module")
def oracle_result(crop):
    u, spacing = crop
    return oracle_pipeline(u, SCALES, spacing, **PARAMS)


def _production(u, spacing):
    resp, t = fused_vesselness_tensor(
        jnp.asarray(u), SCALES, spacing, PARAMS["alpha"], PARAMS["beta"],
        PARAMS["gamma"], PARAMS["epsilon"], PARAMS["omega"],
        PARAMS["sensitivity"],
    )
    return np.asarray(resp), [np.asarray(p) for p in t]


@needs_volume
def test_hessian_matches_scipy_oracle(crop):
    u, spacing = crop
    for sigma in SCALES:
        got = prod_hessian(jnp.asarray(u), sigma, spacing)
        want = oracle_hessian(u, sigma, spacing)
        for k, (g, w) in enumerate(zip(got, want)):
            r = _rel(np.asarray(g), w)
            assert r < 0.03, (sigma, k, r)


@needs_volume
def test_post_hessian_stages_match_oracle_exactly(crop):
    """Eig + |value|-sort + vesselness + scale selection + tensor assembly on
    a SHARED Hessian input: the production analytic path must agree with the
    LAPACK/NumPy transcription to fp accuracy (measured ~1e-13)."""
    u, spacing = crop

    def shared_hess(x, sigma, sp):
        return [np.asarray(p) for p in prod_hessian(jnp.asarray(x), sigma, sp)]

    resp_o, t_o = oracle_pipeline(
        u, SCALES, spacing, hessian_fn=shared_hess, **PARAMS
    )
    resp_p, t_p = _production(u, spacing)
    assert _rel(resp_p, resp_o) < 1e-10
    for k, (a, b) in enumerate(zip(t_p, t_o)):
        assert _rel(a, b) < 1e-10, k
        assert float(np.quantile(np.abs(a - b), 0.99)) < 1e-9, k


@needs_volume
def test_full_pipeline_matches_oracle(crop, oracle_result):
    u, spacing = crop
    resp_o, t_o = oracle_result
    resp_p, t_p = _production(u, spacing)
    assert _rel(resp_p, resp_o) < RESP_BAR
    # the tensor's vessel-axis direction is ill-conditioned where the
    # spectral gap closes, so per-plane bars are looser (measured <= 0.09);
    # the basis-free trace 2*d1 + d3 is tighter.
    for k, (a, b) in enumerate(zip(t_p, t_o)):
        assert _rel(a, b) < 0.15, k
    trace_p = t_p[0] + t_p[3] + t_p[5]
    trace_o = t_o[0] + t_o[3] + t_o[5]
    assert _rel(trace_p, trace_o) < 0.05


@needs_volume
def test_oracle_catches_seeded_bugs(crop, oracle_result, monkeypatch):
    """Deliberate production-side bugs must blow past the clean bars — the
    'Done' criterion of VERDICT r3 next-step #4."""
    u, spacing = crop
    resp_o, _ = oracle_result

    # clean baseline passes (guards against a vacuous bar)
    resp_clean, _ = _production(u, spacing)
    assert _rel(resp_clean, resp_o) < RESP_BAR

    # 1) vesselness bug: alpha 0.5 -> 0.6 inside models/ved.py's measure
    orig_measure = ved_mod.vesselness_measure
    monkeypatch.setattr(
        ved_mod, "vesselness_measure",
        lambda w, alpha, beta, gamma: orig_measure(w, alpha * 1.2, beta, gamma),
    )
    resp_bug, _ = _production(u, spacing)
    assert _rel(resp_bug, resp_o) > 4 * RESP_BAR  # measured 0.26
    monkeypatch.setattr(ved_mod, "vesselness_measure", orig_measure)

    # 2) Hessian bug: drop the sigma^2 scale normalization
    orig_hessian = ved_mod.hessian
    monkeypatch.setattr(
        ved_mod, "hessian",
        lambda x, s, sp, **kw: orig_hessian(
            x, s, sp, **{**kw, "normalize_across_scale": False}
        ),
    )
    resp_bug, _ = _production(u, spacing)
    assert _rel(resp_bug, resp_o) > 4 * RESP_BAR  # measured 0.46
    monkeypatch.setattr(ved_mod, "hessian", orig_hessian)

    # 3) Hessian bug: 10% error on the (0,1) cross-derivative plane
    def skewed_hessian(x, s, sp, **kw):
        h = list(orig_hessian(x, s, sp, **kw))
        h[1] = 1.1 * h[1]
        return tuple(h)

    monkeypatch.setattr(ved_mod, "hessian", skewed_hessian)
    resp_bug, _ = _production(u, spacing)
    assert _rel(resp_bug, resp_o) > RESP_BAR
