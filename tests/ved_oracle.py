"""Implementation-independent oracle for the VED vesselness stages.

A dense NumPy/scipy float64 transcription of the reference's
Hessian -> eigendecomposition -> vesselness -> diffusion-tensor pipeline
(/root/reference/include/itkVEDMultigridImageFilter.hxx:158-378), sharing
NO code with the production pipeline:

* Hessian: ``scipy.ndimage.gaussian_filter`` derivative kernels (scipy's own
  truncated-FIR Gaussian machinery — neither the production moment-corrected
  kernels nor ITK's recursive IIR), sigma expressed in voxel units per axis,
  derivatives rescaled to physical coordinates, ``sigma**2``
  scale-normalization (ITK's NormalizeAcrossScale for 2nd-order derivatives,
  .hxx:169).
* Eigendecomposition: LAPACK via ``numpy.linalg.eigh`` (value-ascending, the
  same convention as the reference's vnl_symmetric_eigensystem).
* Vesselness: a line-by-line transcription of VesselnessFunction
  (.hxx:176-212), applied to |value|-ascending eigenvalues (.hxx:262-268)
  while the kept eigenvector frame stays value-ascending (the reference
  quirk: only the copied eigenvalue array is re-sorted).
* Scale loop: the first scale always initializes the running best (.hxx:272);
  later scales replace it on strictly-greater response.
* Tensor: ``T = Q diag(1+(eps-1)V, 1+(eps-1)V, 1+(omega-1)V) Q^T`` with
  ``V = response**(1/sensitivity)``, identity where ``V <= 0``
  (.hxx:302-378).

Because the Gaussian discretizations differ (scipy sampled-derivative FIR vs
production moment-corrected FIR vs ITK IIR), full-pipeline comparisons are
norm-based with a few-percent bar; stage comparisons on a *shared* Hessian
input are tight.  Plane order everywhere is the canonical symmetric order
((0,0),(0,1),(0,2),(1,1),(1,2),(2,2)).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

SYM_PAIRS_3D = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def oracle_hessian(u, sigma, spacing):
    """Scale-normalized Gaussian Hessian planes (canonical symmetric order)."""
    u = np.asarray(u, np.float64)
    spacing = np.asarray(spacing, np.float64)
    sig_vox = float(sigma) / spacing  # per-axis sigma in voxel units
    planes = []
    for i, j in SYM_PAIRS_3D:
        order = [0, 0, 0]
        if i == j:
            order[i] = 2
        else:
            order[i] = 1
            order[j] = 1
        d = ndimage.gaussian_filter(
            u, sigma=sig_vox, order=order, mode="nearest", truncate=4.0
        )
        # scipy differentiates w.r.t. voxel index -> rescale to physical
        # coordinates, then apply Lindeberg gamma=1 normalization (sigma^2
        # for second-order derivatives).
        d /= spacing[i] * spacing[j]
        planes.append(d * float(sigma) ** 2)
    return planes


def _sym_matrices(planes):
    """(..., 3, 3) symmetric matrices from 6 canonical planes."""
    h = np.empty(planes[0].shape + (3, 3), np.float64)
    for (i, j), p in zip(SYM_PAIRS_3D, planes):
        h[..., i, j] = p
        h[..., j, i] = p
    return h


def oracle_vesselness(eigenvalues, alpha, beta, gamma):
    """VesselnessFunction (.hxx:176-212) on |value|-ascending eigenvalues
    ``(l1, l2, l3)``; zero wherever l2 >= 0 or l3 >= 0."""
    l1, l2, l3 = (np.asarray(l, np.float64) for l in eigenvalues)
    out = np.zeros(l1.shape, np.float64)
    m = (l2 < 0) & (l3 < 0)
    if not np.any(m):
        return out
    l1m, l2m, l3m = l1[m], l2[m], l3[m]
    ra = np.abs(l2m) / np.abs(l3m)
    rb = np.abs(l1m) / np.sqrt(np.abs(l2m * l3m))
    s2 = l1m * l1m + l2m * l2m + l3m * l3m
    c = 1e-5
    smooth = np.exp(-(2.0 * c * c) / (np.abs(l2m) * l3m * l3m))
    out[m] = (
        smooth
        * (1.0 - np.exp(-(ra * ra) / (2.0 * alpha * alpha)))
        * np.exp(-(rb * rb) / (2.0 * beta * beta))
        * (1.0 - np.exp(-s2 / (2.0 * gamma * gamma)))
    )
    return out


def oracle_pipeline(
    u,
    scales,
    spacing,
    alpha=0.5,
    beta=0.5,
    gamma=5.0,
    epsilon=0.01,
    omega=5.0,
    sensitivity=10.0,
    hessian_fn=oracle_hessian,
):
    """Full reference pipeline on a dense volume.

    Returns ``(response, tensor_planes)`` with ``tensor_planes`` in the
    canonical symmetric order.  ``hessian_fn(u, sigma, spacing)`` is
    injectable so stage tests can share a Hessian with the production path.
    """
    u = np.asarray(u, np.float64)
    best_resp = None
    best_w = best_q = None
    for k, sigma in enumerate(scales):
        h = _sym_matrices(hessian_fn(u, sigma, spacing))
        w, q = np.linalg.eigh(h)  # value-ascending, like vnl (.hxx:259-268)
        aidx = np.argsort(np.abs(w), axis=-1, kind="stable")
        wabs = np.take_along_axis(w, aidx, axis=-1)
        resp = oracle_vesselness(
            (wabs[..., 0], wabs[..., 1], wabs[..., 2]), alpha, beta, gamma
        )
        if k == 0:
            # the first scale always initializes the running best (.hxx:272)
            best_resp, best_w, best_q = resp, w, q
        else:
            better = resp > best_resp
            best_resp = np.where(better, resp, best_resp)
            best_w = np.where(better[..., None], w, best_w)
            best_q = np.where(better[..., None, None], q, best_q)
    del best_w  # the tensor uses only the frame + response

    v = np.power(np.maximum(best_resp, 0.0), 1.0 / sensitivity)
    d1 = 1.0 + (epsilon - 1.0) * v
    d3 = 1.0 + (omega - 1.0) * v
    # T = Q D Q^T, value-ascending columns, omega weight on the largest
    # signed eigenvalue's direction (.hxx:327-356)
    d = np.stack([d1, d1, d3], axis=-1)
    t = np.einsum("...ik,...k,...jk->...ij", best_q, d, best_q)
    eye = np.eye(3)
    active = v > 0.0
    t = np.where(active[..., None, None], t, eye)
    planes = [t[..., i, j] for i, j in SYM_PAIRS_3D]
    return best_resp, planes
