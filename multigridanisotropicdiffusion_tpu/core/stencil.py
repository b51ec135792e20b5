"""Stencil-operator container and application.

The reference stores one sparse-matrix row per voxel as an
image-of-neighborhoods (``mad::StencilImage``,
/root/reference/include/mad/itkStencilImage.h:48-111) plus a dynamic
active-offset list.  On TPU we invert the layout: a structure-of-arrays
``coeffs`` tensor of shape ``(K, *grid_shape)`` holding one full coefficient
plane per active offset, plus a *static* offset table.  The planes live in HBM
and every stencil application is a fixed K-term fused multiply-add that XLA
tiles onto the VPU; there is no per-voxel indirection.

Out-of-range neighbors are implicitly zero: the operator assembly
(:mod:`..ops.dca`) folds the Neumann boundary conditions into in-range
coefficients by offset reflection, exactly like the reference
(itkGridsHierarchy.hxx:349-430), so zero-padding the field is the correct
boundary treatment for `apply`.
"""

from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Offset = Tuple[int, ...]


def stencil_offsets(ndim: int, radius: int = 1, drop_corners: bool | None = None) -> Tuple[Offset, ...]:
    """Canonical ordered offset table for a dense radius-``radius`` stencil.

    In 3D the reference deactivates the 8 corner offsets (all components
    nonzero), leaving a 19-point stencil (itkGridsHierarchy.hxx:492-513); the
    DCA discretization never populates them.  ``drop_corners=None`` applies
    that rule automatically for ``ndim == 3`` with radius 1.
    """
    if drop_corners is None:
        drop_corners = ndim == 3 and radius == 1
    offsets = []
    for off in itertools.product(range(-radius, radius + 1), repeat=ndim):
        if drop_corners and all(o != 0 for o in off):
            continue
        offsets.append(tuple(off))
    return tuple(offsets)


@jax.tree_util.register_pytree_node_class
class StencilOperator:
    """A linear operator ``A`` stored as per-offset coefficient planes.

    ``coeffs[k]`` is the coefficient plane multiplying ``x[p + offsets[k]]``
    in row ``p`` of the matrix — i.e.
    ``(A x)[p] = sum_k coeffs[k][p] * x[p + offsets[k]]`` with out-of-range
    reads treated as zero.

    ``coeffs`` is a *tuple* of K full-resolution spatial arrays rather than a
    single ``(K, *shape)`` array: XLA's layout assignment may tile any two
    dims as the minor (lane) dims, and a small leading K in the lane position
    would pad catastrophically (see core.symfield).  Separate planes always
    tile densely.
    """

    def __init__(self, coeffs, offsets: Tuple[Offset, ...]):
        if not isinstance(coeffs, (tuple, list)):
            # accept a stacked (K, *shape) array for convenience
            coeffs = tuple(coeffs[k] for k in range(coeffs.shape[0]))
        self.coeffs = tuple(coeffs)
        self.offsets = tuple(tuple(int(o) for o in off) for off in offsets)
        if len(self.coeffs) != len(self.offsets):
            raise ValueError(
                f"{len(self.coeffs)} coefficient planes != {len(self.offsets)} offsets"
            )

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return self.coeffs, self.offsets

    @classmethod
    def tree_unflatten(cls, offsets, children):
        obj = object.__new__(cls)
        obj.coeffs = tuple(children)
        obj.offsets = offsets
        return obj

    # -- structure ---------------------------------------------------------
    @property
    def ndim(self) -> int:
        return len(self.offsets[0])

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.coeffs[0].shape)

    @property
    def dtype(self):
        return self.coeffs[0].dtype

    @property
    def radius(self) -> int:
        return max(abs(o) for off in self.offsets for o in off)

    @property
    def center_index(self) -> int:
        return self.offsets.index((0,) * self.ndim)

    @property
    def diag(self) -> jnp.ndarray:
        """Coefficient plane of the center offset (the matrix diagonal)."""
        return self.coeffs[self.center_index]

    def offset_index(self, off: Offset) -> int:
        return self.offsets.index(tuple(off))

    def astype(self, dtype) -> "StencilOperator":
        return StencilOperator(
            tuple(c.astype(dtype) for c in self.coeffs), self.offsets
        )

    # -- operator protocol (shared with ops.matfree) -----------------------
    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return apply_stencil(self, x)

    def offdiag_apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return offdiag_apply(self, x)

    def offdiag_abs_rowsum(self) -> jnp.ndarray:
        """Per-row sum of |off-diagonal coefficients| (Gershgorin radius)."""
        c = self.center_index
        out = None
        for k, plane in enumerate(self.coeffs):
            if k == c:
                continue
            a = jnp.abs(plane)
            out = a if out is None else out + a
        return out

    def __repr__(self) -> str:
        return f"StencilOperator(K={len(self.offsets)}, shape={self.shape})"


def shifted(x: jnp.ndarray, offset: Offset, radius: int, x_padded: jnp.ndarray | None = None) -> jnp.ndarray:
    """``x`` shifted so element ``p`` holds ``x[p + offset]`` (zero outside)."""
    if x_padded is None:
        x_padded = jnp.pad(x, radius)
    sl = tuple(
        slice(radius + o, radius + o + s) for o, s in zip(offset, x.shape)
    )
    return x_padded[sl]


def apply_stencil(op: StencilOperator, x: jnp.ndarray) -> jnp.ndarray:
    """Compute ``A x`` — the K-term fused stencil contraction.

    Semantics match the reference residual/smoother loops
    (itkMultigridGaussSeidelSmoother.hxx:148-176): offsets reaching outside the
    region contribute nothing (their folded coefficients are zero anyway).
    """
    r = op.radius
    xp = jnp.pad(x, r)
    out = None
    for k, off in enumerate(op.offsets):
        term = op.coeffs[k] * shifted(x, off, r, xp)
        out = term if out is None else out + term
    return out


def offdiag_apply(op: StencilOperator, x: jnp.ndarray) -> jnp.ndarray:
    """``(A - diag(A)) x`` — used by both smoothers."""
    r = op.radius
    xp = jnp.pad(x, r)
    c = op.center_index
    out = None
    for k, off in enumerate(op.offsets):
        if k == c:
            continue
        term = op.coeffs[k] * shifted(x, off, r, xp)
        out = term if out is None else out + term
    return out


def residual(op, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``r = b - A x`` (reference ComputeResidual).  Works for any operator
    implementing the ``apply`` protocol (stored stencil or matrix-free)."""
    return b - op.apply(x)


def l2_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Plain (unnormalized) L2 norm, matching the reference ``L2Norm``
    (itkMultigridAnisotropicDiffusionImageFilter.hxx:496-515)."""
    return jnp.sqrt(jnp.sum(x * x))


def densify(op: StencilOperator) -> jnp.ndarray:
    """Expand the stencil operator into a dense ``(N, N)`` matrix.

    Row/column order is C-order (last axis fastest) over the grid; entries
    whose column index falls outside the grid are dropped, mirroring the
    reference DirectSolver matrix build (itkDirectSolver.hxx:55-79).  Intended
    only for the tiny coarsest level (every dim in [6, 11]).  Index arrays are
    static (computed at trace time), so this is jittable: K small scatters.
    """
    import numpy as np

    shape = op.shape
    n = int(np.prod(shape))
    a = jnp.zeros((n, n), dtype=op.dtype)
    lex = np.arange(n).reshape(shape)
    for k, off in enumerate(op.offsets):
        row_sl = tuple(
            slice(max(0, -o), s - max(0, o)) for o, s in zip(off, shape)
        )
        col_sl = tuple(
            slice(max(0, o), s - max(0, -o)) for o, s in zip(off, shape)
        )
        rows = lex[row_sl].ravel()
        cols = lex[col_sl].ravel()
        a = a.at[rows, cols].set(op.coeffs[k][row_sl].reshape(-1))
    return a
