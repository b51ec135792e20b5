"""Compressed DCA operator: the 19/9-point stencil stored as 10/6 planes.

The DCA discretization has structure the generic stored form ignores:

* the two face coefficients per dimension are independent (``v2 +- t``), but
  the *twelve* edge (mixed) coefficients in 3D are all ``+-m_dd2`` of just
  three planes (``m = -dt M_dd2 / (2 h_d h_d2)``),
* Neumann folding keeps this structure: at a d-border the ``-e_d`` face folds
  onto ``+e_d`` (plane-representable), and the four mixed couplings of every
  pair containing d cancel *exactly* (``c_pp + c_mp = m - m = 0``), so the
  folded mixed coefficient is just ``m`` masked to zero on the border shells
  of both of its dimensions,
* the diagonal is never touched by folding.

So ``A`` is exactly representable as ``1 diag + 2D face + D(D-1)/2 mixed``
planes — 10 in 3D vs 19, 6 in 2D vs 9.  A red-black half-sweep streams
10 + x + b planes instead of 19 + x + b: ~1.6x less HBM traffic for the
memory-bound smoother, and ~1.9x less operator memory, with zero per-sweep
recomputation (unlike the fully matrix-free form, whose on-the-fly derivative
terms XLA materializes).  Numerics are bit-identical to the stored operator
up to summation order.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.symfield import sym_component
from .dca import _tensor_derivative


def _shift(xp: jnp.ndarray, offset, shape) -> jnp.ndarray:
    """Zero-padded shift (xp = x padded by 1)."""
    return xp[tuple(slice(1 + o, 1 + o + s) for o, s in zip(offset, shape))]


def _border_mask(shape, d: int, dtype) -> jnp.ndarray:
    """1 in the interior of dimension d, 0 on its first/last shell."""
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, d)
    return jnp.logical_and(ids > 0, ids < shape[d] - 1).astype(dtype)


@jax.tree_util.register_pytree_node_class
class CompressedDCAOperator:
    """Folded DCA operator in compressed plane form.

    ``face_p[d]`` / ``face_m[d]``: coefficients of ``x[p + e_d]`` / ``x[p - e_d]``
    (boundary-folded).  ``mixed[(d, d2)]``: the single plane whose four signed
    copies are the edge coefficients (already masked to zero on border shells).
    ``diag_plane``: the center coefficient.
    """

    def __init__(self, face_p, face_m, mixed, diag_plane, ndim: int):
        self.face_p = tuple(face_p)
        self.face_m = tuple(face_m)
        self.mixed = tuple(mixed)  # ordered by pairs (d, d2), d < d2
        self.diag_plane = diag_plane
        self._ndim = ndim

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        return (self.face_p, self.face_m, self.mixed, self.diag_plane), self._ndim

    @classmethod
    def tree_unflatten(cls, ndim, children):
        face_p, face_m, mixed, diag_plane = children
        obj = object.__new__(cls)
        obj.face_p = tuple(face_p)
        obj.face_m = tuple(face_m)
        obj.mixed = tuple(mixed)
        obj.diag_plane = diag_plane
        obj._ndim = ndim
        return obj

    # -- structure ---------------------------------------------------------
    @property
    def ndim(self) -> int:
        return self._ndim

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.diag_plane.shape)

    @property
    def dtype(self):
        return self.diag_plane.dtype

    @property
    def offsets(self):
        """Structural offset table (the standard 19/9-point DCA pattern) —
        lets representation-agnostic consumers (e.g. Galerkin probing) treat
        the compressed form like a stored operator."""
        from ..core.stencil import stencil_offsets

        return stencil_offsets(self._ndim)

    @property
    def diag(self) -> jnp.ndarray:
        return self.diag_plane

    # -- application -------------------------------------------------------
    def offdiag_apply(self, x: jnp.ndarray) -> jnp.ndarray:
        ndim = self._ndim
        shape = self.shape
        xp = jnp.pad(x, 1)

        def e(d, s=1):
            off = [0] * ndim
            off[d] = s
            return tuple(off)

        out = None

        def acc(v):
            nonlocal out
            out = v if out is None else out + v

        for d in range(ndim):
            acc(self.face_p[d] * _shift(xp, e(d, 1), shape))
            acc(self.face_m[d] * _shift(xp, e(d, -1), shape))

        k = 0
        for d in range(ndim):
            for d2 in range(d + 1, ndim):
                pp = tuple(a + b for a, b in zip(e(d, 1), e(d2, 1)))
                pm = tuple(a + b for a, b in zip(e(d, 1), e(d2, -1)))
                mp = tuple(a + b for a, b in zip(e(d, -1), e(d2, 1)))
                mm = tuple(a + b for a, b in zip(e(d, -1), e(d2, -1)))
                acc(
                    self.mixed[k]
                    * (
                        _shift(xp, pp, shape)
                        - _shift(xp, pm, shape)
                        - _shift(xp, mp, shape)
                        + _shift(xp, mm, shape)
                    )
                )
                k += 1
        return out

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.diag_plane * x + self.offdiag_apply(x)

    def offdiag_abs_rowsum(self) -> jnp.ndarray:
        """Per-row sum of |off-diagonal coefficients| (Gershgorin radius)."""
        out = None
        for p in list(self.face_p) + list(self.face_m):
            a = jnp.abs(p)
            out = a if out is None else out + a
        for m in self.mixed:
            out = out + 4.0 * jnp.abs(m)
        return out

    def __repr__(self) -> str:
        return f"CompressedDCAOperator(shape={self.shape})"


def assemble_compressed_dca(
    tensor,
    spacing: Tuple[float, ...],
    time_step: float,
) -> CompressedDCAOperator:
    """Assemble the compressed folded DCA operator from tensor planes
    (canonical symfield order)."""
    ndim = len(spacing)
    shape = tuple(tensor[0].shape)
    dtype = tensor[0].dtype
    dt = time_step

    face_p, face_m = [], []
    diag = jnp.ones(shape, dtype)
    for d in range(ndim):
        m_dd = sym_component(tensor, ndim, d, d)
        v2 = (-dt / (spacing[d] * spacing[d])) * m_dd
        diag = diag - 2.0 * v2
        t = None
        for d2 in range(ndim):
            w = -dt / (4.0 * spacing[d] * spacing[d2])
            dm = _tensor_derivative(sym_component(tensor, ndim, d, d2), d2) * w
            t = dm if t is None else t + dm
        cp = v2 + t
        cm = v2 - t
        # Neumann folding along d: first shell's -e_d coefficient folds onto
        # +e_d; last shell's +e_d onto -e_d (itkGridsHierarchy.hxx:362-363).
        first = [slice(None)] * ndim
        first[d] = slice(0, 1)
        first = tuple(first)
        last = [slice(None)] * ndim
        last[d] = slice(shape[d] - 1, shape[d])
        last = tuple(last)
        cp = cp.at[first].add(cm[first])
        cm = cm.at[first].set(0.0)
        cm = cm.at[last].add(cp[last])
        cp = cp.at[last].set(0.0)
        face_p.append(cp)
        face_m.append(cm)

    mixed = []
    for d in range(ndim):
        for d2 in range(d + 1, ndim):
            m = 2.0 * (-dt / (4.0 * spacing[d] * spacing[d2])) * sym_component(
                tensor, ndim, d, d2
            )
            # folding cancels mixed couplings exactly on the border shells of
            # both participating dimensions
            m = m * _border_mask(shape, d, dtype) * _border_mask(shape, d2, dtype)
            mixed.append(m)

    return CompressedDCAOperator(face_p, face_m, mixed, diag, ndim)
