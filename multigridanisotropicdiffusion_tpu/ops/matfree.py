"""Matrix-free DCA operator: apply ``A = Id - dt*L`` directly from the
diffusion-tensor planes, no stored stencil coefficients.

The stored-coefficient path streams K=19 (3D) coefficient planes from HBM per
smoother half-sweep.  The smoother is memory-bound, so recomputing the DCA
coefficients on the fly from the D(D+1)/2 = 6 tensor planes cuts the HBM
traffic per sweep by ~2.4x and the operator memory by ~3x (512^3 fits a
single chip) at the cost of a few extra VPU flops per voxel — exactly the
trade TPUs want.  XLA fuses the whole expression (tensor reads, coefficient
formulas, neighbor shifts, color select) into one pass over the planes.

Equivalence to the stored operator is *exact*: the reference folds Neumann
BCs into interior coefficients by reflecting out-of-range offsets
(itkGridsHierarchy.hxx:349-430); applying the *unfolded* interior
coefficients to a mirror-padded field (ghost(-1) = x(+1), i.e. jnp.pad
``mode='reflect'``) produces the identical sum, because each folded
contribution c.x[mirror] reappears as c.x_pad[ghost].  The transport-term
coefficients use the same interior/one-sided tensor derivatives as the
assembly (:func:`..ops.dca._tensor_derivative`), so the coefficient values
match bit-for-bit up to re-association.

The center coefficient never receives folded contributions (reflection flips
nonzero offset components only), so the diagonal has the closed form
``1 + sum_d 2 dt/h_d^2 M_dd``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.symfield import sym_component
from .dca import _tensor_derivative


def _mirror_shift(xp: jnp.ndarray, offset, shape) -> jnp.ndarray:
    """Slice of the mirror-padded array so element p holds x[p + offset] with
    reflected ghosts."""
    return xp[tuple(slice(1 + o, 1 + o + s) for o, s in zip(offset, shape))]


@jax.tree_util.register_pytree_node_class
class MatrixFreeDCAOperator:
    """DCA operator applied on the fly from tensor planes.

    Implements the same protocol as :class:`~..core.stencil.StencilOperator`
    (``apply``, ``offdiag_apply``, ``diag``, ``shape``, ``ndim``, ``dtype``)
    so smoothers and cycles are agnostic to the representation.
    """

    def __init__(self, tensor, spacing: Tuple[float, ...], time_step: float):
        self.tensor = tuple(tensor)
        self.spacing = tuple(float(h) for h in spacing)
        self.time_step = float(time_step)

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        return self.tensor, (self.spacing, self.time_step)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = tuple(children)
        obj.spacing, obj.time_step = aux
        return obj

    # -- structure ---------------------------------------------------------
    @property
    def ndim(self) -> int:
        return len(self.spacing)

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.tensor[0].shape)

    @property
    def dtype(self):
        return self.tensor[0].dtype

    def _m(self, d, d2):
        return sym_component(self.tensor, self.ndim, d, d2)

    @property
    def offsets(self):
        """Structural offset table (the standard 19/9-point DCA pattern) —
        lets representation-agnostic consumers (e.g. Galerkin probing) treat
        the matrix-free form like a stored operator."""
        from ..core.stencil import stencil_offsets

        return stencil_offsets(self.ndim)

    @property
    def diag(self) -> jnp.ndarray:
        dt = self.time_step
        out = None
        for d in range(self.ndim):
            term = (2.0 * dt / self.spacing[d] ** 2) * self._m(d, d)
            out = term if out is None else out + term
        return 1.0 + out

    # -- application -------------------------------------------------------
    def _offdiag_terms(self, x: jnp.ndarray) -> jnp.ndarray:
        """Sum of all off-center stencil terms on mirror-padded x."""
        ndim = self.ndim
        shape = self.shape
        dt = self.time_step
        h = self.spacing
        xp = jnp.pad(x, 1, mode="reflect")

        def e(d, s=1):
            off = [0] * ndim
            off[d] = s
            return tuple(off)

        out = None

        def acc(val):
            nonlocal out
            out = val if out is None else out + val

        for d in range(ndim):
            # second-derivative weight on +-e_d
            v2 = (-dt / (h[d] * h[d])) * self._m(d, d)
            # transport term sum_{d2} (d_{d2} M_{d,d2}) * w applied to +-e_d
            t = None
            for d2 in range(ndim):
                w = -dt / (4.0 * h[d] * h[d2])
                dm = _tensor_derivative(self._m(d, d2), d2) * w
                t = dm if t is None else t + dm
            acc((v2 + t) * _mirror_shift(xp, e(d, 1), shape))
            acc((v2 - t) * _mirror_shift(xp, e(d, -1), shape))

        for d in range(ndim):
            for d2 in range(d + 1, ndim):
                # mixed term: the (d,d2) and (d2,d) loop passes of the
                # assembly each contribute M*w, totalling 2*M*w
                m = 2.0 * (-dt / (4.0 * h[d] * h[d2])) * self._m(d, d2)
                pp = tuple(a + b for a, b in zip(e(d, 1), e(d2, 1)))
                pm = tuple(a + b for a, b in zip(e(d, 1), e(d2, -1)))
                mp = tuple(a + b for a, b in zip(e(d, -1), e(d2, 1)))
                mm = tuple(a + b for a, b in zip(e(d, -1), e(d2, -1)))
                acc(
                    m
                    * (
                        _mirror_shift(xp, pp, shape)
                        - _mirror_shift(xp, pm, shape)
                        - _mirror_shift(xp, mp, shape)
                        + _mirror_shift(xp, mm, shape)
                    )
                )

        return out

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.diag * x + self._offdiag_terms(x)

    def offdiag_apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._offdiag_terms(x)

    def offdiag_abs_rowsum(self) -> jnp.ndarray:
        """Per-row sum of |off-diagonal coefficients| (Gershgorin radius)."""
        ndim = self.ndim
        dt = self.time_step
        h = self.spacing
        out = None

        def acc(v):
            nonlocal out
            out = v if out is None else out + v

        for d in range(ndim):
            v2 = (-dt / (h[d] * h[d])) * self._m(d, d)
            t = None
            for d2 in range(ndim):
                w = -dt / (4.0 * h[d] * h[d2])
                dm = _tensor_derivative(self._m(d, d2), d2) * w
                t = dm if t is None else t + dm
            acc(jnp.abs(v2 + t) + jnp.abs(v2 - t))
        for d in range(ndim):
            for d2 in range(d + 1, ndim):
                m = 2.0 * (-dt / (4.0 * h[d] * h[d2])) * self._m(d, d2)
                acc(4.0 * jnp.abs(m))
        return out

    def __repr__(self) -> str:
        return f"MatrixFreeDCAOperator(shape={self.shape}, dt={self.time_step})"
