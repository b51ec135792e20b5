"""Coarsest-grid direct solve.

The reference converts the coarsest StencilImage to a ``vnl_sparse_matrix``,
LU-factorizes once at construction, and back-substitutes per visit
(/root/reference/include/mad/itkDirectSolver.hxx:34-147).  The coarsest level
here is tiny by construction (every dimension in [6, 11], so N <= 1331 in 3D):
we densify the operator to an ``(N, N)`` matrix, run
``jax.scipy.linalg.lu_factor`` once at setup, and each coarsest-level visit is
a cached ``lu_solve`` — a pair of small triangular solves that stay resident
on-chip.  No sparse machinery needed.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..core.stencil import StencilOperator, densify


class CoarseSolver(NamedTuple):
    """Cached LU factorization of the coarsest-level operator."""

    lu: jnp.ndarray
    piv: jnp.ndarray
    shape: Tuple[int, ...]


def build_coarse_solver(op: StencilOperator) -> CoarseSolver:
    a = densify(op)
    lu, piv = jsl.lu_factor(a)
    return CoarseSolver(lu=lu, piv=piv, shape=op.shape)


def coarse_solve(solver: CoarseSolver, b: jnp.ndarray) -> jnp.ndarray:
    """Back-substitution; low-precision rhs (mixed-precision defect cycles)
    are solved in the factorization's precision and cast back."""
    rhs = b.reshape(-1).astype(solver.lu.dtype)
    x = jsl.lu_solve((solver.lu, solver.piv), rhs)
    return x.reshape(b.shape).astype(b.dtype)
