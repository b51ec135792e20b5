"""Galerkin (GCA) coarse-grid operator construction: ``A_c = R A_f P``.

The reference's vestigial ``CoarseGridOperatorsGenerator`` computed the
Galerkin operator column-by-column by interpolating a one-pixel impulse,
applying the fine operator, and restricting
(doc/html/itk_coarse_grid_operators_generator_8hxx_source.html:370-780).  On
TPU the triple product is computed directly on stencil coefficient planes —
implemented later this round as batched stencil convolutions.
"""

from __future__ import annotations

from typing import Sequence

from ..core.stencil import StencilOperator


def assemble_galerkin(fine_op: StencilOperator, centering: Sequence[str]) -> StencilOperator:
    raise NotImplementedError(
        "Galerkin coarse operators land after the DCA end-to-end slice; "
        "use coarse_operator='dca' for now."
    )
