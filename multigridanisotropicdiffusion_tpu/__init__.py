"""multigridanisotropicdiffusion_tpu — a TPU-native (JAX/XLA/Pallas) geometric
multigrid framework for anisotropic diffusion over 2D/3D image grids.

From-scratch reimplementation of the capabilities of the ITK module
``nellogrb/MultigridAnisotropicDiffusion`` (implicit-Euler anisotropic
diffusion solved by V-cycle / full multigrid with pluggable smoothers, plus
the Manniesing vesselness-enhancing-diffusion pipeline), re-designed for TPU:
stencil operators as HBM-resident coefficient planes, red-black smoothers,
separable transfer operators, a dense-LU coarsest solve, jit-unrolled cycles,
and SPMD sharding over device meshes.
"""

from .core.grids import CELL, VERTEX, GridLevel, build_level_descriptors
from .core.stencil import (
    StencilOperator,
    apply_stencil,
    l2_norm,
    residual,
    stencil_offsets,
)
from .core.symfield import (
    as_sym_planes,
    sym_from_matrix,
    sym_pairs,
    sym_to_matrix,
)
from .models.mad import (
    DCA,
    FMG,
    GALERKIN,
    SMOOTHER,
    VCYCLE,
    Hierarchy,
    MADConfig,
    MADResult,
    build_hierarchy,
    mad_diffusion,
)
from .models.ved import VEDConfig, VEDResult, ved
from .ops.dca import assemble_dca
from .ops.matfree import MatrixFreeDCAOperator
from .ops.galerkin import assemble_galerkin
from .ops.smoothers import jacobi_sweep, rb_gauss_seidel_sweep
from .ops.transfer import prolong, restrict

__version__ = "0.1.0"
