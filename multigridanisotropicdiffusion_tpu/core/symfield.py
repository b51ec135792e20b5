"""Symmetric tensor fields as flat tuples of component planes.

TPU lays arrays out by tiling the two *minor-most* dimensions to (8, 128)
lanes, and XLA's layout assignment may pick ANY dims as minor — including
size-3 matrix axes, which then pad 3 -> (4, 128) for a ~40x memory blowup
(observed: ``f32[3,3,256,256,256]{0,1,4,3,2:T(4,128)}`` = 34 GB).  The only
layout-proof representation of a per-voxel symmetric matrix field is a
**tuple of full-resolution scalar planes**, one per unique component; each
plane is a plain spatial array that always tiles densely.

Canonical order: row-major upper triangle —
2D: ``((0,0), (0,1), (1,1))``;
3D: ``((0,0), (0,1), (0,2), (1,1), (1,2), (2,2))``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def sym_pairs(ndim: int) -> Tuple[Tuple[int, int], ...]:
    """Component index pairs in canonical order."""
    return tuple((i, j) for i in range(ndim) for j in range(i, ndim))


def sym_size(ndim: int) -> int:
    return ndim * (ndim + 1) // 2


def sym_index(ndim: int, d: int, d2: int) -> int:
    """Flat index of component (d, d2) (order-insensitive)."""
    i, j = min(d, d2), max(d, d2)
    return sym_pairs(ndim).index((i, j))


def sym_component(planes: Sequence, ndim: int, d: int, d2: int):
    return planes[sym_index(ndim, d, d2)]


def sym_from_matrix(tensor) -> Tuple:
    """``(D, D, *shape)`` or ``(*shape, D, D)`` array -> canonical plane tuple.

    Leading-component layout is detected first.  Only the lower triangle is
    read (matching the reference filter's SetDiffusionTensor,
    itkMultigridAnisotropicDiffusionImageFilter.hxx:86-94) via symmetry.
    """
    shape = tuple(tensor.shape)
    for ndim in (3, 2):
        if (
            len(shape) == ndim + 2
            and shape[0] == ndim
            and shape[1] == ndim
        ):
            return tuple(tensor[j, i] for i, j in sym_pairs(ndim))
        if (
            len(shape) == ndim + 2
            and shape[-1] == ndim
            and shape[-2] == ndim
        ):
            return tuple(tensor[..., j, i] for i, j in sym_pairs(ndim))
    raise ValueError(
        f"cannot interpret shape {shape} as a symmetric 2D/3D tensor field"
    )


def sym_to_matrix(planes: Sequence) -> jnp.ndarray:
    """Plane tuple -> ``(D, D, *shape)`` array (host/debug use only — avoid on
    TPU, see module docstring)."""
    n = len(planes)
    ndim = {3: 2, 6: 3}[n]
    pairs = sym_pairs(ndim)
    rows = []
    for i in range(ndim):
        row = [planes[sym_index(ndim, i, j)] for j in range(ndim)]
        rows.append(jnp.stack(row, axis=0))
    return jnp.stack(rows, axis=0)


def as_sym_planes(tensor, grid_shape: Tuple[int, ...]) -> Tuple:
    """Canonicalize a user-provided tensor field to the plane tuple.

    Accepts an existing plane tuple/list (length D(D+1)/2, each of
    ``grid_shape``), or an array in ``(D, D, *shape)`` / ``(*shape, D, D)``
    layout.
    """
    ndim = len(grid_shape)
    if isinstance(tensor, (tuple, list)):
        planes = tuple(tensor)
        if len(planes) != sym_size(ndim):
            raise ValueError(
                f"expected {sym_size(ndim)} tensor planes for {ndim}D, got {len(planes)}"
            )
        for p in planes:
            if tuple(p.shape) != grid_shape:
                raise ValueError(
                    f"tensor plane shape {tuple(p.shape)} != grid shape {grid_shape}"
                )
        return planes
    t_shape = tuple(tensor.shape)
    if t_shape == (ndim, ndim, *grid_shape) or t_shape == (*grid_shape, ndim, ndim):
        planes = sym_from_matrix(tensor)
        if tuple(planes[0].shape) != grid_shape:
            raise ValueError(
                f"tensor shape {t_shape} inconsistent with grid shape {grid_shape}"
            )
        return planes
    raise ValueError(
        f"tensor shape {t_shape} does not match image shape {grid_shape}: expected "
        f"{(ndim, ndim, *grid_shape)}, {(*grid_shape, ndim, ndim)}, or a tuple of "
        f"{sym_size(ndim)} planes"
    )
