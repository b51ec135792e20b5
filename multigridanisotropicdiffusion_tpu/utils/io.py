"""Lightweight image IO for the test workloads.

The reference relies on ITK's readers/writers (JPEG for the 2D tests,
MetaImage .mhd/.zraw for the VED volumes).  Here: PIL for 2D images and a
self-contained MetaImage implementation (text header + optionally
zlib-compressed raw block).

Axis convention: MetaImage stores the first listed dimension (x) fastest; we
return a C-ordered array of shape ``(DimSize[-1], ..., DimSize[0])`` — i.e.
axis 0 is the slowest (z) — with ``spacing`` reordered to match the array
axes.  All solver code is axis-order agnostic, so parity with the reference
only requires spacing to stay aligned with its axis.
"""

from __future__ import annotations

import os
import zlib
from typing import NamedTuple, Tuple

import numpy as np

_METAIMAGE_DTYPES = {
    "MET_CHAR": np.int8,
    "MET_UCHAR": np.uint8,
    "MET_SHORT": np.int16,
    "MET_USHORT": np.uint16,
    "MET_INT": np.int32,
    "MET_UINT": np.uint32,
    "MET_LONG": np.int64,
    "MET_ULONG": np.uint64,
    "MET_FLOAT": np.float32,
    "MET_DOUBLE": np.float64,
}
_METAIMAGE_NAMES = {np.dtype(v): k for k, v in _METAIMAGE_DTYPES.items()}


class MetaImage(NamedTuple):
    """A loaded volume: C-ordered data (axis 0 slowest) + matching spacing."""

    data: np.ndarray
    spacing: Tuple[float, ...]
    header: dict


def read_meta_image(path: str) -> MetaImage:
    """Read a MetaImage (.mhd header + raw/zraw data file)."""
    header: dict = {}
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or "=" not in line:
                continue
            key, _, value = line.partition("=")
            header[key.strip()] = value.strip()

    ndims = int(header["NDims"])
    dim_size = [int(v) for v in header["DimSize"].split()]
    spacing = [float(v) for v in header.get("ElementSpacing", "1 " * ndims).split()]
    dtype = np.dtype(_METAIMAGE_DTYPES[header.get("ElementType", "MET_SHORT")])
    msb = header.get("BinaryDataByteOrderMSB", "False").lower() == "true"
    compressed = header.get("CompressedData", "False").lower() == "true"

    data_file = header["ElementDataFile"]
    if data_file == "LOCAL":
        raise ValueError("inline (LOCAL) MetaImage data is not supported")
    data_path = os.path.join(os.path.dirname(os.path.abspath(path)), data_file)
    with open(data_path, "rb") as f:
        raw = f.read()
    if compressed:
        raw = zlib.decompress(raw)

    arr = np.frombuffer(raw, dtype=dtype.newbyteorder(">" if msb else "<"))
    n = int(np.prod(dim_size))
    if arr.size != n:
        raise ValueError(f"data size {arr.size} != DimSize product {n}")
    # x fastest in the file -> C-order shape (z, y, x)
    arr = arr.reshape(tuple(reversed(dim_size)))
    return MetaImage(
        data=np.ascontiguousarray(arr),
        spacing=tuple(reversed(spacing)),
        header=header,
    )


def write_meta_image(
    path: str,
    data: np.ndarray,
    spacing: Tuple[float, ...] | None = None,
    compressed: bool = True,
    extra_header: dict | None = None,
) -> None:
    """Write a MetaImage pair (.mhd + .raw/.zraw).

    ``data`` follows the same convention as :func:`read_meta_image`
    (axis 0 slowest); DimSize is written reversed (x first).
    """
    data = np.ascontiguousarray(data)
    ndims = data.ndim
    if spacing is None:
        spacing = (1.0,) * ndims
    base = os.path.splitext(path)[0]
    ext = ".zraw" if compressed else ".raw"
    data_file = os.path.basename(base) + ext

    raw = data.astype(data.dtype.newbyteorder("<"), copy=False).tobytes()
    payload = zlib.compress(raw) if compressed else raw
    with open(base + ext, "wb") as f:
        f.write(payload)

    lines = [
        "ObjectType = Image",
        f"NDims = {ndims}",
        "BinaryData = True",
        "BinaryDataByteOrderMSB = False",
        f"CompressedData = {'True' if compressed else 'False'}",
    ]
    if compressed:
        lines.append(f"CompressedDataSize = {len(payload)}")
    for key, value in (extra_header or {}).items():
        lines.append(f"{key} = {value}")
    lines.append("ElementSpacing = " + " ".join(str(s) for s in reversed(spacing)))
    lines.append("DimSize = " + " ".join(str(s) for s in reversed(data.shape)))
    lines.append(f"ElementType = {_METAIMAGE_NAMES[np.dtype(data.dtype)]}")
    lines.append(f"ElementDataFile = {data_file}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_image_2d(path: str, dtype=np.float64) -> np.ndarray:
    """Read a 2D image (jpg/png/...) as grayscale."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), dtype=dtype)


def write_image_2d(path: str, data: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.clip(np.asarray(data), 0, 255).astype(np.uint8)).save(path)
