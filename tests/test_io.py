import os

import numpy as np
import pytest

from multigridanisotropicdiffusion_tpu.utils.io import (
    read_meta_image,
    write_meta_image,
)

REFERENCE_DATA = os.environ.get(
    "MAD_REFERENCE_DATA", "/root/reference/test/test_data"
)


def test_meta_image_roundtrip(tmp_path, rng):
    data = rng.integers(-500, 500, size=(9, 11, 13)).astype(np.int16)
    path = str(tmp_path / "vol.mhd")
    write_meta_image(path, data, spacing=(0.5, 0.3, 0.3))
    img = read_meta_image(path)
    np.testing.assert_array_equal(img.data, data)
    assert img.spacing == (0.5, 0.3, 0.3)


def test_meta_image_roundtrip_uncompressed(tmp_path, rng):
    data = rng.normal(size=(5, 6)).astype(np.float32)
    path = str(tmp_path / "img.mhd")
    write_meta_image(path, data, compressed=False)
    img = read_meta_image(path)
    np.testing.assert_array_equal(img.data, data)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_DATA, "ved_test.mhd")),
    reason="reference test data not available",
)
def test_read_reference_ved_volume():
    img = read_meta_image(os.path.join(REFERENCE_DATA, "ved_test.mhd"))
    # DimSize = 69 77 69 (x y z) -> C-order (z, y, x)
    assert img.data.shape == (69, 77, 69)
    assert img.data.dtype == np.int16
    assert img.spacing == (0.5, 0.3125, 0.3125)
    # angiography int16: sane dynamic range, nonconstant
    assert img.data.min() < img.data.max()
    assert abs(int(img.data.min())) < 32768


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_DATA, "lena.jpg")),
    reason="reference test data not available",
)
def test_read_reference_lena():
    from multigridanisotropicdiffusion_tpu.utils.io import read_image_2d

    img = read_image_2d(os.path.join(REFERENCE_DATA, "lena.jpg"))
    assert img.shape == (512, 512)
    assert 0 <= img.min() and img.max() <= 255
