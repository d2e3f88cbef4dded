"""Native C++ preprocessing engine vs the python/cv2 reference path."""

import numpy as np
import pytest

from spec_tpu import native
from spec_tpu.data import transforms as T


pytestmark = pytest.mark.skipif(
    not native.available(), reason='native toolchain unavailable')


def test_crop_parity_with_python_path(rng):
    img = (rng.rand(300, 400, 3) * 255).astype(np.float32)
    centers = np.array([[210.0, 160.0], [100.0, 80.0], [350.0, 250.0]],
                       np.float32)
    scales = np.array([0.9, 0.5, 1.2], np.float32)

    out = native.spin_crop_batch(img, centers, scales, res=224,
                                 normalize=False)
    assert out.shape == (3, 224, 224, 3)
    for k in range(3):
        ref = T.crop(img, centers[k], float(scales[k]), [224, 224]) / 255.0
        # Interior matches to cv2's fixed-point interpolation tables
        # (~3e-4 on [0,1] values — invisible after BN); the outermost ring
        # differs by the slice-edge clamping convention.
        diff = np.abs(out[k, 1:-1, 1:-1] - ref[1:-1, 1:-1])
        assert diff.max() < 2e-3, f'crop {k}: max diff {diff.max()}'
        assert diff.mean() < 1e-3, f'crop {k}: mean diff {diff.mean()}'


def test_normalize_fused(rng):
    img = (rng.rand(100, 120, 3) * 255).astype(np.float32)
    centers = np.array([[60.0, 50.0]], np.float32)
    scales = np.array([0.4], np.float32)
    out_n = native.spin_crop_batch(img, centers, scales, res=64,
                                   normalize=True)
    out_r = native.spin_crop_batch(img, centers, scales, res=64,
                                   normalize=False)
    ref = T.normalize_img(out_r[0])
    np.testing.assert_allclose(out_n[0], ref, atol=1e-5)


def test_out_of_bounds_bbox_zero_padded(rng):
    img = (rng.rand(50, 50, 3) * 255).astype(np.float32)
    out = native.spin_crop_batch(
        img, np.array([[0.0, 0.0]], np.float32),
        np.array([1.0], np.float32), res=64, normalize=False)
    # bbox centered at the corner: three quadrants are padding
    assert out[0, :20, :20].max() == 0.0
    assert out[0, 40:, 40:].max() > 0.0
