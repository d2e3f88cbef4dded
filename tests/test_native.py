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
        # FULL image incl. the border ring: box-edge clamping
        # now matches cv2 exactly (was interior-only).
        diff = np.abs(out[k] - ref)
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


class TestRasterMesh:
    """Native z-buffer rasterizer (raster.cpp) vs the python painter's
    path in utils.renderer."""

    def _sphere(self, n=40):
        theta = np.linspace(0.01, np.pi - 0.01, n)
        phi = np.linspace(0, 2 * np.pi, n, endpoint=False)
        T, P = np.meshgrid(theta, phi, indexing='ij')
        verts = np.stack([np.sin(T) * np.cos(P), np.cos(T),
                          np.sin(T) * np.sin(P)], -1)
        verts = verts.reshape(-1, 3).astype(np.float32) * 0.9
        faces = []
        for i in range(n - 1):
            for j in range(n):
                a = i * n + j
                b = i * n + (j + 1) % n
                c = (i + 1) * n + j
                d = (i + 1) * n + (j + 1) % n
                faces += [[a, b, c], [b, d, c]]
        return verts, np.asarray(faces, np.int32)

    def test_occlusion_ordering(self):
        from spec_tpu import native
        from spec_tpu.utils.renderer import _LIGHT_DIRS

        if not native.available():
            pytest.skip('native unavailable')
        # Two front-facing triangles covering the image center; the near
        # (z=2) one must win over the far (z=4) one.
        verts = np.array([
            [-1, -1, 2], [1, -1, 2], [0, 1, 2],     # near
            [-1, -1, 4], [1, -1, 4], [0, 1, 4],     # far
        ], np.float32)
        # CCW as seen from the camera -> normal toward -z (camera)
        faces = np.array([[0, 2, 1], [3, 5, 4]], np.int32)
        K = np.array([[100, 0, 32], [0, 100, 32], [0, 0, 1]], np.float32)
        red = np.array([1.0, 0.0, 0.0], np.float32)
        rgb, mask = native.raster_mesh(
            verts, faces, K, (64, 64), red, _LIGHT_DIRS)
        assert mask[32, 32]
        # near triangle's shade at the center — same flat shade whichever
        # triangle wins, so instead check against a render of ONLY the
        # near triangle
        rgb1, _ = native.raster_mesh(
            verts[:3], faces[:1], K, (64, 64), red, _LIGHT_DIRS)
        np.testing.assert_allclose(rgb[32, 32], rgb1[32, 32])
        # far-only render must be overwritten wherever both cover
        rgb2, mask2 = native.raster_mesh(
            verts, np.array([[3, 5, 4]], np.int32), K, (64, 64), red,
            _LIGHT_DIRS)
        both = mask2 & mask
        assert both.any()
        np.testing.assert_allclose(rgb[both], rgb1[both])

    def test_parity_with_python_rasterizer(self):
        import cv2
        import spec_tpu.native as native
        from spec_tpu.utils import renderer as R

        if not native.available():
            pytest.skip('native unavailable')
        verts, faces = self._sphere()
        verts_cam = verts + np.array([0, 0, 3], np.float32)
        K = np.array([[500, 0, 240], [0, 500, 240], [0, 0, 1]], np.float32)

        rgb_n, mask_n = native.raster_mesh(
            verts_cam, faces, K, (480, 480),
            np.array([0.7, 0.5, 0.5], np.float32), R._LIGHT_DIRS)
        # Force the python painter's path.
        lib, failed = native._lib, native._failed
        native._lib, native._failed = None, True
        try:
            rgb_p, mask_p = R.rasterize_mesh(verts_cam, faces, K,
                                             (480, 480))
        finally:
            native._lib, native._failed = lib, failed

        iou = (mask_n & mask_p).sum() / (mask_n | mask_p).sum()
        assert iou > 0.98, iou
        interior = cv2.erode((mask_n & mask_p).astype(np.uint8),
                             np.ones((3, 3), np.uint8)).astype(bool)
        diff = np.abs(rgb_n[interior] - rgb_p[interior]).max(-1)
        assert (diff < 0.02).mean() > 0.99
