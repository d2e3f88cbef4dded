"""On-device crop/resize/normalize vs the host python path."""

import numpy as np
import jax.numpy as jnp

from spec_tpu.data import transforms as T
from spec_tpu.ops.preprocess import crop_resize_normalize, spin_crop_corners


def test_on_device_crop_matches_host(rng):
    B, H, W = 3, 240, 320
    frames = (rng.rand(B, H, W, 3) * 255).astype(np.float32)
    centers = np.stack([rng.rand(B) * 200 + 60,
                        rng.rand(B) * 140 + 50], 1).astype(np.float32)
    scales = (rng.rand(B) * 0.6 + 0.4).astype(np.float32)

    corners = spin_crop_corners(centers, scales, res=224)
    out = np.asarray(crop_resize_normalize(
        jnp.asarray(frames), jnp.asarray(corners), res=224,
        normalize=False))

    for k in range(B):
        ref = T.crop(frames[k], centers[k], float(scales[k]),
                     [224, 224]) / 255.0
        # FULL image incl. the border ring: box-edge clamping
        # now matches cv2 exactly (was interior-only).
        diff = np.abs(out[k] - ref)
        assert diff.max() < 2e-3, f'{k}: {diff.max()}'
        assert diff.mean() < 1e-3


def test_on_device_normalize(rng):
    frames = (rng.rand(1, 64, 64, 3) * 255).astype(np.float32)
    corners = np.array([[0, 0, 64, 64]], np.int32)
    out_r = np.asarray(crop_resize_normalize(
        jnp.asarray(frames), jnp.asarray(corners), res=64, normalize=False))
    out_n = np.asarray(crop_resize_normalize(
        jnp.asarray(frames), jnp.asarray(corners), res=64, normalize=True))
    np.testing.assert_allclose(out_n[0], T.normalize_img(out_r[0]),
                               atol=1e-5)


def test_zero_padding_outside_frame(rng):
    frames = (rng.rand(1, 50, 50, 3) * 255 + 1).astype(np.float32)
    corners = np.array([[-50, -50, 50, 50]], np.int32)
    out = np.asarray(crop_resize_normalize(
        jnp.asarray(frames), jnp.asarray(corners), res=64, normalize=False))
    assert out[0, :30, :30].max() == 0.0
    assert out[0, 40:, 40:].min() > 0.0
