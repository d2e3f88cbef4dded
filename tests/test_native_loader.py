"""Native host data engine (jpegroi.cpp) vs the python/cv2 oracle path.

Covers the three r4 loader tiers wired into CamDataset._crops:
  * fused JPEG ROI decode + crop (native.jpeg_roi_crop)
  * the shared crop sampler over cached frames (native.crop_affine_u8)
  * the per-sample region cache (data/region_cache.py)
The python cv2 path (native_decode=False) is the parity oracle
throughout; the reference analogue for all of it is the torch
DataLoader's per-sample full decode (reference
spec/dataset/cam_dataset.py:252-262).
"""

import os

import cv2
import numpy as np
import pytest

from spec_tpu import native
from spec_tpu.data import transforms as T
from spec_tpu.data.cam_dataset import AugmentationConfig, CamDataset

pytestmark = pytest.mark.skipif(
    not native.available(), reason='native toolchain unavailable')

# Measured parity of the native float bilinear sampler vs the python
# zero-pad-slice + cv2.resize path on normalized items: ~5e-5 (the
# fixed-point vs float interpolation difference). 5e-4 leaves margin.
ITEM_ATOL = 5e-4


def _smooth_frame(rng, hw):
    """Photo-like frame (random noise is JPEG's worst case and would
    make the q95 region-cache tolerance test meaningless)."""
    yy, xx = np.mgrid[0:hw[0], 0:hw[1]].astype(np.float32)
    img = np.stack([
        127 + 100 * np.sin(xx / 60 + rng.rand() * 6)
        * np.cos(yy / 45 + rng.rand() * 6) for _ in range(3)], -1)
    img += rng.randn(*hw, 3) * 4
    return np.clip(img, 0, 255).astype(np.uint8)


def _write_dataset(tmp_path, n_frames=3, n=9, hw=(600, 900), seed=0,
                   smooth=False):
    rng = np.random.RandomState(seed)
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir(exist_ok=True)
    for i in range(n_frames):
        img = _smooth_frame(rng, hw) if smooth else \
            (rng.rand(*hw, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f'f{i}.jpg'), img)
    annot = dict(
        imgname=np.array([f'f{i % n_frames}.jpg' for i in range(n)]),
        scale=rng.uniform(0.6, 1.6, n).astype('f4'),
        center=np.stack([rng.uniform(100, hw[1] - 100, n),
                         rng.uniform(100, hw[0] - 100, n)], 1).astype('f4'),
        pose=(rng.randn(n, 72) * 0.2).astype('f4'),
        shape=(rng.randn(n, 10) * 0.5).astype('f4'),
        has_smpl=np.ones(n, 'f4'),
        S=rng.randn(n, 24, 4).astype('f4'),
        part=np.concatenate([rng.rand(n, 24, 2) * 500,
                             np.ones((n, 24, 1))], -1).astype('f4'),
        openpose=np.zeros((n, 25, 3), 'f4'),
    )
    npz = tmp_path / 'annots.npz'
    np.savez(npz, **annot)
    return str(npz), str(img_dir)


def _pair(npz, img_dir, **kw):
    a = CamDataset(npz, img_dir, '3dpw-test-cam', seed=7,
                   native_decode=True, **kw)
    b = CamDataset(npz, img_dir, '3dpw-test-cam', seed=7,
                   native_decode=False, **kw)
    return a, b


def _assert_items_close(ia, ib, atol=ITEM_ATOL):
    np.testing.assert_allclose(ia['img'], ib['img'], atol=atol)
    if 'disp_img' in ib:
        np.testing.assert_allclose(ia['disp_img'], ib['disp_img'],
                                   atol=atol)
    np.testing.assert_array_equal(ia['orig_shape'], ib['orig_shape'])
    np.testing.assert_array_equal(ia['keypoints'], ib['keypoints'])


# ---------------------------------------------------------------------------
# native primitives
# ---------------------------------------------------------------------------

def test_roi_decode_bit_exact_vs_cv2(tmp_path, rng):
    """The ROI window equals the same slice of a full cv2 decode
    bit-for-bit (same libjpeg-turbo underneath; the 8 px chroma-edge
    over-decode margin in decode_roi makes the window exact)."""
    img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    p = str(tmp_path / 'f.jpg')
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 92])
    data = np.fromfile(p, np.uint8)
    full = T.read_img(p)
    probe = native.jpeg_probe(data)
    assert probe == (480, 640, 1, False)
    for (x0, y0, w, h) in [(100, 50, 200, 150), (0, 0, 640, 480),
                           (613, 450, 27, 30), (3, 470, 630, 10)]:
        strip, _ = native.jpeg_decode_roi(data, x0, y0, w, h)
        np.testing.assert_array_equal(strip, full[y0:y0 + h, x0:x0 + w])
    # reduced-scale window vs the full reduced decode
    red = T.read_img(p, reduce=2)
    strip, _ = native.jpeg_decode_roi(data, 40, 30, 120, 100, reduce=2)
    np.testing.assert_array_equal(strip, red[30:130, 40:160])


def test_crop_affine_matches_python_crop(rng):
    """crop_affine + crop_affine_u8 vs transforms.crop (rot == 0, the
    SPIN zero-pad-slice semantics incl. corner truncation knife edges)
    and vs crop_from_reduced (rot != 0 warp, reduce = 2)."""
    img = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    res = [224, 224]
    for center, scale in [([210.0, 160.0], 0.9), ([40.0, 20.0], 0.7),
                          ([390.0, 290.0], 1.3), ([200.0, 150.0], 0.31)]:
        aff, box = T.crop_affine(center, scale, res)
        out = native.crop_affine_u8(img, aff, res, box=box)
        ref = T.crop(img.astype(np.float32), center, scale, res)
        assert np.abs(out - ref).max() < 0.5  # [0,255] values
    # rotated: affine inverse path, BORDER_CONSTANT semantics
    for rot in (15.0, -47.0):
        aff, box = T.crop_affine([200.0, 150.0], 0.9, res, rot=rot)
        assert box is None
        out = native.crop_affine_u8(img, aff, res)
        ref = T.crop_from_reduced(img, [200.0, 150.0], 0.9, res, 1,
                                  rot=rot)
        # cv2.warpAffine fixed-point grid vs float: sub-LSB on interior,
        # edge taps differ by the border convention -> compare loosely
        assert np.abs(out - ref).mean() < 0.5
        assert (np.abs(out - ref) < 4).mean() > 0.99
    # reduced grid placement
    red = cv2.resize(img, (200, 150), interpolation=cv2.INTER_AREA)
    aff, box = T.crop_affine([200.0, 150.0], 0.6, res)
    out = native.crop_affine_u8(red, aff, res, box=box, reduce=2)
    ref = T.crop_from_reduced(red, [200.0, 150.0], 0.6, res, 2)
    assert np.abs(out - ref).mean() < 1.0


def test_sample_window_covers_crop(rng):
    """Sampling from only the sample_window strip must reproduce the
    full-frame crop exactly (every bilinear tap is inside)."""
    img = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    res = [224, 224]
    for center, scale, rot in [([210.0, 160.0], 0.9, 0), ([40., 20.], 0.7, 0),
                               ([200.0, 150.0], 0.8, 33.0)]:
        aff, box = T.crop_affine(center, scale, res, rot=rot)
        full = native.crop_affine_u8(img, aff, res, box=box)
        win = T.sample_window(aff, box, res, img.shape[:2])
        x0, y0, w, h = win
        strip = np.ascontiguousarray(img[y0:y0 + h, x0:x0 + w])
        out = native.crop_affine_u8(strip, aff, res, box=box,
                                    origin=(x0, y0))
        np.testing.assert_array_equal(out, full)


# ---------------------------------------------------------------------------
# CamDataset end-to-end parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('kw', [
    dict(is_train=False),
    dict(is_train=False, emit_disp_img=True, render_res=320),
    dict(is_train=True),
    dict(is_train=True, fast_decode=True),
    dict(is_train=False, emit_disp_img=True, render_res=320,
         fast_decode=True),
])
def test_dataset_native_vs_python(tmp_path, kw):
    npz, img_dir = _write_dataset(tmp_path)
    a, b = _pair(npz, img_dir, **kw)
    assert a._native_ok() and not b._native_ok()
    for i in range(len(a)):
        _assert_items_close(a[i], b[i])


def test_dataset_native_rotation_and_jitter(tmp_path):
    """rot != 0 exercises the affine-inverse (no clamp box) plan."""
    npz, img_dir = _write_dataset(tmp_path)
    aug = AugmentationConfig()
    aug.rot_factor = 30.0
    a, b = _pair(npz, img_dir, is_train=True, aug=aug)
    saw_rot = False
    for i in range(len(a)):
        ia, ib = a[i], b[i]
        saw_rot |= float(ib['rot_angle']) != 0.0
        assert float(ia['rot_angle']) == float(ib['rot_angle'])
        # warpAffine fixed-point vs float sampler: looser bound when
        # rotated (still invisible after BN)
        np.testing.assert_allclose(ia['img'], ib['img'], atol=2e-2)
        assert np.abs(ia['img'] - ib['img']).mean() < 1e-3
    assert saw_rot


def test_dataset_native_frame_cache_path(tmp_path):
    """decode_cache > 0 routes through crop_affine_u8 on the cached
    uint8 frame — same items as the pure python cached path."""
    npz, img_dir = _write_dataset(tmp_path)
    a, b = _pair(npz, img_dir, is_train=False, decode_cache=4)
    for i in range(len(a)):
        _assert_items_close(a[i], b[i])


def test_dataset_native_fallbacks(tmp_path):
    """Non-JPEG bytes and EXIF-rotated JPEGs must fall back to the cv2
    path per item and still match the oracle exactly."""
    from PIL import Image

    rng = np.random.RandomState(3)
    npz, img_dir = _write_dataset(tmp_path, n_frames=2, n=4)
    # overwrite frame 0 with a PNG disguised under .jpg (cv2 decodes by
    # content) and frame 1 with an EXIF orientation-6 JPEG
    img0 = (rng.rand(600, 900, 3) * 255).astype(np.uint8)
    ok, buf = cv2.imencode('.png', img0)
    assert ok
    with open(os.path.join(img_dir, 'f0.jpg'), 'wb') as f:
        f.write(buf.tobytes())
    img1 = (rng.rand(900, 600, 3) * 255).astype(np.uint8)
    exif = Image.Exif()
    exif[0x0112] = 6
    Image.fromarray(img1).save(os.path.join(img_dir, 'f1.jpg'),
                               exif=exif, quality=92)
    a, b = _pair(npz, img_dir, is_train=False)
    for i in range(len(a)):
        ia, ib = a[i], b[i]
        # identical code path (cv2 decode + native sampler vs cv2
        # decode + cv2 sampler) -> item tolerance
        _assert_items_close(ia, ib)


# ---------------------------------------------------------------------------
# region cache
# ---------------------------------------------------------------------------

def test_region_cache_raw_bit_identical(tmp_path):
    """fmt='raw': epoch 1 fills, epoch 2 serves from regions; items are
    BIT-identical to the uncached native path in both epochs."""
    npz, img_dir = _write_dataset(tmp_path)
    cache_dir = str(tmp_path / 'rc')
    a = CamDataset(npz, img_dir, '3dpw-test-cam', seed=7, is_train=True,
                   native_decode=True, region_cache_dir=cache_dir,
                   region_cache_format='raw')
    b = CamDataset(npz, img_dir, '3dpw-test-cam', seed=7, is_train=True,
                   native_decode=True)
    for _epoch in range(2):
        for i in range(len(a)):
            ia, ib = a[i], b[i]
            np.testing.assert_array_equal(ia['img'], ib['img'])
    assert len(a._region_cache) == len(a)
    assert a._region_cache.hits >= len(a)   # epoch 2 all hits


def test_region_cache_jpeg_near_identical(tmp_path):
    """fmt='jpeg' re-encodes at q95 — lossy, bounded well below the
    loader's own pixel-noise augmentation (factor 0.4)."""
    npz, img_dir = _write_dataset(tmp_path, smooth=True)
    cache_dir = str(tmp_path / 'rcj')
    a = CamDataset(npz, img_dir, '3dpw-test-cam', seed=7, is_train=True,
                   native_decode=True, region_cache_dir=cache_dir)
    b = CamDataset(npz, img_dir, '3dpw-test-cam', seed=7, is_train=True,
                   native_decode=True)
    for _epoch in range(2):
        for i in range(len(a)):
            ia, ib = a[i], b[i]
            # measured <=6e-3 mean on [0,1] (q95 double compression,
            # amplified by the up-to-1.4x pixel-noise aug); the noise
            # aug alone is +-0.4 multiplicative
            assert np.abs(ia['img'] - ib['img']).mean() < 1e-2
    files = os.listdir(a._region_cache.dir)   # per-(dataset,split) subdir
    assert len(files) == len(a) and all(f.endswith('.jpg') for f in files)


def test_region_cache_persists_across_instances(tmp_path):
    """A fresh dataset over the same cache dir reuses the files (the
    multi-epoch / multi-run steady state) without refilling."""
    npz, img_dir = _write_dataset(tmp_path)
    cache_dir = str(tmp_path / 'rcp')
    kw = dict(seed=7, is_train=False, native_decode=True,
              region_cache_dir=cache_dir, region_cache_format='raw')
    a = CamDataset(npz, img_dir, '3dpw-test-cam', **kw)
    items1 = [a[i]['img'] for i in range(len(a))]
    a2 = CamDataset(npz, img_dir, '3dpw-test-cam', **kw)
    assert len(a2._region_cache) == len(a2)
    items2 = [a2[i]['img'] for i in range(len(a2))]
    assert a2._region_cache.misses == 0
    for x, y in zip(items1, items2):
        np.testing.assert_array_equal(x, y)


def test_region_cache_covers_scale_jitter(tmp_path):
    """The cached window must cover EVERY aug draw: run many epochs of
    max-jitter training and compare each item against the uncached
    native path (a window bug shows up as zero/garbage border taps)."""
    npz, img_dir = _write_dataset(tmp_path, n=6)
    aug = AugmentationConfig()
    aug.rot_factor = 30.0
    aug.scale_factor = 0.25
    cache_dir = str(tmp_path / 'rcw')
    a = CamDataset(npz, img_dir, '3dpw-test-cam', seed=11, is_train=True,
                   aug=aug, native_decode=True,
                   region_cache_dir=cache_dir, region_cache_format='raw')
    b = CamDataset(npz, img_dir, '3dpw-test-cam', seed=11, is_train=True,
                   aug=aug, native_decode=True)
    for _epoch in range(4):
        for i in range(len(a)):
            np.testing.assert_array_equal(a[i]['img'], b[i]['img'])


def test_region_cache_stale_window_refills(tmp_path):
    """A cache filled under SMALLER aug bounds must be detected as
    stale (it can't cover the bigger jitter's taps) and refilled — not
    silently zero-pad crop borders."""
    npz, img_dir = _write_dataset(tmp_path, n=6)
    cache_dir = str(tmp_path / 'rcs')
    kw = dict(seed=11, is_train=True, native_decode=True,
              region_cache_dir=cache_dir, region_cache_format='raw')
    small = AugmentationConfig()
    small.rot_factor = 0.0
    small.scale_factor = 0.0
    a = CamDataset(npz, img_dir, '3dpw-test-cam', aug=small, **kw)
    for i in range(len(a)):
        a[i]
    names_small = dict(a._region_cache._files)
    big = AugmentationConfig()
    big.rot_factor = 30.0
    big.scale_factor = 0.25
    a2 = CamDataset(npz, img_dir, '3dpw-test-cam', aug=big, **kw)
    b2 = CamDataset(npz, img_dir, '3dpw-test-cam', seed=11, is_train=True,
                    aug=big, native_decode=True)
    for _epoch in range(3):
        for i in range(len(a2)):
            np.testing.assert_array_equal(a2[i]['img'], b2[i]['img'])
    # the stale files were replaced (bigger windows) and removed
    names_big = dict(a2._region_cache._files)
    assert any(names_big[i] != names_small[i] for i in names_small)
    on_disk = set(os.listdir(a2._region_cache.dir))
    assert set(names_big.values()) == on_disk


def test_region_cache_torn_file_refills(tmp_path):
    """A corrupt region file is dropped and refilled, not fatal."""
    npz, img_dir = _write_dataset(tmp_path, n=3)
    cache_dir = str(tmp_path / 'rct')
    kw = dict(seed=7, is_train=False, native_decode=True,
              region_cache_dir=cache_dir, region_cache_format='raw')
    a = CamDataset(npz, img_dir, '3dpw-test-cam', **kw)
    ref = [a[i]['img'] for i in range(len(a))]
    name = a._region_cache._files[0]
    with open(os.path.join(a._region_cache.dir, name), 'wb') as f:
        f.write(b'torn')
    a2 = CamDataset(npz, img_dir, '3dpw-test-cam', **kw)
    np.testing.assert_array_equal(a2[0]['img'], ref[0])
    assert len(a2._region_cache) == len(a2)


def test_region_cache_scoped_per_dataset_and_split(tmp_path):
    """Files are keyed by sample index, so the same REGION_CACHE_DIR
    handed to several datasets (spec_train wires one dir into every
    mixture member + every val set) must NOT collide: each
    (dataset, split) gets its own subdir and serves its own pixels."""
    npz, img_dir = _write_dataset(tmp_path, n=3)
    other = tmp_path / 'other'
    other.mkdir()
    npz2, img_dir2 = _write_dataset(other, n=3, seed=99)
    cache_dir = str(tmp_path / 'rcshared')
    kw = dict(seed=7, is_train=False, native_decode=True,
              region_cache_dir=cache_dir, region_cache_format='raw')
    a = CamDataset(npz, img_dir, '3dpw-test-cam', **kw)
    b = CamDataset(npz2, img_dir2, 'spec-syn', **kw)
    ref_a = [a[i]['img'] for i in range(len(a))]
    ref_b = [b[i]['img'] for i in range(len(b))]
    assert a._region_cache.dir != b._region_cache.dir
    # second epoch: each dataset hits ONLY its own cache, pixels exact
    for i in range(len(a)):
        np.testing.assert_array_equal(a[i]['img'], ref_a[i])
        np.testing.assert_array_equal(b[i]['img'], ref_b[i])
    assert a._region_cache.misses == len(a)    # no cross-thrash refills
    assert b._region_cache.misses == len(b)
    # train split scopes separately from val
    tr = CamDataset(npz, img_dir, '3dpw-test-cam', is_train=True,
                    seed=7, native_decode=True,
                    region_cache_dir=cache_dir,
                    region_cache_format='raw')
    assert tr._region_cache.dir != a._region_cache.dir


def test_region_cache_fast_decode_with_crop_aug(tmp_path):
    """fast_decode + random_crop + region cache: the cached region's
    grid must be as fine as the smallest random_crop sub-box needs
    (regression: the window ladder ignored crop_factor, so a cropped
    sample upsampled its 224 crop from a too-coarse grid). Cached and
    uncached native paths must agree exactly across epochs."""
    npz, img_dir = _write_dataset(tmp_path, n=4)
    d = dict(np.load(npz))          # inflate boxes so fast_decode's
    d['scale'] = (d['scale'] * 2.5).astype('f4')   # reduce ladder engages
    np.savez(npz, **d)
    aug = AugmentationConfig()
    aug.scale_factor = 0.25
    aug.crop_prob = 1.0
    aug.crop_factor = 0.5
    aug.use_motion_blur = False
    kw = dict(seed=13, is_train=True, aug=aug, native_decode=True,
              fast_decode=True)
    a = CamDataset(npz, img_dir, '3dpw-test-cam',
                   region_cache_dir=str(tmp_path / 'rcfd'),
                   region_cache_format='raw', **kw)
    b = CamDataset(npz, img_dir, '3dpw-test-cam', **kw)
    for _epoch in range(3):
        for i in range(len(a)):
            np.testing.assert_array_equal(a[i]['img'], b[i]['img'])
    # the cache actually served epochs 2-3 (not silently bypassed)
    assert a._region_cache.hits >= 2 * len(a)
