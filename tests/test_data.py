"""Data layer tests: SPIN crop/transform parity against an independent
pad-slice-resize implementation, dataset contract on a synthetic npz,
mixed-ratio sampling, and the threaded loader."""

import os

import numpy as np
import cv2
import pytest

from spec_tpu.core import constants as C
from spec_tpu.data import (
    AugmentationConfig,
    CamDataset,
    DataLoader,
    MixedCamDataset,
    collate,
    parse_datasets_ratios,
)
from spec_tpu.data import transforms as T


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def reference_style_crop(img, center, scale, res):
    """Independent reimplementation of the classic SPIN crop (no rotation):
    compute ul/br via the inverse point transform, pad-slice, resize."""
    ul = T.transform_point([1, 1], center, scale, res, invert=1) - 1
    br = T.transform_point([res[0] + 1, res[1] + 1], center, scale, res,
                           invert=1) - 1
    new_shape = [br[1] - ul[1], br[0] - ul[0]]
    if len(img.shape) > 2:
        new_shape += [img.shape[2]]
    new_img = np.zeros(new_shape, dtype=np.float32)
    new_x = max(0, -ul[0]), min(br[0], img.shape[1]) - ul[0]
    new_y = max(0, -ul[1]), min(br[1], img.shape[0]) - ul[1]
    old_x = max(0, ul[0]), min(img.shape[1], br[0])
    old_y = max(0, ul[1]), min(img.shape[0], br[1])
    new_img[new_y[0]:new_y[1], new_x[0]:new_x[1]] = \
        img[old_y[0]:old_y[1], old_x[0]:old_x[1]]
    return cv2.resize(new_img, (res[1], res[0]),
                      interpolation=cv2.INTER_LINEAR)


def test_crop_matches_reference_style(rng):
    img = (rng.rand(300, 400, 3) * 255).astype(np.float32)
    center = np.array([210.0, 160.0])
    scale = 0.9
    res = [224, 224]
    mine = T.crop(img, center, scale, res)
    ref = reference_style_crop(img, center, scale, res)
    np.testing.assert_allclose(mine, ref, atol=1e-4)  # exact path


def test_crop_shapes_and_range(rng):
    img = (rng.rand(123, 77, 3) * 255).astype(np.float32)
    out = T.crop(img, [38.0, 61.0], 0.4, [224, 224], rot=15.0)
    assert out.shape == (224, 224, 3)
    assert out.min() >= 0 and out.max() <= 255


def test_flip_pose_involution(rng):
    pose = rng.randn(72).astype(np.float32)
    np.testing.assert_allclose(T.flip_pose(T.flip_pose(pose.copy())), pose)


def test_flip_kp_involution(rng):
    kp = rng.randn(49, 3).astype(np.float32)
    np.testing.assert_allclose(T.flip_kp(T.flip_kp(kp.copy())), kp)


def test_rot_aa_matches_manual(rng):
    aa = rng.randn(3).astype(np.float32) * 0.5
    out = T.rot_aa(aa.copy(), 30.0)
    R0, _ = cv2.Rodrigues(aa.astype(np.float64))
    rot_rad = -30.0 * np.pi / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    Rz = np.array([[cs, -sn, 0], [sn, cs, 0], [0, 0, 1]])
    expect, _ = cv2.Rodrigues(Rz @ R0)
    np.testing.assert_allclose(out, expect.reshape(3), atol=1e-5)


def test_pick_reduce_keeps_downsample():
    # box/reduce must stay >= margin*out_res (margin=1.15)
    assert T.pick_reduce(800.0, 224) == 2      # 400 >= 257.6, 200 < 257.6
    assert T.pick_reduce(500.0, 224) == 1      # 250 < 257.6
    assert T.pick_reduce(2200.0, 224) == 8     # capped at max_reduce
    assert T.pick_reduce(2200.0, 224, max_reduce=4) == 4
    assert T.pick_reduce(600.0, 480) == 1      # large crop target wins


@pytest.fixture
def big_jpeg(tmp_path):
    """A 960x1280 JPEG with sharp landmark dots on a smooth gradient."""
    H, W = 960, 1280
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.stack([xx / W * 255, yy / H * 255,
                    (xx + yy) / (W + H) * 255], -1).astype(np.uint8)
    for (y, x) in [(300, 420), (500, 700), (640, 900)]:
        img[y - 3:y + 4, x - 3:x + 4] = 255
    p = str(tmp_path / 'big.jpg')
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 97])
    return p, (H, W)


def test_reduced_decode_crop_parity(big_jpeg):
    """fast-decode parity bounds: the reduced-decode crop must agree with
    the full-res SPIN crop up to the resampling-filter difference (content)
    and align geometrically to sub-pixel (phase correlation)."""
    p, (H, W) = big_jpeg
    center = np.array([660.0, 470.0])
    scale = 800.0 / T.BBOX_SIDE
    res = [224, 224]

    np.testing.assert_array_equal(T.image_dims(p), [H, W])
    r = T.pick_reduce(T.BBOX_SIDE * scale, 224)
    assert r == 2
    red = T.read_img(p, reduce=r)
    assert red.shape[:2] == (int(np.ceil(H / r)), int(np.ceil(W / r)))

    full = T.read_img(p)
    crop_full = T.crop(full, center, scale, res)
    crop_red = T.crop_from_reduced(red, center, scale, res, r)

    diff = np.abs(crop_full - crop_red)
    assert diff.mean() < 1.0          # 0-255 scale; measured ~0.16
    assert np.percentile(diff, 99) < 4.0

    # Least-squares shift estimate against the known gradients: channel
    # 0 is a pure x-ramp, channel 1 a pure y-ramp, so any geometric
    # misalignment shows up as shift = <d, g> / <g, g>. (phaseCorrelate
    # is unusable here: its subpixel centroid is biased ~0.5 px by the
    # resampling-filter difference even on exactly-aligned crops.)
    d = (crop_red - crop_full)[8:-8, 8:-8]
    gx = np.gradient(crop_full[8:-8, 8:-8, 0], axis=1)
    gy = np.gradient(crop_full[8:-8, 8:-8, 1], axis=0)
    shift_x = (d[..., 0] * gx).sum() / (gx * gx).sum()
    shift_y = (d[..., 1] * gy).sum() / (gy * gy).sum()
    assert abs(shift_x) < 0.1 and abs(shift_y) < 0.1, (shift_x, shift_y)


@pytest.mark.parametrize('orientation', [1, 3, 6, 8])
def test_image_dims_exif_orientation(tmp_path, orientation):
    """image_dims (header-only) must report the dims of what read_img
    (cv2, which APPLIES EXIF orientation) decodes — for the 90-degree
    family (5-8) the raster is transposed vs the stored raster."""
    from PIL import Image

    H, W = 96, 160
    arr = (np.mgrid[0:H, 0:W][1] % 256).astype(np.uint8)
    im = Image.fromarray(np.stack([arr] * 3, -1))
    exif = Image.Exif()
    exif[0x0112] = orientation
    p = str(tmp_path / f'orient{orientation}.jpg')
    im.save(p, exif=exif)

    decoded = T.read_img(p)
    assert tuple(T.image_dims(p).astype(int)) == decoded.shape[:2]
    red = T.read_img(p, reduce=2)
    assert red.shape[:2] == tuple(
        int(np.ceil(d / 2)) for d in decoded.shape[:2])


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------


@pytest.fixture
def synthetic_dataset(tmp_path, rng):
    n = 12
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    names = []
    for i in range(n):
        name = f'im_{i:03d}.jpg'
        img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / name), img)
        names.append(name)

    annot = dict(
        imgname=np.array(names),
        scale=(rng.rand(n) * 0.5 + 0.8).astype('f4'),
        center=np.stack([rng.rand(n) * 100 + 110,
                         rng.rand(n) * 80 + 80], 1).astype('f4'),
        pose=(rng.randn(n, 72) * 0.2).astype('f4'),
        shape=(rng.randn(n, 10) * 0.5).astype('f4'),
        has_smpl=np.ones(n, 'f4'),
        S=rng.randn(n, 24, 4).astype('f4'),
        part=np.concatenate([rng.rand(n, 24, 2) * 200,
                             np.ones((n, 24, 1))], -1).astype('f4'),
        openpose=np.zeros((n, 25, 3), 'f4'),
        gender=np.array(['m', 'f'] * (n // 2)),
        cam_rotmat=np.tile(np.eye(3, dtype='f4'), (n, 1, 1)),
        cam_pitch=(rng.randn(n) * 0.1).astype('f4'),
        cam_roll=(rng.randn(n) * 0.05).astype('f4'),
        cam_int=np.tile(np.array(
            [[1000, 0, 160], [0, 1000, 120], [0, 0, 1]], 'f4'), (n, 1, 1)),
        focal_length=np.full(n, 1000.0, 'f4'),
        camcalib_pitch=(rng.randn(n) * 0.1).astype('f4'),
        camcalib_roll=(rng.randn(n) * 0.05).astype('f4'),
        camcalib_vfov=(rng.rand(n) * 0.5 + 0.6).astype('f4'),
        camcalib_f_pix=(rng.rand(n) * 500 + 800).astype('f4'),
    )
    annot_file = tmp_path / 'annots.npz'
    np.savez(annot_file, **annot)
    return str(annot_file), str(img_dir), annot


def test_cam_dataset_eval_item(synthetic_dataset):
    annot_file, img_dir, annot = synthetic_dataset
    ds = CamDataset(annot_file, img_dir, dataset='3dpw-test-cam',
                    is_train=False)
    assert len(ds) == 12
    item = ds[3]
    assert item['img'].shape == (224, 224, 3)
    assert item['img'].dtype == np.float32
    assert 0.0 <= item['img'].min() and item['img'].max() <= 1.0
    assert item['pose'].shape == (72,)
    assert item['keypoints'].shape == (49, 3)
    assert item['keypoints_orig'].shape == (49, 3)
    assert item['pose_3d'].shape == (24, 4)
    assert item['cam_int'].shape == (3, 3)
    assert item['pred_cam_rotmat'].shape == (3, 3)
    assert item['pred_cam_int'][0, 0] == annot['camcalib_f_pix'][3]
    # pred rotmat is a rotation
    R = item['pred_cam_rotmat']
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert item['gender'] in (0, 1)


def test_cam_dataset_fast_decode_parity(tmp_path, rng):
    """fast_decode=True must leave every non-image field bit-identical
    (coords stay full-res) and the crop within resampling-filter bounds."""
    n = 2
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    names = []
    for i in range(n):
        name = f'big_{i}.jpg'
        # band-limited content (photo-like): white noise is the
        # worst case for comparing two downsample filter chains
        img = (rng.rand(720, 960, 3) * 255).astype(np.float32)
        img = cv2.GaussianBlur(img, (9, 9), 2.5).astype(np.uint8)
        cv2.imwrite(str(img_dir / name), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        names.append(name)
    annot = dict(
        imgname=np.array(names),
        scale=np.full(n, 3.0, 'f4'),            # 600 px box -> reduce=2
        center=np.array([[480.0, 360.0]] * n, 'f4'),
        pose=(rng.randn(n, 72) * 0.2).astype('f4'),
        shape=(rng.randn(n, 10) * 0.5).astype('f4'),
        has_smpl=np.ones(n, 'f4'),
        S=rng.randn(n, 24, 4).astype('f4'),
        part=np.concatenate([rng.rand(n, 24, 2) * 700,
                             np.ones((n, 24, 1))], -1).astype('f4'),
        openpose=np.zeros((n, 25, 3), 'f4'),
        cam_int=np.tile(np.array(
            [[1000, 0, 480], [0, 1000, 360], [0, 0, 1]], 'f4'),
            (n, 1, 1)),
    )
    annot_file = tmp_path / 'annots.npz'
    np.savez(annot_file, **annot)

    kw = dict(dataset='3dpw-test-cam', is_train=False)
    ref = CamDataset(str(annot_file), str(img_dir), **kw)[0]
    fast = CamDataset(str(annot_file), str(img_dir), fast_decode=True,
                      **kw)[0]
    assert fast['img'].shape == ref['img'].shape
    # fields carrying full-res coordinates must be bit-identical
    for k in ('keypoints', 'keypoints_orig', 'cam_int', 'orig_shape',
              'scale', 'center', 'pose', 'pose_3d'):
        if k in ref:
            np.testing.assert_array_equal(ref[k], fast[k], err_msg=k)
    diff = np.abs(ref['img'] - fast['img'])  # images are [0,1] floats
    assert diff.mean() < 0.02

    # small-box samples must fall back to full decode (reduce=1) and be
    # bit-identical
    annot['scale'] = np.full(n, 1.0, 'f4')
    np.savez(annot_file, **annot)
    ref = CamDataset(str(annot_file), str(img_dir), **kw)[0]
    fast = CamDataset(str(annot_file), str(img_dir), fast_decode=True,
                      **kw)[0]
    np.testing.assert_array_equal(ref['img'], fast['img'])


def test_cam_dataset_train_item_augs(synthetic_dataset):
    annot_file, img_dir, _ = synthetic_dataset
    aug = AugmentationConfig(flip_prob=1.0, rot_factor=30.0)
    ds = CamDataset(annot_file, img_dir, dataset='spec-syn', is_train=True,
                    aug=aug)
    item = ds[0]
    assert item['is_flipped'] == 1.0
    assert 'pred_cam_rotmat' not in item  # eval-only field
    assert item['img'].shape == (224, 224, 3)


def test_mixed_dataset_ratio(synthetic_dataset):
    annot_file, img_dir, _ = synthetic_dataset
    d1 = CamDataset(annot_file, img_dir, dataset='a', is_train=True)
    d2 = CamDataset(annot_file, img_dir, dataset='b', is_train=True)
    names, ratios = parse_datasets_ratios('a_b_0.2_0.8')
    assert names == ['a', 'b'] and ratios == [0.2, 0.8]
    mix = MixedCamDataset([d1, d2], ratios, seed=1)
    counts = {'a': 0, 'b': 0}
    for i in range(200):
        counts[mix[i]['dataset_name']] += 1
    assert counts['b'] > counts['a'] * 2


def test_loader_batches_and_padding(synthetic_dataset):
    annot_file, img_dir, _ = synthetic_dataset
    ds = CamDataset(annot_file, img_dir, dataset='3dpw-test-cam',
                    is_train=False)
    loader = DataLoader(ds, batch_size=8, num_workers=4)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]['img'].shape == (8, 224, 224, 3)
    assert batches[0]['_valid_count'] == 8
    assert batches[1]['img'].shape == (8, 224, 224, 3)  # padded
    assert batches[1]['_valid_count'] == 4
    assert len(batches[0]['imgname']) == 8
    assert isinstance(batches[0]['imgname'][0], str)


def test_read_img_returns_uint8_and_crop_parity(big_jpeg):
    """read_img returns uint8; both crop paths convert exactly, so the
    crop is bit-identical to cropping a pre-floated frame."""
    p, _ = big_jpeg
    img = T.read_img(p)
    assert img.dtype == np.uint8
    center, scale, res = np.array([660.0, 470.0]), 4.0, [224, 224]
    a = T.crop(img, center, scale, res)
    b = T.crop(img.astype(np.float32), center, scale, res)
    assert a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    a = T.crop(img, center, scale, res, rot=17.0)
    b = T.crop(img.astype(np.float32), center, scale, res, rot=17.0)
    np.testing.assert_array_equal(a, b)


def test_loader_group_keys_semantics():
    """Grouped shuffle: one epoch covers each index exactly once, members
    of a group stay adjacent and in original relative order, and the
    epoch order is seed-deterministic."""

    class _Idx:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {'i': np.int64(i)}

    keys = np.array(['b', 'a', 'b', 'c', 'a', 'c', 'c', 'a', 'b', 'a'])
    members = {k: [i for i in range(10) if keys[i] == k] for k in 'abc'}

    def epoch_order(seed):
        loader = DataLoader(_Idx(), batch_size=5, shuffle=True, seed=seed,
                            num_workers=2, group_keys=keys)
        return [int(x) for b in loader for x in b['i'][:b['_valid_count']]]

    order = epoch_order(0)
    assert sorted(order) == list(range(10))
    # group members contiguous + original relative order
    pos = 0
    while pos < len(order):
        k = keys[order[pos]]
        size = len(members[k])
        assert order[pos:pos + size] == members[k]
        pos += size
    assert epoch_order(0) == order
    # sequential (shuffle=False) also iterates group-contiguously
    loader = DataLoader(_Idx(), batch_size=10, num_workers=1,
                        group_keys=keys)
    seq = [int(x) for b in loader for x in b['i'][:b['_valid_count']]]
    assert seq == members['a'] + members['b'] + members['c']

    with pytest.raises(ValueError):
        DataLoader(_Idx(), batch_size=5, group_keys=keys[:4])


def test_frame_cache_dedup_and_thread_safety(tmp_path, rng):
    """decode_cache: sibling samples of one frame decode it once, items
    are identical with/without the cache, and the in-flight latch holds
    under concurrent access."""
    from spec_tpu.data.cam_dataset import _FrameCache

    # pure cache: hammer get_or_compute from many threads
    import threading
    cache = _FrameCache(4)
    calls = {'n': 0}
    compute_lock = threading.Lock()

    def fn():
        with compute_lock:
            calls['n'] += 1
        return np.zeros(3), np.zeros(2)

    threads = [threading.Thread(target=lambda: cache.get_or_compute('k', fn))
               for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert calls['n'] == 1 and cache.hits == 15

    # dataset-level: 2 frames x 3 samples; count actual decodes
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    for i in range(2):
        img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f'f{i}.jpg'), img)
    n = 6
    names = np.array([f'f{i // 3}.jpg' for i in range(n)])
    annot = dict(
        imgname=names,
        scale=np.full(n, 1.0, 'f4'),
        center=np.array([[160.0, 120.0]] * n, 'f4'),
        pose=(rng.randn(n, 72) * 0.2).astype('f4'),
        shape=(rng.randn(n, 10) * 0.5).astype('f4'),
        has_smpl=np.ones(n, 'f4'), S=rng.randn(n, 24, 4).astype('f4'),
        part=np.concatenate([rng.rand(n, 24, 2) * 200,
                             np.ones((n, 24, 1))], -1).astype('f4'),
        openpose=np.zeros((n, 25, 3), 'f4'),
    )
    annot_file = tmp_path / 'annots.npz'
    np.savez(annot_file, **annot)

    # native_decode=False: the fused native path never calls T.read_img,
    # which this test patches to count decodes.
    kw = dict(dataset='3dpw-test-cam', is_train=False, native_decode=False)
    plain = CamDataset(str(annot_file), str(img_dir), **kw)
    cachd = CamDataset(str(annot_file), str(img_dir), decode_cache=4, **kw)
    decodes = {'n': 0}
    orig = T.read_img

    def counting_read(path, reduce=1):
        decodes['n'] += 1
        return orig(path, reduce=reduce)

    T.read_img, T_read = counting_read, T.read_img
    try:
        items_c = [cachd[i] for i in range(n)]
        assert decodes['n'] == 2          # one decode per frame
        items_p = [plain[i] for i in range(n)]
        assert decodes['n'] == 2 + n
    finally:
        T.read_img = T_read
    for a, b in zip(items_c, items_p):
        np.testing.assert_array_equal(a['img'], b['img'])

    # loader end-to-end with grouping: decodes stay deduped
    decodes['n'] = 0
    cachd2 = CamDataset(str(annot_file), str(img_dir), decode_cache=4,
                        **kw)
    T.read_img = counting_read
    try:
        loader = DataLoader(cachd2, batch_size=3, shuffle=True,
                            num_workers=3, group_keys=cachd2.imgname)
        n_rows = sum(b['_valid_count'] for b in loader)
        assert n_rows == n and decodes['n'] == 2
    finally:
        T.read_img = T_read


def test_loader_skip_applies_to_first_iteration_only():
    """skip_batches models a resumed (partial) epoch: only the FIRST
    iteration of the loader skips; re-iterating the same loader (next
    epoch) must yield full epochs, and len() must match each phase."""

    class Idx:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {'i': np.int64(i)}

    loader = DataLoader(Idx(), batch_size=4, num_workers=1,
                        skip_batches=3)
    assert len(loader) == 1
    first = list(loader)
    assert len(first) == 1                      # resumed epoch: 1 batch
    assert len(loader) == 4
    second = list(loader)
    assert len(second) == 4                     # next epoch: full



def test_iou_tracker():
    """Greedy IoU tracking: stable ids across motion, occlusion grace
    period (max_age), new ids for new people."""
    from spec_tpu.data.tracking import IoUTracker, iou_matrix, \
        track_video_boxes

    m = iou_matrix(np.array([[50, 50, 20, 20]], 'f4'),
                   np.array([[50, 50, 20, 20], [200, 200, 10, 10]], 'f4'))
    np.testing.assert_allclose(m, [[1.0, 0.0]], atol=1e-6)

    t = IoUTracker(iou_threshold=0.3, max_age=2)
    a0 = t.update(np.array([[50, 50, 30, 60], [150, 50, 30, 60]], 'f4'))
    assert sorted(a0.tolist()) == [0, 1]
    # both move slightly -> same ids
    a1 = t.update(np.array([[54, 51, 30, 60], [146, 50, 30, 60]], 'f4'))
    assert a1.tolist() == a0.tolist()
    # person 0 occluded for 2 frames (within max_age) then returns
    a2 = t.update(np.array([[146, 50, 30, 60]], 'f4'))
    assert a2.tolist() == [a0[1]]
    a3 = t.update(np.array([[56, 52, 30, 60], [146, 50, 30, 60]], 'f4'))
    assert set(a3.tolist()) == {a0[0], a0[1]}  # gap 2 <= max_age
    # unseen for LONGER than max_age -> retired, a comeback gets a new id
    for _ in range(3):
        t.update(np.array([[146, 50, 30, 60]], 'f4'))
    a4 = t.update(np.array([[56, 52, 30, 60], [146, 50, 30, 60]], 'f4'))
    assert a0[0] not in a4.tolist()
    # a genuinely new person gets a new id
    a5 = t.update(np.array([[56, 52, 30, 60], [146, 50, 30, 60],
                            [300, 80, 30, 60]], 'f4'))
    assert a5[2] not in a4.tolist()  # brand-new person, fresh id

    ids = track_video_boxes([np.array([[10, 10, 8, 8]], 'f4')] * 3)
    assert all(i.tolist() == [0] for i in ids)


def test_sort_tracker_motion_model():
    """SORT (Kalman + Hungarian, the reference MPT algorithm): the
    velocity model bridges a two-frame detection miss on a walker —
    greedy last-box IoU cannot (after two missed frames the stale box
    no longer overlaps the target at all)."""
    from spec_tpu.data.tracking import IoUTracker, SortTracker

    # walker: 18 px/frame, width 40 -> consecutive-frame IoU ~0.38,
    # trackable by both; 3-frame displacement 54 px > width -> IoU 0
    def boxes_at(t):
        return np.array([[50 + 18 * t, 60, 40, 50]], 'f4')

    sort = SortTracker(iou_threshold=0.3, max_age=3)
    greedy = IoUTracker(iou_threshold=0.3, max_age=3)
    for t in range(5):
        sid = sort.update(boxes_at(t))[0]
        gid = greedy.update(boxes_at(t))[0]
        if t == 0:
            sid0, gid0 = sid, gid
    assert sid == sid0 and gid == gid0    # both follow while detected
    # detector misses t=5 and t=6 (still walking), reappears at t=7
    for _ in range(2):
        sort.update(np.zeros((0, 4), 'f4'))
        greedy.update(np.zeros((0, 4), 'f4'))
    assert sort.update(boxes_at(7))[0] == sid0      # prediction bridges
    assert greedy.update(boxes_at(7))[0] != gid0    # stale box lost it

    # two crossing walkers keep their ids through the crossover
    sort2 = SortTracker(iou_threshold=0.3, max_age=2)
    left = lambda t: [40 + 8 * t, 60, 28, 56]      # ->
    right = lambda t: [280 - 8 * t, 64, 28, 56]    # <-
    first = sort2.update(np.array([left(0), right(0)], 'f4'))
    for t in range(1, 31):
        cur = sort2.update(np.array([left(t), right(t)], 'f4'))
    assert cur.tolist() == first.tolist()          # no identity swap


def test_track_video_boxes_method_switch():
    from spec_tpu.data.tracking import track_video_boxes

    frames = [np.array([[10 + 2 * t, 10, 8, 8]], 'f4') for t in range(4)]
    for method in ('sort', 'iou'):
        ids = track_video_boxes(frames, method=method)
        assert all(i.tolist() == [0] for i in ids), method
    with pytest.raises(KeyError):
        track_video_boxes(frames, method='nope')


@pytest.mark.slow
def test_jitter_normalize_bounds_drift_vs_pil_colorjitter():
    """The fused-affine jitter deviates from the PIL 4-pass chain in
    documented ways (single final clip, hue as luma-preserving gray-axis
    rotation, strided contrast mean). This bounds the distribution
    drift (ADVICE r4): with PAIRED rng draws (jitter_normalize consumes
    color_jitter's exact draw pattern, so factor sets and op order
    match per draw) the outputs must agree per-draw to a few gray
    levels and match distributionally."""
    from PIL import Image

    from spec_tpu.data.pano_dataset import (
        color_jitter,
        jitter_normalize,
        normalize_u8,
    )

    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:96, 0:128]
    base = 128 + 70 * np.sin(xx / 13.0) * np.cos(yy / 9.0)
    img = np.clip(base[..., None] + rng.rand(96, 128, 3) * 40 - 20,
                  10, 245).astype(np.uint8)

    diffs, mean_f, mean_p = [], [], []
    for k in range(200):
        fused = jitter_normalize(img, np.random.RandomState(k))
        pil = normalize_u8(np.asarray(
            color_jitter(Image.fromarray(img), np.random.RandomState(k)),
            np.uint8))
        diffs.append(np.abs(fused - pil).mean())
        mean_f.append(fused.mean())
        mean_p.append(pil.mean())
    # Units: 1.0 ~ one ImageNet std (~57 gray levels). Measured on this
    # material: mean 0.042, p95 0.068, max 0.080; mean-of-means delta
    # 0.025; std-of-means ratio 1.003.
    assert np.mean(diffs) < 0.08
    assert np.percentile(diffs, 95) < 0.12
    assert abs(np.mean(mean_f) - np.mean(mean_p)) < 0.05
    ratio = np.std(mean_f) / max(np.std(mean_p), 1e-9)
    assert 0.9 < ratio < 1.1


def test_device_jitter_normalize_micro_parity(rng):
    """Fast numeric twin of the slow dataset-level DEVICE_JITTER test:
    the on-device affine+clip+normalize reproduces host jitter_normalize
    on the same drawn affine (paired rng), and the identity affine
    reproduces normalize_u8."""
    import jax.numpy as jnp

    from spec_tpu.data.pano_dataset import (
        jitter_normalize,
        normalize_u8,
        sample_jitter_affine,
    )
    from spec_tpu.ops.preprocess import device_jitter_normalize

    arr = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    host = jitter_normalize(arr, np.random.RandomState(11))
    A, b = sample_jitter_affine(arr, np.random.RandomState(11))
    dev = np.asarray(device_jitter_normalize(
        jnp.asarray(arr[None]), jnp.asarray(A[None].astype(np.float32)),
        jnp.asarray(b[None].astype(np.float32))))[0]
    np.testing.assert_allclose(dev, host, atol=2e-3)

    eye = np.eye(3, dtype=np.float32)[None]
    zero = np.zeros((1, 3), np.float32)
    dev_id = np.asarray(device_jitter_normalize(
        jnp.asarray(arr[None]), jnp.asarray(eye), jnp.asarray(zero)))[0]
    np.testing.assert_allclose(dev_id, normalize_u8(arr), atol=1e-5)
