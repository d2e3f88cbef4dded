"""Datagen tests: gnomonic projection geometry + generation recipes."""

import json
import os

import numpy as np
import pytest

from spec_tpu.datagen import (
    camera_rays,
    equirect_to_perspective,
    preprocess_calib_data,
    rotation_from_angles,
    rays_to_equirect_uv,
    sample_cam_params,
    sample_scalenet_cam,
)


def gradient_pano(h=256, w=512):
    """Pano where R encodes longitude, G encodes latitude."""
    lon = np.linspace(0, 255, w, dtype=np.float32)
    lat = np.linspace(0, 255, h, dtype=np.float32)
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = lon[None, :]
    img[..., 1] = lat[:, None]
    return img


def test_center_ray_points_forward():
    rays = camera_rays(100, 100, np.radians(60))
    ctr = rays[50, 50]
    np.testing.assert_allclose(ctr, [0, 0, 1], atol=0.02)


def test_forward_crop_samples_pano_center():
    pano = gradient_pano()
    crop = equirect_to_perspective(pano, np.radians(60), 0, 0, 0, (64, 64))
    # yaw=0 -> lon=0 -> u = W/2 -> R ~ 127.5; lat=0 -> v = H/2 -> G ~ 127.5
    assert abs(crop[32, 32, 0] - 127.5) < 2
    assert abs(crop[32, 32, 1] - 127.5) < 2


def test_positive_pitch_raises_horizon():
    """The framework-wide convention: pitch > 0 places the horizon ABOVE
    the image center — generated crops must agree with the horizon-line
    vis formula AND the stored annotation (regression for a mirrored
    Rx(+pitch) world-from-camera that flipped every generated pitch/roll
    label)."""
    from spec_tpu.utils.vis import horizon_points

    H, W = 256, 512
    pano = np.zeros((H, W, 3), np.uint8)
    pano[H // 2 - 1:H // 2 + 1] = 255   # mark the equator
    h = w = 100
    vfov = np.radians(60)
    for pitch in (np.radians(15), 0.0, np.radians(-15)):
        crop = equirect_to_perspective(pano, vfov, pitch, 0, 0, (h, w))
        rows = np.where(crop[:, w // 2, 0] > 100)[0]
        assert rows.size, 'no horizon visible'
        landed = rows.mean() / h
        (x0, y0), (x1, y1) = horizon_points(vfov, pitch, 0.0, w, h)
        np.testing.assert_allclose(landed, (y0 + y1) / 2 / h, atol=0.02)
    # roll sign agrees with the vis too
    crop = equirect_to_perspective(pano, vfov, 0.0, 0.3, 0, (h, w))
    lrows = np.where(crop[:, 5, 0] > 100)[0]
    rrows = np.where(crop[:, w - 5, 0] > 100)[0]
    (x0, y0), (x1, y1) = horizon_points(vfov, 0.0, 0.3, w, h)
    np.testing.assert_allclose(lrows.mean() / h, y0 / h, atol=0.03)
    np.testing.assert_allclose(rrows.mean() / h, y1 / h, atol=0.03)


def test_yaw_wraps_longitude():
    pano = gradient_pano()
    left = equirect_to_perspective(pano, np.radians(60), 0, 0,
                                   np.radians(90), (64, 64))
    assert abs(left[32, 32, 0] - (127.5 + 64)) < 3  # lon 90deg -> +W/4


def test_rotation_composition_orthonormal(rng):
    R = rotation_from_angles(0.2, 0.1, 1.0)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)


def test_sampling_distributions(rng):
    cams = [sample_cam_params(rng) for _ in range(500)]
    vf = np.array([c['vfov'] for c in cams])
    assert np.radians(15) <= vf.min() and vf.max() <= np.radians(120)
    sn = [sample_scalenet_cam(rng) for _ in range(500)]
    rolls = np.array([c['roll'] for c in sn])
    assert np.abs(rolls).max() < np.pi / 6  # strict (rejection, not clip)
    f35 = np.array([c['f35'] for c in sn])
    assert 12.0 < f35.min() and f35.max() < 100.0
    # pitch is derived from the 24mm sensor height regardless of
    # orientation (generateCalibrationDataset.py:101-109)
    c = sample_scalenet_cam(np.random.RandomState(3))
    expect = -np.arctan((c['horizon'] - 0.5) * 24.0 / c['f35'])
    np.testing.assert_allclose(c['pitch'], expect, rtol=1e-6)
    # portrait crops keep height 600 and get the 36mm-sensor vfov
    r = np.random.RandomState(11)
    seen_sensor = set()
    for _ in range(200):
        c = sample_scalenet_cam(r)
        assert c['resolution'][0] == 600
        seen_sensor.add(c['sensor_size'])
        np.testing.assert_allclose(
            c['vfov'], 2 * np.arctan2(c['sensor_size'], 2 * c['f35']))
    assert seen_sensor == {24.0, 36.0}


def _ks_stat(a, b):
    """Two-sample Kolmogorov-Smirnov statistic."""
    a, b = np.sort(a), np.sort(b)
    allv = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, allv, side='right') / len(a)
    cdf_b = np.searchsorted(b, allv, side='right') / len(b)
    return float(np.abs(cdf_a - cdf_b).max())


def test_scalenet_sampling_matches_reference_recipe():
    """Distribution parity vs a direct numpy transcription of
    generateCalibrationDataset.py:58-109 ('myDistWider20200403'):
    rejection-sampled lognormal focal, N(0.523,0.3) horizon in (-1,0.95),
    two-regime Cauchy roll with scales 0.001 (p=0.33) / 0.1."""
    from scipy.stats import cauchy, lognorm

    n = 4000
    ref_rng = np.random.RandomState(123)

    def ref_draw():
        focal = np.inf
        while not 12.0 < focal < 100.0:
            focal = np.clip(
                lognorm.rvs(s=0.8, loc=14, scale=17, random_state=ref_rng),
                12.0, 100.0)
        horizon = ref_rng.normal(0.523, 0.3)
        while not -1.0 < horizon < 0.95:
            horizon = ref_rng.normal(0.523, 0.3)
        low_roll = ref_rng.choice((True, False), p=(0.33, 0.67))
        roll = np.inf
        while not -np.pi / 6 < roll < np.pi / 6:
            roll = cauchy.rvs(loc=0.0,
                              scale=0.001 if low_roll else 0.1,
                              random_state=ref_rng)
        pitch = -np.arctan((horizon - 0.5) * 24.0 / focal)
        return focal, horizon, roll, pitch

    ref = np.array([ref_draw() for _ in range(n)])
    our_rng = np.random.RandomState(321)
    ours = np.array([[c['f35'], c['horizon'], c['roll'], c['pitch']]
                     for c in (sample_scalenet_cam(our_rng)
                               for _ in range(n))])

    # KS critical value at alpha~1e-3 (c(a)=sqrt(-ln(a/2)/2)=1.949) for
    # n=m=4000: 1.949*sqrt(2/n) ~ 0.044. Deterministic seeds — no flake.
    thresh = 1.949 * np.sqrt(2.0 / n)
    for k, name in enumerate(['focal', 'horizon', 'roll', 'pitch']):
        ks = _ks_stat(ref[:, k], ours[:, k])
        assert ks < thresh, (name, ks, thresh)
    # the two-regime structure: ~1/3 of |roll| mass is extremely tight
    frac_tiny = float((np.abs(ours[:, 2]) < 0.005).mean())
    assert 0.25 < frac_tiny < 0.45, frac_tiny


def test_preprocess_calib_data_end_to_end(tmp_path, rng):
    import cv2
    panos = []
    for i in range(2):
        p = str(tmp_path / f'pano_{i}.jpg')
        cv2.imwrite(p, (rng.rand(128, 256, 3) * 255).astype('u1'))
        panos.append(p)
    out = str(tmp_path / 'gen')
    splits = preprocess_calib_data(panos, out, crops_per_pano=3, seed=0)
    assert len(splits['train_images']) == 3
    assert len(splits['val_images']) == 3
    name = splits['train_images'][0]
    assert os.path.exists(os.path.join(out, 'images', name))
    with open(os.path.join(out, 'annotations',
                           name.replace('.jpg', '.json'))) as f:
        a = json.load(f)
    assert 15.0 <= a['vfov'] <= 120.0  # degrees in the 'pano' layout
    # round-trips through the CamCalib dataset
    from spec_tpu.data.pano_dataset import CameraRegressorDataset
    ds = CameraRegressorDataset(out, dataset='pano', is_train=True,
                                min_size=128, max_size=256)
    item = ds[0]
    assert item['img'].ndim == 3
    assert np.isfinite(item['vfov_angle'])


def test_pano_dataset_fast_decode_parity(tmp_path, rng):
    """fast_decode (PIL JPEG draft): output shape and targets are
    identical; pixels differ only by the resampling-filter difference.
    Non-JPEG (PNG) inputs fall through draft as a no-op."""
    import cv2
    from PIL import Image
    from spec_tpu.data.pano_dataset import CameraRegressorDataset

    panos = []
    for i in range(2):
        p = str(tmp_path / f'pano_{i}.jpg')
        img = cv2.GaussianBlur(
            (rng.rand(512, 1024, 3) * 255).astype(np.float32),
            (9, 9), 2.5).astype('u1')
        cv2.imwrite(p, img)
        panos.append(p)
    out = str(tmp_path / 'gen')
    # crops are 600 tall; serve at min_size=150 so draft picks 1/2
    preprocess_calib_data(panos, out, crops_per_pano=3, seed=0)
    kw = dict(dataset='pano', min_size=150, max_size=260, is_train=False)
    ref = CameraRegressorDataset(out, **kw)[0]
    fast = CameraRegressorDataset(out, fast_decode=True, **kw)[0]
    assert fast['img'].shape == ref['img'].shape
    np.testing.assert_array_equal(ref['orig_shape'], fast['orig_shape'])
    for k in ('vfov_angle', 'pitch_angle', 'roll_angle'):
        assert ref[k] == fast[k]
    # normalized-space pixels: filter-difference bound
    assert np.abs(ref['img'] - fast['img']).mean() < 0.15

    # draft never undershoots the requested size: the decoded image fed
    # to aspect_resize is >= the final target on both sides
    name = CameraRegressorDataset(out, **kw).image_filenames[0]
    with Image.open(os.path.join(out, 'images', name)) as im:
        w0, h0 = im.size
        s = 150 / min(w0, h0)
        if max(w0, h0) * s > 260:
            s = 260 / max(w0, h0)
        im.draft(None, (int(np.ceil(w0 * s * 1.15)),
                        int(np.ceil(h0 * s * 1.15))))
        w1, h1 = im.size
    assert w1 >= w0 * s and h1 >= h0 * s


def test_generate_calibration_dataset_end_to_end(tmp_path, rng):
    """ScaleNet-recipe generator writes the 'pano_scalenet' layout (json
    next to the jpg, vfov in radians) plus debug horizon overlays
    (reference generateCalibrationDataset.py:119-136)."""
    import cv2
    from spec_tpu.datagen import generate_calibration_dataset
    panos = []
    for i in range(2):
        p = str(tmp_path / f'pano_{i}.jpg')
        cv2.imwrite(p, (rng.rand(128, 256, 3) * 255).astype('u1'))
        panos.append(p)
    out = str(tmp_path / 'gen_sn')
    splits = generate_calibration_dataset(
        panos, out, crops_per_pano=2, seed=0, debug=True)
    assert len(splits['train_images']) == 2
    assert len(splits['val_images']) == 2
    for name in splits['train_images'] + splits['val_images']:
        assert os.path.exists(os.path.join(out, 'images', name))
        assert os.path.exists(os.path.join(out, 'debug', name))
        with open(os.path.join(out, 'images',
                               name.replace('.jpg', '.json'))) as f:
            a = json.load(f)
        assert 0.0 < a['vfov'] < np.pi  # radians in pano_scalenet layout
        assert abs(a['roll']) < np.pi / 6
    # crop height is always 600 (image_extraction.py:133)
    im = cv2.imread(os.path.join(out, 'images', splits['train_images'][0]))
    assert im.shape[0] == 600
    # round-trips through the CamCalib dataset in scalenet dialect
    from spec_tpu.data.pano_dataset import CameraRegressorDataset
    ds = CameraRegressorDataset(out, dataset='pano_scalenet', is_train=True,
                                min_size=128, max_size=256)
    item = ds[0]
    assert item['img'].ndim == 3
    assert np.isfinite(item['vfov_angle'])


def test_datagen_deterministic_across_worker_counts(tmp_path, rng):
    """Pano-level parallelism must not change outputs: each pano draws
    from its own (seed, index) RNG stream, so workers=1 and workers=4
    produce identical splits and annotations. Also covers the module
    CLI (`python -m spec_tpu.datagen.scalenet`)."""
    import cv2
    from spec_tpu.datagen import scalenet

    pano_dir = tmp_path / 'panos'
    pano_dir.mkdir()
    for i in range(4):
        cv2.imwrite(str(pano_dir / f'p{i}.jpg'),
                    (rng.rand(64, 128, 3) * 255).astype('u1'))

    outs = []
    for w in (1, 4):
        out = str(tmp_path / f'gen_w{w}')
        scalenet.main([str(pano_dir), out, '--crops_per_pano', '2',
                       '--seed', '3', '--workers', str(w)])
        import joblib
        outs.append({
            'train': joblib.load(os.path.join(out, 'train_images.pkl')),
            'val': joblib.load(os.path.join(out, 'val_images.pkl')),
            'annots': {
                n: json.load(open(os.path.join(
                    out, 'images', n.replace('.jpg', '.json'))))
                for n in joblib.load(
                    os.path.join(out, 'train_images.pkl'))},
        })
    assert outs[0] == outs[1]


def test_flickr_downloader_offline_and_cli(tmp_path, monkeypatch):
    """Offline behavior: a missing API key fails fast with a clear error
    (never hangs); the CLI mirrors the reference's download modes
    (scripts/download_flickr.py) with the network mocked out."""
    from spec_tpu.datagen import flickr as fl

    monkeypatch.delenv('FLICKR_API_KEY', raising=False)
    with pytest.raises(RuntimeError, match='FLICKR_API_KEY'):
        fl.FlickrDownloader(out_folder=str(tmp_path / 'o'))

    monkeypatch.setenv('FLICKR_API_KEY', 'test-key')
    calls = []

    def fake_call(self, method, **params):
        calls.append((method, params))
        if method == 'flickr.photos.search':
            page = params['page']
            photo = [{'id': f'tag{page}'}] if page == 1 else []
            return {'photos': {'photo': photo}}
        if method == 'flickr.groups.pools.getPhotos':
            page = params['page']
            photo = [{'id': f'grp{page}'}] if page == 1 else []
            return {'photos': {'photo': photo}}
        if method == 'flickr.photos.getSizes':
            return {'sizes': {'size': [
                {'label': 'Large', 'source': 'http://x/l.jpg'},
                {'label': 'Original', 'source': 'http://x/o.jpg'}]}}
        if method == 'flickr.photos.getExif':
            return {'photo': {'camera': 'testcam'}}
        raise AssertionError(method)

    fetched = {}

    class FakeResp:
        content = b'JPEGDATA'

        def raise_for_status(self):
            pass

    def fake_get(url, **kw):
        fetched[url] = fetched.get(url, 0) + 1
        return FakeResp()

    monkeypatch.setattr(fl.FlickrDownloader, '_call', fake_call)
    import types
    monkeypatch.setitem(
        __import__('sys').modules, 'requests',
        types.SimpleNamespace(get=fake_get))

    out = tmp_path / 'imgs'
    # tag mode via the CLI (mirrors scrape_and_download 'tag' branch)
    fl.main(['--download_type', 'tag', '--tag', 'people',
             '--out_folder', str(out), '--max_pages', '3'])
    assert (out / 'tag1.jpg').read_bytes() == b'JPEGDATA'
    assert json.load(open(out / 'tag1_exif.json')) == {'camera': 'testcam'}
    # group mode
    fl.main(['--download_type', 'group', '--group_id', 'g1',
             '--out_folder', str(out)])
    assert (out / 'grp1.jpg').exists()
    # ids mode from an .npy list (the reference's download())
    ids = tmp_path / 'ids.npy'
    np.save(ids, np.array(['42']))
    fl.main(['--download_type', 'ids', '--id_file', str(ids),
             '--out_folder', str(out)])
    assert (out / '42.jpg').exists()
    # pagination stopped at the first empty page
    search_pages = [p['page'] for m, p in calls
                    if m == 'flickr.photos.search']
    assert search_pages == [1, 2]
    with pytest.raises(SystemExit):
        fl.main(['--download_type', 'group', '--out_folder', str(out)])


def test_spec_synth_cli_contract(tmp_path, monkeypatch):
    """spec_datagen_synth smoke: renders frames + writes the full npz
    annotation contract (reference spec/dataset/cam_dataset.py:61-115)
    with self-consistent geometry, loadable by the production CamDataset."""
    from spec_tpu.datagen import spec_synth

    root = tmp_path / 'root'
    spec_synth.main([str(root), '--dataset', 'spec-mtp', '--n', '3',
                     '--height', '96', '--width', '128',
                     '--f_pix', '160'])

    from spec_tpu.utils import paths
    monkeypatch.setenv('SPEC_DATA_ROOT', str(root))
    npz_path = paths.dataset_files()['spec-mtp']
    d = np.load(npz_path)
    for key in ('imgname', 'scale', 'center', 'pose_cam',
                'pose_0yaw_inverseyz', 'shape', 'has_smpl', 'S', 'part',
                'openpose', 'cam_int', 'cam_rotmat', 'camcalib_pitch',
                'camcalib_roll', 'camcalib_vfov', 'camcalib_f_pix'):
        assert key in d, key
    assert d['S'].shape == (3, 24, 4) and d['part'].shape == (3, 24, 3)
    assert np.isfinite(d['S']).all() and np.isfinite(d['part']).all()
    # 2D joints land on (or near — hands can swing out) the frame, and
    # the SPIN bbox encloses the body joints.
    assert (np.abs(d['part'][:, :, :2] - [64, 48]) < [160, 120]).all()
    half = d['scale'][:, None] * 200.0 / 2.0 * 1.01
    assert (np.abs(d['part'][:, :, :2] - d['center'][:, None, :])
            <= half[..., None]).all()
    # frames exist and decode at the rendered size
    import cv2
    img_dir = paths.dataset_folders()['spec-mtp']
    frame = cv2.imread(os.path.join(img_dir, str(d['imgname'][0])))
    assert frame is not None and frame.shape == (96, 128, 3)
    # the installed humanoid SMPL assets resolve through the real loader
    from spec_tpu.core.smpl import load_smpl_assets
    assets = load_smpl_assets(
        os.path.join(str(root), 'body_models', 'smpl'), gender='neutral')
    assert assets.v_template.shape[0] == 6890


def test_pano_dataset_decode_cache(tmp_path, rng):
    """decode_cache: val items are BIT-IDENTICAL with the cache on/off,
    epoch 2 is all hits, train items draw fresh jitter per epoch from the
    cached pre-jitter pixels, and PanoAgoraDataset shares the semantics."""
    import cv2
    from spec_tpu.data.pano_dataset import CameraRegressorDataset

    panos = []
    for i in range(2):
        p = str(tmp_path / f'pano_{i}.jpg')
        img = cv2.GaussianBlur(
            (rng.rand(512, 1024, 3) * 255).astype(np.float32),
            (9, 9), 2.5).astype('u1')
        cv2.imwrite(p, img)
        panos.append(p)
    out = str(tmp_path / 'gen')
    preprocess_calib_data(panos, out, crops_per_pano=3, seed=0)
    kw = dict(dataset='pano', min_size=96, max_size=160)

    plain = CameraRegressorDataset(out, is_train=False, **kw)
    cached = CameraRegressorDataset(out, is_train=False, decode_cache=8,
                                    **kw)
    n = len(plain)
    assert n > 0
    for i in range(n):                       # epoch 1: misses, identical
        a, b = plain[i], cached[i]
        np.testing.assert_array_equal(a['img'], b['img'])
        np.testing.assert_array_equal(a['orig_shape'], b['orig_shape'])
    assert cached._decode_cache.misses == n
    for i in range(n):                       # epoch 2: all hits, identical
        np.testing.assert_array_equal(plain[i]['img'], cached[i]['img'])
    assert cached._decode_cache.hits == n

    # train: cached pixels are pre-jitter -> two epochs of the same item
    # differ (fresh jitter), and no decode happens in epoch 2
    tr = CameraRegressorDataset(out, is_train=True, decode_cache=8,
                                seed=3, **kw)
    e1 = tr[0]['img']
    misses_after_e1 = tr._decode_cache.misses
    e2 = tr[0]['img']
    assert tr._decode_cache.misses == misses_after_e1
    assert np.abs(e1 - e2).max() > 1e-4

    # PanoAgoraDataset twin (merged-npz layout)
    from spec_tpu.data.pano_agora_dataset import PanoAgoraDataset
    names, vf, pt, rl = [], [], [], []
    imdir = tmp_path / 'agora'
    imdir.mkdir()
    for i in range(3):
        nm = f'im{i}.jpg'
        cv2.imwrite(str(imdir / nm),
                    (rng.rand(128, 192, 3) * 255).astype('u1'))
        names.append(nm)
        vf.append(1.0 + 0.1 * i)
        pt.append(0.02 * i)
        rl.append(-0.01 * i)
    for split in ('train', 'val'):
        np.savez(imdir / f'pano_agora_dataset_{split}.npz',
                 imgname=np.array(names), vfov=np.array(vf, 'f4'),
                 pitch=np.array(pt, 'f4'), roll=np.array(rl, 'f4'))
    pa = PanoAgoraDataset(str(imdir), is_train=False, min_size=64,
                          max_size=96, decode_cache=4)
    pa0 = PanoAgoraDataset(str(imdir), is_train=False, min_size=64,
                           max_size=96)
    for i in range(3):
        np.testing.assert_array_equal(pa[i]['img'], pa0[i]['img'])
    pa[0]
    assert pa._decode_cache.hits == 1


def test_jitter_normalize_matches_pil_oracle(rng):
    """The fused affine jitter tracks the 4-pass PIL pipeline:
    per-op parity (brightness exact, contrast/saturation to L-rounding),
    identity at zero strength, same rng consumption, f32-clean
    normalize, and bounded full-jitter deviation (hue rotates about the
    gray axis instead of PIL's uint8-HSV shift)."""
    from PIL import Image
    from spec_tpu.core import constants as C
    from spec_tpu.data.pano_dataset import (
        color_jitter, jitter_normalize, normalize_u8)

    arr = (rng.rand(64, 96, 3) * 255).astype(np.uint8)

    def pil_ref(a, seed, **kw):
        out = color_jitter(Image.fromarray(a),
                           np.random.RandomState(seed), **kw)
        return ((np.asarray(out, np.float32) / 255.0 - C.IMG_NORM_MEAN)
                / C.IMG_NORM_STD).astype(np.float32)

    # zero-strength == plain normalize, exactly
    z = jitter_normalize(arr, np.random.RandomState(0), brightness=0,
                         contrast=0, saturation=0, hue=0)
    np.testing.assert_allclose(z, normalize_u8(arr), atol=1e-6)

    # per-op parity vs PIL (normalized space; IMG_NORM_STD ~0.225 so
    # atol 0.02 ~ 1.1/255 in pixel space)
    for kw in (dict(brightness=0.3, contrast=0, saturation=0, hue=0),
               dict(brightness=0, contrast=0.3, saturation=0, hue=0),
               dict(brightness=0, contrast=0, saturation=0.3, hue=0)):
        ours = jitter_normalize(arr, np.random.RandomState(7), **kw)
        ref = pil_ref(arr, 7, **kw)
        assert np.abs(ours - ref).max() < 0.03, kw

    # full jitter: same rng draws -> same factors; hue model differs, so
    # compare distribution-level moments, not pixels
    ours = jitter_normalize(arr, np.random.RandomState(11))
    ref = pil_ref(arr, 11)
    assert np.abs(ours.mean() - ref.mean()) < 0.05
    assert np.abs(ours.std() - ref.std()) < 0.05
    # determinism
    np.testing.assert_array_equal(
        ours, jitter_normalize(arr, np.random.RandomState(11)))
    # luma is preserved by the hue rotation: a pure-hue jitter keeps the
    # Rec.709-weighted channel mean (to clipping)
    h = jitter_normalize(arr, np.random.RandomState(5), brightness=0,
                         contrast=0, saturation=0, hue=0.1)
    w709 = np.array([0.213, 0.715, 0.072], np.float32)
    base = normalize_u8(arr)
    # de-normalize to pixel space for the luma check
    std = np.asarray(C.IMG_NORM_STD, np.float32)
    mean = np.asarray(C.IMG_NORM_MEAN, np.float32)
    luma = lambda x: float(((x * std + mean) @ w709).mean())
    assert abs(luma(h) - luma(base)) < 0.01


@pytest.mark.slow
def test_pano_dataset_device_jitter_parity(tmp_path, rng):
    """DATASET.DEVICE_JITTER: items carry raw uint8 + a per-image jitter
    affine; ops.preprocess.device_jitter_normalize reproduces the host
    jitter_normalize pixels exactly (same seed -> identical rng draws),
    val items ride the identity affine, pad_collate preserves uint8 and
    the pad mask restores exact zeros in normalized space, and the real
    camcalib train step computes the same loss on either batch form."""
    import cv2
    import jax
    import jax.numpy as jnp

    from spec_tpu.data.pano_dataset import (
        CameraRegressorDataset,
        pad_collate,
    )
    from spec_tpu.ops.preprocess import device_jitter_normalize

    panos = []
    for i in range(2):
        p = str(tmp_path / f'pano_{i}.jpg')
        img = cv2.GaussianBlur(
            (rng.rand(512, 1024, 3) * 255).astype(np.float32),
            (9, 9), 2.5).astype('u1')
        cv2.imwrite(p, img)
        panos.append(p)
    out = str(tmp_path / 'gen')
    preprocess_calib_data(panos, out, crops_per_pano=3, seed=0)
    kw = dict(dataset='pano', min_size=96, max_size=160)

    host = CameraRegressorDataset(out, is_train=True, seed=5, **kw)
    dev = CameraRegressorDataset(out, is_train=True, seed=5,
                                 device_jitter=True, **kw)
    for i in range(len(host)):
        a = host[i]                          # normalized f32 (host path)
        d = dev[i]
        assert d['img'].dtype == np.uint8
        batch = pad_collate([d])
        assert batch['img'].dtype == np.uint8
        got = np.asarray(device_jitter_normalize(
            jnp.asarray(batch['img']), jnp.asarray(batch['jitter_A']),
            jnp.asarray(batch['jitter_b']),
            jnp.asarray(batch['true_shape'])))[0]
        h, w = a['img'].shape[:2]
        np.testing.assert_allclose(got[:h, :w], a['img'], atol=2e-3)
        # pad region: exact zeros, like the host path's pad_collate
        assert np.all(got[h:] == 0.0)
        assert np.all(got[:, w:] == 0.0)

    # val: identity affine -> device path == normalize_u8 host path
    vh = CameraRegressorDataset(out, is_train=False, **kw)
    vd = CameraRegressorDataset(out, is_train=False, device_jitter=True,
                                **kw)
    a, d = vh[0], vd[0]
    batch = pad_collate([d])
    got = np.asarray(device_jitter_normalize(
        jnp.asarray(batch['img']), jnp.asarray(batch['jitter_A']),
        jnp.asarray(batch['jitter_b']),
        jnp.asarray(batch['true_shape'])))[0]
    h, w = a['img'].shape[:2]
    np.testing.assert_allclose(got[:h, :w], a['img'], atol=1e-5)

    # the real train step: identical loss on host-f32 vs device-u8 batches
    import optax

    from spec_tpu.models import CameraRegressorNetwork
    from spec_tpu.train import create_train_state, make_camcalib_train_step

    model = CameraRegressorNetwork(backbone='resnet18')
    tx = optax.sgd(1e-2)
    n = min(len(host), 2)
    hb = pad_collate([host[i] for i in range(n)], fixed_hw=(192, 192))
    # fresh device dataset so the jitter rng draws line up with `host`'s
    dev2 = CameraRegressorDataset(out, is_train=True, seed=5,
                                  device_jitter=True, **kw)
    db = pad_collate([dev2[i] for i in range(n)], fixed_hw=(192, 192))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 96, 96, 3)))
    step = jax.jit(make_camcalib_train_step(model, tx))

    def run(b):
        batch = {'img': jnp.asarray(b['img']),
                 'vfov': jnp.asarray(b['vfov']),
                 'pitch': jnp.asarray(b['pitch']),
                 'roll': jnp.asarray(b['roll'])}
        if 'jitter_A' in b:
            batch['jitter_A'] = jnp.asarray(b['jitter_A'])
            batch['jitter_b'] = jnp.asarray(b['jitter_b'])
            batch['true_shape'] = jnp.asarray(b['true_shape'])
        _, metrics = step(create_train_state(variables, tx), batch)
        return float(metrics['loss'])

    np.testing.assert_allclose(run(db), run(hb), rtol=1e-4)
