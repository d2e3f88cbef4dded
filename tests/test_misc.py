"""Small-surface tests: image-folder bucketing, OBJ export, schedule
parsing, detection helpers, pano-agora merge."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from spec_tpu.data.detection import bbox_to_center_scale, full_image_bboxes
from spec_tpu.data.image_folder import ImageFolder, resize_min_side
from spec_tpu.train.trainer import parse_schedule


def test_image_folder_buckets(tmp_path, rng):
    names = []
    for i, (h, w) in enumerate([(480, 640), (480, 640), (600, 450)]):
        p = tmp_path / f'i{i}.jpg'
        Image.fromarray((rng.rand(h, w, 3) * 255).astype('u1')).save(p)
        names.append(str(p))
    ds = ImageFolder(names, min_size=120)
    buckets = ds.shape_buckets()
    assert len(buckets) == 2
    sizes = sorted((k, len(v)) for k, v in buckets.items())
    assert sum(n for _, n in sizes) == 3
    item = ds[0]
    assert item['img'].shape[0] == 120 or item['img'].shape[1] == 120


def test_resize_min_side():
    img = Image.new('RGB', (640, 480))
    out = resize_min_side(img, 600)
    assert min(out.size) == 600
    assert out.size == (800, 600)


def test_parse_schedule():
    sched = parse_schedule('0+a_b_0.5_0.5 5+c_1.0')
    assert sched == {0: 'a_b_0.5_0.5', 5: 'c_1.0'}
    assert parse_schedule('') == {}


def test_bbox_helpers():
    boxes = np.array([[100.0, 80.0, 50.0, 60.0]], np.float32)
    center, scale = bbox_to_center_scale(boxes)
    np.testing.assert_allclose(center[0], [100, 80])
    np.testing.assert_allclose(scale[0], 60.0 / 200.0)

    dets = full_image_bboxes({'a.jpg': (480, 640)})
    assert dets['a.jpg'].shape == (1, 4)
    np.testing.assert_allclose(dets['a.jpg'][0, :2], [320, 240])


def test_write_obj(tmp_path):
    from spec_tpu.cli.spec_demo import write_obj

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    path = tmp_path / 'm.obj'
    write_obj(str(path), verts, faces)
    lines = path.read_text().strip().split('\n')
    assert lines[0].startswith('v ') and lines[-1] == 'f 1 2 3'


def test_pano_agora_merge(tmp_path, rng):
    import joblib
    from spec_tpu.datagen import merge_pano_agora

    pano = tmp_path / 'pano'
    (pano / 'annotations').mkdir(parents=True)
    joblib.dump(['a.jpg'], pano / 'train_images.pkl')
    with open(pano / 'annotations' / 'a.json', 'w') as f:
        json.dump({'pitch': 0.1, 'roll': 0.02, 'vfov': 60.0}, f)
    agora = {'agora/b.png': {'pitch': -0.05, 'roll': 0.01, 'focal': 1000.0}}

    out = tmp_path / 'merged'
    n = merge_pano_agora(str(pano), agora, str(out), val_ratio=0.5)
    assert n == 2
    train = np.load(out / 'pano_agora_dataset_train.npz', allow_pickle=True)
    val = np.load(out / 'pano_agora_dataset_val.npz', allow_pickle=True)
    assert len(train['imgname']) + len(val['imgname']) == 2
    allv = np.concatenate([train['vfov'], val['vfov']])
    # AGORA vfov derived from focal: 2 atan(540/1000)
    assert np.any(np.isclose(allv, 2 * np.arctan(540.0 / 1000.0),
                             atol=1e-5))
    # pano vfov stored in degrees -> radians
    assert np.any(np.isclose(allv, np.radians(60.0), atol=1e-5))


def test_merge_with_template_shape_tolerance(rng):
    """overwrite_shape_mismatch semantics: mismatched / missing leaves
    keep the template init, matching ones take the checkpoint value."""
    import jax.numpy as jnp
    from spec_tpu.utils.checkpoints import merge_with_template

    template = {'params': {
        'head': {'kernel': jnp.zeros((4, 8)), 'bias': jnp.zeros((8,))},
        'trunk': {'w': jnp.zeros((3, 3))}}}
    ckpt = {'params': {
        'head': {'kernel': jnp.ones((4, 16)),      # changed width
                 'bias': jnp.ones((8,))},          # matches
        # trunk missing entirely
    }}
    out = merge_with_template(ckpt, template, verbose=False)
    assert out['params']['head']['kernel'].shape == (4, 8)
    assert float(out['params']['head']['kernel'].sum()) == 0.0   # re-init
    assert float(out['params']['head']['bias'].sum()) == 8.0     # loaded
    assert out['params']['trunk']['w'].shape == (3, 3)


def test_euler_rotation_sites_agree(tmp_path):
    """Every euler(pitch, 0, roll) construction site — geometry
    euler_to_rotmat, cam_params.read_cam_params, cam_dataset's pred-cam
    helper — must build the SAME rotation (PARE batch_euler2matrix order).
    Regression for a divergence where geometry used Rz@Rx while the data
    paths used the transposed composition."""
    import joblib
    import jax.numpy as jnp
    from spec_tpu.core import geometry as G
    from spec_tpu.utils.cam_params import read_cam_params
    from spec_tpu.data.cam_dataset import _euler_pitch_roll

    pitch, roll, vfov = 0.23, -0.11, 1.1
    R_geo = np.asarray(G.euler_to_rotmat(
        jnp.asarray([[pitch, 0.0, roll]], jnp.float32)))[0]

    pkl = tmp_path / 'img.pkl'
    joblib.dump({'vfov': vfov, 'f_pix': 500.0, 'pitch': pitch,
                 'roll': roll}, pkl)
    R_io = read_cam_params(str(pkl), img_w=640.0, img_h=480.0)[0]
    np.testing.assert_allclose(R_io, R_geo, atol=1e-6)

    R_ds = _euler_pitch_roll(pitch, roll)
    np.testing.assert_allclose(R_ds, R_geo, atol=1e-6)

    # The renderer's overlay rotation and the shared numpy twin.
    from spec_tpu.core.geometry import euler_pitch_roll_np
    np.testing.assert_allclose(euler_pitch_roll_np(pitch, roll), R_geo,
                               atol=1e-6)


def test_joint_error_uncertainty_heatmap_vis():
    from spec_tpu.utils import vis as V

    img = np.zeros((64, 48, 3), np.uint8)
    kp = np.array([[10.0, 10.0, 1.0], [30.0, 40.0, 1.0]], np.float32)
    out = V.draw_joint_errors(img, kp, np.array([0.0, 50.0]))
    assert out.shape == img.shape
    # low-error joint is green-dominant, high-error joint red-dominant
    assert out[10, 10, 1] > out[10, 10, 0]
    assert out[40, 30, 0] > out[40, 30, 1]

    out_u = V.draw_joint_uncertainties(img, kp, np.array([0.1, 2.0]))
    assert out_u.sum() > 0

    hm = np.zeros((2, 16, 12), np.float32)
    hm[0, 4, 4] = 1.0
    out_h = V.visualize_heatmaps(img, hm)
    assert out_h.shape == img.shape
    # the heatmap peak region is reddened
    assert out_h[:32, :24, 0].max() > 100
    assert out_h[48:, 36:, :].max() == 0


def test_find_resume_checkpoint_dir(tmp_path):
    """--resume must locate the previous run's checkpoints: each CLI
    invocation mints a fresh timestamped logdir, so resume searches the
    explicit TRAINING.RESUME path first, then the latest sibling run."""
    import time as _time
    import jax.numpy as jnp
    from spec_tpu.utils.checkpoints import (
        find_resume_checkpoint_dir, save_checkpoint)

    exp = tmp_path / 'logs' / 'spec_train' / 'spec'
    old_run = exp / '01-01-2026_00-00-00'
    older_run = exp / '01-01-2025_00-00-00'
    cur_run = exp / '02-01-2026_12-00-00'
    for d in (old_run, older_run, cur_run):
        (d / 'checkpoints').mkdir(parents=True)

    state = {'w': jnp.ones((3,)), 'step': jnp.asarray(7)}
    save_checkpoint(str(older_run / 'checkpoints'), state, step=3)
    _time.sleep(0.05)
    save_checkpoint(str(old_run / 'checkpoints'), state, step=7)
    os.utime(older_run)  # dir mtimes: make old_run newest among siblings
    _time.sleep(0.05)
    os.utime(old_run)

    # Latest sibling with checkpoints (current run has none).
    found = find_resume_checkpoint_dir(str(cur_run))
    assert found == (str(old_run / 'checkpoints'), None)

    # Explicit path: run dir or checkpoints dir both resolve (latest).
    assert find_resume_checkpoint_dir(
        str(cur_run), explicit=str(older_run)) == \
        (os.path.join(str(older_run), 'checkpoints'), None)
    assert find_resume_checkpoint_dir(
        str(cur_run), explicit=str(older_run / 'checkpoints')) == \
        (str(older_run / 'checkpoints'), None)

    # An explicit step dir PINS that step (not silently the latest).
    step_dir = older_run / 'checkpoints' / 'step_00000003'
    assert step_dir.is_dir()
    assert find_resume_checkpoint_dir(
        str(cur_run), explicit=str(step_dir)) == \
        (str(older_run / 'checkpoints'), 3)

    # Nothing anywhere -> None (caller warns loudly).
    lonely = tmp_path / 'logs2' / 'spec_train' / 'spec' / 'run'
    lonely.mkdir(parents=True)
    assert find_resume_checkpoint_dir(str(lonely)) is None


def test_graceful_shutdown_latch():
    """SIGTERM latches the stop flag (cooperative preemption), handlers
    are restored on exit, and a pre-existing handler comes back."""
    import signal

    from spec_tpu.utils.preemption import GracefulShutdown

    calls = []
    old = signal.signal(signal.SIGTERM, lambda s, f: calls.append(s))
    try:
        with GracefulShutdown() as stop:
            assert not stop.requested
            os.kill(os.getpid(), signal.SIGTERM)
            assert stop.requested
        # restored: our sentinel handler receives the next signal
        os.kill(os.getpid(), signal.SIGTERM)
        assert calls == [signal.SIGTERM]
    finally:
        signal.signal(signal.SIGTERM, old)


def test_step_dirs_skip_orbax_temp(tmp_path):
    """An interrupted orbax save leaves step_N.orbax-checkpoint-tmp-<ts>
    dirs; step parsing must skip them instead of raising ValueError
    (which bricked --resume after a hard kill)."""
    from spec_tpu.utils.checkpoints import latest_step, restore_checkpoint

    ck = tmp_path / 'checkpoints'
    (ck / 'step_00000005').mkdir(parents=True)
    (ck / 'step_00000009.orbax-checkpoint-tmp-1712345').mkdir()
    assert latest_step(str(ck)) == 5
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / 'empty'), {})


def test_backend_probe(monkeypatch):
    """utils.backend.wait_for_backend: returns True immediately on a
    healthy probe; returns False (never raises) when the budget is
    exhausted on a dead tunnel — a transient axon outage must not turn
    the BENCH/entry artifacts red (round-1 MULTICHIP postmortem). Used
    by bench.py and __graft_entry__.entry()."""
    import subprocess

    from spec_tpu.utils import backend as BK

    calls = []

    class _P:
        def __init__(self, rc):
            self.returncode = rc
            self.stderr = b'RuntimeError: tunnel down'

    def fake_run(*a, **k):
        calls.append(1)
        return _P(0)

    monkeypatch.setattr(subprocess, 'run', fake_run)
    assert BK.wait_for_backend(budget_s=1) is True
    assert len(calls) == 1          # healthy: single probe, no sleep

    slept = []
    monkeypatch.setattr(subprocess, 'run', lambda *a, **k: _P(1))
    monkeypatch.setattr(BK.time, 'sleep', lambda s: slept.append(s))
    t0 = BK.time.time()
    # budget exhausted on first failure: returns False without sleeping
    assert BK.wait_for_backend(budget_s=0) is False
    assert BK.time.time() - t0 < 5.0 and not slept

    # one retry then exhaustion: sleeps once, still returns False
    monkeypatch.setattr(
        BK.time, 'time',
        _Clock(step=1.0).now)
    assert BK.wait_for_backend(budget_s=1.5, retry_sleep_s=3) is False
    assert slept == [3]


class _Clock:
    def __init__(self, step):
        self.t, self.step = 0.0, step

    def now(self):
        self.t += self.step
        return self.t
