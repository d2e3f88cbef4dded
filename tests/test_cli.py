"""CLI smoke tests (fast paths only; the full pipelines are driven
end-to-end outside the unit suite)."""

import json
import os

import numpy as np
import cv2
import joblib
import pytest


@pytest.fixture
def data_root(tmp_path, rng, monkeypatch):
    """Minimal SPEC_DATA_ROOT with one synthetic eval dataset."""
    root = tmp_path / 'data'
    (root / 'dataset_extras').mkdir(parents=True)
    img_dir = root / 'dataset_folders' / '3dpw'
    img_dir.mkdir(parents=True)
    n = 6
    names = []
    for i in range(n):
        nm = f'f{i}.jpg'
        cv2.imwrite(str(img_dir / nm),
                    (rng.rand(120, 160, 3) * 255).astype('u1'))
        names.append(nm)
    np.savez(
        root / 'dataset_extras' / '3dpw_test_cam_camcalib.npz',
        imgname=np.array(names),
        scale=(rng.rand(n) * 0.3 + 0.5).astype('f4'),
        center=np.stack([rng.rand(n) * 60 + 50,
                         rng.rand(n) * 40 + 40], 1).astype('f4'),
        pose_0yaw_inverseyz=(rng.randn(n, 72) * 0.2).astype('f4'),
        pose_cam=(rng.randn(n, 72) * 0.2).astype('f4'),
        shape=(rng.randn(n, 10) * 0.5).astype('f4'),
        S=rng.randn(n, 24, 4).astype('f4'),
        part=np.concatenate([rng.rand(n, 24, 2) * 100,
                             np.ones((n, 24, 1))], -1).astype('f4'),
        cam_int=np.tile(np.array(
            [[500, 0, 80], [0, 500, 60], [0, 0, 1]], 'f4'), (n, 1, 1)),
        camcalib_pitch=(rng.randn(n) * 0.1).astype('f4'),
        camcalib_roll=(rng.randn(n) * 0.05).astype('f4'),
        camcalib_vfov=(rng.rand(n) * 0.5 + 0.6).astype('f4'),
        camcalib_f_pix=(rng.rand(n) * 200 + 400).astype('f4'),
    )
    monkeypatch.setenv('SPEC_DATA_ROOT', str(root))
    return root


def test_prepare_data_verify(data_root, capsys):
    from spec_tpu.cli.prepare_data import verify

    status = verify()
    assert status['3dpw-test-cam annots'][0] is True
    assert status['SPEC checkpoint'][0] is False


def test_annotate_camcalib_cli(data_root, tmp_path):
    """spec_annotate_camcalib writes fresh camcalib_* prediction columns
    into an eval npz (the tool the reference never shipped: its
    dataset_extras carry the columns precomputed), and the output npz
    drives CamDataset's predicted-camera path."""
    from spec_tpu.cli.annotate_camcalib import main

    npz = str(data_root / 'dataset_extras' / '3dpw_test_cam_camcalib.npz')
    img_dir = str(data_root / 'dataset_folders' / '3dpw')
    out = str(tmp_path / 'annotated.npz')
    old = dict(np.load(npz, allow_pickle=True))

    main(['--npz', npz, '--img_dir', img_dir, '--out', out,
          '--backbone', 'resnet18', '--min_size', '64',
          '--batch_size', '4'])

    new = dict(np.load(out, allow_pickle=True))
    n = len(old['imgname'])
    for col in ('camcalib_vfov', 'camcalib_pitch', 'camcalib_roll',
                'camcalib_f_pix'):
        assert new[col].shape == (n,) and np.isfinite(new[col]).all()
    # fresh predictions, not the fixture's random placeholders
    assert not np.allclose(new['camcalib_vfov'], old['camcalib_vfov'])
    # f_pix derived from the ORIGINAL image height (120 px here)
    np.testing.assert_allclose(
        new['camcalib_f_pix'],
        120.0 / 2.0 / np.tan(new['camcalib_vfov'] / 2.0), rtol=1e-5)
    # non-camcalib columns untouched
    np.testing.assert_array_equal(new['scale'], old['scale'])

    # the augmented npz drives the predicted-camera dataset path
    from spec_tpu.data.cam_dataset import CamDataset
    ds = CamDataset(out, img_dir, dataset='3dpw-test-cam', img_res=64)
    item = ds[0]
    assert np.isfinite(np.asarray(item['pred_cam_rotmat'])).all()
    np.testing.assert_allclose(float(item['pred_cam_vfov']),
                               float(new['camcalib_vfov'][0]), rtol=1e-6)

    # a missing image fails fast with a pointed error
    import pytest as _pytest
    with _pytest.raises(SystemExit, match='not found'):
        main(['--npz', npz, '--img_dir', str(tmp_path / 'nowhere'),
              '--out', out])


@pytest.mark.slow
def test_spec_eval_then_compute_error_cli(data_root, tmp_path):
    """spec_eval end-to-end on the synthetic dataset (random weights,
    small backbone), then the standalone compute_error CLI on its dump."""
    from spec_tpu.cli import compute_error as ce
    from spec_tpu.cli import spec_eval

    results = spec_eval.main([
        '--log_root', str(tmp_path / 'logs'),
        '--opts', 'DATASET.VAL_DS', '3dpw-test-cam',
        'DATASET.BATCH_SIZE', '3', 'DATASET.NUM_WORKERS', '1',
        'HMR.BACKBONE', 'resnet18'])
    assert '3dpw-test-cam' in results
    assert np.isfinite(results['3dpw-test-cam']['val_mpjpe'])
    assert 'headline_PA-MPJPE' in results['3dpw-test-cam']

    # find the dumped results pkl
    import glob
    pkls = glob.glob(str(tmp_path / 'logs' / '**' /
                         'evaluation_results_3dpw-test-cam.pkl'),
                     recursive=True)
    assert pkls
    headline = ce.main(['--results_file', pkls[0]])
    assert headline['protocol'] == 'j14'
    np.testing.assert_allclose(
        headline['PA-MPJPE'],
        results['3dpw-test-cam']['headline_PA-MPJPE'], rtol=1e-4)


def test_demo_video_mode_rejects_folder_input(tmp_path):
    """--mode video with --image_folder (a directory, not a decodable
    video file) must error out instead of silently running the folder
    path. (Video mode itself IS implemented — exercised in
    test_spec_demo_video_mode below — unlike the reference, which stubs
    it.)"""
    import sys

    from spec_tpu.cli.spec_demo import main

    argv_bak = sys.argv
    sys.argv = ['spec_demo', '--image_folder', str(tmp_path),
                '--mode', 'video']
    try:
        with pytest.raises((FileNotFoundError, SystemExit)):
            main()
    finally:
        sys.argv = argv_bak


@pytest.mark.slow
def test_spec_eval_specsyn_j24(data_root, tmp_path, rng):
    """spec-syn runs the 24-joint protocol with the GT cam rotation."""
    import shutil

    # clone the 3dpw fixture as spec-syn (adds cam_rotmat; j24 headline)
    src = data_root / 'dataset_extras' / '3dpw_test_cam_camcalib.npz'
    data = dict(np.load(src, allow_pickle=True))
    data['pose'] = data.pop('pose_0yaw_inverseyz')
    data.pop('pose_cam')
    n = len(data['imgname'])
    data['cam_rotmat'] = np.tile(np.eye(3, dtype='f4'), (n, 1, 1))
    np.savez(data_root / 'dataset_extras' / 'spec-syn_camcalib.npz', **data)
    dst = data_root / 'dataset_folders' / 'spec-syn'
    shutil.copytree(data_root / 'dataset_folders' / '3dpw', dst)

    from spec_tpu.cli import spec_eval
    results = spec_eval.main([
        '--log_root', str(tmp_path / 'logs'),
        '--opts', 'DATASET.VAL_DS', 'spec-syn',
        'DATASET.BATCH_SIZE', '3', 'DATASET.NUM_WORKERS', '1',
        'HMR.BACKBONE', 'resnet18'])
    r = results['spec-syn']
    assert np.isfinite(r['val_mpjpe_24'])
    assert 'headline_W-MPJPE' in r


def test_camcalib_train_cli_fdr(tmp_path, rng, monkeypatch):
    """End-to-end camcalib training CLI on a tiny synthetic pano set:
    bucketed batches, val MAE, CDF plots, GT-vs-pred horizon dumps,
    checkpoint save."""
    root = tmp_path / 'data'
    pano = root / 'dataset_folders' / 'pano360'
    img_dir = pano / 'images'
    img_dir.mkdir(parents=True)
    names = []
    for i in range(12):
        nm = f'crop{i}.jpg'
        cv2.imwrite(str(img_dir / nm),
                    (rng.rand(64, 80, 3) * 255).astype('u1'))
        with open(img_dir / f'crop{i}.json', 'w') as f:
            json.dump({'vfov': 1.0 + 0.1 * i,
                       'pitch': 0.05 * i - 0.1,
                       'roll': 0.02 * i - 0.05}, f)
        names.append(nm)
    joblib.dump(names[:9], pano / 'train_images.pkl')
    joblib.dump(names[9:], pano / 'val_images.pkl')
    monkeypatch.setenv('SPEC_DATA_ROOT', str(root))

    from spec_tpu.cli.camcalib_train import main
    main(['--fdr', '--log_root', str(tmp_path / 'logs'), '--opts',
          'MODEL.BACKBONE', 'resnet18',
          'DATASET.TRAIN_DS', 'pano_scalenet',
          'DATASET.MIN_RES', '64', 'DATASET.MAX_RES', '96',
          'DATASET.BATCH_SIZE', '8', 'DATASET.NUM_WORKERS', '1',
          'TRAINING.MAX_EPOCHS', '1'])

    logdirs = list((tmp_path / 'logs').glob('**/checkpoints'))
    assert logdirs, 'no checkpoint dir written'
    assert any(d.iterdir() for d in logdirs), 'no checkpoint saved'
    vis = list((tmp_path / 'logs').glob('**/val_images/horizon_e*.png'))
    assert vis, 'no horizon dumps written'
    cdfs = list((tmp_path / 'logs').glob('**/val_images/cdf_*.png'))
    assert cdfs, 'no cdf plots written'


def test_camcalib_demo_dataset_mode(data_root, tmp_path):
    """Reference --dataset mode: image list from a registered npz's
    imgname column (scripts/camcalib_demo.py:59-64)."""
    from spec_tpu.cli.camcalib_demo import main

    out = tmp_path / 'cc_out'
    main(['--dataset', '3dpw-test-cam', '--out_folder', str(out),
          '--backbone', 'resnet18', '--batch_size', '2',
          '--min_size', '64', '--no_save'])
    pkls = sorted(out.glob('*.pkl'))
    assert len(pkls) == 6
    res = joblib.load(pkls[0])
    assert set(res) == {'vfov', 'f_pix', 'pitch', 'roll'}
    assert np.isfinite(res['f_pix'])


def test_camcalib_demo_pano_val_gt_mode(tmp_path, rng, monkeypatch):
    """Reference dataset-less mode (--img_folder -): pano val split with
    GT fields in the pickles and GT-vs-pred horizon overlays
    (scripts/camcalib_demo.py:66-70,142-171)."""
    root = tmp_path / 'data'
    pano = root / 'dataset_folders' / 'pano360'
    img_dir = pano / 'images'
    img_dir.mkdir(parents=True)
    names = []
    for i in range(4):
        nm = f'crop{i}.jpg'
        cv2.imwrite(str(img_dir / nm),
                    (rng.rand(64, 80, 3) * 255).astype('u1'))
        with open(img_dir / f'crop{i}.json', 'w') as f:
            json.dump({'vfov': 1.0 + 0.1 * i, 'pitch': 0.05 * i - 0.1,
                       'roll': 0.02 * i - 0.05}, f)
        names.append(nm)
    joblib.dump(names[:2], pano / 'train_images.pkl')
    joblib.dump(names[2:], pano / 'val_images.pkl')
    monkeypatch.setenv('SPEC_DATA_ROOT', str(root))

    from spec_tpu.cli.camcalib_demo import main

    out = tmp_path / 'cc_out'
    main(['--img_folder', '-', '--out_folder', str(out),
          '--backbone', 'resnet18', '--batch_size', '2',
          '--min_size', '64'])
    pkls = sorted(out.glob('*.pkl'))
    assert len(pkls) == 2  # val split only
    res = joblib.load(pkls[0])
    assert {'vfov', 'f_pix', 'pitch', 'roll',
            'gt_vfov', 'gt_f_pix', 'gt_pitch', 'gt_roll'} <= set(res)
    assert np.isclose(res['gt_vfov'], 1.2, atol=1e-6)  # crop2.json
    overlays = sorted(out.glob('*.jpg'))
    assert len(overlays) == 2


def test_spec_eval_fdr(data_root, tmp_path):
    """--fdr subsamples each dataset to one batch (reference fast-dev-run
    flag, scripts/spec_eval.py:102)."""
    from spec_tpu.cli import spec_eval

    results = spec_eval.main([
        '--fdr', '--log_root', str(tmp_path / 'logs'),
        '--opts', 'DATASET.VAL_DS', '3dpw-test-cam',
        'DATASET.BATCH_SIZE', '3', 'DATASET.NUM_WORKERS', '1',
        'HMR.BACKBONE', 'resnet18'])
    r = results['3dpw-test-cam']
    assert np.isfinite(r['val_mpjpe'])


def test_spec_eval_data_parallel(data_root, tmp_path):
    """--data_parallel shards eval batches over the 8-device test mesh
    (finite metrics; the indivisible-batch guard trips loudly)."""
    from spec_tpu.cli import spec_eval

    results = spec_eval.main([
        '--fdr', '--data_parallel', '--log_root', str(tmp_path / 'logs'),
        '--opts', 'DATASET.VAL_DS', '3dpw-test-cam',
        'DATASET.BATCH_SIZE', '8', 'DATASET.NUM_WORKERS', '1',
        'HMR.BACKBONE', 'resnet18'])
    assert np.isfinite(results['3dpw-test-cam']['val_mpjpe'])

    with pytest.raises(SystemExit, match='multiple'):
        spec_eval.main([
            '--fdr', '--data_parallel',
            '--log_root', str(tmp_path / 'logs2'),
            '--opts', 'DATASET.VAL_DS', '3dpw-test-cam',
            'DATASET.BATCH_SIZE', '3', 'DATASET.NUM_WORKERS', '1',
            'HMR.BACKBONE', 'resnet18'])


def test_spec_eval_fdr_subsamples(data_root):
    """The --fdr path subsamples through CamDataset.num_images."""
    from spec_tpu.data.cam_dataset import CamDataset
    from spec_tpu.utils import paths

    annot = paths.dataset_files()['3dpw-test-cam']
    ds = CamDataset(annot, paths.dataset_folders()['3dpw-test-cam'],
                    dataset='3dpw-test-cam', num_images=3)
    assert len(ds) == 3


def test_reference_flag_surface_accepted(capsys):
    """The reference CLIs' full flag surfaces parse: cluster-submission
    stubs (no-ops, as in the reference), --resume_wo_optimizer, demo
    detector/render/smoothing flags, --ckpt/--exp aliases."""
    import importlib

    for mod, flags in [
        ('spec_tpu.cli.spec_train',
         ['--resume_wo_optimizer', '--cluster', '--bid', '--gpu_min_mem',
          '--disable_comet']),
        ('spec_tpu.cli.spec_eval', ['--cluster', '--resume']),
        ('spec_tpu.cli.camcalib_train', ['--num_gpus', '--resume']),
        ('spec_tpu.cli.spec_demo',
         ['--ckpt', '--exp', '--tracking_method', '--detector',
          '--yolo_img_size', '--tracker_batch_size', '--staf_dir',
          '--display', '--smooth', '--min_cutoff', '--beta',
          '--wireframe', '--sideview', '--draw_keypoints',
          '--camcalib_every']),
        ('spec_tpu.cli.serve', ['--camcalib_every']),
    ]:
        main = importlib.import_module(mod).main
        with pytest.raises(SystemExit) as e:
            main(['--help'])
        assert e.value.code == 0
        helptext = capsys.readouterr().out
        for flag in flags:
            assert flag in helptext, (mod, flag)


@pytest.mark.slow
def test_spec_demo_video_mode(tmp_path):
    """--mode video: frames -> full pipeline -> annotated mp4 at the
    source fps (the reference stubs this with NotImplementedError)."""
    import cv2
    from spec_tpu.cli.spec_demo import main

    vid = tmp_path / 'clip.mp4'
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*'mp4v'),
                        12, (64, 48))
    rng = np.random.RandomState(0)
    for _ in range(3):
        w.write((rng.rand(48, 64, 3) * 255).astype(np.uint8))
    w.release()

    out = tmp_path / 'out'
    # chunk_size 2 < 3 frames: exercises the multi-chunk decode path;
    # --smooth covers the One-Euro track-smoothing + recompute +
    # re-encode post-pass (dead flag in the reference, implemented here)
    main(['--vid_file', str(vid), '--output_folder', str(out),
          '--batch_size', '2', '--exp', 'v1', '--chunk_size', '2',
          '--smooth', '--camcalib_every', '2'])

    exp_dir = out / 'clip_v1'
    video = exp_dir / 'spec_video_output.mp4'
    assert video.exists()
    cap = cv2.VideoCapture(str(video))
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 3
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 12) < 0.5
    # per-frame results written through the folder pipeline
    assert len(list((exp_dir / 'spec_results').glob('*.pkl'))) == 3
    # frames dir cleaned up by default
    assert not (exp_dir / 'frames').exists()
    # person tracks dumped (full-frame boxes -> one stable track)
    import joblib
    tracks = joblib.load(exp_dir / 'tracking.pkl')
    assert list(tracks) == [0]
    assert tracks[0]['frames'].tolist() == [0, 1, 2]
    assert tracks[0]['bboxes'].shape == (3, 4)
    # smoothed results: betas are the track mean (constant over frames),
    # poses stay valid rotations, outputs finite
    res = [joblib.load(p) for p in
           sorted((exp_dir / 'spec_results').glob('*.pkl'))]
    np.testing.assert_allclose(res[0]['pred_shape'], res[1]['pred_shape'],
                               atol=1e-6)
    R = res[2]['pred_pose'][0]
    np.testing.assert_allclose(R @ np.transpose(R, (0, 2, 1)),
                               np.tile(np.eye(3), (24, 1, 1)), atol=1e-4)
    assert np.isfinite(res[1]['smpl_vertices']).all()
    assert np.isfinite(res[1]['smpl_joints2d']).all()
    # --camcalib_every 2: frame 1 reuses frame 0's keyframe camera
    # (chunked decode restarts keyframes per chunk: 0=key, 1=reused,
    # 2=first-of-chunk key); every frame still gets its pickle (the
    # stage-1 -> stage-2 ABI is preserved).
    cams = [joblib.load(exp_dir / 'camcalib' / f'{i:06d}.png.pkl')
            for i in range(3)]
    assert cams[0]['vfov'] == cams[1]['vfov']
    assert cams[0]['pitch'] == cams[1]['pitch']


def test_serve_camcalib_every_help_documents_streams(capsys, monkeypatch):
    """--camcalib_every > 1 is safe under concurrent micro-batching now:
    keyframe state is keyed per stream (X-Spec-Stream header; one-shot
    ephemeral streams for header-less requests), so the old
    --max_batch_frames 1 refusal is gone and the help text documents the
    stream contract instead (ADVICE r4 upgrade; cross-client camera
    contamination is covered by the _Batcher stream-grouping tests in
    test_serving.py)."""
    from spec_tpu.cli import serve

    # argparse wraps help at the terminal width (and breaks on hyphens),
    # so the asserted phrases must not be split at narrow COLUMNS.
    monkeypatch.setenv('COLUMNS', '200')
    with pytest.raises(SystemExit) as e:
        serve.main(['--help'])
    assert e.value.code == 0
    helptext = capsys.readouterr().out
    assert 'X-Spec-Stream' in helptext
    assert 'PER STREAM' in helptext


def test_stage1_keyframes_shot_cut(tmp_path):
    """Folder/video --camcalib_every keyframe selection: every Nth frame
    plus any frame whose thumbnail histogram jumps vs its predecessor
    (a shot cut re-anchors stage 1 even off-stride)."""
    import cv2

    from spec_tpu.cli.spec_demo import _stage1_keyframes

    rng = np.random.RandomState(3)
    names = []
    for i in range(7):
        lvl = 30 if i < 4 else 225               # hard cut at frame 4
        img = np.clip(lvl + rng.rand(48, 64, 3) * 30, 0, 255)
        p = str(tmp_path / f'{i:03d}.jpg')
        cv2.imwrite(p, img.astype(np.uint8))
        names.append(p)

    keys = _stage1_keyframes(names, every=3)
    assert keys == [names[0], names[3], names[4], names[6]]
    # threshold 0 disables the cut trigger (pure stride)
    assert _stage1_keyframes(names, every=3, cut_threshold=0) == [
        names[0], names[3], names[6]]


def test_carry_cameras_forward_unit(tmp_path):
    """Keyframe camera fill: skipped frames copy the latest preceding
    keyframe pickle, rescaling f_pix when the frame height differs."""
    import joblib

    from spec_tpu.cli.spec_demo import _carry_cameras_forward

    cam_out = tmp_path / 'cc'
    cam_out.mkdir()
    names = ['a.png', 'b.png', 'c.png', 'd.png']
    shapes = {'a.png': (100, 160), 'b.png': (100, 160),
              'c.png': (200, 320), 'd.png': (100, 160)}
    key = {'vfov': 1.0, 'f_pix': 100 / (2 * np.tan(0.5)),
           'pitch': 0.1, 'roll': -0.05}
    joblib.dump(key, cam_out / 'a.png.pkl')
    key_d = dict(key, pitch=0.3)
    joblib.dump(key_d, cam_out / 'd.png.pkl')

    _carry_cameras_forward(names, str(cam_out), shapes)

    b = joblib.load(cam_out / 'b.png.pkl')
    assert b == key                                  # same size: verbatim
    c = joblib.load(cam_out / 'c.png.pkl')
    assert c['pitch'] == key['pitch']
    assert np.isclose(c['f_pix'], 200 / (2 * np.tan(0.5)))  # rescaled
    d = joblib.load(cam_out / 'd.png.pkl')
    assert d == key_d                                # keyframes untouched


def _make_train_data_root(root, rng, n=10):
    """data_root twin with enough samples for a mesh-divisible batch
    (the train batch is sharded over the forced 8-device mesh)."""
    (root / 'dataset_extras').mkdir(parents=True)
    img_dir = root / 'dataset_folders' / '3dpw'
    img_dir.mkdir(parents=True)
    names = []
    for i in range(n):
        nm = f'f{i}.jpg'
        cv2.imwrite(str(img_dir / nm),
                    (rng.rand(120, 160, 3) * 255).astype('u1'))
        names.append(nm)
    np.savez(
        root / 'dataset_extras' / '3dpw_test_cam_camcalib.npz',
        imgname=np.array(names),
        scale=(rng.rand(n) * 0.3 + 0.5).astype('f4'),
        center=np.stack([rng.rand(n) * 60 + 50,
                         rng.rand(n) * 40 + 40], 1).astype('f4'),
        pose_0yaw_inverseyz=(rng.randn(n, 72) * 0.2).astype('f4'),
        pose_cam=(rng.randn(n, 72) * 0.2).astype('f4'),
        shape=(rng.randn(n, 10) * 0.5).astype('f4'),
        S=rng.randn(n, 24, 4).astype('f4'),
        part=np.concatenate([rng.rand(n, 24, 2) * 100,
                             np.ones((n, 24, 1))], -1).astype('f4'),
        cam_int=np.tile(np.array(
            [[500, 0, 80], [0, 500, 60], [0, 0, 1]], 'f4'), (n, 1, 1)),
        camcalib_pitch=(rng.randn(n) * 0.1).astype('f4'),
        camcalib_roll=(rng.randn(n) * 0.05).astype('f4'),
        camcalib_vfov=(rng.rand(n) * 0.5 + 0.6).astype('f4'),
        camcalib_f_pix=(rng.rand(n) * 200 + 400).astype('f4'),
    )


@pytest.mark.slow
def test_spec_train_cli_fdr(tmp_path, rng, monkeypatch):
    """End-to-end spec_train CLI fast-dev-run: mixed dataset, sharded
    jitted steps, checkpoint save, then the post-train test pass —
    SpecTrainer.fit was previously only covered indirectly."""
    from spec_tpu.cli import spec_train

    root = tmp_path / 'data'
    _make_train_data_root(root, rng)
    monkeypatch.setenv('SPEC_DATA_ROOT', str(root))

    trainer = spec_train.main([
        '--fdr', '--log_root', str(tmp_path / 'logs'), '--opts',
        'DATASET.DATASETS_AND_RATIOS', '3dpw-test-cam_1.0',
        'DATASET.VAL_DS', '3dpw-test-cam',
        'DATASET.BATCH_SIZE', '8', 'DATASET.NUM_WORKERS', '1',
        'HMR.BACKBONE', 'resnet18',
        'TRAINING.LOG_SAVE_INTERVAL', '1',
        'LOG_FREQ_TB_IMAGES', '1'])
    assert int(trainer.state.step) >= 1
    # fit() ran under the preemption guard and saved a checkpoint
    from spec_tpu.utils.checkpoints import latest_step
    assert latest_step(trainer.ckpt_dir) is not None
    # The multi-sample/multi-sideview mesh grid reached TensorBoard
    # (reference RendererCam.visualize_tb parity).
    from tensorboard.backend.event_processing import event_accumulator
    ea = event_accumulator.EventAccumulator(
        trainer.writer.log_dir, size_guidance={'images': 0})
    ea.Reload()
    assert 'train/mesh_grid' in ea.Tags()['images']


def test_demo_model_cache_reused_across_chunks(tmp_path, rng, monkeypatch):
    """The chunked video path calls the folder pipeline per chunk; model
    loading / jit tracing must happen once per process (cache keyed on
    the load parameters)."""
    from spec_tpu.cli import camcalib_demo, spec_demo

    k1 = spec_demo._get_spec_model('', '', '', 224)
    k2 = spec_demo._get_spec_model('', '', '', 224)
    assert k1[3] is k2[3]  # same jitted infer object

    c1 = camcalib_demo._get_model('/nonexistent.ckpt', 'resnet18',
                                  'softargmax_l2', 64)
    c2 = camcalib_demo._get_model('/nonexistent.ckpt', 'resnet18',
                                  'softargmax_l2', 64)
    assert c1[2] is c2[2]


@pytest.mark.slow
def test_spec_demo_webcam_mode(tmp_path):
    """--mode webcam: per-frame streaming loop on a cv2 source (a video
    file stands in for the camera; the reference stubs webcam mode with
    NotImplementedError, scripts/spec_demo.py:67-68)."""
    import cv2
    import joblib
    from spec_tpu.cli.spec_demo import main

    vid = tmp_path / 'cam.mp4'
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*'mp4v'),
                        10, (64, 48))
    rng = np.random.RandomState(0)
    for _ in range(4):
        w.write((rng.rand(48, 64, 3) * 255).astype(np.uint8))
    w.release()

    out = tmp_path / 'out'
    # --max_frames 3 < 4 source frames: the early-stop path; full-frame
    # person fallback (no detector weights in the sandbox)
    main(['--mode', 'webcam', '--webcam_source', str(vid),
          '--output_folder', str(out), '--exp', 'w1',
          '--max_frames', '3'])

    exp_dir = out / 'cam_w1'
    video = exp_dir / 'spec_webcam_output.mp4'
    assert video.exists()
    cap = cv2.VideoCapture(str(video))
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 3
    pkls = sorted((exp_dir / 'webcam_results').glob('*.pkl'))
    assert [p.name for p in pkls] == ['000000.pkl', '000001.pkl',
                                      '000002.pkl']
    res = joblib.load(pkls[1])
    assert set(res['camera']) == {'vfov', 'f_pix', 'pitch', 'roll'}
    assert res['smpl_vertices'].shape == (1, 6890, 3)
    assert np.isfinite(res['smpl_vertices']).all()


@pytest.mark.slow
def test_spec_demo_webcam_shot_cut_reanchors(tmp_path):
    """Webcam loop with --camcalib_every: a hard shot cut forces an
    off-stride stage-1 keyframe (histogram-delta trigger), so the frame
    after the cut carries a FRESH camera instead of the stale shot-A
    keyframe's."""
    import cv2
    import joblib
    from spec_tpu.cli.spec_demo import main

    vid = tmp_path / 'cam.mp4'
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*'mp4v'),
                        10, (64, 48))
    rng = np.random.RandomState(1)
    for i in range(6):
        lvl = 25 if i < 3 else 220          # hard cut at frame 3
        w.write(np.clip(lvl + rng.rand(48, 64, 3) * 30, 0,
                        255).astype(np.uint8))
    w.release()

    out = tmp_path / 'out'
    # stride keyframes 0 and 4 — frame 3 (the cut) is OFF-stride and
    # must re-anchor via the histogram trigger
    main(['--mode', 'webcam', '--webcam_source', str(vid),
          '--output_folder', str(out), '--exp', 'w2',
          '--camcalib_every', '4'])

    pkls = sorted((out / 'cam_w2' / 'webcam_results').glob('*.pkl'))
    assert len(pkls) == 6
    cams = [joblib.load(p)['camera'] for p in pkls]
    assert cams[0] == cams[1] == cams[2]    # shot A reuses keyframe 0
    assert cams[3] != cams[2]               # cut frame re-anchored
    assert cams[5] == cams[4]               # frame 4 = stride keyframe,
    #                                         frame 5 reuses it (cams[4]
    #                                         may differ slightly from
    #                                         cams[3]: both are real
    #                                         stage-1 passes on lossy-
    #                                         encoded near-twin frames)


def test_serve_exported_applies_stream_flags(monkeypatch):
    """--camcalib_every/--cut_threshold reach the predictor on the
    --exported path too (regression: the flags were silently dropped —
    load_predictor rebuilds the instance without running __init__, so
    main must apply serving knobs itself)."""
    import types

    from spec_tpu.cli import serve as serve_mod

    class _Dummy:
        batch_size = 4

    captured = {}

    def fake_load(path, batch_size=None):
        captured['path'] = path
        return _Dummy()

    class _FakeServer:
        server_address = ('127.0.0.1', 12345)

        def serve_forever(self):
            raise KeyboardInterrupt      # immediately unwind main()

        def shutdown(self):
            captured['shutdown'] = True

    def fake_create(predictor, host, port, max_request_bytes, max_batch_frames):
        captured['pred'] = predictor
        return _FakeServer()

    monkeypatch.setattr('spec_tpu.export.load_predictor', fake_load)
    monkeypatch.setattr(serve_mod, 'create_server', fake_create)
    serve_mod.main(['--exported', 'art.specx', '--camcalib_every', '4',
                    '--cut_threshold', '0.25'])
    assert captured['path'] == 'art.specx'
    assert captured['pred'].camcalib_every == 4
    assert captured['pred'].cut_threshold == 0.25
    assert captured.get('shutdown')
