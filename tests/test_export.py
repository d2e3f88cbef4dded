"""AOT artifact (.specx) round-trip: export a live SpecPredictor, reload
it from the file alone, and require end-to-end predict() parity.

The loader must not construct model code — flax model classes are
sabotaged during load to prove the artifact is self-contained (the
deployment story: ship one file, no checkpoints/SMPL assets/repo).
"""

import json
import zipfile

import numpy as np
import pytest

import spec_tpu.export as EX


def _frames_and_boxes(rng, n=3):
    frames = [(rng.rand(90 + 10 * i, 120, 3) * 255).astype(np.uint8)
              for i in range(n)]
    boxes = [np.array([[60.0, 45.0, 40.0, 70.0],
                       [30.0, 40.0, 25.0, 50.0]], np.float32)[:1 + i % 2]
             for i in range(n)]
    return frames, boxes


@pytest.fixture(scope='module')
def exported(tmp_path_factory):
    from spec_tpu.serving import SpecPredictor

    pred = SpecPredictor(backbone='resnet18', camcalib_backbone='resnet18',
                         batch_size=4, min_size=96, use_fused_lbs=False)
    path = str(tmp_path_factory.mktemp('specx') / 'model.specx')
    EX.export_predictor(pred, path, platforms=('cpu',))
    return pred, path


def test_artifact_layout(exported):
    _, path = exported
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert names == {'meta.json', 'cam.shlo', 'spec.shlo',
                         'cam_vars.npz', 'spec_vars.npz'}
        meta = json.loads(z.read('meta.json'))
    assert meta['format'] == EX.FORMAT
    assert meta['min_size'] == 96 and meta['img_res'] == 224
    assert meta['platforms'] == ['cpu']


def test_export_roundtrip_predict_parity(exported, rng, monkeypatch):
    pred, path = exported

    # Loading must never touch model code: the artifact IS the model.
    import spec_tpu.models as M

    def _boom(*a, **k):
        raise AssertionError('load_predictor constructed a flax model')

    monkeypatch.setattr(M.HMR, '__init__', _boom)
    monkeypatch.setattr(M.CameraRegressorNetwork, '__init__', _boom)
    pred2 = EX.load_predictor(path)
    monkeypatch.undo()

    frames, boxes = _frames_and_boxes(rng)

    cams1 = pred.estimate_cameras(frames)
    cams2 = pred2.estimate_cameras(frames)
    for c1, c2 in zip(cams1, cams2):
        for k in c1:
            np.testing.assert_allclose(c1[k], c2[k], rtol=0, atol=1e-4)

    r1 = pred.predict(frames, boxes)
    r2 = pred2.predict(frames, boxes)
    assert [len(x) for x in r1] == [len(x) for x in r2]
    for f1, f2 in zip(r1, r2):
        for p1, p2 in zip(f1, f2):
            assert set(p1) == set(p2)
            for k in p1:
                if k == 'camera':
                    continue
                np.testing.assert_allclose(
                    p1[k], p2[k], atol=5e-4,
                    err_msg=f'mismatch in {k}')


def test_shape_polymorphism_one_artifact_many_shapes(exported, rng):
    """New frame buckets and batch sizes hit the SAME artifact (jax.export
    symbolic shapes) — no re-export per shape."""
    _, path = exported
    pred2 = EX.load_predictor(path, batch_size=2)
    assert pred2.batch_size == 2
    frames = [(rng.rand(64, 200, 3) * 255).astype(np.uint8),   # wide
              (rng.rand(210, 70, 3) * 255).astype(np.uint8),   # tall
              (rng.rand(100, 100, 3) * 255).astype(np.uint8)]  # square
    cams = pred2.estimate_cameras(frames)
    assert len(cams) == 3
    for c in cams:
        assert np.isfinite([c['vfov'], c['pitch'], c['roll'],
                            c['f_pix']]).all()


def test_weight_tree_roundtrip_preserves_empty_collections():
    """Empty variable collections (dict nodes with no leaves) must survive
    the flat-npz round trip via the meta skeleton — the exported
    function's input treedef includes them, so dropping one breaks every
    call after load."""
    tree = {'params': {'w': np.ones((2, 2), np.float32)},
            'batch_stats': {},
            'nested': {'empty': {}, 'leaf': np.zeros(3, np.int32)}}
    flat = EX._flatten(tree)
    skel = EX._skeleton(tree)
    back = EX._unflatten(flat, skel)
    assert back['batch_stats'] == {}
    assert back['nested']['empty'] == {}
    np.testing.assert_array_equal(back['params']['w'], tree['params']['w'])
    np.testing.assert_array_equal(back['nested']['leaf'],
                                  tree['nested']['leaf'])
    # skeleton must survive json (it is stored in meta.json)
    assert json.loads(json.dumps(skel)) == skel
    # legacy artifacts (no skeleton) still reconstruct leaf-complete trees
    legacy = EX._unflatten(flat)
    np.testing.assert_array_equal(legacy['params']['w'], tree['params']['w'])


def test_loaded_weights_are_device_resident(exported):
    """load_predictor must device_put the weight trees once — numpy
    leaves would re-transfer the full weight set on every jitted call."""
    import jax

    _, path = exported
    pred2 = EX.load_predictor(path)
    assert pred2.batch_size == 4  # meta value honored when not overridden
    leaves = jax.tree.leaves(pred2.cc_vars) + jax.tree.leaves(
        pred2.spec_vars)
    assert leaves and all(isinstance(x, jax.Array) for x in leaves)


def test_load_rejects_foreign_format(tmp_path):
    bad = tmp_path / 'bad.specx'
    with zipfile.ZipFile(bad, 'w') as z:
        z.writestr('meta.json', json.dumps({'format': 'other/9'}))
    with pytest.raises(ValueError, match='unsupported artifact format'):
        EX.load_predictor(str(bad))


@pytest.mark.slow
def test_export_cli_then_http_serve(tmp_path, rng):
    """spec_export CLI (random-init smoke) -> artifact -> HTTP serving
    from the artifact alone (the spec_serve --exported path)."""
    import io
    import threading
    import urllib.request

    from spec_tpu.cli.export_model import main as export_main
    from spec_tpu.cli.serve import create_server

    path = str(tmp_path / 'model.specx')
    export_main(['--output', path, '--backbone', 'resnet18',
                 '--camcalib_backbone', 'resnet18', '--min_size', '64',
                 '--batch_size', '2', '--platforms', 'cpu'])

    pred = EX.load_predictor(path)
    server = create_server(pred, host='127.0.0.1', port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        frame = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        boxes = np.array([[64, 48, 60, 80]], np.float32)
        buf = io.BytesIO()
        np.savez(buf, frame_0=frame, boxes_0=boxes)
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict', data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=300) as r:
            out = np.load(io.BytesIO(r.read()))
        assert int(out['n_frames']) == 1
        assert int(out['f0_n_persons']) == 1
        assert np.isfinite(out['f0_p0_smpl_vertices']).all()
        assert np.isfinite(out['f0_camera']).all()
    finally:
        server.shutdown()
