"""Serving engine: persistent in-process two-stage predictor."""

import numpy as np

from spec_tpu.serving import SpecPredictor


def test_predictor_end_to_end(rng):
    """Frames + boxes in, per-person SMPL results out — no files, mixed
    frame sizes (two stage-1 buckets), empty-box frames handled."""
    frames = [
        (rng.rand(96, 128, 3) * 255).astype(np.uint8),
        (rng.rand(96, 128, 3) * 255).astype(np.uint8),
        (rng.rand(120, 96, 3) * 255).astype(np.uint8),   # second bucket
    ]
    boxes = [
        np.array([[64, 48, 60, 80], [40, 40, 30, 50]], np.float32),
        np.zeros((0, 4), np.float32),                    # no detections
        np.array([[48, 60, 40, 70]], np.float32),
    ]

    pred = SpecPredictor(backbone='resnet18', camcalib_backbone='resnet18',
                         batch_size=2, min_size=64)
    results = pred.predict(frames, boxes)

    assert [len(r) for r in results] == [2, 0, 1]
    p = results[0][0]
    V = pred.assets.num_vertices
    assert p['smpl_vertices'].shape == (V, 3)
    assert p['smpl_joints2d'].shape == (49, 2)
    assert p['pred_cam_t'].shape == (3,)
    assert p['pred_pose'].shape == (24, 3, 3)
    assert p['pred_shape'].shape == (10,)
    assert np.isfinite(p['smpl_vertices']).all()
    assert {'vfov', 'f_pix', 'pitch', 'roll'} <= set(p['camera'])

    # Stage-1-only surface matches the camera dicts used by predict.
    cams = pred.estimate_cameras(frames)
    assert len(cams) == 3
    assert np.isclose(cams[0]['f_pix'],
                      96 / 2.0 / np.tan(cams[0]['vfov'] / 2.0))

    # Precomputed (e.g. GT) cameras are honored.
    gt_cams = [dict(vfov=1.0, f_pix=500.0, pitch=0.05, roll=-0.02)
               for _ in frames]
    results2 = pred.predict(frames, boxes, cameras=gt_cams)
    assert results2[2][0]['camera']['f_pix'] == 500.0


def test_predictor_batch_padding(rng):
    """Person count not divisible by batch_size: tail is padded and
    masked out of the results."""
    frames = [(rng.rand(80, 80, 3) * 255).astype(np.uint8)]
    boxes = [np.array([[40, 40, 30, 40],
                       [30, 30, 20, 30],
                       [50, 50, 25, 35]], np.float32)]
    pred = SpecPredictor(backbone='resnet18', camcalib_backbone='resnet18',
                         batch_size=2, min_size=64)
    results = pred.predict(frames, boxes)
    assert len(results[0]) == 3
    v0 = results[0][0]['smpl_vertices']
    v2 = results[0][2]['smpl_vertices']
    assert not np.allclose(v0, v2)  # distinct crops -> distinct meshes


def test_http_serving_roundtrip(rng):
    """HTTP front-end: npz request -> predictor -> npz response, plus
    healthz and malformed-payload error handling."""
    import io
    import threading
    import urllib.request
    import urllib.error

    from spec_tpu.cli.serve import create_server

    pred = SpecPredictor(backbone='resnet18', camcalib_backbone='resnet18',
                         batch_size=2, min_size=64)
    server = create_server(pred, host='127.0.0.1', port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f'http://127.0.0.1:{port}'
        with urllib.request.urlopen(base + '/healthz', timeout=30) as r:
            assert r.read() == b'ok'

        frame = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        boxes = np.array([[64, 48, 60, 80]], np.float32)
        buf = io.BytesIO()
        # second frame with ZERO detections: its camera must still come
        # back (stage 1 runs on every frame)
        np.savez(buf, frame_0=frame, boxes_0=boxes,
                 frame_1=frame, boxes_1=np.zeros((0, 4), np.float32))
        req = urllib.request.Request(base + '/predict', data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=300) as r:
            out = np.load(io.BytesIO(r.read()))
        assert int(out['n_frames']) == 2
        assert int(out['f0_n_persons']) == 1
        assert int(out['f1_n_persons']) == 0
        V = pred.assets.num_vertices
        assert out['f0_p0_smpl_vertices'].shape == (V, 3)
        assert out['f0_camera'].shape == (4,)
        assert out['f1_camera'].shape == (4,)
        assert np.isfinite(out['f0_p0_smpl_vertices']).all()

        # malformed payload -> 400 with a JSON error, server stays up
        bad = urllib.request.Request(base + '/predict', data=b'not-an-npz')
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError('expected HTTP 400')
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(base + '/healthz', timeout=30) as r:
            assert r.read() == b'ok'

        # oversize payload -> 413 (tiny-limit server instance)
        small_srv = create_server(pred, host='127.0.0.1', port=0,
                                  max_request_bytes=100)
        sport = small_srv.server_address[1]
        t2 = threading.Thread(target=small_srv.serve_forever, daemon=True)
        t2.start()
        try:
            big = urllib.request.Request(
                f'http://127.0.0.1:{sport}/predict', data=b'x' * 200)
            try:
                urllib.request.urlopen(big, timeout=30)
                raise AssertionError('expected HTTP 413')
            except urllib.error.HTTPError as e:
                assert e.code == 413
        finally:
            small_srv.shutdown()
    finally:
        server.shutdown()
