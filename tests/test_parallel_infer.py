"""Sharded two-stage INFERENCE: the fused camcalib->crop->SPEC pipeline
jitted over the 8-device mesh with the batch sharded must match the
single-device run exactly.

The >2k img/s v5e-8 headline (BASELINE.md) is single-chip throughput x
data-parallel scaling; the train step's mesh layouts are covered in
test_parallel_train.py — this pins the inference graph (the bench.py /
serving shape: full frames in, vertices/joints out, reference
spec/tester.py:86-151 collapsed into one program).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spec_tpu.serving import SpecPredictor

import spec_tpu.parallel as par
from spec_tpu.core import bins, constants as C, geometry as G
from spec_tpu.core import smpl as S
from spec_tpu.models import HMR, CameraRegressorNetwork
from spec_tpu.ops.preprocess import crop_resize_normalize, spin_crop_corners


@pytest.mark.slow
def test_two_stage_inference_sharded_matches_single_device(rng):
    B, H, W, res = 8, 96, 128, 64
    assets = S.create_test_assets()
    camcalib = CameraRegressorNetwork(backbone='resnet18')
    spec = HMR(backbone='resnet18', use_cam=True, use_cam_feats=True,
               img_res=res)

    mean = jnp.asarray(C.IMG_NORM_MEAN)
    std = jnp.asarray(C.IMG_NORM_STD)

    def pipeline(cc_vars, spec_vars, raw, corners, center, scale):
        img_h = jnp.full((raw.shape[0],), float(H))
        img_w = jnp.full((raw.shape[0],), float(W))
        frames = (raw / 255.0 - mean) / std
        vfov_l, pitch_l, roll_l = camcalib.apply(cc_vars, frames)
        vfov, pitch, roll = bins.convert_preds_to_angles(
            vfov_l, pitch_l, roll_l, loss_type='softargmax_biased_l2')
        f_pix = G.focal_length_from_vfov(vfov, img_h)
        R = G.euler_to_rotmat(
            jnp.stack([pitch, jnp.zeros_like(pitch), roll], -1))
        K = G.build_cam_intrinsics(f_pix, img_w, img_h)
        crops = crop_resize_normalize(raw, corners, res=res)
        out = spec.apply(spec_vars, assets, crops, R, K, scale, center,
                         img_w, img_h)
        return out['smpl_vertices'], out['smpl_joints2d'], vfov

    raw = jnp.asarray((rng.rand(B, H, W, 3) * 255).astype('f4'))
    center = (rng.rand(B, 2) * 40 + np.array([40, 30])).astype('f4')
    scale = (rng.rand(B) * 0.3 + 0.4).astype('f4')
    corners = jnp.asarray(spin_crop_corners(center, scale))
    center_d, scale_d = jnp.asarray(center), jnp.asarray(scale)

    cc_vars = camcalib.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, H, W, 3)))
    eye = jnp.tile(jnp.eye(3), (1, 1, 1))
    spec_vars = spec.init(
        jax.random.PRNGKey(1), assets, jnp.zeros((1, res, res, 3)), eye,
        eye, jnp.ones((1,)), jnp.ones((1, 2)), jnp.ones((1,)),
        jnp.ones((1,)))

    # Single device.
    v_1, j2d_1, vfov_1 = jax.jit(pipeline)(
        cc_vars, spec_vars, raw, corners, center_d, scale_d)

    # 8-device mesh, batch sharded, params replicated.
    mesh = par.create_mesh()
    rep = par.replicated(mesh)
    bs = par.batch_sharding(mesh)
    jit_sharded = jax.jit(
        pipeline,
        in_shardings=(rep, rep, bs, bs, bs, bs),
        out_shardings=(bs, bs, bs))
    args = [jax.device_put(a, bs) for a in
            (raw, corners, center_d, scale_d)]
    v_8, j2d_8, vfov_8 = jit_sharded(
        jax.device_put(cc_vars, rep), jax.device_put(spec_vars, rep),
        *args)
    # Verify the batch really is distributed.
    assert len(v_8.sharding.device_set) == 8

    np.testing.assert_allclose(np.asarray(vfov_8), np.asarray(vfov_1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_8), np.asarray(v_1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j2d_8), np.asarray(j2d_1),
                               rtol=1e-4, atol=1e-3)

@pytest.mark.slow
def test_serving_data_parallel_matches_single_device(rng):
    """SpecPredictor(data_parallel=True) shards every padded batch over
    the 8-device mesh and must reproduce the plain predictor bit-for-bit
    (params replicated, per-row compute independent)."""
    frames = [
        (rng.rand(96, 128, 3) * 255).astype(np.uint8),
        (rng.rand(96, 128, 3) * 255).astype(np.uint8),
        (rng.rand(120, 96, 3) * 255).astype(np.uint8),   # second bucket
    ]
    boxes = [
        np.array([[64, 48, 60, 80], [40, 40, 30, 50]], np.float32),
        np.zeros((0, 4), np.float32),
        np.array([[48, 60, 40, 70]], np.float32),
    ]

    kw = dict(backbone='resnet18', camcalib_backbone='resnet18',
              batch_size=8, min_size=64)
    plain = SpecPredictor(**kw)
    dp = SpecPredictor(data_parallel=True, **kw)
    assert dp._min_pad == 8 and dp._padded(3) == 8

    r_plain = plain.predict(frames, boxes)
    r_dp = dp.predict(frames, boxes)

    assert [len(r) for r in r_dp] == [len(r) for r in r_plain] == [2, 0, 1]
    for fp, fd in zip(r_plain, r_dp):
        for pp, pd in zip(fp, fd):
            # Stage-1 pad sizes differ (plain: pow2, dp: mesh multiple),
            # so XLA reduction order shifts the cameras by float noise.
            for ck in ('vfov', 'f_pix', 'pitch', 'roll'):
                np.testing.assert_allclose(pd['camera'][ck],
                                           pp['camera'][ck],
                                           rtol=1e-4, atol=1e-5)
            for key in ('smpl_vertices', 'smpl_joints2d', 'pred_cam_t',
                        'pred_pose', 'pred_shape'):
                np.testing.assert_allclose(pd[key], pp[key],
                                           rtol=1e-5, atol=1e-5)


def test_camcalib_spatial_partition_matches_replicated(rng):
    """Spatial partitioning (parallel.spatial_sharding): a batch-1
    camcalib forward with the frame HEIGHT sharded over the 8-device
    mesh must match the replicated run, and the compiled program must
    contain the halo-exchange collectives that prove the conv stack is
    genuinely partitioned (not silently all-gathered)."""
    H, W = 96, 128
    m = CameraRegressorNetwork(backbone='resnet18')
    x = jnp.asarray(rng.randn(1, H, W, 3).astype('f4'))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))

    ref = jax.jit(lambda v, x: m.apply(v, x))(v, x)

    mesh = par.create_mesh()
    rep = par.replicated(mesh)
    sp = par.spatial_sharding(mesh)
    assert sp.spec == jax.sharding.PartitionSpec(
        None, ('data',), None, None)
    f = jax.jit(lambda v, x: m.apply(v, x), in_shardings=(rep, sp),
                out_shardings=(rep, rep, rep))
    out = f(jax.device_put(v, rep), jax.device_put(x, sp))
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
    # H=96 over 8 devices = 12-row shards; every conv with a >1x1 kernel
    # needs neighbour halo rows -> collective-permute; the global
    # avgpool reduces across shards -> all-reduce.
    txt = f.lower(v, x).compile().as_text()
    assert txt.count('collective-permute') > 10, \
        txt.count('collective-permute')
    assert 'all-reduce' in txt


@pytest.mark.slow
def test_serving_spatial_parallel_matches_plain(rng):
    """SpecPredictor(spatial_parallel=True): stage-1 frames shard over
    HEIGHT (batch-1 stays batch-1 — no mesh-multiple pad), stage 2
    shards over the person batch; outputs match the plain predictor."""
    frames = [
        (rng.rand(96, 128, 3) * 255).astype(np.uint8),
        (rng.rand(96, 128, 3) * 255).astype(np.uint8),
    ]
    boxes = [
        np.array([[64, 48, 60, 80], [40, 40, 30, 50]], np.float32),
        np.array([[48, 60, 40, 70]], np.float32),
    ]

    kw = dict(backbone='resnet18', camcalib_backbone='resnet18',
              batch_size=8, min_size=64)
    plain = SpecPredictor(**kw)
    sp = SpecPredictor(spatial_parallel=True, **kw)
    # stage 1 pads power-of-two only (2 frames -> 2); stage 2 pads to
    # the mesh multiple (3 persons -> 8).
    assert sp._min_pad_s1 == 1 and sp._padded(2, sp._min_pad_s1) == 2
    assert sp._min_pad == 8 and sp._padded(3) == 8

    r_plain = plain.predict(frames, boxes)
    r_sp = sp.predict(frames, boxes)

    assert [len(r) for r in r_sp] == [len(r) for r in r_plain] == [2, 1]
    for fp, fs in zip(r_plain, r_sp):
        for pp, ps in zip(fp, fs):
            for ck in ('vfov', 'f_pix', 'pitch', 'roll'):
                np.testing.assert_allclose(ps['camera'][ck],
                                           pp['camera'][ck],
                                           rtol=1e-4, atol=1e-5)
            for key in ('smpl_vertices', 'smpl_joints2d', 'pred_cam_t',
                        'pred_pose', 'pred_shape'):
                np.testing.assert_allclose(ps[key], pp[key],
                                           rtol=1e-5, atol=1e-5)


def test_serving_spatial_and_data_parallel_exclusive():
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip('needs a multi-device mesh')
    with pytest.raises(ValueError, match='mutually exclusive'):
        SpecPredictor(backbone='resnet18', camcalib_backbone='resnet18',
                      batch_size=n_dev, min_size=64,
                      data_parallel=True, spatial_parallel=True)


def test_serving_data_parallel_rejects_indivisible_batch():
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip('needs a multi-device mesh')
    with pytest.raises(ValueError, match='multiple'):
        SpecPredictor(backbone='resnet18', camcalib_backbone='resnet18',
                      batch_size=n_dev + 1, min_size=64,
                      data_parallel=True)
