"""Composition-level parity: the reference's ENTIRE two-stage pipeline,
assembled independently in torch, vs SpecPredictor on the same frames.

Every component below (backbone, bin decode, crop, HMR head, LBS,
projection) is torch-cross-checked in isolation elsewhere; this test
guards the GLUE between them — exactly where the round-1 fx-vs-fy
conditioning bug lived. Torch twin composition, step by step per the
reference call stack (SURVEY.md §3.2):

  camcalib forward (camcalib/model.py:72-81)
    -> softargmax decode (camcalib/cam_utils.py:114-145)
    -> f_pix = H/2/tan(vfov/2) (scripts/camcalib_demo.py:129)
    -> rotmat = euler(pitch, 0, roll), K = [[f,0,cx],[0,f,cy]]
       (spec/utils/cam_params.py:24-49)
    -> SPIN crop, bbox scale = max_side/200 (spec/tester.py:109-133)
    -> HMR backbone + head w/ cam conditioning vfov = 2 atan(H/(2 fx))
       (spec/models/hmr.py:82-98)
    -> rot6d -> rotmat -> SMPL LBS
    -> weak-persp -> full-image cam_t, perspective projection
       (spec/models/hmr.py:100-113, spec/tester.py:143-151)

Weights flow through the REAL checkpoint path: the torch modules'
random weights are torch.save'd in the lightning dialect and loaded by
SpecPredictor via utils/checkpoints.py; SMPL assets flow through the
real chumpy-pkl loader from a synthetic SMPL_NEUTRAL.pkl.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from spec_tpu.core import constants as C
from tests.test_data import reference_style_crop
from tests.test_models import TorchCamCalib, TorchHMRHead
from tests.test_backbones import TorchResNet, TorchBasic
from tests.test_smpl import write_synthetic_smpl_pkl

# Decode ranges duplicated here ON PURPOSE (independent of core/bins.py):
# the reference's cam_utils.py:39-58 tables.
VFOV_LO, VFOV_HI = 0.2617, 2.1
PITCH_LO, PITCH_HI = -0.6, 0.6
ROLL_LO, ROLL_HI = -0.6, 0.6


# ---------------------------------------------------------------------------
# Torch twin: stage 1 decode + camera assembly
# ---------------------------------------------------------------------------


def torch_softargmax_angle(logits, lo, hi):
    """softargmax1d -> [-1,1] -> angle (cam_utils.py:94-118)."""
    probs = torch.softmax(logits, dim=-1)
    idx = torch.arange(logits.shape[-1], dtype=torch.float32)
    soft = (probs * idx).sum(-1) / (logits.shape[-1] - 1) * 2.0 - 1.0
    return (hi - lo) * (soft + 1.0) / 2.0 + lo


def torch_euler_pitch_roll(pitch, roll):
    """euler([pitch, 0, roll]) per PARE batch_euler2matrix as used at
    spec/utils/cam_params.py:37 — Rx(pitch) @ Rz(roll)."""
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]], np.float32)
    Rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]], np.float32)
    return Rx @ Rz


def torch_rot6d_to_rotmat(x6):
    """SPIN 6D -> rotmat (columns [b1|b2|b1xb2]); x6: (..., 6) torch."""
    a1, a2 = x6[..., 0:3], x6[..., 3:6]
    b1 = a1 / a1.norm(dim=-1, keepdim=True)
    b2 = a2 - (b1 * a2).sum(-1, keepdim=True) * b1
    b2 = b2 / b2.norm(dim=-1, keepdim=True)
    b3 = torch.cross(b1, b2, dim=-1)
    return torch.stack([b1, b2, b3], dim=-1)


class SMPLArrays:
    """Raw SMPL arrays in the loader's flattened layouts, built here from
    the pkl's raw arrays (an independent twin of load_smpl_assets)."""

    def __init__(self, raw):
        V = raw['v_template'].shape[0]
        self.v_template = raw['v_template'].astype(np.float32)
        self.shapedirs = (
            raw['shapedirs'][:, :, :C.NUM_BETAS]
            .reshape(V * 3, -1).T.astype(np.float32))
        self.posedirs = raw['posedirs'].reshape(V * 3, -1).T.astype(
            np.float32)
        self.j_regressor = raw['J_regressor'].astype(np.float32)
        self.lbs_weights = raw['weights'].astype(np.float32)
        self.parents = tuple(int(p) for p in C.SMPL_PARENTS)


def torch_smpl_joints49(smpl, jre, betas_t, rotmats_t):
    """Torch LBS (per-sample, loop-based) + the reference's 49-joint
    superset: [24 kinematic | 21 extra-vertex | 9 regressed] smpl54
    reordered by JOINT49_TO_SMPL54."""
    from tests.test_smpl import reference_lbs_torch

    verts, joints24 = reference_lbs_torch(
        smpl, betas_t.numpy(), rotmats_t.numpy())
    extra_ids = np.asarray(C.EXTRA_VERTEX_JOINT_IDS)
    parts = [joints24, verts[:, extra_ids],
             np.einsum('jv,bvc->bjc', jre, verts)]
    smpl54 = np.concatenate(parts, axis=1)
    return verts, smpl54[:, np.asarray(C.JOINT49_TO_SMPL54)]


class TorchSPEC(nn.Module):
    """Independent torch HMR twin (cam-conditioned head; resnet18 for
    the fast gate, resnet50 — the RELEASED trunk, reference
    spec/config.py:152-163 — in the slow tier)."""

    def __init__(self, backbone='resnet18'):
        super().__init__()
        from tests.test_backbones import TorchBottleneck
        if backbone == 'resnet50':
            self.backbone = TorchResNet(TorchBottleneck, (3, 4, 6, 3))
            self.head = TorchHMRHead(nfeat=2048, use_cam_feats=True)
        else:
            self.backbone = TorchResNet(TorchBasic, (2, 2, 2, 2))
            self.head = TorchHMRHead(nfeat=512, use_cam_feats=True)

    def forward(self, crops, cam_rotmat, cam_vfov):
        xf = self.backbone(crops).mean(dim=(2, 3))
        return self.head(xf, cam_rotmat=cam_rotmat, cam_vfov=cam_vfov)


def torch_two_stage_pipeline(tm_cc, tm_spec, smpl, jre, frames, boxes):
    """The full reference pipeline in torch. Returns (cameras, results)
    shaped like SpecPredictor.estimate_cameras / predict."""
    mean = np.asarray(C.IMG_NORM_MEAN, np.float32)
    std = np.asarray(C.IMG_NORM_STD, np.float32)

    # -- stage 1: per-frame CamCalib (batch-1, like camcalib_demo.py:95) --
    cameras = []
    for fr in frames:
        x = (np.asarray(fr, np.float32) / 255.0 - mean) / std
        xt = torch.from_numpy(np.transpose(x, (2, 0, 1))[None])
        with torch.no_grad():
            lv, lp, lr = tm_cc(xt)
        vfov = float(torch_softargmax_angle(lv, VFOV_LO, VFOV_HI)[0])
        pitch = float(torch_softargmax_angle(lp, PITCH_LO, PITCH_HI)[0])
        roll = float(torch_softargmax_angle(lr, ROLL_LO, ROLL_HI)[0])
        h = fr.shape[0]
        cameras.append({
            'vfov': vfov,
            'f_pix': h / 2.0 / np.tan(vfov / 2.0),   # camcalib_demo.py:129
            'pitch': pitch,
            'roll': roll,
        })

    # -- stage 2: per-person crops + HMR + SMPL + projection --
    results = [[] for _ in frames]
    for fi, bx in enumerate(boxes):
        bx = np.asarray(bx, np.float32).reshape(-1, 4)
        if len(bx) == 0:
            continue
        cam = cameras[fi]
        h, w = np.asarray(frames[fi]).shape[:2]
        R = torch_euler_pitch_roll(cam['pitch'], cam['roll'])
        f = np.float32(cam['f_pix'])
        # K = [[f,0,w/2],[0,f,h/2]] (cam_params.py:39-47) applied inline
        frame_f = np.asarray(frames[fi], np.float32)
        for (cx, cy, bw, bh) in bx:
            center = np.array([cx, cy], np.float32)
            scale = max(bw, bh) / 200.0            # spec/tester.py:127-128
            crop = reference_style_crop(frame_f, center, scale,
                                        [224, 224]) / 255.0
            crop = (crop - mean) / std
            ct = torch.from_numpy(
                np.transpose(crop, (2, 0, 1))[None].astype(np.float32))
            vfov_cond = 2.0 * np.arctan(h / (2.0 * f))  # hmr.py:95, from fx
            with torch.no_grad():
                pose6d, shape, cam_wp = tm_spec(
                    ct, torch.from_numpy(R[None].copy()),
                    torch.tensor([vfov_cond], dtype=torch.float32))
                rotmats = torch_rot6d_to_rotmat(pose6d.reshape(1, 24, 6))
            verts, j49 = torch_smpl_joints49(smpl, jre, shape, rotmats)

            # weak-persp -> full-image translation (SMPLCamHead semantics)
            s, tx, ty = [float(v) for v in cam_wp[0]]
            b = scale * 200.0
            tz = 2.0 * f / (s * b)
            cam_t = np.array([tx + 2 * (cx - w / 2.0) / (s * b),
                              ty + 2 * (cy - h / 2.0) / (s * b), tz],
                             np.float32)
            # perspective projection K @ (R X + t)
            pts = j49[0] @ R.T + cam_t
            uv = pts[:, :2] / np.maximum(pts[:, 2:3], 1e-9)
            j2d = uv * f + np.array([w / 2.0, h / 2.0], np.float32)

            results[fi].append({
                'pred_pose': rotmats[0].numpy(),
                'pred_shape': shape[0].numpy(),
                'pred_cam': cam_wp[0].numpy(),
                'smpl_vertices': verts[0],
                'smpl_joints3d': j49[0],
                'smpl_joints2d': j2d,
                'pred_cam_t': cam_t,
            })
    return cameras, results


# ---------------------------------------------------------------------------
# Fixture: a full synthetic data root + lightning checkpoints
# ---------------------------------------------------------------------------


@pytest.fixture(scope='module',
                params=['resnet18',
                        pytest.param('resnet50', marks=pytest.mark.slow)])
def pipeline_fixture(request, tmp_path_factory):
    """resnet18 composes in the fast gate; resnet50 (the RELEASED trunk
    for both stages — bottleneck converter + 2048-feat cam-conditioned
    head, exactly what the published checkpoints exercise) runs in the
    slow tier."""
    backbone = request.param
    root = tmp_path_factory.mktemp('spec_data')
    torch.manual_seed(0)

    # SMPL assets through the real chumpy-pkl loader.
    smpl_dir = root / 'body_models' / 'smpl'
    smpl_dir.mkdir(parents=True)
    V = C.NUM_SMPL_VERTICES   # real ids in EXTRA_VERTEX_JOINT_IDS need 6890
    raw = write_synthetic_smpl_pkl(smpl_dir / 'SMPL_NEUTRAL.pkl',
                                   num_vertices=V)
    rng = np.random.RandomState(5)
    jre = rng.rand(9, V).astype(np.float32)
    jre /= jre.sum(1, keepdims=True)
    np.save(root / 'J_regressor_extra.npy', jre)
    jrh = rng.rand(17, V).astype(np.float32)
    np.save(root / 'J_regressor_h36m.npy', jrh / jrh.sum(1, keepdims=True))

    # Torch models -> lightning-dialect checkpoints (the REAL ckpt path).
    tm_cc = TorchCamCalib(backbone=backbone).eval()
    (root / 'camcalib').mkdir()
    cc_ckpt = root / 'camcalib' / 'camcalib.ckpt'
    torch.save({'state_dict': {'model.' + k: v
                               for k, v in tm_cc.state_dict().items()},
                'epoch': 3}, cc_ckpt)

    tm_spec = TorchSPEC(backbone=backbone).eval()
    (root / 'spec').mkdir()
    spec_ckpt = root / 'spec' / 'spec.ckpt'
    torch.save({'state_dict': {'model.' + k: v
                               for k, v in tm_spec.state_dict().items()},
                'epoch': 7}, spec_ckpt)

    return dict(root=root, raw=raw, jre=jre, tm_cc=tm_cc, tm_spec=tm_spec,
                cc_ckpt=str(cc_ckpt), spec_ckpt=str(spec_ckpt),
                backbone=backbone)


def test_full_pipeline_composition_parity(pipeline_fixture, monkeypatch):
    fx = pipeline_fixture
    monkeypatch.setenv('SPEC_DATA_ROOT', str(fx['root']))

    rng = np.random.RandomState(11)
    # Frames at min-side 96 so stage-1 resize is the identity (resize
    # parity is covered elsewhere; this test targets the glue).
    H, W = 96, 128
    frames = [(rng.rand(H, W, 3) * 255).astype(np.uint8) for _ in range(3)]
    boxes = [
        np.array([[60.0, 50.0, 40.0, 70.0],
                  [90.0, 40.0, 30.0, 55.0]], np.float32),   # 2 persons
        np.zeros((0, 4), np.float32),                       # empty frame
        np.array([[40.0, 55.0, 50.0, 50.0]], np.float32),   # 1 person
    ]

    cams_t, res_t = torch_two_stage_pipeline(
        fx['tm_cc'], fx['tm_spec'], SMPLArrays(fx['raw']), fx['jre'],
        frames, boxes)

    from spec_tpu.serving import SpecPredictor

    pred = SpecPredictor(
        spec_ckpt=fx['spec_ckpt'], camcalib_ckpt=fx['cc_ckpt'],
        smpl_model_dir=str(fx['root'] / 'body_models' / 'smpl'),
        backbone=fx['backbone'], use_cam_feats=True,
        camcalib_backbone=fx['backbone'], min_size=96, batch_size=8)
    cams_j = pred.estimate_cameras(frames)
    res_j = pred.predict(frames, boxes, cameras=cams_j)

    # -- stage-1 camera pickle fields (the inter-stage ABI) --
    for ct, cj in zip(cams_t, cams_j):
        assert abs(ct['vfov'] - cj['vfov']) < 1e-4
        assert abs(ct['pitch'] - cj['pitch']) < 1e-4
        assert abs(ct['roll'] - cj['roll']) < 1e-4
        assert abs(ct['f_pix'] - cj['f_pix']) < 0.05  # pixels

    # -- per-person SPEC outputs --
    assert [len(r) for r in res_j] == [2, 0, 1]
    for fi in range(len(frames)):
        for pi, (pt, pj) in enumerate(zip(res_t[fi], res_j[fi])):
            loc = f'frame {fi} person {pi}'
            np.testing.assert_allclose(
                np.asarray(pj['pred_shape']), pt['pred_shape'],
                atol=2e-3, err_msg=loc)
            np.testing.assert_allclose(
                np.asarray(pj['pred_cam']), pt['pred_cam'],
                atol=2e-3, err_msg=loc)
            np.testing.assert_allclose(
                np.asarray(pj['pred_pose']), pt['pred_pose'],
                atol=2e-3, err_msg=loc)
            np.testing.assert_allclose(
                np.asarray(pj['pred_cam_t']), pt['pred_cam_t'],
                rtol=2e-3, atol=2e-3, err_msg=loc)
            np.testing.assert_allclose(
                np.asarray(pj['smpl_vertices']), pt['smpl_vertices'],
                atol=5e-3, err_msg=loc)
            np.testing.assert_allclose(
                np.asarray(pj['smpl_joints3d']), pt['smpl_joints3d'],
                atol=5e-3, err_msg=loc)
            # pixels in the ORIGINAL full image
            np.testing.assert_allclose(
                np.asarray(pj['smpl_joints2d']), pt['smpl_joints2d'],
                atol=0.1, err_msg=loc)


def test_checkpoint_epoch_metadata_ignored(pipeline_fixture):
    """The lightning blobs carry non-tensor metadata; the loader must not
    trip on it (reference ckpts carry optimizer state etc.)."""
    from spec_tpu.utils.checkpoints import load_torch_state_dict

    sd = load_torch_state_dict(pipeline_fixture['cc_ckpt'])
    assert 'backbone.conv1.weight' in sd
    assert all(not k.startswith('model.') for k in sd)
