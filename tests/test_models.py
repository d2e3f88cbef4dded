"""Model-level tests: CamCalib regressor, HMR head parity vs an independent
torch construction, and the composite HMR forward contract."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from spec_tpu.core import smpl as S
from spec_tpu.core import geometry as G
from spec_tpu.models import (
    CameraRegressorNetwork,
    convert_torch_camcalib_params,
    HMR,
)
from spec_tpu.models.heads import (
    HMRHead,
    convert_torch_hmr_head_params,
    default_init_params,
)
from tests.test_backbones import TorchResNet, TorchBasic


# ---------------------------------------------------------------------------
# CamCalib
# ---------------------------------------------------------------------------


class TorchCamCalib(nn.Module):
    """Independent torch construction mirroring the reference
    CameraRegressorNetwork graph (backbone + avgpool + 3 single FC
    heads). ``backbone='resnet50'`` builds the RELEASED trunk
    (reference scripts/camcalib_demo.py:74-78)."""

    def __init__(self, backbone='resnet18'):
        super().__init__()
        from tests.test_backbones import TorchBottleneck
        if backbone == 'resnet50':
            self.backbone = TorchResNet(TorchBottleneck, (3, 4, 6, 3))
            nf = 2048
        else:
            self.backbone = TorchResNet(TorchBasic, (2, 2, 2, 2))
            nf = 512
        self.fc_vfov = nn.Linear(nf, 256)
        self.fc_pitch = nn.Linear(nf, 256)
        self.fc_roll = nn.Linear(nf, 256)

    def forward(self, x):
        f = self.backbone(x)
        v = f.mean(dim=(2, 3))
        return self.fc_vfov(v), self.fc_pitch(v), self.fc_roll(v)


def test_camcalib_parity_resnet18(rng):
    tm = TorchCamCalib().eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_torch_camcalib_params(sd, backbone='resnet18')
    model = CameraRegressorNetwork(backbone='resnet18')

    x = rng.randn(2, 3, 96, 128).astype(np.float32)
    with torch.no_grad():
        ref = [t.numpy() for t in tm(torch.from_numpy(x))]
    out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    for o, r in zip(out, ref):
        assert o.shape == (2, 256)
        np.testing.assert_allclose(np.asarray(o), r, atol=5e-4)


def test_camcalib_multi_layer_head_shapes(rng):
    model = CameraRegressorNetwork(
        backbone='resnet18', num_fc_layers=3, num_fc_channels=512)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert all(o.shape == (1, 256) for o in out)


# ---------------------------------------------------------------------------
# HMR head
# ---------------------------------------------------------------------------


class TorchHMRHead(nn.Module):
    """Independent torch iterative regressor (SPIN semantics + optional
    cam-feature conditioning appended to the iteration input)."""

    def __init__(self, nfeat=2048, use_cam_feats=False):
        super().__init__()
        npose = 24 * 6
        extra = 10 if use_cam_feats else 0
        self.use_cam_feats = use_cam_feats
        self.fc1 = nn.Linear(nfeat + npose + 13 + extra, 1024)
        self.fc2 = nn.Linear(1024, 1024)
        self.decpose = nn.Linear(1024, npose)
        self.decshape = nn.Linear(1024, 10)
        self.deccam = nn.Linear(1024, 3)
        init = default_init_params()
        self.register_buffer('init_pose', torch.from_numpy(init['init_pose']))
        self.register_buffer('init_shape',
                             torch.from_numpy(init['init_shape']))
        self.register_buffer('init_cam', torch.from_numpy(init['init_cam']))

    def forward(self, xf, cam_rotmat=None, cam_vfov=None, n_iter=3):
        B = xf.shape[0]
        pose = self.init_pose.expand(B, -1)
        shape = self.init_shape.expand(B, -1)
        cam = self.init_cam.expand(B, -1)
        for _ in range(n_iter):
            xc = torch.cat([xf, pose, shape, cam], 1)
            if self.use_cam_feats:
                xc = torch.cat(
                    [xc, cam_rotmat.reshape(B, 9), cam_vfov.reshape(B, 1)], 1)
            h = self.fc2(self.fc1(xc))
            pose = self.decpose(h) + pose
            shape = self.decshape(h) + shape
            cam = self.deccam(h) + cam
        return pose, shape, cam


@pytest.mark.parametrize('use_cam_feats', [False, True])
def test_hmr_head_parity(rng, use_cam_feats):
    tm = TorchHMRHead(nfeat=512, use_cam_feats=use_cam_feats).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_torch_hmr_head_params(sd)
    head = HMRHead(use_cam_feats=use_cam_feats)

    xf = rng.randn(4, 512).astype(np.float32)
    rotmat = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
    vfov = rng.rand(4).astype(np.float32) + 0.5

    with torch.no_grad():
        pose_t, shape_t, cam_t = tm(
            torch.from_numpy(xf),
            cam_rotmat=torch.from_numpy(rotmat) if use_cam_feats else None,
            cam_vfov=torch.from_numpy(vfov) if use_cam_feats else None)

    kwargs = {}
    if use_cam_feats:
        kwargs = dict(cam_rotmat=jnp.asarray(rotmat),
                      cam_vfov=jnp.asarray(vfov))
    out = head.apply({'params': params}, jnp.asarray(xf), **kwargs)

    np.testing.assert_allclose(
        np.asarray(out['pred_pose_6d']), pose_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out['pred_shape']), shape_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out['pred_cam']), cam_t.numpy(), atol=2e-4)
    # rot6d decode consistency
    R = np.asarray(out['pred_pose'])
    eye = np.einsum('bjik,bjlk->bjil', R, R)
    np.testing.assert_allclose(
        eye, np.tile(np.eye(3), (4, 24, 1, 1)), atol=1e-5)


def test_hmr_head_converter_fills_missing_init_buffers(rng):
    """Legacy ckpts lack init_pose/shape/cam; the reference patches them in
    before resume (scripts/spec_train.py:86-90) — the converter must fall
    back to mean params so the tree still applies."""
    tm = TorchHMRHead(nfeat=512).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if not k.startswith('init_')}
    params = convert_torch_hmr_head_params(sd)
    for buf in ('init_pose', 'init_shape', 'init_cam'):
        assert buf in params
    np.testing.assert_allclose(
        np.asarray(params['init_pose']), default_init_params()['init_pose'])
    head = HMRHead()
    out = head.apply({'params': params},
                     jnp.asarray(rng.randn(2, 512).astype(np.float32)))
    with torch.no_grad():
        pose_t, _, _ = tm(torch.from_numpy(
            np.zeros((1, 512), np.float32)))
    assert out['pred_pose_6d'].shape == (2, 144)


# ---------------------------------------------------------------------------
# Composite HMR
# ---------------------------------------------------------------------------


def test_hmr_forward_contract(rng):
    assets = S.create_test_assets(num_vertices=512)
    model = HMR(backbone='resnet18', use_cam=True, use_cam_feats=True)
    B = 2
    images = jnp.asarray(rng.randn(B, 64, 64, 3).astype(np.float32))
    pitch = jnp.asarray(rng.randn(B).astype(np.float32) * 0.1)
    roll = jnp.asarray(rng.randn(B).astype(np.float32) * 0.05)
    cam_rotmat = G.euler_to_rotmat(
        jnp.stack([pitch, jnp.zeros_like(pitch), roll], -1))
    img_w = jnp.full((B,), 1920.0)
    img_h = jnp.full((B,), 1080.0)
    K = G.build_cam_intrinsics(jnp.full((B,), 1500.0), img_w, img_h)
    bbox_center = jnp.asarray(
        rng.rand(B, 2).astype(np.float32) * 1000 + 200)
    bbox_scale = jnp.asarray(rng.rand(B).astype(np.float32) + 1.0)

    variables = model.init(
        jax.random.PRNGKey(0), assets, images, cam_rotmat, K,
        bbox_scale, bbox_center, img_w, img_h)
    out = jax.jit(
        lambda v, a, im: model.apply(
            v, a, im, cam_rotmat, K, bbox_scale, bbox_center, img_w, img_h)
    )(variables, assets, images)

    assert out['pred_pose'].shape == (B, 24, 3, 3)
    assert out['pred_shape'].shape == (B, 10)
    assert out['pred_cam'].shape == (B, 3)
    assert out['smpl_vertices'].shape == (B, 512, 3)
    assert out['smpl_joints3d'].shape == (B, 49, 3)
    assert out['smpl_joints2d'].shape == (B, 49, 2)
    assert out['pred_cam_t'].shape == (B, 3)
    assert np.isfinite(np.asarray(out['smpl_joints2d'])).all()


def test_hmr_non_cam_path(rng):
    assets = S.create_test_assets(num_vertices=512)
    model = HMR(backbone='resnet18', use_cam=False)
    images = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), assets, images)
    out = model.apply(variables, assets, images)
    # normalized crop-frame joints2d
    assert out['smpl_joints2d'].shape == (1, 49, 2)


def test_hmr_hrnet_backbone_forward(rng):
    """Composite HMR with the HRNet trunk variants the reference demo
    supports (spec/models/hmr.py:44-53)."""
    from spec_tpu.core import smpl as S
    from spec_tpu.core import geometry as G

    assets = S.create_test_assets(num_vertices=128)
    model = HMR(backbone='hrnet_w32-conv', use_cam=True, use_cam_feats=True)
    B = 2
    images = jnp.asarray(rng.randn(B, 64, 64, 3).astype(np.float32))
    cam_rotmat = jnp.tile(jnp.eye(3), (B, 1, 1))
    img_w = jnp.full((B,), 1920.0)
    img_h = jnp.full((B,), 1080.0)
    K = G.build_cam_intrinsics(jnp.full((B,), 1500.0), img_w, img_h)
    bbox_center = jnp.full((B, 2), 500.0)
    bbox_scale = jnp.ones((B,))
    variables = model.init(
        jax.random.PRNGKey(0), assets, images, cam_rotmat, K,
        bbox_scale, bbox_center, img_w, img_h)
    out = model.apply(variables, assets, images, cam_rotmat, K,
                      bbox_scale, bbox_center, img_w, img_h)
    assert out['pred_pose'].shape == (B, 24, 3, 3)
    assert out['smpl_joints2d'].shape[0] == B


def test_convert_spin_flat_dialect(rng):
    """SPIN model_checkpoint.pt stores the HMR flat (torchvision resnet
    keys + fc1/fc2/dec* head keys, NO backbone./head. prefixes) — the
    converter must synthesize the prefixes (regression: the prefix
    filter dropped every key and crashed)."""
    from tests.test_backbones import TorchBasic, TorchResNet
    from spec_tpu.models.hmr import convert_torch_hmr_params

    trunk = TorchResNet(TorchBasic, (2, 2, 2, 2)).eval()
    head = TorchHMRHead(nfeat=512).eval()
    sd = {k: v.numpy() for k, v in trunk.state_dict().items()}
    sd.update({k: v.numpy() for k, v in head.state_dict().items()})
    assert not any(k.startswith(('backbone.', 'head.')) for k in sd)

    variables = convert_torch_hmr_params(sd, backbone='resnet18', prefix='')
    assert 'ResNet_0' in variables['params']
    assert 'decpose' in variables['params']['head']
    # converted trunk actually loads into the flax HMR
    import jax
    from spec_tpu.core import smpl as S
    from spec_tpu.models import HMR

    assets = S.create_test_assets(num_vertices=64)
    model = HMR(backbone='resnet18', use_cam=True)
    B = 1
    img = jnp.zeros((B, 64, 64, 3))
    eye = jnp.tile(jnp.eye(3), (B, 1, 1))
    one = jnp.ones((B,))
    template = model.init(jax.random.PRNGKey(0), assets, img, eye, eye,
                          one, jnp.ones((B, 2)), one, one)
    from spec_tpu.utils.checkpoints import merge_with_template
    merged = merge_with_template(variables, template, verbose=False)
    out = model.apply(merged, assets, img, eye, eye, one,
                      jnp.ones((B, 2)), one, one)
    assert np.isfinite(np.asarray(out['smpl_vertices'])).all()


def test_init_buffers_frozen_in_training():
    """init_pose/init_shape/init_cam are fixed buffers in the reference
    (register_buffer) — the optimizer must not move them."""
    import optax

    from spec_tpu.train.state import adam, freeze_init_buffers

    params = {'head': {'init_pose': jnp.ones((1, 4)),
                       'decpose': {'kernel': jnp.ones((4, 4))}},
              'trunk': {'w': jnp.ones((3,))}}
    tx = freeze_init_buffers(adam(0.1))
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, st = tx.update(grads, st, params)
    new = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(new['head']['init_pose']), 1.0)
    assert not np.allclose(
        np.asarray(new['head']['decpose']['kernel']), 1.0)
    assert not np.allclose(np.asarray(new['trunk']['w']), 1.0)


@pytest.mark.parametrize('backbone', [
    'resnet18',
    # the W32 variant costs ~72 s on this 1-core host — slow tier keeps
    # remat coverage per-commit via resnet18 and per-round via W32
    pytest.param('hrnet_w32', marks=pytest.mark.slow),
])
def test_backbone_remat_equivalence(rng, backbone):
    """TRAINING.REMAT (jax.checkpoint around residual/exchange blocks) is
    a pure memory knob: identical param tree, train-mode loss, and grads
    vs the plain backbone."""
    from spec_tpu.models.backbones import get_backbone

    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))

    def build(remat):
        trunk = get_backbone(backbone, remat=remat)
        v = trunk.init(jax.random.PRNGKey(0), x, train=True)

        def loss(params, batch_stats):
            out, upd = trunk.apply(
                {'params': params, 'batch_stats': batch_stats}, x,
                train=True, mutable=['batch_stats'])
            return jnp.sum(out.astype(jnp.float32) ** 2), \
                upd['batch_stats']

        (l, bs), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(
            v['params'], v['batch_stats'])
        return v, float(l), g, bs

    v0, l0, g0, bs0 = build(False)
    v1, l1, g1, bs1 = build(True)
    # same param tree (checkpoint compatibility) and same numbers
    assert jax.tree_util.tree_structure(v0) == \
        jax.tree_util.tree_structure(v1)
    assert l0 == l1
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(bs0),
                    jax.tree_util.tree_leaves(bs1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
