"""Eval-loop internals: gendered GT blending and the demo CLI end-to-end."""

import json
import os

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from spec_tpu.core import smpl as S
from spec_tpu.eval.eval_loop import _gendered_gt_mesh


def test_gendered_blend_selects_per_sample(rng):
    male = S.create_test_assets(num_vertices=128, seed=1)
    female = S.create_test_assets(num_vertices=128, seed=2)
    neutral = S.create_test_assets(num_vertices=128, seed=3)
    assets = {'neutral': neutral, 'male': male, 'female': female}

    B = 4
    pose = jnp.asarray((rng.randn(B, 72) * 0.1).astype('f4'))
    betas = jnp.asarray((rng.randn(B, 10) * 0.2).astype('f4'))
    gender = jnp.asarray(np.array([0, 1, 0, 1], np.int32))  # m, f, m, f

    verts, j24 = _gendered_gt_mesh(assets, pose, betas, gender)

    def fwd(a, i):
        out = S.smpl_forward(
            a, betas[i:i + 1], pose[i:i + 1, 3:].reshape(-1, 23, 3),
            pose[i:i + 1, :3].reshape(-1, 1, 3), joint_set='native')
        return np.asarray(out.vertices)[0]

    np.testing.assert_allclose(np.asarray(verts)[0], fwd(male, 0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(verts)[1], fwd(female, 1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(verts)[3], fwd(female, 3),
                               atol=1e-5)
    # neutral-only dict falls back to neutral for everyone
    v_n, _ = _gendered_gt_mesh({'neutral': neutral}, pose, betas, gender)
    np.testing.assert_allclose(np.asarray(v_n)[0], fwd(neutral, 0),
                               atol=1e-5)


def test_device_prefetch_passthrough(rng):
    from spec_tpu.data import device_prefetch

    batches = [{'img': rng.rand(2, 4, 4, 3).astype('f4'),
                'imgname': ['a', 'b'], '_valid_count': 2}
               for _ in range(3)]
    out = list(device_prefetch(iter(batches)))
    assert len(out) == 3
    assert out[0]['imgname'] == ['a', 'b']
    np.testing.assert_allclose(np.asarray(out[1]['img']), batches[1]['img'])


def test_occlusion_paste(rng):
    from spec_tpu.data.occlusion import occlude_with_objects

    img = np.zeros((64, 64, 3), np.float32)
    occ = np.zeros((16, 16, 4), np.float32)
    occ[..., 0] = 200.0   # red
    occ[..., 3] = 255.0   # opaque
    out = occlude_with_objects(img, [occ], rng=np.random.RandomState(0),
                               img_size=64)
    assert out.max() > 0  # something was pasted
    assert img.max() == 0  # input untouched


@pytest.mark.slow
def test_eval_step_mesh_sharded_matches_plain(rng):
    """make_eval_step(mesh=...): the eval batch sharded over the
    8-device mesh reproduces the single-device metrics (rows are
    independent; spec_eval --data_parallel / trainer validation path)."""
    import jax

    import spec_tpu.parallel as par
    from spec_tpu.eval.eval_loop import make_eval_step
    from spec_tpu.models import HMR

    B, res = 8, 64
    assets = S.create_test_assets(num_vertices=128)
    jreg = np.asarray(assets.j_regressor_h36m)
    model = HMR(backbone='resnet18', use_cam=True, img_res=res)
    eye = jnp.tile(jnp.eye(3), (B, 1, 1))
    variables = model.init(
        jax.random.PRNGKey(0), assets, jnp.zeros((B, res, res, 3)),
        eye, eye, jnp.ones((B,)), jnp.ones((B, 2)), jnp.ones((B,)),
        jnp.ones((B,)))
    K = np.tile(np.array([[500., 0., 64.], [0., 500., 48.],
                          [0., 0., 1.]], 'f4'), (B, 1, 1))
    batch = {
        'img': jnp.asarray(rng.randn(B, res, res, 3).astype('f4')),
        'pose': jnp.asarray((rng.randn(B, 72) * 0.1).astype('f4')),
        'betas': jnp.asarray((rng.randn(B, 10) * 0.2).astype('f4')),
        'gender': jnp.zeros((B,), jnp.int32),
        'scale': jnp.ones((B,)),
        'center': jnp.asarray(np.tile([[64., 48.]], (B, 1)).astype('f4')),
        'orig_shape': jnp.asarray(np.tile([[96., 128.]], (B, 1))),
        'cam_rotmat': eye,
        'cam_intrinsics': jnp.asarray(K),
    }

    step = make_eval_step(model, {'neutral': assets}, jreg)
    out0, j14_0, j24_0, v2v_0 = step(variables, batch)

    mesh = par.create_mesh()
    step_m = make_eval_step(model, {'neutral': assets}, jreg, mesh=mesh)
    out1, j14_1, j24_1, v2v_1 = step_m(variables, batch)
    assert len(v2v_1.sharding.device_set) == 8  # genuinely distributed

    np.testing.assert_allclose(np.asarray(v2v_1), np.asarray(v2v_0),
                               rtol=1e-5, atol=1e-6)
    for a, b in ((j14_1, j14_0), (j24_1, j24_0)):
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]),
                                       np.asarray(b[k]),
                                       rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1['smpl_vertices']),
                               np.asarray(out0['smpl_vertices']),
                               rtol=1e-5, atol=1e-5)


def test_evaluate_dataset_mesh_rejects_indivisible_batch(rng):
    import jax
    import pytest as _pytest

    import spec_tpu.parallel as par
    from spec_tpu.eval.eval_loop import evaluate_dataset

    n_dev = len(jax.devices())
    if n_dev < 2:
        _pytest.skip('needs a multi-device mesh')

    class _Loader:
        batch_size = n_dev + 1

    with _pytest.raises(ValueError, match='multiple'):
        evaluate_dataset(None, None, _Loader(), {'neutral': None}, None,
                         mesh=par.create_mesh())


def test_spec_demo_cli_end_to_end(tmp_path, rng, monkeypatch):
    """Full two-stage demo through the CLI entry (small backbone via
    monkeypatched model builders would be invasive — run resnet50 on two
    tiny images instead; CPU, one batch)."""
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    for i in range(2):
        cv2.imwrite(str(img_dir / f'p{i}.jpg'),
                    (rng.rand(96, 128, 3) * 255).astype('u1'))
    dets = {f'p{i}.jpg': [[64.0, 48.0, 60.0, 80.0]] for i in range(2)}
    det_file = tmp_path / 'dets.json'
    det_file.write_text(json.dumps(dets))

    from spec_tpu.cli.spec_demo import run_spec_on_folder

    # Model hyperparams come from the config yaml shipped with the
    # checkpoint (reference spec/tester.py:49-61) — use a small backbone.
    cfg_file = tmp_path / 'spec_config.yaml'
    cfg_file.write_text('HMR:\n  BACKBONE: resnet18\n  USE_CAM_FEATS: '
                        'true\n')

    # min_size=64 exercises the reduced-bucket plumbing (spec_demo
    # --min_size -> stage-1 resize) and keeps stage-1 small on CPU.
    outs = run_spec_on_folder(
        str(img_dir), str(tmp_path / 'out'), bbox_file=str(det_file),
        batch_size=2, render=True, save_obj=True, cfg_file=str(cfg_file),
        min_size=64)
    assert len(outs) == 2
    res_dir = tmp_path / 'out' / 'spec_results'
    assert sorted(os.listdir(res_dir)) == ['p0.pkl', 'p1.pkl']
    assert os.path.exists(tmp_path / 'out' / 'spec_images' / 'p0.jpg')
    assert os.path.exists(tmp_path / 'out' / 'meshes' / 'p0' / '000000.obj')
    assert os.path.exists(tmp_path / 'out' / 'camcalib' / 'p0.jpg.pkl')


def test_itw_dataset_requires_save_images():
    """In-the-wild datasets (no 3D GT) must refuse a metrics-only eval
    (reference spec/trainer.py:262-269 logs and exits)."""
    import pytest as _pytest

    from spec_tpu.eval.eval_loop import evaluate_dataset

    with _pytest.raises(SystemExit):
        evaluate_dataset(None, None, None, {}, None,
                         dataset_name='coco', save_images=False)


def test_loader_surfaces_getitem_errors(rng):
    """A raising __getitem__ must surface in the consumer, not hang it
    (missing sentinel), and an abandoned iterator must not leak a
    blocked producer."""
    import time

    from spec_tpu.data import DataLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise FileNotFoundError(f'missing image {i}')

    loader = DataLoader(Bad(), batch_size=4, num_workers=2)
    with pytest.raises(FileNotFoundError):
        list(iter(loader))

    class Slow:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {'x': np.zeros(4, 'f4')}

    loader = DataLoader(Slow(), batch_size=4, num_workers=2, prefetch=1)
    import threading
    before = threading.active_count()
    for _ in range(3):
        for batch in loader:   # abandon after one batch
            break
    time.sleep(1.0)  # bounded puts notice the stop event
    assert threading.active_count() <= before + 2
