"""The shipped reduced-bucket fine-tune recipes, executed end-to-end.

configs/camcalib/config_sa_bias_l2_min{448,384}.yaml are the recipes for
serving stage 1 below the reference's min-side-600 (CLAUDE.md bucket
ladder: the accuracy penalty of a smaller serving bucket is train/test
resolution mismatch and is recovered by (re)training at the bucket).
These tests load both presets through the real config machinery and run
the 448 recipe end-to-end: synthetic panoramas -> the real ScaleNet
datagen CLI -> camcalib_train --cfg <preset> with a TRAINING.PRETRAINED
fine-tune init from a torch lightning checkpoint (the released-ckpt
path, scripts/camcalib_demo.py:39).
"""

import numpy as np
import pytest
import torch

from spec_tpu.utils.config import camcalib_default_config, update_hparams


@pytest.mark.parametrize('min_res', [448, 384])
def test_finetune_preset_loads(min_res):
    cfg = update_hparams(
        f'configs/camcalib/config_sa_bias_l2_min{min_res}.yaml',
        dialect='camcalib')
    # A key the YAML does NOT set must come from the CAMCALIB default
    # tree (the spec tree keeps model hparams under HMR, not MODEL, so a
    # wrong-dialect merge has no MODEL.DTYPE and fails here).
    assert cfg.MODEL.DTYPE == camcalib_default_config().MODEL.DTYPE
    assert cfg.DATASET.MIN_RES == min_res
    assert cfg.DATASET.TRAIN_DS == 'pano_scalenet'
    assert cfg.MODEL.LOSS_TYPE == 'softargmax_biased_l2'
    assert cfg.MODEL.BACKBONE == 'resnet50'   # the released ckpt's trunk
    # fine-tune recipe: 10x below the from-scratch LR, short schedule
    assert cfg.OPTIMIZER.LR == pytest.approx(1e-4)
    assert cfg.TRAINING.MAX_EPOCHS <= 10
    # PRETRAINED is the fine-tune entry point (null in the file; the CLI
    # run supplies the min-600 checkpoint)
    assert 'PRETRAINED' in cfg.TRAINING


def _make_synthetic_panos(pano_dir, n=2, rng=None):
    import cv2

    rng = rng or np.random.RandomState(0)
    pano_dir.mkdir(parents=True)
    H, W = 128, 256    # equirect 2:1
    yy, xx = np.mgrid[0:H, 0:W]
    for i in range(n):
        img = np.stack([
            128 + 100 * np.sin(xx / (9.0 + 3 * i)),
            128 + 100 * np.cos(yy / (7.0 + 2 * i)),
            np.clip(60 + rng.randn(H, W) * 30, 0, 255),
        ], -1)
        cv2.imwrite(str(pano_dir / f'pano{i}.jpg'),
                    np.clip(img, 0, 255).astype('u1'))


@pytest.mark.slow
def test_min448_recipe_end_to_end(tmp_path, rng, monkeypatch):
    """datagen -> fine-tune with the SHIPPED preset (fdr schedule).

    Overrides keep the test tractable on the CPU mesh (resnet18 trunk,
    tiny batch) without touching what the recipe is ABOUT: the 448-744
    resize band, the biased-L2 loss, the fine-tune LR, and the
    TRAINING.PRETRAINED torch-checkpoint init path.
    """
    import joblib

    from spec_tpu.datagen import scalenet
    from tests.test_models import TorchCamCalib

    root = tmp_path / 'data'
    pano_src = tmp_path / 'panos'
    _make_synthetic_panos(pano_src, n=2, rng=rng)

    out = root / 'dataset_folders' / 'pano360'
    scalenet.main([str(pano_src), str(out),
                   '--crops_per_pano', '8', '--val_ratio', '0.25'])
    train_names = joblib.load(out / 'train_images.pkl')
    val_names = joblib.load(out / 'val_images.pkl')
    assert len(train_names) >= 4 and len(val_names) >= 2
    monkeypatch.setenv('SPEC_DATA_ROOT', str(root))

    # The released-checkpoint stand-in: a torch lightning ckpt through
    # the same converter path real fine-tunes use.
    tm = TorchCamCalib().eval()
    base_ckpt = tmp_path / 'camcalib_base.ckpt'
    torch.save({'state_dict': {'model.' + k: v
                               for k, v in tm.state_dict().items()}},
               base_ckpt)

    from spec_tpu.cli.camcalib_train import main
    main(['--cfg', 'configs/camcalib/config_sa_bias_l2_min448.yaml',
          '--fdr', '--log_root', str(tmp_path / 'logs'), '--opts',
          'MODEL.BACKBONE', 'resnet18',
          'DATASET.BATCH_SIZE', '8',   # forced 8-device CPU mesh
          'DATASET.NUM_WORKERS', '1',
          'TRAINING.PRETRAINED', str(base_ckpt)])

    ckpts = list((tmp_path / 'logs').glob('**/checkpoints'))
    assert ckpts and any(d.iterdir() for d in ckpts)

    # The fine-tuned trunk started FROM the torch weights: conv1 of the
    # saved state must be closer to the converted init than a fresh
    # random init would be (one fdr step at LR 1e-4 moves it ~1e-4).
    import jax

    from spec_tpu.models import (
        CameraRegressorNetwork,
        convert_torch_camcalib_params,
    )
    from spec_tpu.utils.checkpoints import latest_step, restore_checkpoint
    from spec_tpu.train import create_train_state, make_optimizer

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    init_vars = convert_torch_camcalib_params(sd, backbone='resnet18')
    model = CameraRegressorNetwork(backbone='resnet18')
    import jax.numpy as jnp
    template = create_train_state(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 448, 448, 3))),
        make_optimizer(update_hparams(
            'configs/camcalib/config_sa_bias_l2_min448.yaml',
            dialect='camcalib').OPTIMIZER))
    ckpt_dir = str(ckpts[0])
    assert latest_step(ckpt_dir) is not None
    saved = restore_checkpoint(ckpt_dir, template)
    w_saved = np.asarray(
        saved.params['ResNet_0']['conv1']['conv']['kernel'])
    w_init = np.asarray(
        init_vars['params']['ResNet_0']['conv1']['conv']['kernel'])
    assert np.abs(w_saved - w_init).max() < 1e-2   # fine-tune, not re-init
