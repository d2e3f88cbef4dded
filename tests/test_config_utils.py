"""Config system + profiling utility tests."""

import os

import numpy as np
import pytest

from spec_tpu.utils import StepTimer, set_seed
from spec_tpu.utils.config import (
    CfgNode,
    get_grid_search_configs,
    run_grid_search_experiments,
    spec_default_config,
)


def test_cfgnode_merge_and_opts(tmp_path):
    cfg = spec_default_config()
    assert cfg.OPTIMIZER.LR == 1e-4
    yml = tmp_path / 'c.yaml'
    yml.write_text('OPTIMIZER:\n  LR: 0.001\nHMR:\n  BACKBONE: resnet34\n')
    cfg.merge_from_file(str(yml))
    assert cfg.OPTIMIZER.LR == 0.001
    assert cfg.HMR.BACKBONE == 'resnet34'
    cfg.merge_from_list(['DATASET.BATCH_SIZE', '16',
                         'TESTING.USE_GT_CAM', 'True'])
    assert cfg.DATASET.BATCH_SIZE == 16
    assert cfg.TESTING.USE_GT_CAM is True


def test_reference_camcalib_config_dialect():
    """The reference's shipped camcalib presets (MODEL.LOSS_TYPE /
    MODEL.LOSS_*_WEIGHT, reference camcalib/configs/*.yaml) must load and
    resolve against our tree; the legacy DATASET.LOSS_TYPE spelling still
    works."""
    from spec_tpu.utils.config import (
        camcalib_default_config,
        resolve_camcalib_loss,
    )

    root = os.path.join(os.path.dirname(__file__), '..', 'configs',
                        'camcalib')
    cfg = camcalib_default_config()
    cfg.merge_from_file(os.path.join(root, 'config_sa_bias_l2.yaml'))
    assert resolve_camcalib_loss(cfg) == 'softargmax_biased_l2'
    assert cfg.MODEL.LOSS_VFOV_WEIGHT == 10.0
    assert cfg.MODEL.BACKBONE == 'resnet50'
    assert cfg.DATASET.TRAIN_DS == 'pano_scalenet'

    cfg = camcalib_default_config()
    cfg.merge_from_file(os.path.join(root, 'config_kl.yaml'))
    assert resolve_camcalib_loss(cfg) == 'kl'

    # Legacy spelling (early spec_tpu configs).
    cfg = camcalib_default_config()
    cfg.DATASET.LOSS_TYPE = 'softargmax_l2'
    assert resolve_camcalib_loss(cfg) == 'softargmax_l2'
    # MODEL wins when both are explicitly non-default.
    cfg.MODEL.LOSS_TYPE = 'softargmax_biased_l2'
    assert resolve_camcalib_loss(cfg) == 'softargmax_biased_l2'


def test_all_shipped_camcalib_presets_load():
    """Every yaml under configs/camcalib/ must merge cleanly against the
    default tree (incl. the reduced-bucket fine-tune presets, which must
    carry a MIN_RES matching their filename)."""
    import glob

    from spec_tpu.utils.config import (
        camcalib_default_config,
        resolve_camcalib_loss,
    )

    root = os.path.join(os.path.dirname(__file__), '..', 'configs',
                        'camcalib')
    paths = sorted(glob.glob(os.path.join(root, '*.yaml')))
    assert len(paths) >= 7
    for p in paths:
        cfg = camcalib_default_config()
        cfg.merge_from_file(p)
        assert resolve_camcalib_loss(cfg) in (
            'ce', 'kl', 'softargmax_l2', 'softargmax_biased_l2'), p
        assert cfg.DATASET.MIN_RES <= cfg.DATASET.MAX_RES, p
        name = os.path.basename(p)
        if '_min' in name:
            want = int(name.rsplit('_min', 1)[1].split('.')[0])
            assert cfg.DATASET.MIN_RES == want, p


def test_spec_default_tree_reference_keys():
    """Keys present in the reference default tree (spec/config.py:62-163)
    must exist so reference YAML overrides are honored, not silently added
    as orphans."""
    cfg = spec_default_config()
    assert cfg.DATASET.LOAD_TYPE == 'Base'
    assert cfg.DATASET.IGNORE_3D is False
    assert cfg.DATASET.TEACHER_FORCE_SCHEDULE == ''
    assert cfg.DATASET.TRAIN_NUM_IMAGES == -1
    assert cfg.TRAINING.USE_PART_SEGM_LOSS is False
    assert cfg.PROJECT_NAME == 'spec'
    assert cfg.SYSTEM.CLUSTER_NODE == 0.0


def test_grid_search_expansion():
    cfg = {'A': {'X': [1, 2, 3], 'Y': 'fixed'}, 'B': [True, False]}
    exps, hp = get_grid_search_configs(cfg)
    assert len(exps) == 6
    assert set(hp) == {'A/X', 'B'}
    assert {e['A']['X'] for e in exps} == {1, 2, 3}
    assert all(isinstance(e['B'], bool) for e in exps)


def test_grid_search_excluded_keys():
    cfg = {'T': {'DS': ['a_b', '0.5_0.5']}}
    exps, hp = get_grid_search_configs(cfg, excluded_keys=['T/DS'])
    assert len(exps) == 1
    assert exps[0]['T']['DS'] == ['a_b', '0.5_0.5']


def test_grid_search_excluded_scalar_stays_scalar():
    """Regression: a scalar excluded key (the default multi-dataset
    VAL_DS string) must NOT be wrapped into a one-element list — the
    '_'-splitting consumers would then silently resolve zero datasets."""
    from spec_tpu.utils.config import split_ds_names

    cfg = {'DATASET': {'VAL_DS': 'spec-syn_spec-mtp_3dpw-test-cam'}}
    exps, _ = get_grid_search_configs(cfg,
                                      excluded_keys=['DATASET/VAL_DS'])
    v = exps[0]['DATASET']['VAL_DS']
    assert v == 'spec-syn_spec-mtp_3dpw-test-cam'
    assert split_ds_names(v) == ['spec-syn', 'spec-mtp', '3dpw-test-cam']
    # And the list form (grid-search protected) splits the same way.
    assert split_ds_names(['spec-syn_spec-mtp', '3dpw-test-cam']) == [
        'spec-syn', 'spec-mtp', '3dpw-test-cam']


def test_run_grid_search_experiments(tmp_path):
    yml = tmp_path / 'c.yaml'
    yml.write_text('OPTIMIZER:\n  LR: [0.001, 0.0001]\n')
    cfg = run_grid_search_experiments(
        str(yml), spec_default_config(), script='spec_train.py',
        cfg_id=1, log_root=str(tmp_path / 'logs'))
    assert cfg.NUM_EXPERIMENTS == 2
    assert cfg.OPTIMIZER.LR == 0.0001
    assert os.path.exists(os.path.join(cfg.LOGDIR, 'config_to_run.yaml'))
    assert 'LR-0.0001' in cfg.LOGDIR


def test_step_timer():
    import time
    t = StepTimer()
    with t('a'):
        time.sleep(0.01)
    assert 0.005 < t.mean('a') < 0.2
    assert 'a' in t.report()


def test_set_seed():
    key = set_seed(3)
    assert key is not None
    a = np.random.rand()
    set_seed(3)
    assert np.random.rand() == a


def test_check_batch_gradient():
    import jax.numpy as jnp
    from spec_tpu.utils.profiling import check_batch_gradient

    # batch-independent fn passes
    assert check_batch_gradient(lambda x: x * 2 + 1,
                                jnp.ones((4, 8)))
    # batch-coupled fn (mean subtraction) fails
    assert not check_batch_gradient(
        lambda x: x - x.mean(axis=0, keepdims=True), jnp.ones((4, 8)))


def test_update_hparams_entry_point(tmp_path):
    """The reference's public config entry (spec/config.py:173-176):
    defaults + YAML overlay, both dialects."""
    import spec_tpu

    cfg = spec_tpu.update_hparams()
    assert cfg.DATASET.IMG_RES == 224

    y = tmp_path / 'o.yaml'
    y.write_text('DATASET:\n  BATCH_SIZE: 12\n')
    cfg = spec_tpu.update_hparams(str(y))
    assert cfg.DATASET.BATCH_SIZE == 12

    from spec_tpu.utils.config import update_hparams
    cam = update_hparams(dialect='camcalib')
    assert cam.MODEL.BACKBONE == 'resnet34'


def test_merge_from_list_rejects_unknown_keys():
    """yacs semantics: a typo'd --opts key raises instead of silently
    adding a dead key (a silent no-op override hid a real mistake)."""
    import pytest

    from spec_tpu.utils.config import (camcalib_default_config,
                                       spec_default_config)

    for cfg in (spec_default_config(), camcalib_default_config()):
        with pytest.raises(KeyError):
            cfg.merge_from_list(['DATASET.NO_SUCH_KEY', '5'])
        with pytest.raises(KeyError):
            cfg.merge_from_list(['NOSECTION.X', '1'])
    # known keys still merge + coerce
    cfg = camcalib_default_config()
    cfg.merge_from_list(['DATASET.NUM_IMAGES', '64'])
    assert cfg.DATASET.NUM_IMAGES == 64
