"""SPEC training CLI (reference ``scripts/spec_train.py``).

Wires config -> datasets (mixed/staged schedules) -> SpecTrainer (sharded
jitted steps over the device mesh) -> orbax checkpoints, then runs the
test pass (reference :128-134).

Usage:
  python -m spec_tpu.cli.spec_train --cfg configs/spec.yaml \
      --opts TRAINING.MAX_EPOCHS 5
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description='SPEC train (TPU)')
    parser.add_argument('--cfg', type=str, default=None)
    parser.add_argument('--opts', nargs='*', default=[])
    parser.add_argument('--cfg_id', type=int, default=0)
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--resume_wo_optimizer', action='store_true',
                        help='resume params/batch_stats only, fresh '
                             'optimizer (reference '
                             'scripts/spec_train.py:147-149)')
    parser.add_argument('--ckpt', type=str, default='',
                        help='pretrained torch ckpt to start from')
    parser.add_argument('--log_root', type=str, default='logs')
    parser.add_argument('--fdr', action='store_true',
                        help='fast dev run: 1 epoch on a tiny slice')
    parser.add_argument('--coordinator_address', type=str, default='',
                        help='multi-host training: host:port of process 0 '
                             '(jax.distributed); the mesh then spans all '
                             'hosts and each host loads its own data '
                             'shard. On Cloud TPU pods omit all three '
                             'flags — jax auto-detects')
    parser.add_argument('--num_processes', type=int, default=None,
                        help='multi-host: total process count')
    parser.add_argument('--process_id', type=int, default=None,
                        help='multi-host: this process\'s rank')
    from spec_tpu.cli._compat import add_cluster_flags
    add_cluster_flags(parser)
    args = parser.parse_args(argv)

    if args.coordinator_address:
        # BEFORE any jax backend touch (enable_compilation_cache is
        # config-only, but initialize must precede device queries).
        from spec_tpu import parallel as par_init
        par_init.initialize_multihost(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes, process_id=args.process_id)

    from spec_tpu.utils.paths import enable_compilation_cache
    enable_compilation_cache()

    from spec_tpu.utils.config import (
        run_grid_search_experiments,
        spec_default_config,
    )

    cfg = run_grid_search_experiments(
        args.cfg, spec_default_config(), script='spec_train.py',
        cfg_id=args.cfg_id, opts=args.opts, log_root=args.log_root)

    import jax

    if jax.process_count() > 1:
        # Every process minted its own second-resolution timestamped
        # LOGDIR; checkpoints/meta/resume need ONE agreed directory (on
        # shared storage) — take process 0's.
        from spec_tpu import parallel as _par
        cfg.LOGDIR = _par.broadcast_string(cfg.LOGDIR)
        os.makedirs(cfg.LOGDIR, exist_ok=True)
    from spec_tpu.core import smpl as S
    from spec_tpu.data import (
        CamDataset,
        DataLoader,
        MixedCamDataset,
        parse_datasets_ratios,
    )
    from spec_tpu.data.cam_dataset import AugmentationConfig
    from spec_tpu.models import HMR
    from spec_tpu.train.trainer import SpecTrainer, parse_schedule
    from spec_tpu.utils import paths
    from spec_tpu.utils.checkpoints import load_spec_variables

    # Assets.
    smpl_dir = paths.smpl_model_dir()
    assets_by_gender = {}
    if os.path.isdir(smpl_dir) and os.listdir(smpl_dir):
        for g in ('neutral', 'male', 'female'):
            try:
                assets_by_gender[g] = S.load_smpl_assets(
                    smpl_dir, gender=g,
                    j_regressor_extra_path=paths.j_regressor_extra_path(),
                    j_regressor_h36m_path=paths.j_regressor_h36m_path())
            except FileNotFoundError:
                pass
    if 'neutral' not in assets_by_gender:
        print('[train] WARNING: SMPL assets missing; synthetic test assets')
        assets_by_gender = {'neutral': S.create_test_assets()}
    neutral = assets_by_gender['neutral']
    jreg = (np.load(paths.j_regressor_h36m_path())
            if os.path.exists(paths.j_regressor_h36m_path())
            else np.asarray(neutral.j_regressor_h36m))

    aug = AugmentationConfig(
        flip_prob=cfg.DATASET.FLIP_PROB,
        noise_factor=cfg.DATASET.NOISE_FACTOR,
        rot_factor=cfg.DATASET.ROT_FACTOR,
        scale_factor=cfg.DATASET.SCALE_FACTOR,
        crop_prob=cfg.DATASET.CROP_PROB,
        crop_factor=cfg.DATASET.CROP_FACTOR,
        use_occlusion=cfg.DATASET.USE_SYNTHETIC_OCCLUSION,
        use_3d_conf=cfg.DATASET.USE_3D_CONF,
    )

    def build_cam_dataset(name, is_train):
        annot = paths.dataset_files().get(name)
        folder = paths.dataset_folders().get(name)
        assert annot and os.path.exists(annot), f'missing annots for {name}'
        return CamDataset(
            annot, folder, dataset=name, is_train=is_train,
            img_res=cfg.DATASET.IMG_RES, aug=aug,
            ignore_3d=cfg.DATASET.get('IGNORE_3D', False),
            baseline_cam_rot=cfg.DATASET.BASELINE_CAM_ROT,
            baseline_cam_f=cfg.DATASET.BASELINE_CAM_F,
            baseline_cam_c=cfg.DATASET.BASELINE_CAM_C,
            fast_decode=is_train and cfg.DATASET.get('FAST_DECODE', False),
            decode_cache=cfg.DATASET.get('DECODE_CACHE', 0),
            native_decode=cfg.DATASET.get('NATIVE_DECODE', True),
            region_cache_dir=cfg.DATASET.get('REGION_CACHE_DIR', ''),
            region_cache_format=cfg.DATASET.get('REGION_CACHE_FORMAT',
                                                'jpeg'))

    stage_sched = parse_schedule(cfg.DATASET.STAGE_DATASETS)
    tf_sched = parse_schedule(cfg.DATASET.get('TEACHER_FORCE_SCHEDULE', ''))

    def make_train_dataset(epoch):
        if epoch in tf_sched:
            # Mirrors reference spec/trainer.py:573-579. (Its consumption
            # site is commented out in the reference dataset,
            # cam_dataset.py:603-604, so this only updates the hparam.)
            cfg.DATASET.TEACHER_FORCE = float(tf_sched[epoch])
            print(f'[train] teacher force -> {cfg.DATASET.TEACHER_FORCE}')
        ratios_spec = cfg.DATASET.DATASETS_AND_RATIOS
        if isinstance(ratios_spec, list):
            ratios_spec = '_'.join(str(x) for x in ratios_spec)
        if cfg.DATASET.TRAIN_DS == 'stage' and epoch in stage_sched:
            ratios_spec = stage_sched[epoch]
        if cfg.DATASET.TRAIN_DS in ('all', 'stage'):
            names, ratios = parse_datasets_ratios(ratios_spec)
            members = [build_cam_dataset(n, True) for n in names]
            if len(members) == 1:
                return members[0]
            return MixedCamDataset(members, ratios, seed=epoch)
        return build_cam_dataset(cfg.DATASET.TRAIN_DS, True)

    def make_val_loaders():
        from spec_tpu.utils.config import split_ds_names
        names = split_ds_names(cfg.DATASET.VAL_DS)
        out = {}
        for n in names:
            annot = paths.dataset_files().get(n)
            if not annot or not os.path.exists(annot):
                continue
            ds = build_cam_dataset(n, False)
            out[n] = DataLoader(
                ds, batch_size=cfg.DATASET.BATCH_SIZE,
                num_workers=cfg.DATASET.NUM_WORKERS,
                # sequential epochs iterate frame-contiguously so the
                # decode cache pays even on an unsorted npz
                group_keys=(ds.imgname
                            if cfg.DATASET.get('GROUP_BY_FRAME', False)
                            else None))
        return out

    import jax.numpy as _jnp
    model = HMR(backbone=cfg.HMR.BACKBONE, use_cam=True,
                use_cam_feats=cfg.HMR.USE_CAM_FEATS,
                dtype=getattr(_jnp, cfg.HMR.get('DTYPE', 'float32')),
                remat=cfg.TRAINING.get('REMAT', False))

    ckpt = args.ckpt or cfg.TRAINING.PRETRAINED_LIT \
        or paths.spec_checkpoint_path()
    if ckpt and os.path.exists(str(ckpt)):
        variables = load_spec_variables(str(ckpt),
                                        backbone=cfg.HMR.BACKBONE)
        print(f'[train] loaded pretrained weights from {ckpt}')
    else:
        print('[train] no pretrained ckpt; random init (the reference '
              'always starts from SPIN/PARE weights)')
        import jax.numpy as jnp
        B = 1
        variables = model.init(
            jax.random.PRNGKey(0), neutral,
            jnp.zeros((B, cfg.DATASET.IMG_RES, cfg.DATASET.IMG_RES, 3)),
            jnp.tile(jnp.eye(3), (B, 1, 1)), jnp.tile(jnp.eye(3), (B, 1, 1)),
            jnp.ones((B,)), jnp.ones((B, 2)), jnp.ones((B,)), jnp.ones((B,)))

    trainer = SpecTrainer(
        cfg, model, assets_by_gender, jreg,
        make_train_dataset, make_val_loaders, init_variables=variables)
    if args.resume or args.resume_wo_optimizer:
        trainer.resume(wo_optimizer=args.resume_wo_optimizer)
    trainer.fit(max_epochs=1 if args.fdr else None)
    return trainer


if __name__ == '__main__':
    main()
