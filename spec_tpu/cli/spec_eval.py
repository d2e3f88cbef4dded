"""SPEC evaluation CLI (reference ``scripts/spec_eval.py``).

Two passes, both on device (SURVEY.md §3.3):
  1. the in-loop pass: batched model forward + gendered GT SMPL + J14/J24
     metrics, accumulated per dataset and dumped as
     ``evaluation_results_{ds}.pkl``;
  2. the offline headline pass (``compute_error``): world/cam-frame
     W-MPJPE / PA-MPJPE / W-PVE from the dumped vertices + the predicted
     camera rotations — the numbers in the reference README table.

Usage:
  python -m spec_tpu.cli.spec_eval --cfg cfg.yaml \
      --opts DATASET.VAL_DS 3dpw-test-cam TESTING.USE_GT_CAM False
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description='SPEC eval (TPU)')
    parser.add_argument('--cfg', type=str, default=None)
    parser.add_argument('--opts', nargs='*', default=[])
    parser.add_argument('--cfg_id', type=int, default=0)
    parser.add_argument('--ckpt', type=str, default='')
    parser.add_argument('--log_root', type=str, default='logs')
    parser.add_argument('--resume', action='store_true',
                        help='accepted for reference CLI parity (eval '
                             'loads --ckpt / config checkpoints)')
    parser.add_argument('--resume_wo_optimizer', action='store_true',
                        help='accepted for reference CLI parity')
    parser.add_argument('--fdr', action='store_true',
                        help='fast dev run: one batch per dataset '
                             '(reference scripts/spec_eval.py:102)')
    parser.add_argument('--data_parallel', action='store_true',
                        help='shard every eval batch over ALL visible '
                             'devices (params replicated; BATCH_SIZE '
                             'must divide the device count). The '
                             'reference pins eval to one GPU '
                             '(scripts/spec_eval.py:72-75)')
    parser.add_argument('--coordinator_address', type=str, default='',
                        help='multi-host eval: host:port of process 0 '
                             '(jax.distributed, same flags as '
                             'spec_train). Each host evaluates the full '
                             'val set host-locally (metrics identical '
                             'everywhere); process 0 writes the '
                             'artifacts. On Cloud TPU pods omit all '
                             'three flags — jax auto-detects')
    parser.add_argument('--num_processes', type=int, default=None,
                        help='multi-host: total process count')
    parser.add_argument('--process_id', type=int, default=None,
                        help='multi-host: this process\'s rank')
    from spec_tpu.cli._compat import add_cluster_flags
    add_cluster_flags(parser)
    args = parser.parse_args(argv)

    if args.coordinator_address:
        # BEFORE any jax backend touch (spec_train does the same).
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
        args.cfg, spec_default_config(), script='spec_eval.py',
        cfg_id=args.cfg_id, opts=args.opts, log_root=args.log_root)
    cfg.RUN_TEST = True

    import jax

    is_main = jax.process_index() == 0
    if jax.process_count() > 1:
        # One agreed artifact dir (every process minted its own
        # timestamped LOGDIR) — take process 0's, like spec_train.
        from spec_tpu import parallel as _par
        cfg.LOGDIR = _par.broadcast_string(cfg.LOGDIR)
        if is_main:
            os.makedirs(cfg.LOGDIR, exist_ok=True)
        if args.data_parallel:
            raise SystemExit(
                '--data_parallel shards batches over a single-process '
                'mesh; under multi-host eval each process evaluates the '
                'full val set host-locally instead (metrics identical '
                'everywhere, artifacts from process 0) — drop the flag')
    from spec_tpu.core import smpl as S
    from spec_tpu.data import CamDataset, DataLoader
    from spec_tpu.eval.eval_loop import evaluate_dataset
    from spec_tpu.eval.evaluator import compute_error
    from spec_tpu.models import HMR
    from spec_tpu.utils import paths
    from spec_tpu.utils.checkpoints import load_spec_variables

    # SMPL assets (gendered when available).
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
        print(f'[eval] WARNING: SMPL assets missing at {smpl_dir}; '
              'using synthetic test assets')
        assets_by_gender = {'neutral': S.create_test_assets()}

    jreg_path = paths.j_regressor_h36m_path()
    if os.path.exists(jreg_path):
        jreg = np.load(jreg_path)
    else:
        neutral = assets_by_gender['neutral']
        assert neutral.j_regressor_h36m is not None, (
            f'J_regressor_h36m not found at {jreg_path}')
        jreg = np.asarray(neutral.j_regressor_h36m)

    import jax.numpy as _jnp
    model = HMR(backbone=cfg.HMR.BACKBONE, use_cam=True,
                use_cam_feats=cfg.HMR.USE_CAM_FEATS,
                dtype=getattr(_jnp, cfg.HMR.get('DTYPE', 'float32')))
    ckpt = args.ckpt or paths.spec_checkpoint_path()
    from spec_tpu.utils.checkpoints import latest_step, load_orbax_variables
    if os.path.isdir(ckpt) and latest_step(ckpt) is not None:
        # A spec_train orbax checkpoint dir (<logdir>/checkpoints) — the
        # native train->eval product path.
        variables = load_orbax_variables(ckpt)
        print(f'[eval] loaded orbax checkpoint from {ckpt} '
              f'(step {latest_step(ckpt)})')
    elif os.path.exists(ckpt):
        variables = load_spec_variables(ckpt, backbone=cfg.HMR.BACKBONE)
    else:
        print(f'[eval] WARNING: checkpoint {ckpt} missing; random init')
        import jax.numpy as jnp
        B = 1
        variables = model.init(
            jax.random.PRNGKey(0), assets_by_gender['neutral'],
            jnp.zeros((B, cfg.DATASET.IMG_RES, cfg.DATASET.IMG_RES, 3)),
            jnp.tile(jnp.eye(3), (B, 1, 1)), jnp.tile(jnp.eye(3), (B, 1, 1)),
            jnp.ones((B,)), jnp.ones((B, 2)), jnp.ones((B,)), jnp.ones((B,)))

    mesh = None
    if args.data_parallel:
        import spec_tpu.parallel as par

        mesh = par.create_mesh()
        n_dev = int(mesh.devices.size)
        if int(cfg.DATASET.BATCH_SIZE) % n_dev:
            raise SystemExit(
                f'--data_parallel: DATASET.BATCH_SIZE '
                f'{cfg.DATASET.BATCH_SIZE} must be a multiple of the '
                f'{n_dev}-device mesh')
        print(f'[eval] data_parallel over {n_dev} devices')

    from spec_tpu.utils.config import split_ds_names
    val_ds = split_ds_names(cfg.DATASET.VAL_DS)
    all_results = {}
    for ds_name in val_ds:
        annot = paths.dataset_files().get(ds_name)
        img_dir = paths.dataset_folders().get(ds_name)
        if not annot or not os.path.exists(annot):
            print(f'[eval] dataset {ds_name}: annotations not found '
                  f'({annot}); skipping')
            continue
        # NUM_IMAGES > 0 subsamples (reference config key); --fdr = one
        # batch.
        num_images = max(int(cfg.DATASET.get('NUM_IMAGES', -1)), 0)
        if args.fdr:
            num_images = int(cfg.DATASET.BATCH_SIZE)
        ds = CamDataset(annot, img_dir, dataset=ds_name, is_train=False,
                        img_res=cfg.DATASET.IMG_RES,
                        render_res=cfg.DATASET.RENDER_RES,
                        num_images=num_images,
                        emit_disp_img=cfg.TESTING.SAVE_IMAGES,
                        decode_cache=cfg.DATASET.get('DECODE_CACHE', 0),
                        native_decode=cfg.DATASET.get('NATIVE_DECODE',
                                                      True))
        if not cfg.TESTING.USE_GT_CAM and ds.camcalib_pitch is None:
            # Without camcalib_* columns the 'predicted camera' silently
            # degrades to the identity-rotation f=5000 fallback and the
            # W-frame numbers are meaningless — say so loudly.
            print(f'[eval] WARNING: {ds_name} has no camcalib_* columns '
                  'but TESTING.USE_GT_CAM=False — the predicted camera '
                  'falls back to identity/f=5000. Generate the columns '
                  'with: spec_annotate_camcalib --npz '
                  f'{annot} --img_dir {img_dir}')
        loader = DataLoader(ds, batch_size=cfg.DATASET.BATCH_SIZE,
                            num_workers=cfg.DATASET.NUM_WORKERS)
        t0 = time.perf_counter()
        summary, acc = evaluate_dataset(
            model, variables, loader, assets_by_gender, jreg,
            use_gt_cam=cfg.TESTING.USE_GT_CAM,
            use_gender=cfg.DATASET.USE_GENDER,
            mesh=mesh,
            save_results=cfg.TESTING.SAVE_RESULTS,
            save_images=cfg.TESTING.SAVE_IMAGES,
            save_freq=cfg.TESTING.SAVE_FREQ,
            # multi-host: every process computes (identical) metrics;
            # logdir=None suppresses file artifacts off process 0
            logdir=cfg.LOGDIR if is_main else None,
            dataset_name=ds_name)
        dt = time.perf_counter() - t0
        print(f'[eval] {ds_name}: {summary} '
              f'({len(ds) / max(dt, 1e-6):.1f} img/s)')

        # Offline headline pass (reference compute_error).
        res = acc.results_dict()
        if cfg.TESTING.SAVE_RESULTS and len(res.get('vertices', [])):
            pred_rotmats = _pred_rotmats(ds)
            headline = compute_error(
                ds_name,
                pred_vertices=np.asarray(res['vertices'], np.float32),
                pred_cam_rotmat=pred_rotmats[:len(res['vertices'])],
                gt_pose=ds.pose, gt_betas=ds.betas,
                assets=assets_by_gender['neutral'],
                j_regressor_h36m=jreg,
                gt_pose_cam=_pose_cam(ds),
                gt_cam_rotmat=(np.asarray(ds.cam_rotmat, np.float32)
                               if ds.cam_rotmat is not None else None))
            print(f'[eval] {ds_name} headline: {headline}')
            summary.update({f'headline_{k}': v
                            for k, v in headline.items() if k != 'protocol'})
        all_results[ds_name] = summary

        if is_main:
            _save_best_results(cfg.LOGDIR, ds_name, summary)

    print(json.dumps(all_results, indent=2, default=float))
    return all_results


def _pred_rotmats(ds) -> np.ndarray:
    """Per-sample predicted camera rotations from the camcalib columns
    (what the reference reads from data/camcalib/{ds}_cam_rotmat.pkl)."""
    from spec_tpu.data.cam_dataset import _euler_pitch_roll

    n = len(ds)
    out = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    if ds.camcalib_pitch is not None and ds.camcalib_roll is not None:
        for i in range(n):
            out[i] = _euler_pitch_roll(
                float(ds.camcalib_pitch[i]), float(ds.camcalib_roll[i]))
    return out


def _pose_cam(ds):
    """Cam-frame GT pose when the annots carry one (3dpw/mtp; reference
    compute_error.py:166-181)."""
    return ds.pose_cam


def _save_best_results(logdir, ds_name, summary):
    """Running-best JSON (reference val_accuracy_results*.json,
    trainer.py:655-668)."""
    path = os.path.join(logdir, f'val_accuracy_results_{ds_name}.json')
    history = []
    if os.path.exists(path):
        with open(path) as f:
            history = json.load(f)
    history.append(summary)
    with open(path, 'w') as f:
        json.dump(history, f, indent=2, default=float)


if __name__ == '__main__':
    main()
