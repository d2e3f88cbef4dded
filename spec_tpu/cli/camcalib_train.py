"""CamCalib training CLI (reference ``scripts/camcalib_train.py`` +
``camcalib/trainer.py``).

The reference's multi-GPU story is single-process DataParallel with the
batch size pre-multiplied by the GPU count (:36-37,73-75); here the global
batch is sharded over the full device mesh by pjit — the same program on
1 or N chips. Variable image sizes are handled by shape-bucketed batches
(one compiled step per bucket) instead of per-batch dynamic padding.

Validation decodes bins -> angles on device and reports mean absolute
error in degrees (reference camcalib/trainer.py:104-116).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description='CamCalib train (TPU)')
    parser.add_argument('--cfg', type=str, default=None)
    parser.add_argument('--opts', nargs='*', default=[])
    parser.add_argument('--cfg_id', type=int, default=0)
    parser.add_argument('--log_root', type=str, default='logs')
    parser.add_argument('--resume', action='store_true',
                        help='resume from the latest orbax checkpoint')
    parser.add_argument('--fdr', action='store_true')
    parser.add_argument('--coordinator_address', type=str, default='',
                        help='multi-host training: host:port of process 0 '
                             '(jax.distributed). On Cloud TPU pods omit — '
                             'jax auto-detects')
    parser.add_argument('--num_processes', type=int, default=None)
    parser.add_argument('--process_id', type=int, default=None)
    from spec_tpu.cli._compat import add_cluster_flags
    add_cluster_flags(parser, num_gpus=True)
    args = parser.parse_args(argv)

    if args.coordinator_address:
        from spec_tpu import parallel as par_init
        par_init.initialize_multihost(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes, process_id=args.process_id)

    from spec_tpu.utils.paths import enable_compilation_cache
    enable_compilation_cache()

    from spec_tpu.utils.config import (
        camcalib_default_config,
        resolve_camcalib_loss,
        run_grid_search_experiments,
    )

    cfg = run_grid_search_experiments(
        args.cfg, camcalib_default_config(), script='camcalib_train.py',
        cfg_id=args.cfg_id, opts=args.opts, log_root=args.log_root)

    import jax

    if jax.process_count() > 1:
        # one agreed LOGDIR (process 0's) — see spec_train.py
        from spec_tpu import parallel as _par
        cfg.LOGDIR = _par.broadcast_string(cfg.LOGDIR)
        os.makedirs(cfg.LOGDIR, exist_ok=True)
    import jax.numpy as jnp
    from spec_tpu import parallel as par
    from spec_tpu.core import bins as B
    from spec_tpu.data.pano_agora_dataset import PanoAgoraDataset
    from spec_tpu.data.pano_dataset import CameraRegressorDataset, pad_collate
    from spec_tpu.models import CameraRegressorNetwork
    from spec_tpu.train import (create_train_state, make_camcalib_train_step,
                                make_optimizer)
    from spec_tpu.utils import paths
    from spec_tpu.utils.checkpoints import save_checkpoint

    loss_type = resolve_camcalib_loss(cfg)

    def build_dataset(is_train):
        folder = paths.dataset_folders().get('pano360', 'data/pano360')
        decode_cache = int(cfg.DATASET.get('DECODE_CACHE', 0) or 0)
        num_images = int(cfg.DATASET.get('NUM_IMAGES', -1) or -1)
        if cfg.DATASET.TRAIN_DS == 'pano_agora':
            return PanoAgoraDataset(
                folder, is_train=is_train, min_size=cfg.DATASET.MIN_RES,
                max_size=cfg.DATASET.MAX_RES, loss_type=loss_type,
                decode_cache=decode_cache, num_images=num_images,
                device_jitter=(is_train
                               and cfg.DATASET.get('DEVICE_JITTER',
                                                   False)))
        return CameraRegressorDataset(
            folder, dataset=cfg.DATASET.TRAIN_DS, is_train=is_train,
            min_size=cfg.DATASET.MIN_RES, max_size=cfg.DATASET.MAX_RES,
            loss_type=loss_type,
            fast_decode=(is_train
                         and cfg.DATASET.get('FAST_DECODE', False)),
            decode_cache=decode_cache, num_images=num_images,
            # TRAIN only: the val path stays host-normalized f32 (exact,
            # and _val_infer shares the plain-image graph)
            device_jitter=(is_train
                           and cfg.DATASET.get('DEVICE_JITTER', False)))

    train_ds = build_dataset(True)
    val_ds = build_dataset(False)

    model = CameraRegressorNetwork(
        backbone=cfg.MODEL.BACKBONE,
        num_fc_layers=cfg.MODEL.NUM_FC_LAYERS,
        num_fc_channels=cfg.MODEL.NUM_FC_CHANNELS,
        dtype=getattr(jnp, cfg.MODEL.get('DTYPE', 'float32')))
    tx = make_optimizer(
        cfg.OPTIMIZER,
        grad_accum_steps=int(
            cfg.TRAINING.get('GRAD_ACCUM_STEPS', 1) or 1))

    mesh = par.create_mesh()
    rep = par.replicated(mesh)
    ex = jnp.zeros((1, cfg.DATASET.MIN_RES, cfg.DATASET.MIN_RES, 3))
    variables = model.init(jax.random.PRNGKey(0), ex)

    pretrained = cfg.TRAINING.get('PRETRAINED') or None
    if pretrained and not args.resume:
        # Fine-tune initialization (the shipped min448/min384 recipes:
        # configs/camcalib/config_sa_bias_l2_min{448,384}.yaml point
        # TRAINING.PRETRAINED at the min-600 checkpoint). Torch files
        # (the released camcalib_sa_biased_l2.ckpt) go through the
        # converter; an orbax checkpoint dir restores params/batch_stats
        # only — step and optimizer state start fresh.
        from spec_tpu.utils.checkpoints import (
            load_camcalib_variables,
            restore_checkpoint,
        )

        if os.path.isdir(pretrained):
            prev = restore_checkpoint(
                pretrained, create_train_state(variables, tx))
            variables = {'params': prev.params,
                         'batch_stats': prev.batch_stats}
        else:
            variables = load_camcalib_variables(
                pretrained, backbone=cfg.MODEL.BACKBONE,
                num_fc_layers=cfg.MODEL.NUM_FC_LAYERS,
                template=variables)
        print(f'[camcalib-train] fine-tune init from {pretrained}')
    state = par.replicate(create_train_state(variables, tx), mesh)

    step = make_camcalib_train_step(
        model, tx, loss_type=loss_type,
        vfov_loss_weight=cfg.MODEL.get('LOSS_VFOV_WEIGHT', 1.0),
        pitch_loss_weight=cfg.MODEL.get('LOSS_PITCH_WEIGHT', 1.0),
        roll_loss_weight=cfg.MODEL.get('LOSS_ROLL_WEIGHT', 1.0))
    jit_step = jax.jit(step, in_shardings=(rep, par.batch_sharding(mesh)),
                       out_shardings=(rep, rep), donate_argnums=(0,))

    ckpt_dir = os.path.join(cfg.LOGDIR, 'checkpoints')
    if args.resume:
        from spec_tpu.utils.checkpoints import (
            find_resume_checkpoint_dir, latest_step, restore_checkpoint)
        if latest_step(ckpt_dir) is not None:
            src, pinned = ckpt_dir, None
        else:
            found = find_resume_checkpoint_dir(
                cfg.LOGDIR, explicit=cfg.TRAINING.get('RESUME') or None)
            src, pinned = found if found else (None, None)
        if src is None:
            print('[camcalib-train] WARNING: --resume requested but no '
                  'checkpoint found — starting from scratch')
        else:
            state = restore_checkpoint(src, state, step=pinned)
            print(f'[camcalib-train] resumed from {src} at step '
                  f'{int(state.step)}')
    max_epochs = 1 if args.fdr else cfg.TRAINING.MAX_EPOCHS
    # Continue the true training step count (checkpoint numbering, logs)
    # and skip epochs the restored run already completed. Steps/epoch is
    # the ACTUAL bucketed-batch count: each shape bucket yields
    # ceil(len(bucket)/B) padded batches (len(ds)//B would undercount and
    # over-skip epochs that never ran).
    global_step = int(state.step)
    bsz = cfg.DATASET.BATCH_SIZE
    steps_per_epoch = max(sum(
        (len(idxs) + bsz - 1) // bsz
        for idxs in train_ds.shape_buckets().values()), 1)
    start_epoch = min(global_step // steps_per_epoch, max_epochs)
    # Sample-exact mid-epoch resume: the bucketed batch order is seeded
    # by epoch, so the leftover step count maps 1:1 onto index chunks to
    # skip (no sample trained twice, none missed).
    skip_first = global_step - start_epoch * steps_per_epoch
    if start_epoch or skip_first:
        print(f'[camcalib-train] skipping {start_epoch} completed '
              f'epoch(s) + {skip_first} batch(es) '
              f'({steps_per_epoch} steps/epoch)')

    from spec_tpu.utils.preemption import GracefulShutdown

    with GracefulShutdown() as stop_ctx:
        return _train_epochs(
            cfg, args, stop_ctx, state, jit_step, mesh, par, jnp, model,
            train_ds, val_ds, loss_type, B, ckpt_dir, save_checkpoint,
            jax, max_epochs, start_epoch, global_step, skip_first)


def _train_epochs(cfg, args, stop_ctx, state, jit_step, mesh, par, jnp,
                  model, train_ds, val_ds, loss_type, B, ckpt_dir,
                  save_checkpoint, jax, max_epochs, start_epoch,
                  global_step, skip_first=0):
    @jax.jit
    def _val_infer(variables, img):
        logits = model.apply(variables, img)
        return B.convert_preds_to_angles(*logits, loss_type=loss_type)

    # Multi-host: the train batches are process-sharded (each host loads
    # its slice, parallel.shard_batch assembles the global array); only
    # process 0 writes checkpoints/artifacts; validation runs identically
    # on every host from host-local params (no collectives).
    is_main = jax.process_index() == 0

    for epoch in range(start_epoch, max_epochs):
        t0 = time.time()
        for batch in _bucketed_batches(
                train_ds, cfg.DATASET.BATCH_SIZE, shuffle=True, seed=epoch,
                num_workers=cfg.DATASET.NUM_WORKERS,
                max_res=cfg.DATASET.MAX_RES,
                skip=(skip_first if epoch == start_epoch else 0),
                process_id=jax.process_index(),
                process_count=jax.process_count()):
            # cross-host agreement before the collective save/return path
            # (see parallel.all_processes_any)
            if par.all_processes_any(stop_ctx.requested):
                # save_checkpoint is an orbax collective: all processes
                # call it; process 0 does the logging.
                save_checkpoint(ckpt_dir, jax.device_get(state),
                                global_step)
                if is_main:
                    print(f'[camcalib-train] preempted at step '
                          f'{global_step}; checkpoint saved to {ckpt_dir}')
                return state
            dev = {
                'img': batch['img'],
                'vfov': batch['vfov'],
                'pitch': batch['pitch'],
                'roll': batch['roll'],
            }
            if 'jitter_A' in batch:
                # DEVICE_JITTER: u8 frames + per-image affines; the pad
                # mask is rebuilt on device from true_shape (8 bytes/
                # sample — shipping the f32 mask would hand back most
                # of the u8 transfer saving)
                dev['jitter_A'] = batch['jitter_A']
                dev['jitter_b'] = batch['jitter_b']
                dev['true_shape'] = batch['true_shape']
            state, metrics = jit_step(state, par.shard_batch(dev, mesh))
            global_step += 1
            log_every = int(cfg.TRAINING.get('LOG_SAVE_INTERVAL', 50))
            if global_step % max(log_every, 1) == 0 or args.fdr:
                loss = float(metrics['loss'])
                if not np.isfinite(loss):
                    raise FloatingPointError(f'non-finite loss: {metrics}')
                print(f'[camcalib-train] epoch {epoch} step {global_step} '
                      f'loss {loss:.4f}')
            if args.fdr and global_step >= 2:
                break

        # Validation: decoded-angle MAE in degrees (every
        # CHECK_VAL_EVERY_N_EPOCH epochs, reference camcalib_train.py:84).
        val_every = max(int(cfg.TRAINING.get('CHECK_VAL_EVERY_N_EPOCH', 1)),
                        1)
        if not args.fdr and (epoch + 1) % val_every != 0:
            save_checkpoint(ckpt_dir, jax.device_get(state), global_step)
            continue
        errs = {'vfov': [], 'pitch': [], 'roll': []}
        if jax.process_count() > 1:
            # Host-local copies: the val jit then runs per-process with no
            # collectives (replicated state is process-addressable), every
            # host computing the identical full-val MAE.
            variables_now = {
                'params': jax.device_get(state.params),
                'batch_stats': jax.device_get(state.batch_stats)}
        else:
            variables_now = {
                'params': state.params,
                'batch_stats': state.batch_stats}
        first_val_batch = None
        first_val_pred = None
        for batch in _bucketed_batches(
                val_ds, cfg.DATASET.BATCH_SIZE, shuffle=False, seed=0,
                num_workers=cfg.DATASET.NUM_WORKERS,
                max_res=cfg.DATASET.MAX_RES):
            # Jitted (one compile per shape bucket): eager model.apply
            # dispatches the whole ResNet op-by-op — catastrophic through
            # a remote-execution tunnel.
            vfov, pitch, roll = _val_infer(
                variables_now, jnp.asarray(batch['img']))
            if first_val_batch is None:
                first_val_batch = batch
                first_val_pred = (np.asarray(vfov), np.asarray(pitch),
                                  np.asarray(roll))
            # Tail chunks are padded by repeating the last sample —
            # count each real sample once in the MAE / CDFs.
            n_valid = int(batch.get('valid_count', len(batch['img'])))
            for k, pred in zip(('vfov', 'pitch', 'roll'),
                               (vfov, pitch, roll)):
                gt = batch[f'{k}_angle'][:n_valid]
                errs[k] += np.degrees(
                    np.abs(np.asarray(pred)[:n_valid] - gt)).tolist()
            if args.fdr:
                break
        mae = {k: float(np.mean(v)) for k, v in errs.items() if v}
        print(f'[camcalib-val] epoch {epoch} MAE(deg): {mae}')
        if is_main:
            # Observability artifacts: error CDFs (reference vis_utils CDF
            # plot) — per-angle, per-epoch.
            try:
                from spec_tpu.utils.vis import plot_error_cdf
                vis_dir = os.path.join(cfg.LOGDIR, 'val_images')
                os.makedirs(vis_dir, exist_ok=True)
                for k, v in errs.items():
                    if v:
                        plot_error_cdf(
                            v, os.path.join(vis_dir,
                                            f'cdf_{k}_epoch{epoch}.png'),
                            label=k)
            except Exception as e:
                print(f'[camcalib-val] cdf plots skipped: {e}')
            # GT (green) vs predicted (yellow) horizon overlays for the
            # first val batch (reference camcalib/trainer.py:118-169
            # renders these each validation epoch).
            if first_val_batch is not None:
                try:
                    _save_horizon_dumps(
                        first_val_batch, first_val_pred,
                        os.path.join(cfg.LOGDIR, 'val_images'), epoch)
                except Exception as e:
                    print(f'[camcalib-val] horizon dumps skipped: {e}')
        save_checkpoint(ckpt_dir, jax.device_get(state), global_step)
        if args.fdr:
            break
    return state


def _save_horizon_dumps(batch, pred_angles, vis_dir, epoch, max_n=4):
    """Save GT-vs-pred horizon overlays (un-normalize, crop the padding)."""
    from PIL import Image

    from spec_tpu.core import constants as C
    from spec_tpu.utils.vis import gt_vs_pred_horizon

    os.makedirs(vis_dir, exist_ok=True)
    vfov, pitch, roll = pred_angles
    for i in range(min(max_n, len(batch['img']))):
        img = np.asarray(batch['img'][i], np.float32)
        img = (img * C.IMG_NORM_STD + C.IMG_NORM_MEAN) * 255.0
        if 'pad_mask' in batch:
            m = np.asarray(batch['pad_mask'][i])
            h = max(int(m.any(axis=1).sum()), 1)
            w = max(int(m.any(axis=0).sum()), 1)
            img = img[:h, :w]
        img = np.clip(img, 0, 255).astype(np.uint8)
        out = gt_vs_pred_horizon(
            img,
            (float(batch['vfov_angle'][i]), float(batch['pitch_angle'][i]),
             float(batch['roll_angle'][i])),
            (float(vfov[i]), float(pitch[i]), float(roll[i])))
        Image.fromarray(out).save(
            os.path.join(vis_dir, f'horizon_e{epoch:03d}_{i}.png'))


def _bucketed_batches(dataset, batch_size, shuffle, seed, num_workers,
                      max_res, skip=0, process_id=0, process_count=1):
    """Group indices by padded shape bucket, then batch within buckets —
    each bucket shape compiles once. ``skip`` drops the first k chunks at
    the index level (sample-exact mid-epoch resume, zero IO for the
    skipped part; the order is fully determined by ``seed``).
    ``process_id``/``process_count``: multi-host — the global chunking is
    seed-identical on every host, each host fetches only its contiguous
    slice of every chunk (see data/loader.py DataLoader for the same
    contract); ``valid_count`` becomes this process's real-sample count."""
    import concurrent.futures as cf

    from spec_tpu.data.loader import shard_index_chunk
    from spec_tpu.data.pano_dataset import pad_collate

    buckets = dataset.shape_buckets()
    rng = np.random.RandomState(seed)
    order = list(buckets.items())
    if shuffle:
        rng.shuffle(order)
    with cf.ThreadPoolExecutor(max(1, num_workers)) as pool:
        for bucket_hw, idxs in order:
            idxs = list(idxs)
            if shuffle:
                rng.shuffle(idxs)
            for s in range(0, len(idxs), batch_size):
                if skip > 0:
                    skip -= 1
                    continue
                local, n_valid = shard_index_chunk(
                    idxs[s:s + batch_size], batch_size,
                    process_id, process_count)
                # fetch only real entries; pad rows repeat the last item
                real = local[:n_valid] if n_valid else local[:1]
                items = list(pool.map(dataset.__getitem__, real))
                while len(items) < len(local):
                    items.append(items[-1])
                batch = pad_collate(items, fixed_hw=bucket_hw)
                batch['valid_count'] = n_valid
                yield batch


if __name__ == '__main__':
    main()
