"""SPEC training orchestration (the Lightning-free trainer).

Replaces reference ``spec/trainer.py`` (SPECTrainer LightningModule) +
``scripts/spec_train.py`` plumbing with an explicit loop:

  epoch -> rebuild train dataset (staged-dataset + teacher-force
  schedules, reference trainer.py:571-609) -> sharded jitted train steps
  over the device mesh -> periodic validation (the on-device eval loop)
  -> orbax checkpointing ranked by val loss (top-k, reference
  scripts/spec_train.py:92-98) -> TensorBoard scalars.

NaN guard: the step metrics are checked on host each log interval and
training aborts on non-finite loss (the reference relies on Lightning's
``terminate_on_nan``, scripts/spec_train.py:115).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from spec_tpu import parallel as par
from spec_tpu.core import constants as C
from spec_tpu.losses import HMRLossConfig
from spec_tpu.train.state import create_train_state, make_optimizer
from spec_tpu.train.steps import make_spec_train_step
from spec_tpu.utils.checkpoints import restore_checkpoint, save_checkpoint
from spec_tpu.utils.profiling import StepTimer


class SpecTrainer:
    def __init__(self, cfg, model, assets_by_gender, j_regressor_h36m,
                 make_train_dataset, make_val_loaders,
                 init_variables=None):
        """Args:
          cfg: resolved CfgNode (spec_default_config tree).
          model: HMR flax module.
          make_train_dataset: fn(epoch) -> dataset (handles staged
            schedules outside this class).
          make_val_loaders: fn() -> {ds_name: loader}.
          init_variables: converted pretrained variables (the reference
            always starts from PRETRAINED_LIT, scripts/spec_train.py:79-82).
        """
        self.cfg = cfg
        self.model = model
        self.assets = assets_by_gender
        self.jreg = j_regressor_h36m
        self.make_train_dataset = make_train_dataset
        self.make_val_loaders = make_val_loaders

        fsdp_group = int(getattr(cfg.TRAINING, 'FSDP_GROUP_SIZE', 0) or 0)
        if getattr(cfg.TRAINING, 'FSDP', False) and fsdp_group > 1:
            # HSDP: params/opt shard over k-device groups, replicate
            # across groups; batch shards over every device either way.
            self.mesh = par.create_hybrid_mesh(fsdp=fsdp_group)
        else:
            self.mesh = par.create_mesh()
        if (jax.process_count() > 1 and getattr(cfg.TRAINING, 'FSDP', False)
                and not (fsdp_group > 1
                         and len(jax.local_devices()) % fsdp_group == 0)):
            # Full-axis ZeRO spans hosts: state shards are not process-
            # addressable, so host-side checkpointing (device_get on
            # process 0) cannot assemble them. HSDP with within-host fsdp
            # groups keeps every shard locally addressable.
            raise SystemExit(
                'multi-host + TRAINING.FSDP requires HSDP with '
                'within-host groups: set TRAINING.FSDP_GROUP_SIZE to a '
                f'divisor of the {len(jax.local_devices())} local devices')
        n_dev = self.mesh.devices.size
        if cfg.DATASET.BATCH_SIZE % n_dev != 0:
            raise SystemExit(
                f'DATASET.BATCH_SIZE={cfg.DATASET.BATCH_SIZE} must be '
                f'divisible by the {n_dev}-device mesh (the batch axis is '
                'sharded over it) — an opaque sharding error would '
                'otherwise surface on the first batch')
        # init_pose/shape/cam are non-trainable buffers in the
        # reference — exclude them from optimization. Schedules / grad
        # clipping / accumulation are beyond-reference knobs, all off by
        # default (train/state.py make_optimizer).
        self.tx = make_optimizer(
            cfg.OPTIMIZER, freeze_buffers=True,
            grad_accum_steps=int(
                getattr(cfg.TRAINING, 'GRAD_ACCUM_STEPS', 1) or 1))
        loss_cfg = HMRLossConfig(
            shape_loss_weight=cfg.HMR.SHAPE_LOSS_WEIGHT,
            keypoint_loss_weight=cfg.HMR.KEYPOINT_LOSS_WEIGHT,
            pose_loss_weight=cfg.HMR.POSE_LOSS_WEIGHT,
            beta_loss_weight=cfg.HMR.BETA_LOSS_WEIGHT,
            openpose_train_weight=cfg.HMR.OPENPOSE_TRAIN_WEIGHT,
            gt_train_weight=cfg.HMR.GT_TRAIN_WEIGHT,
            loss_weight=cfg.HMR.LOSS_WEIGHT,
        )
        step = make_spec_train_step(
            model, assets_by_gender['neutral'], self.tx, loss_cfg)
        rep = par.replicated(self.mesh)
        self.rep = rep

        if init_variables is None:
            raise ValueError('provide init_variables (pretrained or init)')
        state = create_train_state(init_variables, self.tx)
        if getattr(cfg.TRAINING, 'FSDP', False):
            # ZeRO/FSDP: params + optimizer state sharded leaf-wise over
            # the data axis; XLA inserts all-gather/reduce-scatter from
            # the sharding annotations (see parallel.fsdp_leaf_sharding).
            state_sh = par.fsdp_shardings(state, self.mesh)
            self.state = par.shard_like(state, state_sh)
        else:
            state_sh = rep
            self.state = par.replicate(state, self.mesh)
        self.jit_step = jax.jit(
            step,
            in_shardings=(state_sh, par.batch_sharding(self.mesh), rep),
            out_shardings=(state_sh, rep),
            donate_argnums=(0,))  # reuse the old state's buffers in place

        # Multi-host: every process runs the same jitted steps (they are
        # collective); only process 0 writes checkpoints/meta/TB.
        self.is_main = jax.process_index() == 0
        self.writer = None
        if cfg.LOGDIR and self.is_main:
            try:
                from torch.utils.tensorboard import SummaryWriter
                # max_queue default is 10: on a slow-fsync filesystem
                # the writer thread's flushes back up the queue and
                # add_scalar BLOCKS THE TRAIN LOOP (profiled: 80 s of
                # queue.put waits in a 3-minute CPU run). A deep queue +
                # rare flushes decouple logging from stepping; close()
                # still drains everything at exit.
                self.writer = SummaryWriter(
                    os.path.join(cfg.LOGDIR, 'tb_logs'),
                    max_queue=100_000, flush_secs=600)
            except Exception:
                pass
        self.ckpt_dir = os.path.join(cfg.LOGDIR or '.', 'checkpoints')
        self.best: list = []  # [(val_loss, step)]

        # Fail FAST on an operator error the reference only catches at
        # validation time (spec/trainer.py:262-269): an in-the-wild val
        # dataset without image saving would SystemExit AFTER a full
        # trained epoch, losing it before the checkpoint is written.
        from spec_tpu.utils.config import split_ds_names
        itw = [n for n in split_ds_names(cfg.DATASET.VAL_DS)
               if n in ('mpii', 'coco')]
        if itw and not cfg.TESTING.SAVE_IMAGES:
            raise SystemExit(
                f'{itw} are in-the-wild datasets (no 3D GT): their '
                'evaluation is qualitative only — set '
                'TESTING.SAVE_IMAGES True (reference '
                'spec/trainer.py:262-269)')

    # ------------------------------------------------------------------

    def resume(self, wo_optimizer: bool = False):
        """Restore the latest checkpoint. ``wo_optimizer`` keeps the fresh
        optimizer state (+ step 0) and takes only params/batch_stats —
        the reference's ``--resume_wo_optimizer``
        (scripts/spec_train.py:147-149).

        Each invocation mints a fresh timestamped LOGDIR, so the crashed
        run's checkpoints are never in ``self.ckpt_dir`` — fall back to
        ``TRAINING.RESUME`` (explicit path) and then to the latest
        sibling run with checkpoints; fail LOUDLY when nothing is found."""
        from spec_tpu.utils.checkpoints import (
            find_resume_checkpoint_dir, latest_step)

        ckpt_dir, step = self.ckpt_dir, None
        if latest_step(ckpt_dir) is None:
            found = find_resume_checkpoint_dir(
                self.cfg.LOGDIR,
                explicit=self.cfg.TRAINING.get('RESUME') or None)
            ckpt_dir, step = found if found else (None, None)
        if ckpt_dir is None:
            print('[train] WARNING: --resume requested but no checkpoint '
                  'found (no TRAINING.RESUME path and no prior run with '
                  'checkpoints next to this logdir) — starting from '
                  'scratch')
            return
        try:
            restored = restore_checkpoint(ckpt_dir, self.state, step=step)
        except FileNotFoundError:
            print(f'[train] WARNING: no checkpoints in {ckpt_dir} — '
                  'starting from scratch')
            return
        print(f'[train] restoring from {ckpt_dir}'
              + (f' (pinned step {step})' if step is not None else ''))
        if wo_optimizer:
            self.state = dataclasses.replace(
                self.state, params=restored.params,
                batch_stats=restored.batch_stats)
            print('[train] resumed params/batch_stats only (fresh '
                  f'optimizer) from step {int(restored.step)}')
        else:
            self.state = restored
            print(f'[train] resumed from step {int(self.state.step)}')
        if not wo_optimizer:
            try:
                with open(os.path.join(ckpt_dir, 'meta.json')) as f:
                    meta = json.load(f)
                restored_step = str(int(restored.step))
                if restored_step in meta.get('epochs', {}):
                    self._resume_epoch = int(meta['epochs'][restored_step])
                # Sample-exact mid-epoch resume: batches already consumed
                # in the epoch being resumed (0 for epoch-end checkpoints).
                self._resume_skip = int(
                    meta.get('skip', {}).get(restored_step, 0))
                self.best = [
                    (float(e[0]), int(e[1]),
                     e[2] if len(e) > 2 else ckpt_dir)
                    for e in meta.get('ranked', [])]
            except (OSError, ValueError, KeyError):
                pass

    def _read_meta(self) -> dict:
        try:
            with open(os.path.join(self.ckpt_dir, 'meta.json')) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _write_meta(self, next_epoch: int, step: int, skip: int = 0):
        """Sidecar keyed BY STEP: resume looks up the epoch of the step
        it actually restored (ranked pruning can delete the newest
        checkpoint, so a single latest-epoch record would be wrong), and
        the top-k ranking survives the process (otherwise a resumed run
        forgets which old checkpoints it was keeping and never prunes
        them). ``skip`` = batches already consumed in ``next_epoch`` when
        the checkpoint is a mid-epoch preemption save — resume skips them
        at the loader index level so no sample is trained twice."""
        meta = self._read_meta()
        epochs = meta.get('epochs', {})
        epochs[str(int(step))] = int(next_epoch)
        meta['epochs'] = epochs
        skips = meta.get('skip', {})
        skips[str(int(step))] = int(skip)
        meta['skip'] = skips
        meta['ranked'] = [[float(v), int(st), d]
                          for v, st, d in self.best]
        try:
            with open(os.path.join(self.ckpt_dir, 'meta.json'), 'w') as f:
                json.dump(meta, f)
        except OSError:
            pass

    def _run_smplify(self, dev):
        """SPIN in-the-loop fitting (``TRAINING.RUN_SMPLIFY`` — the knobs
        the reference carries as unimplemented stubs,
        spec/config.py:131-133): predict SMPL params with the current
        network, refine them against the 2D keypoints with the jitted
        smplify loop, and swap in the fit as supervision where its
        per-joint reprojection loss beats ``SMPLIFY_THRESHOLD``."""
        from spec_tpu.core.geometry import rotmat_to_aa
        from spec_tpu.train.smplify import apply_smplify_update, smplify_fit

        if not hasattr(self, '_jit_predict'):
            def predict(variables, img, rotmat, K, scale, center, w, h):
                return self.model.apply(
                    variables, self.assets['neutral'], img, rotmat, K,
                    scale, center, w, h)
            self._jit_predict = jax.jit(predict)

        h = dev['orig_shape'][:, 0].astype(np.float32)
        w = dev['orig_shape'][:, 1].astype(np.float32)
        out = self._jit_predict(
            self.state.variables(), dev['img'], dev['cam_rotmat'],
            dev['cam_intrinsics'], dev['scale'], dev['center'], w, h)
        aa = rotmat_to_aa(out['pred_pose'])          # (B, 24, 3)
        res = smplify_fit(
            self.assets['neutral'], aa[:, :1], aa[:, 1:],
            out['pred_shape'], out['pred_cam_t'], dev['keypoints_orig'],
            dev['cam_rotmat'], dev['cam_intrinsics'],
            num_iters=int(self.cfg.TRAINING.NUM_SMPLIFY_ITERS))
        return apply_smplify_update(
            dev, res, float(self.cfg.TRAINING.SMPLIFY_THRESHOLD))

    def _device_batch(self, batch):
        mean = C.IMG_NORM_MEAN
        std = C.IMG_NORM_STD
        img = ((batch['img'] - mean) / std).astype(np.float32)
        dev = {
            'img': img,
            'pose': batch['pose'],
            'betas': batch['betas'],
            'pose_conf': batch['pose_conf'],
            'pose_3d': batch['pose_3d'],
            'keypoints_orig': batch['keypoints_orig'],
            'has_smpl': batch['has_smpl'],
            'has_pose_3d': batch['has_pose_3d'],
            'orig_shape': batch['orig_shape'].astype(np.float32),
            'scale': batch['scale'],
            'center': batch['center'],
            'cam_rotmat': batch['cam_rotmat'],
            'cam_intrinsics': batch['cam_int'],
        }
        return par.shard_batch(dev, self.mesh)

    def fit(self, max_epochs: Optional[int] = None):
        from spec_tpu.utils.preemption import GracefulShutdown

        with GracefulShutdown() as stop:
            self._fit(max_epochs, stop)

    def _fit(self, max_epochs, stop):
        from spec_tpu.data import DataLoader

        cfg = self.cfg
        max_epochs = max_epochs or cfg.TRAINING.MAX_EPOCHS
        if cfg.SEED_VALUE >= 0:
            # numpy/python too (augmentation draws) — the reference's
            # set_seed; PRNGKey alone leaves host-side RNG unseeded.
            from spec_tpu.utils.profiling import set_seed
            set_seed(cfg.SEED_VALUE)
        rng = jax.random.PRNGKey(max(cfg.SEED_VALUE, 0))
        global_step = int(self.state.step)
        # Epoch-keyed schedules (staged datasets, teacher forcing) must
        # not replay from 0 after a resume; the sidecar meta written with
        # every checkpoint records the next epoch to run.
        start_epoch = min(getattr(self, '_resume_epoch', 0), max_epochs)
        if start_epoch:
            print(f'[train] resuming at epoch {start_epoch} '
                  f'(step {global_step})')
        resume_skip = getattr(self, '_resume_skip', 0)
        self._resume_skip = 0            # consume once (this _fit only)

        for epoch in range(start_epoch, max_epochs):
            # Sample-exact continuation of a preempted epoch: the shuffle
            # is seeded by epoch, so skipping the consumed batch count at
            # the index level replays exactly the remaining samples.
            skip = resume_skip if epoch == start_epoch else 0
            batches_done = skip
            train_ds = self.make_train_dataset(epoch)
            # Frame-grouped epochs (opt-in): siblings of one frame land
            # adjacently so the dataset's decode_cache deduplicates the
            # frame decode. Only single CamDatasets expose per-sample
            # imgnames (a Mixed train set resamples members per index).
            group_keys = (train_ds.imgname
                          if cfg.DATASET.get('GROUP_BY_FRAME', False)
                          and hasattr(train_ds, 'imgname') else None)
            loader = DataLoader(
                train_ds, batch_size=cfg.DATASET.BATCH_SIZE,
                shuffle=cfg.DATASET.SHUFFLE_TRAIN,
                num_workers=cfg.DATASET.NUM_WORKERS, drop_last=True,
                seed=epoch, skip_batches=skip,
                process_id=jax.process_index(),
                process_count=jax.process_count(),
                group_keys=group_keys)
            if skip:
                print(f'[train] epoch {epoch}: skipping {skip} already-'
                      'trained batches (mid-epoch resume)')
            t0 = time.time()
            n_img = 0
            timer = StepTimer()
            batch_iter = iter(loader)
            while True:
                with timer('load'):
                    batch = next(batch_iter, None)
                if batch is None:
                    break
                # Cross-host agreement BEFORE branching into collectives
                # (save/early-return): a per-host SIGTERM latch can skew
                # by an iteration between hosts, which would pit a psum
                # against an orbax barrier — distributed deadlock.
                if par.all_processes_any(stop.requested):
                    # Preemption (SIGTERM grace window): checkpoint the
                    # in-flight state so --resume continues from here.
                    # keep=1000 matches the epoch-end path: the default
                    # recency pruning would delete ranked-retained best
                    # checkpoints (_prune_ranked keeps top-k by val loss,
                    # which includes OLD steps). save_checkpoint is a
                    # collective (orbax barriers all hosts) — every
                    # process calls it; plain-file writes are process 0's.
                    save_checkpoint(self.ckpt_dir,
                                    jax.device_get(self.state),
                                    global_step, keep=1000)
                    if self.writer:
                        # TB history must never trail the last durable
                        # checkpoint (flush_secs=600 queues up to 10 min
                        # of scalars otherwise — ADVICE r4).
                        self.writer.flush()
                    if self.is_main:
                        self._write_meta(epoch, global_step,
                                         skip=batches_done)
                        print(f'[train] preempted at step {global_step}; '
                              f'checkpoint saved to {self.ckpt_dir}')
                    return
                rng, step_rng = jax.random.split(rng)
                with timer('h2d'):
                    dev = self._device_batch(batch)
                if self.cfg.TRAINING.RUN_SMPLIFY:
                    with timer('smplify'):
                        dev = self._run_smplify(dev)
                with timer('step'):
                    # par.replicate (not plain device_put): multi-process
                    # assembles the replicated array from per-host copies
                    # (step_rng is identical everywhere — same seed/chain).
                    self.state, metrics = self.jit_step(
                        self.state, dev, par.replicate(step_rng, self.mesh))
                global_step += 1
                batches_done += 1
                n_img += cfg.DATASET.BATCH_SIZE
                if global_step % cfg.TRAINING.LOG_SAVE_INTERVAL == 0:
                    total = float(metrics['loss/total_loss'])
                    if not np.isfinite(total):
                        raise FloatingPointError(
                            f'non-finite loss at step {global_step}: '
                            f'{ {k: float(v) for k, v in metrics.items()} }')
                    ips = n_img / (time.time() - t0)
                    print(f'[train] epoch {epoch} step {global_step} '
                          f'loss {total:.3f} ({ips:.1f} img/s | '
                          f'{timer.report()})')
                    if self.writer:
                        for k, v in metrics.items():
                            self.writer.add_scalar(
                                f'train/{k}', float(v), global_step)
                if (self.writer and cfg.LOG_FREQ_TB_IMAGES > 0
                        and global_step % cfg.LOG_FREQ_TB_IMAGES == 0):
                    self._train_image_summary(batch, global_step)

            val_every = max(
                int(self.cfg.TRAINING.CHECK_VAL_EVERY_N_EPOCH), 1)
            if (epoch + 1) % val_every == 0:
                val_loss = self.validate(epoch, global_step)
                save_checkpoint(self.ckpt_dir, jax.device_get(self.state),
                                global_step, keep=1000)
                if self.is_main:
                    self._write_meta(epoch + 1, global_step)
                    self._prune_ranked(val_loss, global_step)
            else:
                save_checkpoint(self.ckpt_dir, jax.device_get(self.state),
                                global_step, keep=1000)
                if self.is_main:
                    self._write_meta(epoch + 1, global_step)
            if self.writer:
                # Flush at every checkpoint save so TB never trails the
                # last durable checkpoint (ADVICE r4).
                self.writer.flush()
        if self.writer:
            self.writer.flush()
        return self.state

    def _train_image_summary(self, batch, global_step: int,
                             max_samples: int = 4):
        """Render a multi-sample, multi-sideview prediction grid to
        TensorBoard (reference train_summaries -> RendererCam.visualize_tb,
        spec/trainer.py:173-228 + spec/utils/renderer_cam.py:221-393):
        one row per sample = [crop | overlay | 90/180/270-degree views]."""
        try:
            import numpy as _np
            from spec_tpu.utils.renderer import render_tb_grid

            variables = {
                'params': jax.device_get(self.state.params),
                'batch_stats': jax.device_get(self.state.batch_stats),
            }
            n = min(max_samples, len(batch['img']))
            img = _np.asarray(batch['img'][:n], _np.float32)
            dev_img = jnp.asarray(
                (img - C.IMG_NORM_MEAN) / C.IMG_NORM_STD)
            out = self.model.apply(
                variables, self.assets['neutral'], dev_img,
                jnp.asarray(batch['cam_rotmat'][:n]),
                jnp.asarray(batch['cam_int'][:n]),
                jnp.asarray(batch['scale'][:n]),
                jnp.asarray(batch['center'][:n]),
                jnp.asarray(batch['orig_shape'][:n, 1].astype(_np.float32)),
                jnp.asarray(batch['orig_shape'][:n, 0].astype(_np.float32)))
            res = img.shape[1]
            # batch['img'] is the bbox-centered SPIN crop, NOT a resized
            # full frame: map the full-image intrinsics through the crop
            # transform crop_px = (orig_px - ul) * res / box with
            # box = scale*200 and ul = center - box/2.
            K = _np.asarray(batch['cam_int'][:n])
            box = _np.maximum(
                _np.asarray(batch['scale'][:n], _np.float64) * 200.0, 1.0)
            sc = res / box
            ctr = _np.asarray(batch['center'][:n], _np.float64)
            ul = ctr - box[:, None] / 2.0
            fl = _np.stack([K[:, 0, 0] * sc, K[:, 1, 1] * sc], axis=1)
            cc = (K[:, :2, 2] - ul) * sc[:, None]
            grid = render_tb_grid(
                img,
                vertices=_np.asarray(out['smpl_vertices']),
                camera_translation=_np.asarray(out['pred_cam_t']),
                camera_rotation=_np.asarray(batch['cam_rotmat'][:n]),
                focal_length=fl,
                camera_center=cc,
                faces=_np.asarray(self.assets['neutral'].faces),
                max_samples=n)
            self.writer.add_image(
                'train/mesh_grid', grid.transpose(2, 0, 1), global_step)
        except Exception as e:
            print(f'[train] image summary skipped: {e}')

    def _prune_ranked(self, val_metric: float, step: int, keep: int = 30):
        """Keep the ``keep`` best checkpoints by validation metric
        (reference: ModelCheckpoint(save_top_k=30, monitor='val_loss'),
        scripts/spec_train.py:92-98). Entries carry the directory they
        were saved in: after a resume, restored entries point at the
        PREVIOUS run's checkpoints dir and must be deleted there."""
        import shutil

        if not np.isfinite(val_metric):
            return
        self.best.append((float(val_metric), step, self.ckpt_dir))
        self.best.sort(key=lambda t: t[:2])
        for _, worst_step, worst_dir in self.best[keep:]:
            shutil.rmtree(
                os.path.join(worst_dir, f'step_{worst_step:08d}'),
                ignore_errors=True)
        self.best = self.best[:keep]

    def validate(self, epoch: int, global_step: int) -> float:
        from spec_tpu.eval.eval_loop import evaluate_dataset

        variables = {
            'params': jax.device_get(self.state.params),
            'batch_stats': jax.device_get(self.state.batch_stats),
        }
        total, n_finite = 0.0, 0
        for ds_name, loader in self.make_val_loaders().items():
            summary, _ = evaluate_dataset(
                self.model, variables, loader, self.assets, self.jreg,
                use_gt_cam=self.cfg.TESTING.USE_GT_CAM,
                use_gender=self.cfg.DATASET.USE_GENDER,
                # Single-process: shard the val batches over the train
                # mesh (rows independent; the val loader batch is the
                # global BATCH_SIZE, already mesh-divisible). Multi-
                # process hosts evaluate their own loader slice
                # host-locally instead (no collectives).
                mesh=self.mesh if jax.process_count() == 1 else None,
                save_results=False,
                # multi-host: metrics run on every process (identical);
                # file artifacts are process 0's — logdir=None disables
                # writes without tripping the qualitative-dataset check
                # (save_images stays the semantic flag).
                logdir=self.cfg.LOGDIR if self.is_main else None,
                save_images=self.cfg.TESTING.SAVE_IMAGES,
                save_freq=max(int(self.cfg.TESTING.SAVE_FREQ), 1),
                dataset_name=ds_name)
            print(f'[val] epoch {epoch} {ds_name}: {summary}')
            if self.writer:
                for k, v in summary.items():
                    if np.isfinite(v):
                        self.writer.add_scalar(
                            f'val/{ds_name}/{k}', v, global_step)
            v = summary.get('val_mpjpe', np.nan)
            # NaN (e.g. an empty loader, or a qualitative/ITW dataset
            # with no 3D GT) must not poison the ranked checkpoint
            # list — sorting tuples with NaN is arbitrary and
            # _prune_ranked could evict the genuinely best checkpoints.
            if np.isfinite(v):
                total += v
                n_finite += 1
            else:
                print(f'[val] WARNING: no finite val_mpjpe for '
                      f'{ds_name}; excluded from the ranking metric')
            self._append_results_json(ds_name, epoch, summary)
        if n_finite == 0:
            # No quantitative val signal this epoch: returning a constant
            # (e.g. 0.0) would rank every epoch equal and make
            # _prune_ranked's ascending (metric, step) sort retain the 30
            # OLDEST checkpoints while deleting the newest. NaN makes
            # _prune_ranked skip ranking; recency retention still applies.
            print('[val] WARNING: no quantitative val metric produced; '
                  'skipping ranked checkpoint pruning this epoch')
            return float('nan')
        return total

    def _append_results_json(self, ds_name, epoch, summary):
        if not self.cfg.LOGDIR or not self.is_main:
            return
        path = os.path.join(
            self.cfg.LOGDIR, f'val_accuracy_results_{ds_name}.json')
        hist = []
        if os.path.exists(path):
            with open(path) as f:
                hist = json.load(f)
        hist.append({'epoch': epoch, **summary})
        with open(path, 'w') as f:
            json.dump(hist, f, indent=2, default=float)


def parse_schedule(spec: str) -> dict:
    """``'0+a_b_0.5_0.5 5+c_1.0' -> {0: 'a_b_0.5_0.5', 5: 'c_1.0'}``
    (the reference's epoch-keyed schedule strings, trainer.py:573-596).
    Whitespace-tolerant; malformed entries raise a pointed error instead
    of a bare int('')/IndexError."""
    if not spec:
        return {}
    out = {}
    for x in spec.split():
        epoch, plus, value = x.partition('+')
        if not plus or not epoch.isdigit() or not value:
            raise ValueError(
                f'malformed schedule entry {x!r} in {spec!r} — expected '
                "'<epoch>+<value>' tokens separated by spaces")
        out[int(epoch)] = value
    return out
