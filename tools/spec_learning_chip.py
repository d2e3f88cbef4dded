"""On-chip SPEC end-to-end CONVERGENCE: the committed-artifact twin of
tests/test_spec_learning_e2e.py (which runs on the forced 8-device CPU
mesh). Renders the synthetic humanoid dataset, runs the REAL
``spec_train`` -> ``spec_eval`` product path on the DEFAULT backend (the
TPU chip), and records the held-out MPJPE/PA-MPJPE *curve* — training in
resume segments and evaluating the latest checkpoint after each — to a
JSON artifact (commit as SPEC_LEARNING_r{N}.json).

Round 4 recorded a 320-step smoke (207.7 -> 153.7 mm, "it learns");
round 5 scales it to a convergence demonstration (n>=1024 rendered
samples, B=128, thousands of steps, a curve point every few hundred
steps, plateau + floor analysis). Stands in for the reference's eval
table (README.md:153-159) in a sandbox without the released
checkpoints/mocap data; unlike the bench modes this exercises training
DYNAMICS on the chip, not just step time.

Run: python tools/spec_learning_chip.py --json SPEC_LEARNING_r05.json
Smoke (r4 protocol): --n_train 256 --n_val 16 --batch 8 --epochs 10 \
    --eval_every 0
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def base_opts(batch, workers=2):
    # Keep in sync with tests/test_spec_learning_e2e.py (the CPU-mesh
    # twin). IMG_RES 64 / resnet18 bound remote-compile time; flip aug
    # stays OFF (the humanoid's left limbs are asymmetric on purpose —
    # CLAUDE.md synthetic knife-edges).
    return [
        'DATASET.VAL_DS', 'spec-mtp',
        'DATASET.BATCH_SIZE', str(batch),
        'DATASET.NUM_WORKERS', str(workers),
        'DATASET.IMG_RES', '64',
        'DATASET.FLIP_PROB', '0.0',
        'DATASET.NOISE_FACTOR', '0.0',
        'DATASET.SCALE_FACTOR', '0.0',
        'DATASET.ROT_FACTOR', '0.0',
        'DATASET.CROP_PROB', '0.0',
        'HMR.BACKBONE', 'resnet18',
        'HMR.POSE_LOSS_WEIGHT', '10.0',
        'TESTING.USE_GT_CAM', 'True',
    ]


def eval_mpjpe(log_root, opts, ckpt=''):
    from spec_tpu.cli import spec_eval
    argv = ['--log_root', log_root, '--opts'] + opts
    if ckpt:
        argv = ['--ckpt', ckpt] + argv
    r = spec_eval.main(argv)['spec-mtp']
    return {'mpjpe_mm': round(float(r['val_mpjpe']), 2),
            'pampjpe_mm': round(float(r['val_pampjpe']), 2)}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--workdir', default='')
    parser.add_argument('--n_train', type=int, default=1024)
    parser.add_argument('--n_val', type=int, default=64)
    parser.add_argument('--batch', type=int, default=128)
    parser.add_argument('--epochs', type=int, default=400,
                        help='total train epochs (n_train/batch steps '
                             'each)')
    parser.add_argument('--eval_every', type=int, default=25,
                        help='epochs per curve point (0 = single '
                             'segment, the r4 smoke protocol)')
    parser.add_argument('--lr', type=float, default=5e-4)
    parser.add_argument('--json', default='')
    args = parser.parse_args(argv)

    from spec_tpu.utils.paths import enable_compilation_cache
    enable_compilation_cache()

    work = args.workdir or tempfile.mkdtemp(prefix='spec_learning_')
    data = os.path.join(work, 'data')
    from spec_tpu.datagen.spec_synth import render_spec_synth_dataset
    if not os.path.exists(os.path.join(data, 'dataset_extras')):
        t0 = time.time()
        render_spec_synth_dataset(data, dataset='spec-syn',
                                  n=args.n_train, seed=0)
        render_spec_synth_dataset(data, dataset='spec-mtp',
                                  n=args.n_val, seed=100)
        print(f'[spec-learning] rendered {args.n_train}+{args.n_val} '
              f'samples in {time.time() - t0:.1f}s')
    os.environ['SPEC_DATA_ROOT'] = data

    opts = base_opts(args.batch)
    # Eval keeps the r4 batch (8) so its cached compile is reused and
    # curve points stay cheap.
    eval_opts = base_opts(8)

    base = eval_mpjpe(os.path.join(work, 'eval_init'), eval_opts)
    steps_per_epoch = max(1, args.n_train // args.batch)
    curve = [dict(epoch=0, step=0, **base)]
    print(f'[spec-learning] init: {base}')

    from spec_tpu.cli import spec_train
    seg = max(1, int(args.eval_every)) if args.eval_every else args.epochs
    train_opts = opts + [
        'DATASET.DATASETS_AND_RATIOS', 'spec-syn_1.0',
        'DATASET.REGION_CACHE_DIR', os.path.join(work, 'rcache'),
        'DATASET.REGION_CACHE_FORMAT', 'raw',
        'TRAINING.LOG_SAVE_INTERVAL', str(10 * steps_per_epoch),
        'OPTIMIZER.LR', str(args.lr),
    ]
    t0 = time.time()
    trainer = None
    done = 0
    while done < args.epochs:
        upto = min(done + seg, args.epochs)
        # Segmented training through the real CLI: every segment is a
        # fresh invocation that --resumes the latest sibling checkpoint
        # under the same log_root (the product crash-resume path, so the
        # curve also soak-tests it).
        seg_argv = ['--log_root', os.path.join(work, 'train'),
                    '--opts'] + train_opts + [
                    'TRAINING.MAX_EPOCHS', str(upto),
                    'TRAINING.CHECK_VAL_EVERY_N_EPOCH', str(upto + 1)]
        if done:
            seg_argv = ['--resume'] + seg_argv
        trainer = spec_train.main(seg_argv)
        done = upto
        pt = eval_mpjpe(os.path.join(work, f'eval_e{done:04d}'),
                        eval_opts, ckpt=trainer.ckpt_dir)
        curve.append(dict(epoch=done, step=int(trainer.state.step), **pt))
        print(f'[spec-learning] epoch {done}/{args.epochs} '
              f'(step {int(trainer.state.step)}): {pt} '
              f'[{time.time() - t0:.0f}s]')
    train_s = time.time() - t0

    trained = {k: curve[-1][k] for k in ('mpjpe_mm', 'pampjpe_mm')}
    tail = curve[-3:] if len(curve) >= 3 else curve
    plateau = {
        'mpjpe_mm': round(float(np.mean([p['mpjpe_mm'] for p in tail])), 2),
        'pampjpe_mm': round(float(np.mean([p['pampjpe_mm']
                                           for p in tail])), 2),
        'tail_points': len(tail),
        # flat := tail spread under 5% of its mean — "visibly flattens"
        'mpjpe_tail_spread_pct': round(
            100.0 * (max(p['mpjpe_mm'] for p in tail)
                     - min(p['mpjpe_mm'] for p in tail))
            / max(np.mean([p['mpjpe_mm'] for p in tail]), 1e-9), 1),
    }

    # Analytic localization floor of the synthetic task: one crop-pixel
    # of 2D localization noise back-projects to Z/f * (person_px /
    # crop_px) mm at the render depth — the resolution term of the
    # plateau (regressor-width + articulation-subspace terms add to it).
    z_mid, f_pix, img_res = 4.5, 400.0, 64.0
    person_px = 1.7 / z_mid * f_pix          # ~150 px on the frame
    crop_scale = 1.2 * person_px / img_res   # frame px per crop px
    floor_mm_per_crop_px = z_mid / f_pix * crop_scale * 1000.0

    import jax
    result = {
        'protocol': 'synthetic humanoid render -> segmented spec_train '
                    '(--resume) -> spec_eval curve on held-out split '
                    '(tests/test_spec_learning_e2e.py protocol, scaled; '
                    'r5 convergence artifact)',
        'n_train': args.n_train, 'n_val': args.n_val,
        'batch': args.batch, 'lr': args.lr,
        'steps': int(trainer.state.step) if trainer else 0,
        'train_wall_s': round(train_s, 1),
        'init': base,
        'trained': trained,
        'curve': curve,
        'plateau': plateau,
        'floor_analysis': {
            'mm_per_crop_px_at_depth': round(floor_mm_per_crop_px, 1),
            'note': 'one crop-pixel of joint-localization noise at the '
                    '~4.5 m render depth (f=400, 64-px crops of a '
                    f'~{person_px:.0f}-px person) back-projects to '
                    f'~{floor_mm_per_crop_px:.0f} mm — the resolution '
                    'term of the plateau; the gaussian joint regressors '
                    '(sigma~mesh-local) and the 6-joint articulated '
                    'subspace add model-capacity-independent terms, so '
                    'the plateau is bounded below by tens of mm by '
                    'construction, not by the training pipeline.',
        },
        'mpjpe_improvement_x': round(
            base['mpjpe_mm'] / trained['mpjpe_mm'], 3),
        'pampjpe_improvement_x': round(
            base['pampjpe_mm'] / trained['pampjpe_mm'], 3),
        'backend': jax.default_backend(),
        'measured_at': time.time(),
    }
    print(json.dumps(result))
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(result, f, indent=1)
    ok = (result['mpjpe_improvement_x'] > 1.2
          and result['pampjpe_improvement_x'] > 1.3)
    print(f'[spec-learning] {"PASS" if ok else "FAIL"} '
          f'(bars 1.2x/1.3x, the test tier thresholds)')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
