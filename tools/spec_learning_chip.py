"""On-chip SPEC end-to-end learnability: the committed-artifact twin of
tests/test_spec_learning_e2e.py (which runs on the forced 8-device CPU
mesh). Renders the synthetic humanoid dataset, runs the REAL
``spec_train`` -> ``spec_eval`` product path on the DEFAULT backend (the
TPU chip), and records init-vs-trained held-out MPJPE/PA-MPJPE to a JSON
artifact (commit as SPEC_LEARNING_r{N}.json).

Stands in for the reference's eval table (README.md:153-159) in a
sandbox without the released checkpoints/mocap data; unlike the bench
modes this exercises training DYNAMICS on the chip, not just step time.

Run: python tools/spec_learning_chip.py --json SPEC_LEARNING_r04.json
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

# Keep in sync with tests/test_spec_learning_e2e.py (the CPU-mesh twin).
OPTS = [
    'DATASET.VAL_DS', 'spec-mtp',
    'DATASET.BATCH_SIZE', '8',
    'DATASET.NUM_WORKERS', '2',
    'DATASET.IMG_RES', '64',
    'DATASET.FLIP_PROB', '0.0',      # asymmetric body; see spec_synth
    'DATASET.NOISE_FACTOR', '0.0',
    'DATASET.SCALE_FACTOR', '0.0',
    'DATASET.ROT_FACTOR', '0.0',
    'DATASET.CROP_PROB', '0.0',
    'HMR.BACKBONE', 'resnet18',
    'HMR.POSE_LOSS_WEIGHT', '10.0',
    'TESTING.USE_GT_CAM', 'True',
]


def eval_mpjpe(log_root, ckpt=''):
    from spec_tpu.cli import spec_eval
    argv = ['--log_root', log_root, '--opts'] + OPTS
    if ckpt:
        argv = ['--ckpt', ckpt] + argv
    r = spec_eval.main(argv)['spec-mtp']
    return {'mpjpe_mm': round(float(r['val_mpjpe']), 2),
            'pampjpe_mm': round(float(r['val_pampjpe']), 2)}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--workdir', default='')
    parser.add_argument('--n_train', type=int, default=256)
    parser.add_argument('--n_val', type=int, default=16)
    parser.add_argument('--epochs', type=int, default=10)
    parser.add_argument('--json', default='')
    args = parser.parse_args(argv)

    from spec_tpu.utils.paths import enable_compilation_cache
    enable_compilation_cache()

    work = args.workdir or tempfile.mkdtemp(prefix='spec_learning_')
    data = os.path.join(work, 'data')
    from spec_tpu.datagen.spec_synth import render_spec_synth_dataset
    if not os.path.exists(os.path.join(data, 'dataset_extras')):
        render_spec_synth_dataset(data, dataset='spec-syn',
                                  n=args.n_train, seed=0)
        render_spec_synth_dataset(data, dataset='spec-mtp',
                                  n=args.n_val, seed=100)
    os.environ['SPEC_DATA_ROOT'] = data

    base = eval_mpjpe(os.path.join(work, 'eval_init'))

    from spec_tpu.cli import spec_train
    t0 = time.time()
    trainer = spec_train.main([
        '--log_root', os.path.join(work, 'train'), '--opts'] + OPTS + [
        'DATASET.DATASETS_AND_RATIOS', 'spec-syn_1.0',
        'TRAINING.MAX_EPOCHS', str(args.epochs),
        'TRAINING.CHECK_VAL_EVERY_N_EPOCH', str(args.epochs),
        'TRAINING.LOG_SAVE_INTERVAL', '80',
        'OPTIMIZER.LR', '3e-4',
    ])
    train_s = time.time() - t0
    trained = eval_mpjpe(os.path.join(work, 'eval_trained'),
                         ckpt=trainer.ckpt_dir)

    import jax
    result = {
        'protocol': 'synthetic humanoid render -> spec_train -> '
                    'spec_eval on held-out split (tests/'
                    'test_spec_learning_e2e.py, on-chip twin)',
        'steps': int(trainer.state.step),
        'train_wall_s': round(train_s, 1),
        'init': base,
        'trained': trained,
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
