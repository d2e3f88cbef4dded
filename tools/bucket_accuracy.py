"""Stage-1 bucket resolution-sensitivity study (synthetic proxy).

The bench ladder (CLAUDE.md / README) shows throughput is ~linear in the
stage-1 pixel count: 600x800 -> 1029, 512x672 -> 1428, 448x608 -> 1748,
384x512 -> 2383 img/s/chip. The open question attached to those numbers
is ACCURACY: CamCalib was trained at min-side 600 (reference
``camcalib/pano_dataset.py`` Resize(600)), so serving at a smaller
bucket is a train/test resolution mismatch. The released checkpoint and
pano eval data are not in this sandbox, so this measures the proxy that
IS measurable here: the same architecture (ResNet + 256-bin heads, 'ce')
trained on synthetic horizon images (``spec_tpu.datagen.synthetic``) at
a native bucket, then evaluated

  (a) at the native bucket                       — baseline,
  (b) on inputs downsized by each ladder ratio   — the serving mismatch,
  (c) against a control RETRAINED at each bucket — information content.

(b)-(a) is the mismatch penalty a user pays for dropping ``min_size``
below the training resolution; (c) shows how much of it retraining at
the serving bucket recovers. Run: ``python tools/bucket_accuracy.py``
(CPU, ~15 min). Results are recorded in CLAUDE.md / README — this is a
proxy study on a synthetic task, not a released-checkpoint measurement.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402

NATIVE = (96, 128)           # 4:3 "min-side 96" stand-in for min-side 600
RATIOS = {                   # bench.py ladder, as min-side ratios
    'native (600-equiv)': 1.0,
    '512-equiv': 512 / 600,
    '448-equiv': 448 / 600,
    '384-equiv': 384 / 600,
}
VFOV = 1.2
N_TRAIN, N_VAL, BATCH, EPOCHS = 192, 128, 32, 8


def _bucket(ratio):
    return (int(round(NATIVE[0] * ratio)), int(round(NATIVE[1] * ratio)))


def _train(res_hw, seed):
    from spec_tpu.data.pano_dataset import encode_targets
    from spec_tpu.datagen.synthetic import render_horizon_batch
    from spec_tpu.models import CameraRegressorNetwork
    from spec_tpu.train import adam, create_train_state, make_camcalib_train_step

    rng = np.random.RandomState(seed)
    imgs, pitch, roll = render_horizon_batch(rng, N_TRAIN, res=res_hw,
                                             vfov=VFOV)
    model = CameraRegressorNetwork(backbone='resnet18')
    tx = adam(3e-4)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.asarray(imgs[:2]))
    state = create_train_state(variables, tx)
    step = jax.jit(make_camcalib_train_step(model, tx, loss_type='ce'))
    for _ in range(EPOCHS):
        order = rng.permutation(N_TRAIN)
        for s in range(0, N_TRAIN, BATCH):
            idx = order[s:s + BATCH]
            enc = encode_targets(np.full(len(idx), VFOV, 'f4'),
                                 pitch[idx], roll[idx], 'ce')
            state, _ = step(state, {
                'img': jnp.asarray(imgs[idx]),
                'vfov': jnp.asarray(enc['vfov']),
                'pitch': jnp.asarray(enc['pitch']),
                'roll': jnp.asarray(enc['roll'])})
    return model, {'params': state.params, 'batch_stats': state.batch_stats}


def _mae(model, variables, imgs, pitch, roll, out_hw):
    from spec_tpu.core import bins as B

    x = jnp.asarray(imgs)
    if out_hw != imgs.shape[1:3]:
        x = jax.image.resize(
            x, (len(imgs), *out_hw, 3), method='bilinear')
    logits = model.apply(variables, x, train=False)
    _, p, r = B.convert_preds_to_angles(*logits, loss_type='ce')
    return (float(np.abs(np.asarray(p) - pitch).mean()),
            float(np.abs(np.asarray(r) - roll).mean()))


def main():
    from spec_tpu.datagen.synthetic import render_horizon_batch

    rng = np.random.RandomState(1234)
    val_imgs, val_pitch, val_roll = render_horizon_batch(
        rng, N_VAL, res=NATIVE, vfov=VFOV)

    print(f'training reference model at native {NATIVE} ...')
    model, variables = _train(NATIVE, seed=0)

    print(f'{"bucket":<20} {"hw":>10} {"mismatch MAE p/r":>20} '
          f'{"retrained MAE p/r":>20}')
    base = None
    for name, ratio in RATIOS.items():
        hw = _bucket(ratio)
        mp, mr = _mae(model, variables, val_imgs, val_pitch, val_roll, hw)
        if ratio == 1.0:
            base = (mp, mr)
            rp, rr = mp, mr
        else:
            # control: same recipe, trained and evaluated AT the bucket
            m2, v2 = _train(hw, seed=0)
            v_imgs2 = jax.image.resize(
                jnp.asarray(val_imgs), (N_VAL, *hw, 3), method='bilinear')
            rp, rr = _mae(m2, v2, np.asarray(v_imgs2), val_pitch,
                          val_roll, hw)
        print(f'{name:<20} {str(hw):>10} '
              f'{mp:>9.4f}/{mr:.4f} {rp:>12.4f}/{rr:.4f} rad')
    print(f'\nnative baseline MAE pitch/roll: '
          f'{base[0]:.4f}/{base[1]:.4f} rad')
    print('mismatch column = native-trained model fed downsized inputs '
          '(what dropping min_size does); retrained column = recipe '
          'retrained at that bucket (information ceiling).')


if __name__ == '__main__':
    main()
