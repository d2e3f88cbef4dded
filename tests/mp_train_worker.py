"""Multi-process (multi-host stand-in) camcalib train worker.

Spawned by tests/test_multiprocess.py as N coordinated processes (gloo
CPU collectives). Each process: initialize jax.distributed, build the
GLOBAL device mesh, feed its process-LOCAL data shard through
``parallel.shard_batch`` (which assembles the global array), run K train
steps, and (process 0) dump the final params for comparison against a
single-process run over the identical global batches.

Not a pytest file (no ``test_`` prefix): imported by the test for the
shared dataset/model definitions, executed as ``__main__`` by the
subprocesses.
"""

from __future__ import annotations

import os
import sys

import numpy as np

IMG = 32
N_SAMPLES = 24
GLOBAL_BATCH = 8
STEPS = 3


class SynthCamDataset:
    """Deterministic synthetic camcalib samples, keyed only by index."""

    def __len__(self):
        return N_SAMPLES

    def __getitem__(self, i):
        rng = np.random.RandomState(1000 + int(i))
        return {
            'img': rng.randn(IMG, IMG, 3).astype(np.float32),
            'vfov': np.float32(rng.uniform(-1, 1)),
            'pitch': np.float32(rng.uniform(-1, 1)),
            'roll': np.float32(rng.uniform(-1, 1)),
        }


def build(jax):
    """Model/optimizer/state/step shared by the worker and the reference
    run (identical PRNG seed -> identical init on every process)."""
    import jax.numpy as jnp
    import optax

    from spec_tpu.models import CameraRegressorNetwork
    from spec_tpu.train import create_train_state, make_camcalib_train_step

    model = CameraRegressorNetwork(backbone='resnet18')
    # SGD, not adam: the update is linear in the gradient, so cross-
    # topology float-association noise stays at eps scale instead of
    # being amplified by m/sqrt(v) in the early steps (same choice as
    # the FSDP layout test).
    tx = optax.sgd(1e-2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 3)))
    state = create_train_state(variables, tx)
    step = make_camcalib_train_step(model, tx)
    return state, step


def run_steps(jax, mesh, state, step, process_id, process_count):
    from spec_tpu import parallel as par
    from spec_tpu.data import DataLoader

    rep = par.replicated(mesh)
    jit_step = jax.jit(step, in_shardings=(rep, par.batch_sharding(mesh)),
                       out_shardings=(rep, rep), donate_argnums=(0,))
    state = par.replicate(state, mesh)
    loader = DataLoader(SynthCamDataset(), batch_size=GLOBAL_BATCH,
                        shuffle=True, seed=0, num_workers=1, drop_last=True,
                        process_id=process_id, process_count=process_count)
    losses = []
    it = iter(loader)
    for _ in range(STEPS):
        batch = next(it)
        dev = par.shard_batch(
            {k: batch[k] for k in ('img', 'vfov', 'pitch', 'roll')}, mesh)
        state, metrics = jit_step(state, dev)
        losses.append(float(metrics['loss']))
    return state, losses


def flatten_params(params):
    flat = {}

    def _flatten(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                _flatten(f'{prefix}/{k}', v)
        else:
            flat[prefix] = np.asarray(tree)

    _flatten('p', params)
    return flat


def main_camcalib(jax, pid, nproc, out_npz):
    from spec_tpu import parallel as par

    mesh = par.create_mesh()               # spans ALL processes' devices
    state, step = build(jax)
    state, losses = run_steps(jax, mesh, state, step,
                              process_id=pid, process_count=nproc)
    print(f'[p{pid}] losses={losses}', flush=True)
    if pid == 0:
        np.savez(out_npz, losses=np.asarray(losses),
                 **flatten_params(jax.device_get(state.params)))


def main_spec(jax, pid, nproc, out_npz):
    """Full SpecTrainer under 2 processes: mid-epoch SIGTERM-latch
    preemption (process-0 checkpoint), resume on BOTH processes from the
    shared logdir, sample-exact epoch completion; every process must end
    with identical replicated params."""
    import jax.numpy as jnp

    from jax.experimental import multihost_utils

    from spec_tpu.core import smpl as S
    from spec_tpu.data import CamDataset
    from spec_tpu.models import HMR
    from spec_tpu.train.trainer import SpecTrainer
    from spec_tpu.utils.config import spec_default_config

    data_root = os.environ['SPEC_DATA_ROOT']
    logdir = os.environ['MP_LOGDIR']

    cfg = spec_default_config()
    cfg.LOGDIR = logdir
    cfg.TRAINING.LOG_SAVE_INTERVAL = 1
    cfg.DATASET.BATCH_SIZE = 8
    cfg.DATASET.NUM_WORKERS = 1

    annot = os.path.join(data_root, 'dataset_extras',
                         '3dpw_test_cam_camcalib.npz')
    img_dir = os.path.join(data_root, 'dataset_folders', '3dpw')

    def make_train_dataset(epoch):
        return CamDataset(annot, img_dir, dataset='3dpw-test-cam',
                          is_train=True, img_res=32)

    assets = S.create_test_assets(num_vertices=64)
    model = HMR(backbone='resnet18', use_cam=True, use_cam_feats=False)

    def init_vars(seed):
        B = 1
        img = jnp.zeros((B, 32, 32, 3))
        eye = jnp.tile(jnp.eye(3), (B, 1, 1))
        one = jnp.ones((B,))
        return model.init(jax.random.PRNGKey(seed), assets, img, eye, eye,
                          one, jnp.ones((B, 2)), one, one)

    class StopAtStep:
        def __init__(self, trainer, at):
            self.trainer, self.at = trainer, at

        @property
        def requested(self):
            return int(self.trainer.state.step) >= self.at

    t1 = SpecTrainer(cfg, model, {'neutral': assets},
                     np.asarray(assets.j_regressor_h36m),
                     make_train_dataset, lambda: {},
                     init_variables=init_vars(0))
    assert t1.is_main == (pid == 0)
    t1._fit(1, StopAtStep(t1, 2))       # preempted at 2/3 batches
    assert int(t1.state.step) == 2
    # process 0 wrote the checkpoint; everyone waits before resuming
    multihost_utils.sync_global_devices('ckpt_written')

    t2 = SpecTrainer(cfg, model, {'neutral': assets},
                     np.asarray(assets.j_regressor_h36m),
                     make_train_dataset, lambda: {},
                     init_variables=init_vars(7))
    t2.resume()
    assert int(t2.state.step) == 2, int(t2.state.step)
    assert getattr(t2, '_resume_skip', 0) == 2
    t2._fit(1, StopAtStep(t2, 99))      # finish the epoch: ONE more step
    assert int(t2.state.step) == 3, int(t2.state.step)

    flat = flatten_params(jax.device_get(t2.state.params))
    np.savez(out_npz.replace('.npz', f'_p{pid}.npz'),
             step=np.int64(int(t2.state.step)), **flat)


def main_val(jax, pid, nproc, out_npz):
    """Multi-host VALIDATION through the real spec_eval CLI: every
    process evaluates the full val set host-locally (metrics must be
    identical everywhere); only process 0 writes the artifact files
    into the broadcast-agreed logdir."""
    from spec_tpu.cli import spec_eval

    res = spec_eval.main([
        '--log_root', os.environ['MP_LOGDIR'], '--opts',
        'DATASET.VAL_DS', '3dpw-test-cam',
        'DATASET.BATCH_SIZE', '8',
        'DATASET.NUM_WORKERS', '1',
        'DATASET.IMG_RES', '32',
        'HMR.BACKBONE', 'resnet18',
        'TESTING.USE_GT_CAM', 'True',
    ])['3dpw-test-cam']
    np.savez(out_npz.replace('.npz', f'_p{pid}.npz'),
             **{k: np.float64(v) for k, v in res.items()})


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_npz = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else 'camcalib'

    import jax

    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    if mode == 'spec':
        main_spec(jax, pid, nproc, out_npz)
    elif mode == 'val':
        main_val(jax, pid, nproc, out_npz)
    else:
        main_camcalib(jax, pid, nproc, out_npz)
    print(f'[p{pid}] DONE', flush=True)


if __name__ == '__main__':
    main()
