"""True multi-process (multi-host stand-in) data-parallel training.

Two coordinated CPU processes (jax.distributed + gloo collectives), each
holding its own devices and loading only its slice of every global batch
(DataLoader process sharding + parallel.shard_batch's
make_array_from_process_local_data path), must optimize to the same
parameters as a single process stepping the identical global batches on
the 8-device test mesh — the multi-host claim of SURVEY §2.4, verified
rather than asserted.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import mp_train_worker as W


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, 'tests', 'mp_train_worker.py')
    port = _free_port()
    out = tmp_path / 'p0_params.npz'

    env = dict(os.environ)
    env['PYTHONPATH'] = (repo + os.pathsep + os.path.join(repo, 'tests')
                         + os.pathsep + env.get('PYTHONPATH', ''))
    # 2 virtual CPU devices per process -> a 4-device global mesh (the
    # conftest XLA_FLAGS of THIS process must not leak 8 into workers).
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), '2', str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), '\n'.join(logs)
    assert all('DONE' in lg for lg in logs), '\n'.join(logs)

    got = np.load(out)

    # Single-process reference over the IDENTICAL global batches (the
    # loader's epoch order depends only on the seed, and process slicing
    # partitions each global chunk without reordering).
    import jax

    ref_state, step = W.build(jax)
    from spec_tpu import parallel as par

    # Same GLOBAL device count as the workers (2 procs x 2 devices): the
    # batch partitioning and reduction tree then match, so adam (which
    # amplifies float-association noise early on) stays tight.
    mesh = par.create_mesh(jax.devices()[:4])
    ref_state, ref_losses = W.run_steps(jax, mesh, ref_state, step,
                                        process_id=0, process_count=1)

    np.testing.assert_allclose(got['losses'], np.asarray(ref_losses),
                               rtol=1e-4, atol=1e-5)

    flat = {}

    def _flatten(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                _flatten(f'{prefix}/{k}', v)
        else:
            flat[prefix] = np.asarray(tree)

    _flatten('p', jax.device_get(ref_state.params))
    keys = sorted(flat)
    assert keys == sorted(k for k in got.files if k != 'losses')
    for k in keys:
        np.testing.assert_allclose(
            got[k], flat[k], rtol=1e-4, atol=1e-5,
            err_msg=f'param {k} diverged between 2-process and '
                    'single-process training')


@pytest.mark.slow
def test_two_process_spec_trainer_preempt_resume(tmp_path, rng):
    """The flagship SpecTrainer under 2 real jax.distributed processes:
    process-sharded loading, mid-epoch preemption (process-0-only
    checkpoint), resume on both processes from the shared logdir with
    sample-exact continuation, and identical final replicated params on
    every process."""
    from test_cli import _make_train_data_root

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, 'tests', 'mp_train_worker.py')
    port = _free_port()
    root = tmp_path / 'data'
    _make_train_data_root(root, rng, n=24)
    out = str(tmp_path / 'spec_params.npz')

    env = dict(os.environ)
    env['PYTHONPATH'] = (repo + os.pathsep + os.path.join(repo, 'tests')
                         + os.pathsep + env.get('PYTHONPATH', ''))
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    env['SPEC_DATA_ROOT'] = str(root)
    env['MP_LOGDIR'] = str(tmp_path / 'run')

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), '2', str(port), out,
             'spec'],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), '\n'.join(logs)

    p0 = np.load(out.replace('.npz', '_p0.npz'))
    p1 = np.load(out.replace('.npz', '_p1.npz'))
    assert int(p0['step']) == 3 and int(p1['step']) == 3
    keys = [k for k in p0.files if k != 'step']
    assert keys and sorted(keys) == sorted(
        k for k in p1.files if k != 'step')
    for k in keys:
        np.testing.assert_array_equal(
            p0[k], p1[k],
            err_msg=f'replicated param {k} differs across processes')
    # only process 0 wrote checkpoints (its log mentions the preemption
    # save; process 1's must not)
    assert 'checkpoint saved' in logs[0]
    assert 'checkpoint saved' not in logs[1]


@pytest.mark.slow
def test_two_process_validation_matches_single_process(tmp_path, rng):
    """Multi-host VALIDATION through the real spec_eval CLI: each of two
    jax.distributed processes evaluates the full val set host-locally;
    metrics must be identical across processes AND match the
    single-process run, and artifacts (val_accuracy_results json +
    evaluation_results pkl) must be written by process 0 only, into the
    ONE broadcast-agreed logdir (VERDICT r4: the README multi-host
    validation claim, now test-backed)."""
    from test_cli import _make_train_data_root

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, 'tests', 'mp_train_worker.py')
    port = _free_port()
    root = tmp_path / 'data'
    _make_train_data_root(root, rng, n=24)
    out = str(tmp_path / 'val_metrics.npz')

    env = dict(os.environ)
    env['PYTHONPATH'] = (repo + os.pathsep + os.path.join(repo, 'tests')
                         + os.pathsep + env.get('PYTHONPATH', ''))
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    env['SPEC_DATA_ROOT'] = str(root)
    env['MP_LOGDIR'] = str(tmp_path / 'run')

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), '2', str(port), out,
             'val'],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), '\n'.join(logs)

    p0 = np.load(out.replace('.npz', '_p0.npz'))
    p1 = np.load(out.replace('.npz', '_p1.npz'))
    keys = sorted(p0.files)
    assert 'val_mpjpe' in keys and keys == sorted(p1.files)
    for k in keys:
        # both processes run the identical host-local compute
        np.testing.assert_allclose(
            p0[k], p1[k], rtol=1e-6,
            err_msg=f'val metric {k} differs across processes')

    # artifacts: exactly ONE logdir (the broadcast LOGDIR agreement),
    # holding the json + pkl written by process 0
    import glob as _glob
    jsons = _glob.glob(str(tmp_path / 'run' / '**' /
                           'val_accuracy_results_3dpw-test-cam.json'),
                       recursive=True)
    pkls = _glob.glob(str(tmp_path / 'run' / '**' /
                          'evaluation_results_3dpw-test-cam.pkl'),
                      recursive=True)
    assert len(jsons) == 1, jsons
    assert len(pkls) == 1, pkls
    import json as _json
    with open(jsons[0]) as f:
        hist = _json.load(f)
    assert len(hist) == 1     # one process appended, once

    # single-process reference over the same data (this process's
    # forced-CPU backend; host-local mesh=None path like the workers)
    from spec_tpu.cli import spec_eval
    os.environ['SPEC_DATA_ROOT'] = str(root)
    try:
        ref = spec_eval.main([
            '--log_root', str(tmp_path / 'ref'), '--opts',
            'DATASET.VAL_DS', '3dpw-test-cam',
            'DATASET.BATCH_SIZE', '8',
            'DATASET.NUM_WORKERS', '1',
            'DATASET.IMG_RES', '32',
            'HMR.BACKBONE', 'resnet18',
            'TESTING.USE_GT_CAM', 'True',
        ])['3dpw-test-cam']
    finally:
        os.environ.pop('SPEC_DATA_ROOT', None)
    for k in keys:
        np.testing.assert_allclose(
            p0[k], float(ref[k]), rtol=1e-5,
            err_msg=f'2-process val metric {k} deviates from the '
                    'single-process run')


def test_loader_process_sharding_partitions_batches():
    """Every global chunk is exactly the concatenation of the per-process
    slices, in process order, for shuffled seeded epochs."""
    from spec_tpu.data import DataLoader

    class Idx:
        def __len__(self):
            return 22

        def __getitem__(self, i):
            return {'i': np.int64(i)}

    full = [b['i'] for b in DataLoader(Idx(), batch_size=8, shuffle=True,
                                       seed=3, num_workers=1)]
    parts = [
        [b['i'] for b in DataLoader(Idx(), batch_size=8, shuffle=True,
                                    seed=3, num_workers=1,
                                    process_id=p, process_count=4)]
        for p in range(4)
    ]
    assert len(full) == 3
    for bi in range(3):
        merged = np.concatenate([parts[p][bi] for p in range(4)])
        np.testing.assert_array_equal(merged, full[bi])

    # valid counts: 22 samples -> last chunk has 6 real rows = 2 per
    # process for p0..p2, 0 for p3
    last_valid = [
        [b['_valid_count'] for b in DataLoader(
            Idx(), batch_size=8, shuffle=False, num_workers=1,
            process_id=p, process_count=4)][-1]
        for p in range(4)
    ]
    assert last_valid == [2, 2, 2, 0]

    # batch_size must divide over processes
    import pytest as _pytest
    with _pytest.raises(ValueError):
        DataLoader(Idx(), batch_size=6, process_count=4)
