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


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_npz = sys.argv[4]

    import jax

    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    from spec_tpu import parallel as par

    mesh = par.create_mesh()               # spans ALL processes' devices
    state, step = build(jax)
    state, losses = run_steps(jax, mesh, state, step,
                              process_id=pid, process_count=nproc)
    print(f'[p{pid}] losses={losses}', flush=True)
    if pid == 0:
        import jax as _j
        params = _j.device_get(state.params)
        flat = {}

        def _flatten(prefix, tree):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    _flatten(f'{prefix}/{k}', v)
            else:
                flat[prefix] = np.asarray(tree)

        _flatten('p', params)
        np.savez(out_npz, losses=np.asarray(losses), **flat)
    print(f'[p{pid}] DONE', flush=True)


if __name__ == '__main__':
    main()
