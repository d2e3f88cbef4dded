"""Device-mesh parallelism (pjit/NamedSharding).

The reference's only parallelism is single-node ``DataParallel`` for
CamCalib (``scripts/camcalib_train.py:73-75``) and pinned single-GPU for
SPEC (``scripts/spec_train.py:73``); SURVEY.md §2.4. The TPU-native
equivalent is SPMD batch parallelism over a 1-D ``('data',)`` mesh:

  * batch tensors sharded over 'data' (collectives ride ICI);
  * params/optimizer state replicated — at ResNet-50 scale (~100 MB fp32)
    replication is strictly faster than any tensor-parallel split on a v5e
    slice, so TP/PP/SP/EP axes are deliberately absent (they would only
    add latency; the models have no sequence dimension, SURVEY.md §5.7);
  * gradient reduction is inserted by XLA from the sharding annotations
    (psum over 'data'), not hand-written collectives;
  * multi-host scale-out is the same program under
    ``jax.distributed.initialize`` — the mesh just spans hosts (DCN).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def create_mesh(
    devices: Optional[Sequence[Any]] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state, SMPL assets)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of k >= n (global batch must divide the mesh)."""
    return ((n + k - 1) // k) * k


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host setup: call once per host before building the mesh; the
    mesh then spans all hosts (data parallel over ICI within a slice, DCN
    across — XLA routes collectives by mesh locality). No-op when JAX has
    already been initialized for multi-process."""
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # single-host dev boxes
        print(f'[parallel] jax.distributed.initialize skipped: {e}')
