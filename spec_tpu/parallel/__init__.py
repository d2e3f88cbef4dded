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
    ``jax.distributed.initialize`` — the mesh just spans hosts (DCN);
  * optional ZeRO/FSDP (1-D, full data axis) and HSDP (2-D
    ``('data', 'fsdp')`` hybrid, :func:`create_hybrid_mesh`) layouts as
    capacity knobs — params/opt shard over the fsdp group, so per-layer
    all-gathers stay within a slice while gradients all-reduce across;
  * :func:`spatial_sharding` — SPMD **spatial partitioning** of the
    image height for latency-bound small-batch inference (the image-CNN
    analogue of sequence parallelism): GSPMD inserts the conv halo
    exchanges (collective-permute) automatically. This is the one
    model-sharding layout that pays for this family — a batch-1 stage-1
    frame cannot use data parallelism at all.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
FSDP_AXIS = 'fsdp'


def create_mesh(
    devices: Optional[Sequence[Any]] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def create_hybrid_mesh(
    devices: Optional[Sequence[Any]] = None, fsdp: int = 2,
) -> Mesh:
    """2-D HSDP mesh ``('data', 'fsdp')`` of shape (n/fsdp, fsdp).

    Hybrid sharded data parallel: the batch is sharded over BOTH axes
    (every device still holds a distinct micro-batch) while params and
    optimizer state shard only over the inner ``fsdp`` axis and
    replicate over ``data``. All-gather/reduce-scatter volume is bounded
    to the ``fsdp`` group; gradient all-reduce crosses groups. On
    multi-host topologies put the ``fsdp`` groups within a slice (ICI)
    so the per-layer collectives never ride DCN — jax device order
    already enumerates local devices first, so a reshape groups them.
    Set ``fsdp=n_devices`` for full-axis ZeRO, ``fsdp=1`` for pure DP.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % fsdp != 0:
        raise ValueError(f'{n} devices not divisible by fsdp={fsdp}')
    arr = np.asarray(devices).reshape(n // fsdp, fsdp)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh, axis_name=None) -> NamedSharding:
    """Shard the leading (batch) dimension over ALL mesh axes (for a 1-D
    mesh this is the data axis; for the hybrid mesh the batch shards over
    data x fsdp so every device computes a distinct micro-batch)."""
    axes = axis_name if axis_name is not None else tuple(mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def spatial_sharding(mesh: Mesh, axis_name=None, ndim: int = 4,
                     dim: int = 1) -> NamedSharding:
    """Shard an NHWC image batch over its HEIGHT dimension (spatial
    partitioning).

    For convolutions, XLA's SPMD partitioner handles a spatially-sharded
    operand by exchanging kernel-halo rows between neighbour shards
    (collective-permute over ICI) and keeps every stage of the trunk
    partitioned; global average pooling becomes a psum. Numerics match
    the replicated run to float-association noise.

    When it pays: LATENCY of a small-batch (especially batch-1) forward
    on a large input — the stage-1 CamCalib frame at min-side 600 is the
    use case (``SpecPredictor(spatial_parallel=True)``). Per-device FLOPs
    drop ~n_devices x while the halo volume (a few rows per conv) stays
    negligible at these shapes. For throughput at full batches plain
    data parallelism is strictly better (no halo traffic) — this is a
    latency knob, not the default. The height dim need not divide the
    mesh; GSPMD pads the ragged shard internally.
    """
    axes = axis_name if axis_name is not None else tuple(mesh.axis_names)
    spec: list = [None] * ndim
    spec[dim] = axes
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state, SMPL assets)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name=None):
    """Device-put a pytree of host arrays with the batch axis sharded.

    Single-process: ``batch`` is the GLOBAL batch, device_put shards it.
    Multi-process (``jax.distributed``): ``batch`` is this process's
    LOCAL slice (global_batch / process_count rows, distinct per host —
    see ``DataLoader(process_id=...)``); the global array is assembled
    from the per-process shards without any cross-host data movement.
    """
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh. Multi-process:
    every host passes the same value (deterministic init/seeds make this
    hold) and contributes its addressable replicas."""
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), tree)


def _fsdp_axis(mesh: Mesh) -> str:
    """Param-sharding axis: the inner 'fsdp' axis on a hybrid mesh, else
    the data axis (full-axis ZeRO on the 1-D mesh)."""
    return FSDP_AXIS if FSDP_AXIS in mesh.axis_names else DATA_AXIS


def fsdp_leaf_sharding(
    mesh: Mesh, shape, axis_name: Optional[str] = None,
    min_size: int = 2 ** 14,
) -> NamedSharding:
    """ZeRO/FSDP-style sharding for one array: shard the LARGEST axis that
    divides the mesh over the data axis; replicate small or indivisible
    leaves.

    With params + optimizer state laid out this way and the step jitted
    with matching in/out shardings, XLA inserts the all-gather (param use)
    and reduce-scatter (grad update) collectives automatically — the
    standard JAX FSDP recipe. Per-device param+opt memory drops ~Nx; at
    ResNet-50 scale this is a capacity knob (bigger per-chip batches /
    activation headroom), not a throughput one — replication is the
    default (module docstring).
    """
    axis_name = axis_name or _fsdp_axis(mesh)
    n_dev = mesh.shape[axis_name]
    size = int(np.prod(shape)) if shape else 0
    if size < min_size:
        return NamedSharding(mesh, P())
    divisible = [d for d in range(len(shape)) if shape[d] % n_dev == 0]
    if not divisible:
        return NamedSharding(mesh, P())
    axis = max(divisible, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def fsdp_shardings(tree, mesh: Mesh, axis_name: Optional[str] = None,
                   min_size: int = 2 ** 14):
    """Pytree of NamedShardings mirroring ``tree`` (arrays or
    ShapeDtypeStructs), leaf-wise :func:`fsdp_leaf_sharding`. On a
    hybrid mesh the leaves shard over the inner 'fsdp' axis and
    replicate over 'data' (HSDP)."""
    return jax.tree_util.tree_map(
        lambda x: fsdp_leaf_sharding(mesh, np.shape(x), axis_name,
                                     min_size), tree)


def shard_like(tree, shardings):
    """Device-put each leaf of ``tree`` with the matching sharding."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of k >= n (global batch must divide the mesh)."""
    return ((n + k - 1) // k) * k


def broadcast_string(s: str, max_len: int = 1024) -> str:
    """Process 0's string on every host (no-op single-process). Used to
    agree on the run LOGDIR: each process mints its own timestamped dir,
    but checkpoints/meta must land in ONE directory for resume."""
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    data = s.encode()
    if len(data) > max_len:
        raise ValueError(f'string longer than {max_len} bytes: {s!r}')
    buf = np.zeros(max_len, np.uint8)
    buf[:len(data)] = np.frombuffer(data, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    nz = np.nonzero(out == 0)[0]
    end = int(nz[0]) if nz.size else max_len
    return bytes(out[:end]).decode()


def all_processes_any(flag: bool) -> bool:
    """Cross-host OR of a per-process boolean (no-op single-process).

    Branching into a collective (checkpoint save, early return) on a
    per-process signal like a SIGTERM latch is a distributed-deadlock
    hazard: hosts whose signal delivery skews by one iteration would
    execute mismatched collectives. Agree first, branch after."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    return bool(np.asarray(multihost_utils.process_allgather(
        np.asarray([bool(flag)]))).any())


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host setup: call once per host before building the mesh; the
    mesh then spans all hosts (data parallel over ICI within a slice, DCN
    across — XLA routes collectives by mesh locality). No-op when JAX has
    already been initialized for multi-process."""
    import jax

    # MUST NOT touch the backend before initialize(): even
    # jax.process_count() triggers XLA backend init, after which
    # jax.distributed.initialize always raises. Probe the distributed
    # client state directly instead.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, 'client', None) is not None:
        return  # already initialized for multi-process
    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        if coordinator_address:
            # The caller explicitly asked for multi-host: running on as a
            # silent single-process instance would never reduce gradients
            # across hosts — fail loudly instead.
            raise RuntimeError(
                f'multi-host initialization failed: {e}') from e
        print(f'[parallel] jax.distributed.initialize skipped '
              f'(single-host): {e}')
