"""Host data pipeline: parallel fetch + batch collate + device prefetch.

Replaces torch ``DataLoader(num_workers=8, pin_memory=True)`` (reference
``spec/config.py:86-87``, trainer dataloaders ``spec/trainer.py:611-653``).
Decode+crop are GIL-releasing cv2 calls, so a thread pool gets full
parallelism without worker-process pickling; batches are stacked into
contiguous numpy and transferred with ``jax.device_put`` one batch ahead
(double buffering) so host IO overlaps device compute.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import itertools
import queue
import threading
from typing import Iterator, Optional

import numpy as np


_NON_TENSOR_KEYS = ('imgname', 'dataset_name', 'maskname', 'partname')


def check_process_divisibility(batch_size: int, process_count: int) -> int:
    """-> per-process batch rows; raises unless batch_size divides."""
    process_count = max(int(process_count), 1)
    if batch_size % process_count:
        raise ValueError(
            f'batch_size {batch_size} must divide evenly over '
            f'{process_count} processes')
    return batch_size // process_count


def shard_index_chunk(chunk, batch_size: int, process_id: int,
                      process_count: int):
    """The single definition of the multi-host chunk contract (used by
    DataLoader and camcalib's bucketed batcher): pad a global index chunk
    to ``batch_size`` by repeating the last index, return this process's
    contiguous slice and how many of its entries are real samples."""
    per = check_process_divisibility(batch_size, process_count)
    lo = int(process_id) * per
    valid = len(chunk)
    chunk = np.asarray(chunk)
    if valid < batch_size:
        chunk = np.concatenate(
            [chunk, np.full(batch_size - valid, chunk[-1], chunk.dtype)])
    return chunk[lo:lo + per], int(np.clip(valid - lo, 0, per))


def collate(items) -> dict:
    """Stack a list of item dicts into a batch dict (numpy), keeping
    string fields as lists."""
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if k in _NON_TENSOR_KEYS or isinstance(vals[0], str):
            out[k] = vals
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    """Iterable over collated batches with threaded fetch + prefetch.

    Args:
      dataset: map-style dataset (``__len__`` + ``__getitem__``).
      batch_size: static batch size. The final partial batch is padded by
        repeating the last sample (XLA static shapes); the true count is in
        ``batch['_valid_count']``.
      shuffle: reshuffle indices each epoch.
      num_workers: fetch threads.
      prefetch: batches resident in the queue.
      drop_last: drop the final partial batch instead of padding.
      skip_batches: skip the first k index chunks WITHOUT fetching them
        (sample-exact mid-epoch resume: the shuffle order is seeded, so
        skipping at the index level reproduces the preempted epoch's
        remaining batches at zero IO cost). Applies to the FIRST
        iteration of this loader only — the resumed epoch; re-iterating
        the same loader (next epoch) yields full epochs again.
      process_id / process_count: multi-host data parallelism
        (``jax.distributed``). The GLOBAL epoch order (shuffle, chunking,
        skip) is identical on every host — it depends only on the seed —
        and each host fetches ONLY its contiguous slice of every global
        chunk (batch_size/process_count samples), so IO is balanced and
        no sample is read twice. Feed the local batches through
        ``parallel.shard_batch``, which assembles the global device array
        from the per-process shards.
      group_keys: optional per-sample key array (len(dataset)); with
        ``shuffle``, the epoch permutes GROUPS (samples sharing a key
        stay adjacent, original relative order) instead of samples.
        Pass ``ds.imgname`` so multi-person samples of one frame land in
        the same batch and share one decode via the dataset's
        ``decode_cache``. Trade-off: batch rows are frame-correlated
        (same trick as sequence packing); the reference's torch loader
        has no analogue. The group permutation is seed-deterministic,
        so the multi-host contract is unchanged.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 8, prefetch: int = 2,
                 drop_last: bool = False, seed: int = 0,
                 skip_batches: int = 0,
                 process_id: int = 0, process_count: int = 1,
                 group_keys=None):
        check_process_divisibility(batch_size, process_count)
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.skip_batches = int(skip_batches)
        self.process_id = int(process_id)
        self.process_count = max(int(process_count), 1)
        self._epoch = 0
        self._seed = seed
        self._groups = None
        if group_keys is not None:
            keys = np.asarray(group_keys)
            if len(keys) != len(dataset):
                raise ValueError(
                    f'group_keys length {len(keys)} != dataset '
                    f'{len(dataset)}')
            _, inv = np.unique(keys, return_inverse=True)
            order = np.argsort(inv, kind='stable')
            counts = np.bincount(inv)
            self._groups = np.split(order, np.cumsum(counts)[:-1])

    def __len__(self):
        n = len(self.dataset)
        total = (n // self.batch_size if self.drop_last
                 else (n + self.batch_size - 1) // self.batch_size)
        # skip applies to the UPCOMING first (resumed) iteration only;
        # once that epoch has started, later epochs are full length.
        skip = self.skip_batches if self._epoch == 0 else 0
        return max(total - skip, 0)

    def _index_batches(self):
        """Yield (local_index_chunk, local_valid_count) per global batch.

        Partial final chunks are padded at the INDEX level (repeat the
        last index) so every process sees its full slice; `local_valid`
        is how many of this process's entries are real samples."""
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self._seed + self._epoch)
            if self._groups is not None:
                perm = rng.permutation(len(self._groups))
                idx = np.concatenate([self._groups[g] for g in perm])
            else:
                rng.shuffle(idx)
        elif self._groups is not None:
            # sequential epochs also iterate group-contiguously, so the
            # decode cache pays even when the npz isn't frame-sorted
            idx = np.concatenate(self._groups)
        # only the first iteration is a resumed (partial) epoch; a reused
        # loader must not silently drop the head of every later epoch.
        skip = self.skip_batches if self._epoch == 1 else 0
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s:s + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            if skip > 0:
                skip -= 1
                continue
            yield shard_index_chunk(chunk, self.batch_size,
                                    self.process_id, self.process_count)

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        error: list = []

        def _put(item) -> bool:
            # Bounded put re-checking the stop event: an abandoned
            # iterator (caller breaks early) sets `stop` while the
            # producer is blocked on a full queue — a plain q.put would
            # leak the producer + pool threads forever.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    for chunk, valid in self._index_batches():
                        if stop.is_set():
                            return
                        # Fetch only the REAL entries; padded tail rows
                        # repeat the last fetched item instead of paying
                        # decode+augment again per pad row.
                        real = chunk[:valid] if valid else chunk[:1]
                        items = list(pool.map(self.dataset.__getitem__,
                                              real))
                        while len(items) < len(chunk):
                            items.append(items[-1])
                        batch = collate(items)
                        batch['_valid_count'] = valid
                        if not _put(batch):
                            return
            except BaseException as e:  # surface in the consumer
                error.append(e)
            finally:
                # ALWAYS enqueue the sentinel — if __getitem__ raised,
                # a missing sentinel would hang the consumer forever.
                _put(None)
                if stop.is_set():
                    # consumer may never drain; make sure the sentinel
                    # fits even on a full queue
                    try:
                        q.put_nowait(None)
                    except queue.Full:
                        pass

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    if error:
                        raise error[0]
                    return
                yield batch
        finally:
            stop.set()


def device_prefetch(iterator, sharding=None, tensor_keys=None):
    """Move batches to device one step ahead of consumption.

    Args:
      iterator: yields numpy batch dicts.
      sharding: optional jax Sharding for tensors (batch-sharded on a mesh).
      tensor_keys: keys to transfer (default: every ndarray value).
    """
    import jax

    def put(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and (
                    tensor_keys is None or k in tensor_keys):
                out[k] = jax.device_put(v, sharding) if sharding is not None \
                    else jax.device_put(v)
            else:
                out[k] = v
        return out

    it = iter(iterator)
    try:
        ahead = put(next(it))
    except StopIteration:
        return
    for batch in it:
        nxt = put(batch)  # enqueue H2D before the consumer blocks
        yield ahead
        ahead = nxt
    yield ahead
