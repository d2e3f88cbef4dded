"""Thread-safe decoded-image LRU shared by loader threads.

Used by the SPEC loader (``CamDataset(decode_cache=N)``: full decoded
frames, multi-person frames decode once per epoch) and the CamCalib
loaders (``CameraRegressorDataset``/``PanoAgoraDataset``
``decode_cache=N``: decoded+resized crops — epochs 2+ skip the dominant
JPEG decode + bilinear resize). No reference analogue (the reference's
torch DataLoader re-decodes every sample every epoch,
``spec/config.py:86-87``).
"""

from __future__ import annotations

import threading


class FrameCache:
    """Thread-safe LRU of decoded images keyed by the caller's key.

    Values are treated as READ-ONLY once cached (they are shared across
    loader threads — every mutating consumer copies first).

    ``get_or_compute`` deduplicates in-flight decodes: frame-grouped
    batches hand sibling samples to the pool AT THE SAME TIME, so
    without a per-key latch every sibling would miss and decode the
    same frame concurrently, nullifying the cache exactly when it
    should pay."""

    def __init__(self, capacity: int):
        import collections
        self.capacity = int(capacity)
        self._d = collections.OrderedDict()
        self._lock = threading.Lock()
        self._inflight = {}
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key, fn):
        while True:
            with self._lock:
                val = self._d.get(key)
                if val is not None:
                    self._d.move_to_end(key)
                    self.hits += 1
                    return val
                event = self._inflight.get(key)
                if event is None:
                    event = threading.Event()
                    self._inflight[key] = event
                    self.misses += 1
                    break
            # another thread is decoding this frame right now
            event.wait()
            # loop: the value is normally cached by the owner; if it was
            # already evicted (tiny capacity) or the owner raised, the
            # retry either finds it or becomes the new owner
        try:
            val = fn()
            with self._lock:
                self._d[key] = val
                self._d.move_to_end(key)
                while len(self._d) > self.capacity:
                    self._d.popitem(last=False)
            return val
        finally:
            with self._lock:
                self._inflight.pop(key, None)
            event.set()
