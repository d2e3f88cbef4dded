"""Multi-person box tracking for video inference.

The reference demo delegates detection+tracking to the external
``multi_person_tracker`` package (SORT over YOLOv3 boxes,
``spec/tester.py:73-84``). This is the dependency-free equivalent used by
the video demo: a greedy IoU tracker that keeps person identities stable
across frames so per-person results can be grouped into tracks. Pure
numpy, host-side (tracking is bookkeeping, not device work).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _cxcywh_to_xyxy(b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, np.float32).reshape(-1, 4)
    half = b[:, 2:4] / 2.0
    return np.concatenate([b[:, :2] - half, b[:, :2] + half], axis=1)


def iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of two (N, 4) / (M, 4) [cx, cy, w, h] box sets."""
    a = _cxcywh_to_xyxy(boxes_a)[:, None]      # (N, 1, 4)
    b = _cxcywh_to_xyxy(boxes_b)[None]         # (1, M, 4)
    lt = np.maximum(a[..., :2], b[..., :2])
    rb = np.minimum(a[..., 2:], b[..., 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


class IoUTracker:
    """Greedy best-first IoU association with a max-age grace period.

    ``update(boxes)`` is called once per frame with (N, 4) [cx, cy, w, h]
    boxes and returns an (N,) int array of stable track ids. A detection
    matches the live track with the highest IoU above ``iou_threshold``
    (each track used once per frame, best pairs first); unmatched
    detections open new tracks; tracks unseen for more than ``max_age``
    frames are retired.
    """

    def __init__(self, iou_threshold: float = 0.3, max_age: int = 5):
        self.iou_threshold = iou_threshold
        self.max_age = max_age
        self._tracks: Dict[int, dict] = {}   # id -> {box, last_seen}
        self._next_id = 0
        self._frame = -1

    def update(self, boxes: np.ndarray) -> np.ndarray:
        self._frame += 1
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        # Retire stale tracks.
        self._tracks = {
            tid: t for tid, t in self._tracks.items()
            if self._frame - t['last_seen'] <= self.max_age}

        ids = np.full(len(boxes), -1, np.int64)
        if len(boxes) and self._tracks:
            tids = list(self._tracks)
            m = iou_matrix(
                boxes, np.stack([self._tracks[t]['box'] for t in tids]))
            # Greedy best-first assignment.
            while True:
                i, j = np.unravel_index(np.argmax(m), m.shape)
                if m[i, j] < self.iou_threshold:
                    break
                ids[i] = tids[j]
                m[i, :] = -1.0
                m[:, j] = -1.0
        for i in range(len(boxes)):
            if ids[i] < 0:
                ids[i] = self._next_id
                self._next_id += 1
            self._tracks[int(ids[i])] = {
                'box': boxes[i], 'last_seen': self._frame}
        return ids


def track_video_boxes(per_frame_boxes: List[np.ndarray],
                      iou_threshold: float = 0.3,
                      max_age: int = 5) -> List[np.ndarray]:
    """Convenience: run :class:`IoUTracker` over a whole clip.
    Returns per-frame (N_i,) track-id arrays."""
    tracker = IoUTracker(iou_threshold=iou_threshold, max_age=max_age)
    return [tracker.update(b) for b in per_frame_boxes]
