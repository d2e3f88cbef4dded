"""In-repo YOLOv3 person detector (flax.linen, NHWC, TPU-native).

The reference delegates person detection to two external CUDA/torch
packages — ``yolov3.yolo.YOLOv3`` + ``multi_person_tracker.MPT``
(``spec/tester.py:23-24,73-84``, installed from git per
``requirements.txt:29-30``) — and ships the official darknet
``yolov3.weights`` via ``scripts/prepare_data.sh:11``. Here the detector
is in-repo and TPU-native:

  * the standard YOLOv3 graph (Darknet-53 trunk + 3-scale FPN heads) is
    encoded as a static layer table mirroring the official ``yolov3.cfg``
    so the released darknet weight file loads one-to-one
    (:func:`load_darknet_weights` parses the binary format directly — no
    torch involved);
  * the whole forward (letterboxed frame -> 10647 decoded candidate
    boxes) is one jitted static-shape graph: convs in bf16 on the MXU,
    box decode fused at the tail, a single (B, 10647, 6) fetch;
  * only confidence filtering + NMS run on host (numpy, tiny arrays).

Output contract matches what the demo pipeline consumes downstream
(reference ``spec/tester.py:109-133``): per image an (N, 4) float32
array of SQUARE ``[cx, cy, w, h]`` person boxes (MPT squares detections
before handing them to the crop path; bbox scale = w / 200).

No detector weights ship in this sandbox; with ``weights_path=None`` the
network runs random-init (shape/pipeline checks only). Point
``weights_path`` at the official ``yolov3.weights`` to reproduce the
reference detector.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spec_tpu.utils.batching import pad_pow2

# ---------------------------------------------------------------------------
# Architecture table — official yolov3.cfg, conv/shortcut/route/upsample
# order preserved exactly (this IS the darknet weight-file order).
# Entries:
#   ('conv', out_ch, kernel, stride, batchnorm)   leaky 0.1 iff batchnorm
#   ('shortcut', rel_offset)                      x = out[-1] + out[rel]
#   ('route', (rel_or_abs, ...))                  channel concat
#   ('upsample',)                                 2x nearest
#   ('yolo', (anchor, ...))                       detection head (raw in)
# ---------------------------------------------------------------------------

ANCHORS = ((10, 13), (16, 30), (33, 23), (30, 61), (62, 45), (59, 119),
           (116, 90), (156, 198), (373, 326))


def _res(blocks: int, mid: int, out: int) -> list:
    layers = []
    for _ in range(blocks):
        layers += [('conv', mid, 1, 1, True), ('conv', out, 3, 1, True),
                   ('shortcut', -3)]
    return layers


YOLOV3_LAYERS: tuple = tuple(
    [('conv', 32, 3, 1, True), ('conv', 64, 3, 2, True)]
    + _res(1, 32, 64)
    + [('conv', 128, 3, 2, True)] + _res(2, 64, 128)
    + [('conv', 256, 3, 2, True)] + _res(8, 128, 256)      # layer 36 = C3
    + [('conv', 512, 3, 2, True)] + _res(8, 256, 512)      # layer 61 = C4
    + [('conv', 1024, 3, 2, True)] + _res(4, 512, 1024)    # layer 74 = C5
    + [('conv', 512, 1, 1, True), ('conv', 1024, 3, 1, True),
       ('conv', 512, 1, 1, True), ('conv', 1024, 3, 1, True),
       ('conv', 512, 1, 1, True), ('conv', 1024, 3, 1, True),
       ('conv', 255, 1, 1, False), ('yolo', (6, 7, 8)),
       ('route', (-4,)), ('conv', 256, 1, 1, True), ('upsample',),
       ('route', (-1, 61)),
       ('conv', 256, 1, 1, True), ('conv', 512, 3, 1, True),
       ('conv', 256, 1, 1, True), ('conv', 512, 3, 1, True),
       ('conv', 256, 1, 1, True), ('conv', 512, 3, 1, True),
       ('conv', 255, 1, 1, False), ('yolo', (3, 4, 5)),
       ('route', (-4,)), ('conv', 128, 1, 1, True), ('upsample',),
       ('route', (-1, 36)),
       ('conv', 128, 1, 1, True), ('conv', 256, 3, 1, True),
       ('conv', 128, 1, 1, True), ('conv', 256, 3, 1, True),
       ('conv', 128, 1, 1, True), ('conv', 256, 3, 1, True),
       ('conv', 255, 1, 1, False), ('yolo', (0, 1, 2))]
)

NUM_CLASSES = 80  # COCO; person = class 0


class YoloV3(nn.Module):
    """YOLOv3 over the static layer table. Input (B, S, S, 3) in [0, 1],
    S a multiple of 32 (default 416). Returns (B, S²/32²·3·21, 85):
    decoded [cx, cy, w, h] in input pixels, objectness, 80 class probs
    (all post-sigmoid, darknet decode semantics)."""

    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        size = x.shape[1]
        outs: List[jnp.ndarray] = []
        dets: List[jnp.ndarray] = []
        x = x.astype(self.compute_dtype)
        conv_i = 0
        for spec in YOLOV3_LAYERS:
            kind = spec[0]
            if kind == 'conv':
                _, ch, k, s, has_bn = spec
                p = (k - 1) // 2
                # Darknet stride-2 convs pad 1 like torch (top-left
                # favoured at even sizes) — explicit padding, not SAME.
                x = nn.Conv(ch, (k, k), strides=(s, s),
                            padding=((p, p), (p, p)), use_bias=not has_bn,
                            dtype=self.compute_dtype,
                            param_dtype=jnp.float32,
                            name=f'conv{conv_i}')(x)
                if has_bn:
                    x = nn.BatchNorm(use_running_average=True,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.compute_dtype,
                                     param_dtype=jnp.float32,
                                     name=f'bn{conv_i}')(x)
                    x = nn.leaky_relu(x, 0.1)
                conv_i += 1
            elif kind == 'shortcut':
                x = x + outs[spec[1]]
            elif kind == 'route':
                srcs = [outs[i] for i in spec[1]]
                x = srcs[0] if len(srcs) == 1 else jnp.concatenate(
                    srcs, axis=-1)
            elif kind == 'upsample':
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            elif kind == 'yolo':
                dets.append(_decode_head(x, spec[1], size))
            outs.append(x)
        return jnp.concatenate(dets, axis=1)


def _decode_head(raw: jnp.ndarray, anchor_ids: Sequence[int],
                 input_size: int) -> jnp.ndarray:
    """Darknet YOLO-layer decode: raw (B, G, G, 255) -> (B, G·G·3, 85)
    with boxes in input-pixel units.

    cx = (sigmoid(tx) + gx) * stride ; w = exp(tw) * anchor_w
    (anchors are in input pixels already). Class probs are independent
    sigmoids (YOLOv3 multi-label head), NOT softmax.
    """
    B, G = raw.shape[0], raw.shape[1]
    stride = input_size // G
    raw = raw.astype(jnp.float32).reshape(B, G, G, 3, 85)
    gy, gx = jnp.meshgrid(jnp.arange(G, dtype=jnp.float32),
                          jnp.arange(G, dtype=jnp.float32), indexing='ij')
    anchors = jnp.asarray([ANCHORS[i] for i in anchor_ids],
                          jnp.float32)                       # (3, 2)
    xy = (jax.nn.sigmoid(raw[..., :2])
          + jnp.stack([gx, gy], -1)[:, :, None, :]) * stride
    wh = jnp.exp(raw[..., 2:4]) * anchors
    conf = jax.nn.sigmoid(raw[..., 4:])                      # obj + classes
    out = jnp.concatenate([xy, wh, conf], axis=-1)
    # (B, G, G, 3, 85) -> (B, G*G*3, 85), anchor-major within a cell like
    # darknet (cell order row-major, anchors contiguous per cell).
    return out.reshape(B, G * G * 3, 85)


# ---------------------------------------------------------------------------
# Darknet binary weight loading (no torch involved)
# ---------------------------------------------------------------------------

def load_darknet_weights(params: dict, data: bytes) -> Tuple[dict, int]:
    """Load an official darknet ``.weights`` buffer into YoloV3 params.

    Format (darknet ``parser.c``): header of 3 int32 (major, minor,
    revision) then a seen-counter — int64 if (major*10+minor) >= 2 else
    int32 — followed by a flat float32 stream. Per conv layer, in cfg
    order: [bn_bias, bn_gamma, bn_running_mean, bn_running_var] when
    batch-normalized else [conv_bias]; then conv weights in OIHW order.

    Returns (new_params, floats_consumed). Raises ValueError on size
    mismatch so a truncated/wrong file fails loudly.
    """
    import flax

    header = np.frombuffer(data[:12], dtype='<i4')
    major, minor = int(header[0]), int(header[1])
    off = 12 + (8 if major * 10 + minor >= 2 else 4)
    buf = np.frombuffer(data[off:], dtype='<f4')
    pos = 0

    def take(n):
        nonlocal pos
        if pos + n > buf.size:
            raise ValueError(
                f'darknet weight file too short: need {pos + n} floats, '
                f'have {buf.size}')
        out = buf[pos:pos + n]
        pos += n
        return out

    p = flax.core.unfreeze(params)
    conv_i = 0
    for spec in YOLOV3_LAYERS:
        if spec[0] != 'conv':
            continue
        _, ch, k, s, has_bn = spec
        kernel = p['params'][f'conv{conv_i}']['kernel']  # (kh, kw, in, out)
        kh, kw, cin, cout = kernel.shape
        if has_bn:
            bn = p['batch_stats'][f'bn{conv_i}']
            bnp = p['params'][f'bn{conv_i}']
            bnp['bias'] = jnp.asarray(take(cout))
            bnp['scale'] = jnp.asarray(take(cout))
            bn['mean'] = jnp.asarray(take(cout))
            bn['var'] = jnp.asarray(take(cout))
        else:
            p['params'][f'conv{conv_i}']['bias'] = jnp.asarray(take(cout))
        w = take(cout * cin * kh * kw).reshape(cout, cin, kh, kw)
        # OIHW -> HWIO (flax NHWC conv kernel layout).
        p['params'][f'conv{conv_i}']['kernel'] = jnp.asarray(
            w.transpose(2, 3, 1, 0))
        conv_i += 1
    if pos != buf.size:
        raise ValueError(
            f'darknet weight file has {buf.size - pos} unread floats '
            f'(expected an exact fit for YOLOv3)')
    return p, pos


# ---------------------------------------------------------------------------
# Host-side pre/post (tiny arrays; numpy)
# ---------------------------------------------------------------------------

def letterbox(img: np.ndarray, size: int = 416,
              pad_value: float = 0.5) -> Tuple[np.ndarray, float, float,
                                               float]:
    """Aspect-preserving resize + centered pad to (size, size), values in
    [0, 1]. Returns (image, scale, pad_x, pad_y) so detections map back
    as ``orig = (pred - pad) / scale``. Nearest-free PIL bilinear matches
    the usual darknet/torch demo path closely enough for detection."""
    from PIL import Image

    h, w = img.shape[:2]
    scale = size / max(h, w)
    nw, nh = int(round(w * scale)), int(round(h * scale))
    pil = Image.fromarray(img.astype(np.uint8))
    resized = np.asarray(pil.resize((nw, nh), Image.BILINEAR),
                         np.float32) / 255.0
    out = np.full((size, size, 3), pad_value, np.float32)
    pad_x, pad_y = (size - nw) // 2, (size - nh) // 2
    out[pad_y:pad_y + nh, pad_x:pad_x + nw] = resized
    return out, scale, float(pad_x), float(pad_y)


def top_person_candidates(dets: jnp.ndarray, k: int = 256) -> jnp.ndarray:
    """Device-side candidate selection: (B, N, 85) decoded rows ->
    (B, k, 5) [cx, cy, w, h, obj*P(person)] sorted by score.

    Keeps the host fetch tiny (5 KB vs 3.5 MB per frame) — everything
    score-shaped runs on the VPU, only NMS-sized work leaves HBM. k=256
    comfortably exceeds any real person count per frame before NMS.
    """
    score = dets[..., 4] * dets[..., 5]
    top, idx = jax.lax.top_k(score, min(k, score.shape[-1]))
    boxes = jnp.take_along_axis(dets[..., :4], idx[..., None], axis=1)
    return jnp.concatenate([boxes, top[..., None]], axis=-1)


def nms_person(dets: np.ndarray, conf_thresh: float = 0.7,
               nms_thresh: float = 0.4) -> np.ndarray:
    """Person-class confidence filter + greedy IoU NMS.

    ``dets``: (N, 85) decoded rows [cx, cy, w, h, obj, 80 cls] OR (N, 5)
    pre-scored rows from :func:`top_person_candidates`. Score =
    obj * P(person). Returns (M, 5) [cx, cy, w, h, score] sorted by
    score descending.
    """
    score = (dets[:, 4] if dets.shape[1] == 5
             else dets[:, 4] * dets[:, 5])
    keep = score > conf_thresh
    if not keep.any():
        return np.zeros((0, 5), np.float32)
    boxes = dets[keep, :4].astype(np.float32)
    score = score[keep].astype(np.float32)
    order = np.argsort(-score)
    boxes, score = boxes[order], score[order]
    x1 = boxes[:, 0] - boxes[:, 2] / 2
    y1 = boxes[:, 1] - boxes[:, 3] / 2
    x2 = boxes[:, 0] + boxes[:, 2] / 2
    y2 = boxes[:, 1] + boxes[:, 3] / 2
    area = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    picked = []
    alive = np.ones(len(boxes), bool)
    for i in range(len(boxes)):
        if not alive[i]:
            continue
        picked.append(i)
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = (np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0))
        iou = inter / np.maximum(area[i] + area - inter, 1e-9)
        alive &= iou <= nms_thresh
        alive[i] = False
    out = np.concatenate([boxes[picked], score[picked, None]], axis=1)
    return out.astype(np.float32)


def square_cxcywh(boxes: np.ndarray) -> np.ndarray:
    """(N, >=4) [cx, cy, w, h] -> square boxes side max(w, h), the MPT
    convention the crop path expects (scale = w / 200 downstream,
    reference spec/tester.py:127-128)."""
    if boxes.shape[0] == 0:
        return np.zeros((0, 4), np.float32)
    side = np.maximum(boxes[:, 2], boxes[:, 3])
    return np.stack([boxes[:, 0], boxes[:, 1], side, side],
                    axis=1).astype(np.float32)


class YoloDetector:
    """Persistent batched person detector: frames in, square
    ``[cx, cy, w, h]`` person boxes per frame out.

    One jitted graph per (batch, size); frames are letterboxed on host
    (uint8-sized work), uploaded as a single (B, S, S, 3) batch, decoded
    candidates fetched once, filtered + NMS'd on host. Tail chunks pad to
    the next power of two (at most log2(batch_size) compiled shapes), so
    a one-frame call does not pay a full batch of detector compute.

    ``topk`` bounds pre-NMS person candidates per frame on device; 256
    covers realistic crowds (the host conf_thresh=0.7 filter keeps far
    fewer), but extremely dense scenes with trained weights can exceed it
    — raise it there (the fetch grows linearly, still << the full
    (N, 85) decode).

    ``conf_thresh`` / ``nms_thresh`` are host-side only (never traced) —
    they can be overridden per ``detect`` call without recompiling.

    ``mesh``: optional device mesh — detector batches shard over it
    (weights replicated), so detection scales with the serving slice
    like the two SPEC stages (``SpecPredictor(data_parallel=True,
    detector='yolo')`` passes its mesh through). ``batch_size`` must
    divide the mesh; tail pads round up to a mesh multiple.
    """

    def __init__(self, weights_path: Optional[str] = None,
                 img_size: int = 416, batch_size: int = 8,
                 conf_thresh: float = 0.7, nms_thresh: float = 0.4,
                 topk: int = 256, seed: int = 0, mesh=None):
        if img_size % 32:
            raise ValueError('img_size must be a multiple of 32')
        self.img_size = int(img_size)
        self.batch_size = int(batch_size)
        self.conf_thresh = float(conf_thresh)
        self.nms_thresh = float(nms_thresh)
        self.model = YoloV3()
        dummy = jnp.zeros((1, self.img_size, self.img_size, 3),
                          jnp.float32)
        self.vars = self.model.init(jax.random.PRNGKey(seed), dummy)
        if weights_path is not None:
            with open(weights_path, 'rb') as f:
                self.vars, _ = load_darknet_weights(self.vars, f.read())
        # Fused forward + device-side top-K person filter: the host
        # fetch is (B, topk, 5) instead of (B, 10647, 85) — candidate
        # scoring stays on device, only NMS-sized data crosses PCIe.
        fwd = lambda v, x: top_person_candidates(     # noqa: E731
            self.model.apply(v, x, mutable=False), k=int(topk))
        self._min_pad = 1
        if mesh is not None:
            import spec_tpu.parallel as par

            n_dev = int(mesh.devices.size)
            if self.batch_size % n_dev:
                raise ValueError(
                    f'detector batch_size {self.batch_size} must be a '
                    f'multiple of the {n_dev}-device mesh')
            rep = par.replicated(mesh)
            self.vars = jax.device_put(self.vars, rep)
            self._fwd = jax.jit(
                fwd, in_shardings=(rep, par.batch_sharding(mesh)),
                out_shardings=par.batch_sharding(mesh))
            self._min_pad = n_dev
        else:
            self._fwd = jax.jit(fwd)

    def detect_dispatch(self, frames: Sequence[np.ndarray]) -> list:
        """Queue every detector forward WITHOUT fetching.

        jax dispatch is async, so a caller can queue other device work
        (e.g. the serving stage-1 CamCalib batches) after this and then
        :meth:`detect_fetch` — the host-side NMS of chunk k then overlaps
        the device compute queued behind it instead of serializing
        (serving.py uses exactly this to remove its detect->stage-1
        bubble). Returns an opaque pending list for :meth:`detect_fetch`.
        """
        pending = []
        B = self.batch_size
        for start in range(0, len(frames), B):
            chunk = frames[start:start + B]
            prepped = [letterbox(np.asarray(f), self.img_size)
                       for f in chunk]
            batch = np.stack([p[0] for p in prepped])
            bp = pad_pow2(len(chunk), B)
            # under a mesh, every shard must be non-empty
            bp = -(-bp // self._min_pad) * self._min_pad
            if len(chunk) < bp:   # pad tail to a compiled-ladder shape
                batch = np.concatenate(
                    [batch, np.zeros((bp - len(chunk),) + batch.shape[1:],
                                     np.float32)])
            pending.append(
                (prepped, self._fwd(self.vars, jnp.asarray(batch))))
        return pending

    def detect_fetch(self, pending: list,
                     conf_thresh: Optional[float] = None,
                     nms_thresh: Optional[float] = None) -> List[np.ndarray]:
        """Fetch dispatched candidates and finish on host (filter + NMS +
        MPT square-box convention)."""
        conf = self.conf_thresh if conf_thresh is None else conf_thresh
        nms = self.nms_thresh if nms_thresh is None else nms_thresh
        results: List[np.ndarray] = []
        for prepped, dets_dev in pending:
            dets = np.asarray(dets_dev)
            for i, (_, scale, px, py) in enumerate(prepped):
                kept = nms_person(dets[i], conf, nms)
                kept[:, 0] = (kept[:, 0] - px) / scale
                kept[:, 1] = (kept[:, 1] - py) / scale
                kept[:, 2:4] = kept[:, 2:4] / scale
                results.append(square_cxcywh(kept))
        return results

    def detect(self, frames: Sequence[np.ndarray],
               conf_thresh: Optional[float] = None,
               nms_thresh: Optional[float] = None) -> List[np.ndarray]:
        return self.detect_fetch(self.detect_dispatch(frames),
                                 conf_thresh, nms_thresh)
