"""In-process serving engine: persistent two-stage SPEC predictor.

Production inference surface on top of the same building blocks as the
demo CLI, but file-free: numpy frames + person boxes in, per-person SMPL
results out. Holds both models' variables in HBM across calls and keeps
one compiled graph per encountered shape (stage 1 compiles per
post-resize frame bucket, stage 2 compiles once for the fixed crop
batch), so steady-state latency is pure device time.

Reference scope: this is the programmatic equivalent of
``spec/tester.py:90-209`` (SPECTester.run_on_image_folder) without the
per-image Python loop, the CamCalib subprocess, or the pickle ABI
(``spec/tester.py:86-88``); detection stays pluggable (boxes are an
input, ``[cx, cy, w, h]`` with the reference's scale = max_side/200
convention, spec/tester.py:127-128).

Example:
    predictor = SpecPredictor(spec_ckpt=..., camcalib_ckpt=...)
    results = predictor.predict(frames, boxes)   # len(frames) lists
    results[0][0]['smpl_vertices']               # (6890, 3)
"""

from __future__ import annotations

import os
from collections import OrderedDict, defaultdict
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from spec_tpu.core import bins
from spec_tpu.core import constants as C
from spec_tpu.utils import paths


from spec_tpu.utils.batching import pad_pow2 as _pad_size


def frame_signature(frame: np.ndarray, bins: int = 32,
                    max_side: int = 64) -> np.ndarray:
    """Cheap per-frame signature for shot-cut detection: a normalized
    gray histogram of a strided ~``max_side``-px downsample. O(max_side^2)
    regardless of frame size — noise vs the cost of a stage-1 pass."""
    a = np.asarray(frame)
    if a.ndim == 3:
        a = a.mean(axis=2)
    step = max(1, -(-max(a.shape[:2]) // max_side))
    a = a[::step, ::step]
    hist, _ = np.histogram(a, bins=bins, range=(0.0, 256.0))
    return hist.astype(np.float32) / max(int(hist.sum()), 1)


def cut_score(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """L1 distance between two :func:`frame_signature` vectors, in
    [0, 2]. Hard cuts land well above 0.5; pans/jitter stay near 0."""
    return float(np.abs(np.asarray(sig_a) - np.asarray(sig_b)).sum())


class KeyframeSelector:
    """The ONE definition of the ``camcalib_every`` keyframe rule:
    frame i is a stage-1 keyframe iff ``i % every == 0`` (the stride)
    OR its :func:`frame_signature` delta vs the previous readable frame
    exceeds ``cut_threshold`` (a hard shot cut; 0 disables the
    trigger). Shared by :meth:`SpecPredictor.predict`, the demo
    folder/video keyframe pre-pass, and the webcam loop.

    ``is_keyframe(sig)`` consumes one frame's signature (or None when
    unreadable) and advances the counter. An unreadable frame keeps the
    previous signature, so a cut spanning it is still caught on the
    next readable frame."""

    def __init__(self, every: int, cut_threshold: float = 0.5,
                 start_index: int = 0, prev_sig=None):
        self.every = max(1, int(every))
        self.cut_threshold = float(cut_threshold or 0.0)
        self.i = int(start_index)
        self.prev_sig = prev_sig

    def is_keyframe(self, sig=None) -> bool:
        key = self.i % self.every == 0
        if (not key and self.cut_threshold > 0.0 and sig is not None
                and self.prev_sig is not None
                and cut_score(self.prev_sig, sig) > self.cut_threshold):
            key = True
        if sig is not None:
            self.prev_sig = sig
        self.i += 1
        return key


class SpecPredictor:
    """Persistent camera-aware human mesh recovery predictor.

    Args:
      spec_ckpt / camcalib_ckpt: checkpoint paths (default: the registry
        under SPEC_DATA_ROOT; random init with a warning when absent —
        useful for smoke tests only).
      cfg_file: optional SPEC config yaml shipped with the checkpoint
        (HMR.BACKBONE / USE_CAM_FEATS, reference spec/tester.py:49-61).
      batch_size: stage-2 crop batch (pad-to-batch, masked).
      min_size: stage-1 aspect-preserving resize target (reference
        Resize(600)).
      loss_type: CamCalib bin decode flavor (released ckpt:
        softargmax_biased_l2).
      dtype: backbone compute dtype (bfloat16 for production).
      use_fused_lbs: route SMPL through the fused Pallas kernel.
        Default: on when the default backend is a TPU (the kernel has no
        compiled CPU lowering).
      uint8_crops: upload stage-2 crops as uint8 + on-device normalize
        (4x less transfer; <=0.5/255 crop quantization vs the reference's
        f32 hand-off — opt-in for production serving).
      data_parallel: shard every batch over a 1-D mesh of ALL visible
        devices (params replicated, batch split — the v5e-8 serving
        layout). batch_size must divide by the device count; small calls
        still pad, but never below one item per device.
      spatial_parallel: single-frame LATENCY layout — stage-1 frames are
        sharded over their HEIGHT across all devices (SPMD spatial
        partitioning; GSPMD inserts the conv halo exchanges) so a
        batch-1 camcalib call uses the whole slice instead of one chip,
        while stage-2 person crops shard over the batch as in
        data_parallel. Mutually exclusive with data_parallel (which is
        the better layout for full-batch throughput).
      detector: '' (caller supplies boxes) or 'yolo' — the in-repo
        TPU-native YOLOv3 (models/detector.py), making ``predict(frames)``
        fully self-contained like the reference demo (spec/tester.py runs
        MPT detection in-pipeline before HMR).
      yolo_weights: path to the official darknet ``yolov3.weights`` for
        ``detector='yolo'`` (random init without it — smoke tests only).
      yolo_img_size: detector letterbox size (multiple of 32) for
        ``detector='yolo'``; mirrors the demo's ``--yolo_img_size``.
      camcalib_every: run stage 1 only on every Nth frame of the stream
        and reuse the latest keyframe camera in between (the camera is a
        per-shot quantity; stage 1 at min-side 600 dominates pipeline
        cost, so N amortizes it ~N-fold for video/webcam). The counter
        persists across ``predict()`` calls — independently per
        ``predict(stream=...)`` name, so one predictor can serve many
        concurrent video streams; ``reset_camera_stream()`` re-anchors
        on a shot cut. Default 1 = per-frame (reference parity; the
        reference has no video mode at all).
      cut_threshold: automatic shot-cut re-anchoring for
        ``camcalib_every`` streams — every frame gets a cheap gray-
        histogram signature (:func:`frame_signature`) and a frame whose
        L1 delta vs the previous frame exceeds this threshold becomes a
        stage-1 keyframe even off-stride, so a multi-shot video never
        silently holds a stale camera across a cut. 0 disables (pure
        stride). Default 0.5 (hard cuts measure >1 on real footage;
        pans/noise stay <0.1).
    """

    # Class-level defaults for optional knobs: export.load_predictor
    # rebuilds instances via __new__ WITHOUT running __init__, so any
    # knob predict() consults must resolve through the class when an
    # older .specx restore path (or a future knob) does not set it on
    # the instance. Add new constructor knobs here, not only in
    # __init__ (the uint8_crops AttributeError regression on exported
    # predictors is the motivating case).
    uint8_crops = False
    detector = None
    mesh = None
    _min_pad = 1       # stage-2 (and data_parallel stage-1) pad multiple
    _min_pad_s1 = 1    # stage-1 pad multiple (1 under spatial_parallel)
    camcalib_every = 1  # stage-1 stream amortization (1 = every frame)
    cut_threshold = 0.5  # shot-cut re-anchor (L1 histogram delta; 0=off)
    # camcalib_every state, keyed by stream name ('' = the default
    # anonymous stream): OrderedDict[str, {'cam', 'h', 'i', 'sig'}],
    # created lazily (a mutable class-level default would be shared
    # across instances — and exported predictors skip __init__).
    _cam_streams = None
    max_streams = 256  # LRU cap on retained named streams (serve.py
    #                    keys streams per client; an evicted stream just
    #                    re-anchors on its next frame)

    def __init__(
        self,
        spec_ckpt: str = '',
        camcalib_ckpt: str = '',
        cfg_file: str = '',
        smpl_model_dir: str = '',
        backbone: str = 'resnet50',
        use_cam_feats: bool = False,
        camcalib_backbone: str = 'resnet50',
        loss_type: str = 'softargmax_biased_l2',
        img_res: int = 224,
        batch_size: int = 32,
        min_size: int = 600,
        dtype: Any = None,
        use_fused_lbs: Optional[bool] = None,
        uint8_crops: bool = False,
        data_parallel: bool = False,
        spatial_parallel: bool = False,
        detector: str = '',
        yolo_weights: str = '',
        yolo_img_size: int = 416,
        camcalib_every: int = 1,
        cut_threshold: float = 0.5,
    ):
        import jax
        import jax.numpy as jnp
        from spec_tpu.core import smpl as S
        from spec_tpu.models import HMR, CameraRegressorNetwork
        from spec_tpu.utils.checkpoints import (
            load_camcalib_variables,
            load_spec_variables,
        )

        if detector not in ('', 'yolo'):
            # Validate BEFORE the expensive model/asset construction.
            raise ValueError(f'unknown detector {detector!r}; '
                             "use '' (caller boxes) or 'yolo'")

        # Remote TPU compiles take minutes through the tunnel; share the
        # same persistent cache the CLIs warm ($SPEC_JAX_CACHE_DIR /
        # ~/.cache/spec_tpu/jax) so programmatic users hit it too.
        from spec_tpu.utils.paths import enable_compilation_cache
        enable_compilation_cache()

        self._jax = jax
        self._jnp = jnp
        self.img_res = img_res
        self.batch_size = batch_size
        self.min_size = min_size
        self.loss_type = loss_type
        # Opt-in: upload stage-2 person crops as raw uint8 and normalize
        # on device — 4x less host->device traffic per chunk (f32 crops
        # are 19 MB per 32-batch on PCIe/tunnel). Costs <=0.5/255 pixel
        # quantization of the bilinear crop output vs the reference's
        # f32 hand-off, so it is OFF by default (strict pickle parity);
        # production serving should turn it on. Stage 1 already uploads
        # uint8 losslessly (PIL resize output is uint8).
        self.uint8_crops = bool(uint8_crops)
        # Stream amortization: stage 1 (the dominant pipeline cost) runs
        # on every Nth frame of a video/webcam stream; the camera is a
        # per-shot quantity, so in-between frames reuse the latest
        # keyframe's (f_pix rescaled if the frame height changes).
        # 1 = per-frame (reference parity). See predict().
        self.camcalib_every = max(1, int(camcalib_every))
        self.cut_threshold = float(cut_threshold)
        self._cam_streams = None
        dtype = dtype or jnp.float32

        if cfg_file:
            from spec_tpu.utils.config import hmr_hparams_from_cfg
            backbone, use_cam_feats = hmr_hparams_from_cfg(cfg_file)

        assets = S.load_assets_or_test(smpl_model_dir, tag='serving')
        if use_fused_lbs is None:
            use_fused_lbs = jax.default_backend() == 'tpu'
        if use_fused_lbs:
            assets = S.with_packed_lbs(assets)
        self.assets = assets

        # Stage 1.
        self.camcalib = CameraRegressorNetwork(
            backbone=camcalib_backbone, num_fc_layers=1, dtype=dtype)
        camcalib_ckpt = camcalib_ckpt or paths.camcalib_checkpoint_path()
        if os.path.exists(camcalib_ckpt):
            self.cc_vars = load_camcalib_variables(
                camcalib_ckpt, backbone=camcalib_backbone)
        else:
            print(f'[serving] WARNING: camcalib ckpt {camcalib_ckpt} '
                  'missing; random init')
            self.cc_vars = self.camcalib.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, min_size, min_size, 3), jnp.float32))

        # Stage 2.
        self.spec = HMR(backbone=backbone, use_cam=True,
                        use_cam_feats=use_cam_feats, dtype=dtype)
        spec_ckpt = spec_ckpt or paths.spec_checkpoint_path()
        if os.path.exists(spec_ckpt):
            self.spec_vars = load_spec_variables(spec_ckpt,
                                                 backbone=backbone)
        else:
            print(f'[serving] WARNING: spec ckpt {spec_ckpt} missing; '
                  'random init')
            ex = jnp.zeros((1, img_res, img_res, 3), jnp.float32)
            eye = jnp.tile(jnp.eye(3), (1, 1, 1))
            one = jnp.ones((1,))
            self.spec_vars = self.spec.init(
                jax.random.PRNGKey(1), assets, ex, eye, eye, one,
                jnp.ones((1, 2)), one, one)

        # Variables enter the jitted bodies as ARGUMENTS: closure arrays
        # bake into the HLO, so compile-cache keys would change with every
        # fresh init and the remote-compile payload would carry the full
        # weight tensors.
        self._min_pad = 1
        self._min_pad_s1 = 1
        if data_parallel and spatial_parallel:
            raise ValueError(
                'data_parallel and spatial_parallel are mutually '
                'exclusive layouts (throughput vs single-frame latency)')
        if data_parallel or spatial_parallel:
            import spec_tpu.parallel as par

            self.mesh = par.create_mesh()
            n_dev = int(self.mesh.devices.size)
            if self.batch_size % n_dev:
                raise ValueError(
                    f'batch_size {self.batch_size} must be a multiple '
                    f'of the device count {n_dev} for '
                    'data_parallel/spatial_parallel')
            rep = par.replicated(self.mesh)
            bs = par.batch_sharding(self.mesh)
            self.cc_vars = jax.device_put(self.cc_vars, rep)
            self.spec_vars = jax.device_put(self.spec_vars, rep)
            if spatial_parallel:
                # Stage 1: frame HEIGHT sharded over the mesh (GSPMD
                # spatial partitioning with conv halo exchange) so a
                # batch-1 camcalib call engages every device — batches
                # need no mesh-multiple padding (_min_pad_s1 stays 1).
                self._cam_infer = jax.jit(
                    self._cam_forward,
                    in_shardings=(rep, par.spatial_sharding(self.mesh)),
                    out_shardings=rep)
            else:
                self._cam_infer = jax.jit(self._cam_forward,
                                          in_shardings=(rep, bs),
                                          out_shardings=bs)
                self._min_pad_s1 = n_dev
            # Stage 2 (224^2 person crops) always shards over the batch:
            # crops are small, persons batch naturally, and spatial
            # splitting a 224-px map would be all halo.
            self._spec_infer = jax.jit(self._spec_forward,
                                       in_shardings=(rep,) + (bs,) * 7,
                                       out_shardings=bs)
            # Padded batches must stay divisible by the mesh (powers of
            # two compose with power-of-two meshes above this floor).
            self._min_pad = n_dev
        else:
            self.mesh = None
            self._cam_infer = jax.jit(self._cam_forward)
            self._spec_infer = jax.jit(self._spec_forward)

        self.detector = None
        if detector == 'yolo':
            from spec_tpu.models.detector import YoloDetector

            if not yolo_weights:
                print('[serving] WARNING: detector=yolo without '
                      'yolo_weights runs a random-init detector '
                      '(pipeline smoke only)')
            det_mesh = self.mesh if data_parallel else None
            det_bs = 8
            if det_mesh is not None:   # batch must divide the mesh
                n_dev = int(det_mesh.devices.size)
                det_bs = -(-det_bs // n_dev) * n_dev
            self.detector = YoloDetector(
                weights_path=yolo_weights or None,
                img_size=yolo_img_size, batch_size=det_bs,
                # Detection shards over the serving mesh with the two
                # SPEC stages under data_parallel. Under spatial_parallel
                # the detector stays unsharded (its batch-1 letterboxed
                # 416^2 input is small; spatially splitting it would be
                # mostly halo).
                mesh=det_mesh)

    def _padded(self, n_valid: int, mult: Optional[int] = None) -> int:
        """Compiled batch size for ``n_valid`` work items: next power of
        two capped at batch_size, rounded up to a multiple of the mesh
        size under batch sharding (so every device shard is non-empty).
        ``mult`` overrides the multiple (stage 1 under spatial_parallel
        shards the HEIGHT, not the batch, so its chunks pass 1)."""
        bp = _pad_size(n_valid, self.batch_size)
        mp = self._min_pad if mult is None else mult
        return -(-bp // mp) * mp

    # -- jitted bodies ------------------------------------------------------

    def _cam_forward(self, cc_vars, images_u8):
        # NB: bins is imported at module scope — importing it here (inside
        # a traced body) would create its module-level tables under the
        # trace on first import (leaked tracers).
        # Frames arrive as uint8 and normalize ON DEVICE: host->device
        # transfer is 4x smaller than pre-normalized f32 (PIL's resize
        # output is uint8 anyway, so this is lossless), which matters on
        # PCIe and dominates through the remote tunnel.
        jnp = self._jnp
        images = (images_u8.astype(jnp.float32) / 255.0
                  - jnp.asarray(C.IMG_NORM_MEAN)) / jnp.asarray(
                      C.IMG_NORM_STD)
        logits = self.camcalib.apply(cc_vars, images)
        return bins.convert_preds_to_angles(*logits,
                                            loss_type=self.loss_type)

    def _spec_forward(self, spec_vars, crops, rotmat, K, scale, center,
                      img_w, img_h):
        if crops.dtype == self._jnp.uint8:
            # uint8_crops path: crops arrive as raw [0, 255] bytes and
            # normalize on device (4x less host->device traffic).
            jnp = self._jnp
            crops = (crops.astype(jnp.float32) / 255.0
                     - jnp.asarray(C.IMG_NORM_MEAN)) / jnp.asarray(
                         C.IMG_NORM_STD)
        return self.spec.apply(spec_vars, self.assets, crops, rotmat,
                               K, scale, center, img_w, img_h)

    # -- stage 1 ------------------------------------------------------------

    def _cameras_dispatch(self, frames: Sequence[np.ndarray]):
        """Resize/bucket frames on host and queue every stage-1 batch
        (no fetch). Returns (prepped, pending) for :meth:`_cameras_fetch`."""
        from PIL import Image

        from spec_tpu.data.image_folder import resize_min_side

        jnp = self._jnp
        prepped, buckets = [], defaultdict(list)
        for i, fr in enumerate(frames):
            pil = Image.fromarray(np.asarray(fr).astype(np.uint8))
            h = pil.size[1]
            img = np.asarray(resize_min_side(pil, self.min_size), np.uint8)
            prepped.append((img, h))   # uint8; normalized on device
            buckets[img.shape[:2]].append(i)

        pending = []    # dispatch every bucket/chunk, then fetch (async
        for _, idxs in buckets.items():   # dispatch overlaps host prep)
            for s0 in range(0, len(idxs), self.batch_size):
                chunk = idxs[s0:s0 + self.batch_size]
                n_valid = len(chunk)
                # Pad to the next power of two (capped at batch_size):
                # bounded compile count per bucket without paying a full
                # batch of stage-1 ResNet for a one-frame call. Under
                # data_parallel the pad is also rounded up to a multiple
                # of the device count so every shard is non-empty; under
                # spatial_parallel the HEIGHT is sharded instead, so a
                # one-frame call stays one frame.
                bp = self._padded(n_valid, self._min_pad_s1)
                pad = chunk + [chunk[-1]] * (bp - n_valid)
                batch = jnp.asarray(np.stack([prepped[i][0] for i in pad]))
                pending.append(
                    (chunk, self._cam_infer(self.cc_vars, batch)))
        return prepped, pending

    def _cameras_fetch(self, prepped, pending,
                       n_frames: int) -> List[Dict[str, float]]:
        out: List[Optional[dict]] = [None] * n_frames
        for chunk, (vfov, pitch, roll) in pending:
            vfov, pitch, roll = (np.asarray(vfov), np.asarray(pitch),
                                 np.asarray(roll))
            for k, i in enumerate(chunk):
                orig_h = prepped[i][1]
                out[i] = {
                    'vfov': float(vfov[k]),
                    'f_pix': float(orig_h / 2.0
                                   / np.tan(vfov[k] / 2.0)),
                    'pitch': float(pitch[k]),
                    'roll': float(roll[k]),
                }
        return out  # type: ignore[return-value]

    def estimate_cameras(
        self, frames: Sequence[np.ndarray]
    ) -> List[Dict[str, float]]:
        """CamCalib over raw RGB frames (uint8/float HWC, any sizes).

        Returns one dict per frame: {vfov, f_pix, pitch, roll} in the
        reference pickle's units (radians; f_pix w.r.t. the ORIGINAL
        frame height, scripts/camcalib_demo.py:129).
        """
        prepped, pending = self._cameras_dispatch(frames)
        return self._cameras_fetch(prepped, pending, len(frames))

    def reset_camera_stream(self, stream: Optional[str] = None, *,
                            all_streams: bool = False) -> None:
        """Forget ``camcalib_every`` stream state so the next frame of
        that stream is a stage-1 keyframe (call when switching to a NEW
        video; hard cuts WITHIN a stream are re-anchored automatically
        via ``cut_threshold``).

        Args:
          stream: which named stream to reset (the ``stream=`` key
            passed to :meth:`predict`); None resets the default
            anonymous stream. Unknown names are a no-op.
          all_streams: drop every stream's state (e.g. a serving restart
            or checkpoint swap).
        """
        if all_streams:
            self._cam_streams = None
        elif self._cam_streams is not None:
            self._cam_streams.pop('' if stream is None else str(stream),
                                  None)

    def _stream_state(self, stream: Optional[str]) -> dict:
        """The mutable camcalib_every state for ``stream`` (creating it
        empty if new), LRU-evicting the stalest stream past
        ``max_streams`` — long-running multi-client servers must not
        grow state unboundedly; an evicted client's next frame simply
        becomes a keyframe again."""
        streams = self._cam_streams
        if streams is None:
            streams = self._cam_streams = OrderedDict()
        key = '' if stream is None else str(stream)
        st = streams.get(key)
        if st is None:
            st = streams[key] = {'cam': None, 'h': 0, 'i': 0, 'sig': None}
            limit = max(1, int(getattr(self, 'max_streams', 256) or 256))
            while len(streams) > limit:
                streams.popitem(last=False)
        else:
            streams.move_to_end(key)
        return st

    # -- full pipeline --------------------------------------------------------

    def predict(
        self,
        frames: Sequence[np.ndarray],
        boxes: Optional[Sequence[np.ndarray]] = None,
        cameras: Optional[Sequence[dict]] = None,
        stream: Optional[str] = None,
        return_cameras: bool = False,
    ):
        """Two-stage inference.

        Args:
          frames: RGB images (HWC, uint8 or float in [0, 255]).
          boxes: per-frame (N_i, 4) [cx, cy, w, h] person boxes (N_i may
            be 0). None runs the configured in-process detector
            (``detector='yolo'``); an error without one.
          cameras: optional precomputed stage-1 outputs (dicts like
            :meth:`estimate_cameras` returns) — e.g. GT cameras.
          stream: which ``camcalib_every`` stream these frames belong to.
            The keyframe camera/counter state is keyed per stream name
            (None = the default anonymous stream), so one predictor can
            amortize stage 1 across MANY concurrent video streams (e.g.
            one per serving client) without cross-contaminating their
            keyframe cameras. State is LRU-capped at ``max_streams``.
            Ignored when ``camcalib_every == 1`` or ``cameras`` is given.
          return_cameras: also return the per-frame stage-1 cameras this
            call used (computed, reused from the stream's keyframe, or
            the ``cameras`` argument echoed back) — the serving layer
            needs them per frame without forcing an extra full stage-1
            pass that would defeat ``camcalib_every``.
        Returns:
          Per frame, a list of per-person dicts: the SPEC output tensors
          (smpl_vertices, smpl_joints3d, smpl_joints2d, pred_cam_t,
          pred_pose, pred_shape, pred_cam) plus the frame 'camera'.
          With ``return_cameras=True``: ``(results, cameras)``.
        """
        from spec_tpu import native
        from spec_tpu.core import geometry as G
        from spec_tpu.data.detection import bbox_to_center_scale
        from spec_tpu.data.transforms import crop as spin_crop, normalize_img

        jnp = self._jnp
        if boxes is None and self.detector is None:
            raise ValueError(
                'predict(frames) without boxes needs an in-process '
                "detector — construct SpecPredictor(detector='yolo', "
                "yolo_weights=...) or pass per-frame boxes")
        # Detection and stage 1 are independent, so both are DISPATCHED
        # before either is fetched: the detector's host NMS then runs
        # while the CamCalib batches queued behind it compute on device
        # (previously detect() synchronized per chunk and the two stages
        # ran back-to-back).
        pending_det = (self.detector.detect_dispatch(frames)
                       if boxes is None else None)
        n_frames = len(frames)
        every = max(1, int(getattr(self, 'camcalib_every', 1) or 1))
        key_idx = None
        cam_pending = None
        # Stream-state writes are DEFERRED to the end of the call: if
        # anything downstream raises (malformed boxes, a failed stage-2
        # dispatch), the stream is left exactly as it was, so a caller
        # retrying the same frames (serve.py's per-request retry after a
        # failed coalesced round) does not double-advance the counter or
        # re-feed signatures and shift the keyframe cadence.
        stream_update = None
        if cameras is None:
            if every > 1:
                # Stream amortization: the camera is a per-SHOT quantity,
                # so stage 1 (the dominant pipeline cost) runs only on
                # every Nth frame of the stream; in-between frames reuse
                # the latest keyframe camera. The counter persists across
                # predict() calls (reset_camera_stream() on a cut),
                # independently per named stream.
                st = self._stream_state(stream)
                # Shot-cut re-anchor (KeyframeSelector): a frame whose
                # histogram signature jumps vs its predecessor becomes
                # a keyframe even off-stride, so a multi-shot stream
                # never reuses a stale camera across a cut. The last
                # signature persists across predict() calls; with the
                # trigger disabled it is cleared, so re-enabling never
                # compares against an arbitrarily old frame.
                thr = float(getattr(self, 'cut_threshold', 0.5) or 0.0)
                sel = KeyframeSelector(every, thr, start_index=st['i'],
                                       prev_sig=st.get('sig'))
                key_idx = [
                    i for i in range(n_frames)
                    if sel.is_keyframe(frame_signature(frames[i])
                                       if thr > 0.0 else None)]
                stream_update = {
                    'sig': sel.prev_sig if thr > 0.0 else None}
                if (n_frames and st['cam'] is None
                        and (not key_idx or key_idx[0] != 0)):
                    key_idx.insert(0, 0)
                if key_idx:
                    cam_pending = self._cameras_dispatch(
                        [frames[i] for i in key_idx])
            else:
                cam_pending = self._cameras_dispatch(frames)
        if pending_det is not None:
            boxes = self.detector.detect_fetch(pending_det)
        if key_idx is not None:
            key_cams = (self._cameras_fetch(*cam_pending, len(key_idx))
                        if cam_pending is not None else [])
            # st is this stream's state from the dispatch block above.
            cam, cam_h = st['cam'], st['h']
            cameras = []
            ki = 0
            for i in range(n_frames):
                h = int(np.asarray(frames[i]).shape[0])
                if ki < len(key_idx) and key_idx[ki] == i:
                    cam, cam_h = key_cams[ki], h
                    ki += 1
                c = cam
                if h != cam_h:
                    # f_pix is defined w.r.t. the frame height
                    # (scripts/camcalib_demo.py:129) — rescale on reuse.
                    c = dict(c)
                    c['f_pix'] = float(
                        h / (2.0 * np.tan(c['vfov'] / 2.0)))
                cameras.append(c)
            stream_update.update(cam=cam, h=cam_h, i=st['i'] + n_frames)
        elif cam_pending is not None:
            cameras = self._cameras_fetch(*cam_pending, len(frames))

        # Flatten (frame, person) work items.
        work = []
        for fi, bx in enumerate(boxes):
            bx = np.asarray(bx, np.float32).reshape(-1, 4)
            if len(bx) == 0:
                continue
            cam = cameras[fi]
            h, w = np.asarray(frames[fi]).shape[:2]
            rotmat = np.asarray(G.euler_to_rotmat(jnp.asarray(
                [[cam['pitch'], 0.0, cam['roll']]], np.float32)))[0]
            K = np.asarray(G.build_cam_intrinsics(
                jnp.asarray([cam['f_pix']], np.float32),
                jnp.asarray([float(w)]), jnp.asarray([float(h)])))[0]
            centers, scales = bbox_to_center_scale(bx)
            for pi in range(len(centers)):
                work.append((fi, centers[pi], scales[pi], rotmat, K, w, h))

        results: List[List[dict]] = [[] for _ in frames]
        use_native = native.available()
        f32_frames: Dict[int, np.ndarray] = {}  # per-call frame cache
        # Two-phase dispatch/fetch: jax dispatch is async, so queueing
        # every chunk before fetching any result overlaps the host-side
        # SPIN crops of chunk k with the device compute of chunk k-1
        # (a synchronous per-chunk fetch serializes them). Outputs are
        # small (KBs/person); the crops of in-flight chunks are the only
        # extra HBM held.
        pending: list = []
        for s0 in range(0, len(work), self.batch_size):
            chunk = work[s0:s0 + self.batch_size]
            n_valid = len(chunk)
            bp = self._padded(n_valid)
            while len(chunk) < bp:
                chunk = chunk + [chunk[-1]]
            # One native call per FRAME with all of its crops — the
            # OpenMP kernel parallelizes over crops, so per-person n=1
            # calls would serialize the host preprocessing.
            crops: list = [None] * len(chunk)
            by_frame: Dict[int, list] = defaultdict(list)
            for ci, (fi, center, scale, *_rest) in enumerate(chunk):
                if fi not in f32_frames:
                    f32_frames[fi] = np.asarray(frames[fi], np.float32)
                by_frame[fi].append(ci)
            u8 = self.uint8_crops
            for fi, cis in by_frame.items():
                frame = f32_frames[fi]
                if use_native:
                    batch_crops = native.spin_crop_batch(
                        frame,
                        np.asarray([chunk[ci][1] for ci in cis],
                                   np.float32),
                        np.asarray([chunk[ci][2] for ci in cis],
                                   np.float32),
                        res=self.img_res, normalize=not u8)
                    for k, ci in enumerate(cis):
                        # native normalize=False returns v/255 in [0, 1]
                        crops[ci] = (np.clip(batch_crops[k] * 255.0 + 0.5,
                                             0, 255).astype(np.uint8)
                                     if u8 else batch_crops[k])
                else:
                    for ci in cis:
                        raw = spin_crop(frame, chunk[ci][1], chunk[ci][2],
                                        [self.img_res, self.img_res])
                        crops[ci] = (np.clip(raw + 0.5, 0, 255)
                                     .astype(np.uint8)
                                     if u8 else normalize_img(raw / 255.0))
            out = self._spec_infer(
                self.spec_vars,
                jnp.asarray(np.stack(crops)),
                jnp.asarray(np.stack([c[3] for c in chunk])),
                jnp.asarray(np.stack([c[4] for c in chunk])),
                jnp.asarray(np.array([c[2] for c in chunk], np.float32)),
                jnp.asarray(np.stack([c[1] for c in chunk]).astype(
                    np.float32)),
                jnp.asarray(np.array([c[5] for c in chunk], np.float32)),
                jnp.asarray(np.array([c[6] for c in chunk], np.float32)))
            pending.append((chunk, n_valid, out))
        for chunk, n_valid, out in pending:
            out_np = {k: np.asarray(v) for k, v in out.items()}
            for bi in range(n_valid):
                fi = chunk[bi][0]
                person = {k: v[bi] for k, v in out_np.items()}
                person['camera'] = cameras[fi]
                results[fi].append(person)
        if stream_update is not None:
            # Commit the stream advance only now that the whole call
            # succeeded (see the deferred-write note above).
            st.update(stream_update)
        if return_cameras:
            return results, list(cameras)
        return results
