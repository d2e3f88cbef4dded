"""Camera-annotated human-crop dataset (the SPEC workhorse).

Rebuild of reference ``spec/dataset/cam_dataset.py:41-660`` as a
struct-of-arrays annotation store + a host ``__getitem__`` that does only
IO-bound work (decode, crop). Everything the reference does per-sample on
the host that is compute-bound — GT SMPL forwards (reference :417-478!),
ImageNet normalization, eval-tensor pelvis centering — moves into the
batched on-device eval/train steps.

npz contract (verified against the reference loader :86-164):
  imgname, scale, center; pose / pose_0yaw_inverseyz (preferred for 3dpw,
  :94-97), shape, has_smpl; S (3D pose, 24x4); part (24x3) + openpose
  (25x3) -> 49 keypoints; gender ('m'/'f'); focal_length, cam_rotmat,
  cam_pitch, cam_roll, cam_ext, cam_int; camcalib_{pitch,roll,vfov,f_pix}
  (stage-1 predictions baked in, :136-146).
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from os.path import join
from typing import Optional

import numpy as np

from spec_tpu.core import constants as C
from spec_tpu.data import transforms as T
from spec_tpu.data.cache import FrameCache
from spec_tpu.data.occlusion import occlude_with_objects


@dataclasses.dataclass
class AugmentationConfig:
    """Reference defaults: spec/config.py:77-113 (flip/rot disabled for cam
    training, reference cam_dataset.py:61-63)."""

    flip_prob: float = 0.0
    noise_factor: float = 0.4
    rot_factor: float = 0.0
    scale_factor: float = 0.25
    crop_prob: float = 0.0
    crop_factor: float = 0.0
    use_occlusion: bool = False
    use_motion_blur: bool = True
    use_3d_conf: bool = False


# _FrameCache moved to spec_tpu/data/cache.py (shared with the
# CamCalib loaders); alias kept for existing callers/tests.
_FrameCache = FrameCache


class _NpzView(dict):
    """Dict with an NpzFile-style ``files`` attribute (used when the
    loaded annotations are subsampled in memory)."""

    @property
    def files(self):
        return list(self.keys())


class CamDataset:
    """Map-style dataset over one annotation npz.

    Args:
      annot_file: npz path.
      img_dir: image root the npz imgnames are relative to.
      dataset: dataset name tag ('3dpw-test-cam', 'spec-syn', ...).
      is_train: enables augmentation and drops eval-only fields.
      img_res: crop resolution (224).
      baseline_cam_rot / baseline_cam_f / baseline_cam_c: ablation toggles
        mirroring DATASET.BASELINE_CAM_* (reference config 100-104).
      normalize: ImageNet-normalize on host. Keep False to normalize on
        device (fused, preferred); True matches reference layout.
    """

    def __init__(
        self,
        annot_file: str,
        img_dir: str,
        dataset: str,
        is_train: bool = False,
        img_res: int = 224,
        aug: Optional[AugmentationConfig] = None,
        occluders=None,
        ignore_3d: bool = False,
        use_gt_cam: bool = False,
        baseline_cam_rot: bool = False,
        baseline_cam_f: bool = False,
        baseline_cam_c: bool = False,
        normalize: bool = False,
        render_res: int = 480,
        emit_disp_img: bool = False,
        num_images: int = 0,
        seed: int = 0,
        fast_decode: bool = False,
        decode_cache: int = 0,
        native_decode='auto',
        region_cache_dir: str = '',
        region_cache_format: str = 'jpeg',
    ):
        self.dataset = dataset
        self.img_dir = img_dir
        self.is_train = is_train
        self.img_res = img_res
        self.aug = aug or AugmentationConfig()
        self.occluders = occluders
        self.use_gt_cam = use_gt_cam
        self.baseline_cam_rot = baseline_cam_rot
        self.baseline_cam_f = baseline_cam_f
        self.baseline_cam_c = baseline_cam_c
        self.normalize = normalize
        self.render_res = render_res
        self.emit_disp_img = emit_disp_img
        # Opt-in reduced-scale decode (libjpeg DCT scaling) when the
        # person box is much larger than the crop target — the decode is
        # the host loader's dominant cost (measured: bench.py --mode
        # input). OFF by default: the crop content drifts by the
        # resampling-filter difference (see test_data.py fast-decode
        # parity bounds), so it is a training-throughput knob, not an
        # eval-path default. No reference analogue.
        self.fast_decode = fast_decode
        # Decoded-frame LRU (frames, uint8): multi-person datasets carry
        # several samples per frame (3DPW averages ~2-4), so siblings
        # reuse one decode. Pays when siblings land near each other —
        # sequential eval order, or DataLoader(group_keys=ds.imgname)
        # for shuffled training. Thread-safe (the loader pool shares
        # it); frames are treated read-only downstream. No reference
        # analogue (the torch loader decodes per sample).
        self._frame_cache = _FrameCache(decode_cache) if decode_cache \
            else None
        # Native host engine (native/jpegroi.cpp): fused JPEG ROI decode
        # + crop — decodes ONLY the scanline window the crop samples
        # (decode is 92% of the python item cost at 1080p). 'auto'/True:
        # use when the toolchain built _native.so and the file/EXIF
        # qualifies, else fall back to the cv2 path per item; False:
        # always cv2 (the parity oracle). Resolved lazily (first item)
        # so constructing datasets never triggers a g++ build.
        self.native_decode = bool(native_decode)
        self._native = None
        # Per-sample crop-region cache (see data/region_cache.py):
        # epoch 1 decodes normally, later epochs decode only the small
        # cached region. Requires the native engine.
        self._region_cache = None
        if region_cache_dir:
            from spec_tpu.data.region_cache import RegionCache
            # Files are keyed by SAMPLE INDEX, so the cache must be
            # scoped per (dataset, split): spec_train hands the same
            # REGION_CACHE_DIR to every train-mixture member and every
            # val dataset, and a shared flat dir would serve dataset
            # B's index-0 lookup dataset A's pixels (or thrash on the
            # coverage check refilling each other's files every epoch).
            self._region_cache = RegionCache(
                os.path.join(region_cache_dir,
                             f'{dataset}_{"train" if is_train else "val"}'),
                fmt=region_cache_format)
        self.rng = np.random.RandomState(seed)

        data = np.load(annot_file, allow_pickle=True)
        self.files = set(data.files)
        self.imgname = data['imgname']
        # Random subsampling (reference cam_dataset.py:65-67 — a dead
        # parameter there, its NUM_IMAGES config keys are never plumbed;
        # kept for API parity, made deterministic via the dataset seed).
        if num_images > 0:
            n0 = len(self.imgname)
            # without replacement: duplicates would double-count samples
            # in eval metrics while silently skipping others
            sel = np.random.RandomState(seed).choice(
                n0, size=min(num_images, n0), replace=False)
            sub = {}
            for k in data.files:
                arr = np.asarray(data[k])  # decompress each member ONCE
                sub[k] = arr[sel] if arr.ndim >= 1 and arr.shape[0] == n0 \
                    else arr
            data = _NpzView(sub)
            self.imgname = data['imgname']
        self.scale = data['scale'].astype(np.float32)
        self.center = data['center'].astype(np.float32)
        n = len(self.imgname)

        # SMPL params (prefer the yaw-normalized world pose for 3dpw).
        pose_key = ('pose_0yaw_inverseyz'
                    if 'pose_0yaw_inverseyz' in self.files else 'pose')
        if pose_key in self.files and 'shape' in self.files:
            self.pose = data[pose_key].astype(np.float32)
            self.betas = data['shape'].astype(np.float32)
            self.has_smpl = (data['has_smpl'].astype(np.float32)
                             if 'has_smpl' in self.files
                             else np.ones(n, np.float32))
        else:
            self.pose = np.zeros((n, 72), np.float32)
            self.betas = np.zeros((n, 10), np.float32)
            self.has_smpl = np.zeros(n, np.float32)
        if ignore_3d:
            self.has_smpl = np.zeros(n, np.float32)

        if 'S' in self.files and not ignore_3d:
            self.pose_3d = data['S'].astype(np.float32)
            self.has_pose_3d = 1
        else:
            self.pose_3d = None
            self.has_pose_3d = 0

        kp_gt = (data['part'].astype(np.float32) if 'part' in self.files
                 else np.zeros((n, 24, 3), np.float32))
        kp_op = (data['openpose'].astype(np.float32)
                 if 'openpose' in self.files
                 else np.zeros((n, 25, 3), np.float32))
        self.keypoints = np.concatenate([kp_op, kp_gt], axis=1)

        if 'gender' in self.files:
            self.gender = np.array(
                [0 if str(g) == 'm' else 1 for g in data['gender']],
                np.int32)
        else:
            self.gender = -np.ones(n, np.int32)

        for k in ('focal_length', 'cam_rotmat', 'cam_pitch', 'cam_roll',
                  'cam_ext', 'cam_int', 'camcalib_pitch', 'camcalib_roll',
                  'camcalib_vfov', 'camcalib_f_pix'):
            setattr(self, k, data[k] if k in self.files else None)
        # Camera-frame GT pose for the offline metric pass (reference
        # compute_error.py:166-181 reads data['pose_cam'] for 3dpw/mtp).
        self.pose_cam = (data['pose_cam'].astype(np.float32)
                         if 'pose_cam' in self.files else None)

    def __len__(self):
        return len(self.imgname)

    # -- camera assembly ----------------------------------------------------

    def _gt_focal(self, index, orig_shape):
        """Reference fallback chain (cam_dataset.py:502-526)."""
        if self.baseline_cam_f:
            return 5000.0, 5000.0
        if self.focal_length is not None:
            f = self.focal_length[index]
            f = np.atleast_1d(np.asarray(f, np.float64))
            return (float(f[0]), float(f[1])) if f.size > 1 else \
                (float(f[0]), float(f[0]))
        if self.dataset == 'h36m':
            return 1150.0, 1150.0
        if self.dataset == 'mpi-inf-3dhp':
            return 1500.0, 1500.0
        if self.cam_int is not None:
            K = self.cam_int[index]
            return float(K[0, 0]), float(K[1, 1])
        return 5000.0, 5000.0

    def _build_K(self, fx, fy, center, orig_shape):
        cx, cy = ((float(center[0]), float(center[1]))
                  if self.baseline_cam_c
                  else (orig_shape[1] / 2.0, orig_shape[0] / 2.0))
        K = np.zeros((3, 3), np.float32)
        K[0, 0], K[1, 1] = fx, fy
        K[0, 2], K[1, 2] = cx, cy
        # NB deliberate deviation: the reference leaves K[2,2] = 0
        # (cam_dataset.py:565-576, cam_params.py:38-46 both build a
        # SINGULAR intrinsics matrix); no consumer reads [2,2], so we
        # store a proper pinhole K — consistent with utils/cam_params.
        K[2, 2] = 1.0
        return K

    def _pred_cam(self, index, center, orig_shape):
        """Predicted (CamCalib) camera columns -> rotmat + intrinsics
        (reference cam_dataset.py:617-653)."""
        pitch = 0.0 if self.baseline_cam_rot else (
            float(self.camcalib_pitch[index])
            if self.camcalib_pitch is not None else 0.0)
        roll = 0.0 if self.baseline_cam_rot else (
            float(self.camcalib_roll[index])
            if self.camcalib_roll is not None else 0.0)
        f = 5000.0 if self.baseline_cam_f else (
            float(self.camcalib_f_pix[index])
            if self.camcalib_f_pix is not None else 5000.0)
        vfov = (float(self.camcalib_vfov[index])
                if self.camcalib_vfov is not None else 0.0)
        rotmat = _euler_pitch_roll(pitch, roll)
        K = self._build_K(f, f, center, orig_shape)
        return pitch, roll, vfov, f, rotmat, K

    # -- item ---------------------------------------------------------------

    def __getitem__(self, index: int) -> dict:
        item = {}
        scale = float(self.scale[index])
        center = self.center[index].copy()
        keypoints = self.keypoints[index].copy()
        keypoints_orig = self.keypoints[index].copy()

        flip, pn, rot, sc = self._augm_params()
        if self.is_train and self.aug.crop_factor > 0 \
                and self.rng.rand() < self.aug.crop_prob:
            center, scale = T.random_crop(
                center, scale, 1 - self.aug.crop_factor, axis='y',
                rng=self.rng)

        t0 = time.perf_counter()
        imgname = join(self.img_dir, str(self.imgname[index]))
        want_disp = not self.is_train and self.emit_disp_img
        raw_crop, disp, orig_shape = self._crops(
            index, imgname, center, sc * scale, rot, want_disp)
        load_time = time.perf_counter() - t0

        pose = (self.pose[index].copy() if self.has_smpl[index]
                else np.zeros(72, np.float32))
        betas = (self.betas[index].copy() if self.has_smpl[index]
                 else np.zeros(10, np.float32))

        keypoints = self._j2d(keypoints, center, sc * scale, rot, flip)

        t1 = time.perf_counter()
        img = self._rgb(raw_crop, flip, pn, keypoints)
        proc_time = time.perf_counter() - t1

        item['img'] = img
        if want_disp:
            # RENDER_RES crop for validation overlays (reference
            # cam_dataset.py:373-381 disp_img).
            item['disp_img'] = (disp / 255.0).astype(np.float32)
        item['pose'] = self._pose(pose, rot, flip)
        item['betas'] = betas
        item['imgname'] = imgname
        item['pose_conf'] = np.ones(24, np.float32)
        if self.aug.use_3d_conf and self.dataset in ('mpii', 'coco',
                                                     'lspet'):
            # Copy 2D keypoint confidences onto SMPL pose joints
            # (reference cam_dataset.py:386-394).
            from spec_tpu.core.kp_utils import map_spin_joints_to_smpl
            for srcs, dst in map_spin_joints_to_smpl():
                item['pose_conf'][dst] = max(
                    keypoints[25 + s_, 2] for s_ in srcs)

        if self.has_pose_3d:
            S = self.pose_3d[index].copy()
            if (self.cam_rotmat is not None and self.baseline_cam_rot
                    and self.is_train):
                S[:, :3] = (self.cam_rotmat[index] @ S[:, :3].T).T
            item['pose_3d'] = self._j3d(S, rot, flip)
            if self.aug.use_3d_conf and self.dataset in ('mpii', 'coco',
                                                         'lspet'):
                # Confidence propagation onto the 3D GT joints (reference
                # cam_dataset.py:396-411).
                from spec_tpu.core.kp_utils import relation_among_spin_joints
                for srcs, dst in relation_among_spin_joints():
                    conf = max([keypoints[x, 2] for x in srcs]
                               + [keypoints[dst, 2]])
                    item['pose_3d'][dst - 25, -1] = np.float32(conf)
        else:
            item['pose_3d'] = np.zeros((24, 4), np.float32)

        item['keypoints_orig'] = keypoints_orig.astype(np.float32)
        item['keypoints'] = keypoints.astype(np.float32)
        item['has_smpl'] = np.float32(self.has_smpl[index])
        item['has_pose_3d'] = np.float32(self.has_pose_3d)
        item['scale'] = np.float32(sc * scale)
        item['center'] = center.astype(np.float32)
        item['orig_shape'] = orig_shape
        item['is_flipped'] = np.float32(flip)
        item['rot_angle'] = np.float32(rot)
        item['gender'] = self.gender[index]
        item['sample_index'] = index
        item['dataset_name'] = self.dataset

        # GT camera (teacher during training; eval when USE_GT_CAM).
        fx, fy = self._gt_focal(index, orig_shape)
        item['focal_length'] = np.array([fx, fy], np.float32)
        if self.cam_rotmat is not None and not self.baseline_cam_rot:
            item['cam_rotmat'] = self.cam_rotmat[index].astype(np.float32)
        else:
            item['cam_rotmat'] = np.eye(3, dtype=np.float32)
            if (self.cam_rotmat is not None and self.baseline_cam_rot
                    and self.is_train):
                item['pose'][:3] = _rotate_global_aa(
                    self.cam_rotmat[index], item['pose'][:3])
        item['cam_pitch'] = np.float32(
            self.cam_pitch[index] if self.cam_pitch is not None
            and not self.baseline_cam_rot else 0.0)
        item['cam_roll'] = np.float32(
            self.cam_roll[index] if self.cam_roll is not None
            and not self.baseline_cam_rot else 0.0)
        if self.cam_ext is not None:
            item['cam_ext'] = self.cam_ext[index].astype(np.float32)
        if self.cam_int is not None and not self.baseline_cam_f:
            item['cam_int'] = self.cam_int[index].astype(np.float32)
        else:
            item['cam_int'] = self._build_K(fx, fy, center, orig_shape)

        if not self.is_train:
            (item['pred_cam_pitch'], item['pred_cam_roll'],
             item['pred_cam_vfov'], item['pred_cam_focal_length'],
             item['pred_cam_rotmat'], item['pred_cam_int']) = \
                [np.float32(v) if np.isscalar(v) else v.astype(np.float32)
                 for v in self._pred_cam(index, center, orig_shape)]

        item['load_time'] = np.float32(load_time)
        item['proc_time'] = np.float32(proc_time)
        return item

    # -- processing helpers ---------------------------------------------

    def _augm_params(self):
        """Reference augm_params (cam_dataset.py:223-250)."""
        flip, pn, rot, sc = 0, np.ones(3), 0.0, 1.0
        if self.is_train:
            a = self.aug
            if self.rng.uniform() <= a.flip_prob:
                flip = 1
            pn = self.rng.uniform(1 - a.noise_factor, 1 + a.noise_factor, 3)
            rot = float(np.clip(self.rng.randn() * a.rot_factor,
                                -2 * a.rot_factor, 2 * a.rot_factor))
            sc = float(np.clip(self.rng.randn() * a.scale_factor + 1,
                               1 - a.scale_factor, 1 + a.scale_factor))
            if self.rng.uniform() <= 0.6:
                rot = 0.0
        return flip, pn, rot, sc

    # -- decode + crop paths ----------------------------------------------

    def _native_ok(self) -> bool:
        """Lazy native-engine resolution (never builds at __init__)."""
        if self._native is None:
            if not self.native_decode:
                self._native = False
            else:
                from spec_tpu import native
                self._native = native.available()
        return self._native

    def _reduce_for(self, scale) -> int:
        """fast_decode ladder: the crop consumers of this sample set the
        floor — the img_res model crop, plus the render_res disp crop on
        the eval path. keypoints/K/orig_shape stay in full-res coords."""
        if not self.fast_decode:
            return 1
        need = self.img_res
        if not self.is_train and self.emit_disp_img:
            need = max(need, self.render_res)
        return T.pick_reduce(T.BBOX_SIDE * scale, need)

    def _decode(self, imgname, reduce):
        if reduce > 1:
            # header-only exact dims; pixels decode reduced
            return (T.read_img(imgname, reduce=reduce),
                    T.image_dims(imgname))
        img = T.read_img(imgname)
        return img, np.array(img.shape[:2], np.float32)

    def _plans(self, center, scale, rot, want_disp, reduce):
        """Crop plan(s) for the native sampler: model crop + optional
        disp crop. The SPIN clamp box applies exactly where the python
        path is bit-faithful (transforms.crop: rot == 0 at full res);
        the reduced/rotated paths are BORDER_CONSTANT affine warps
        (transforms.crop_from_reduced)."""
        res = [self.img_res, self.img_res]
        aff, box = T.crop_affine(center, scale, res, rot)
        clamp = rot == 0 and reduce == 1
        plans = [(res, aff, box if clamp else None)]
        if want_disp:
            dres = [self.render_res, self.render_res]
            aff2, box2 = T.crop_affine(center, scale, dres, rot)
            plans.append((dres, aff2, box2 if clamp else None))
        return plans

    def _crops(self, index, imgname, center, scale, rot, want_disp):
        """Decode + crop -> (model crop f32 [0,255] HWC, disp crop or
        None, orig_shape). Path priority: per-sample region cache >
        decoded-frame LRU > native fused ROI decode > python cv2; every
        native step degrades to the cv2 path per item (non-JPEG bytes,
        EXIF-rotated files, decode errors, missing toolchain)."""
        native_ok = self._native_ok()

        if self._region_cache is not None and native_ok:
            out = self._region_crops(index, imgname, center, scale, rot,
                                     want_disp)
            if out is not None:
                return out

        reduce = self._reduce_for(scale)

        if self._frame_cache is not None:
            cv_img, orig_shape = self._frame_cache.get_or_compute(
                (imgname, reduce), lambda: self._decode(imgname, reduce))
            crop, disp = self._crops_from_frame(
                cv_img, center, scale, rot, want_disp, reduce, native_ok)
            return crop, disp, orig_shape

        if native_ok:
            out = self._fused_crops(imgname, center, scale, rot,
                                    want_disp, reduce)
            if out is not None:
                return out

        cv_img, orig_shape = self._decode(imgname, reduce)
        crop, disp = self._crops_from_frame(
            cv_img, center, scale, rot, want_disp, reduce, native_ok)
        return crop, disp, orig_shape

    def _crops_from_frame(self, cv_img, center, scale, rot, want_disp,
                          reduce, native_ok):
        """Crop(s) from an in-memory decoded frame — native sampler when
        available (no full-frame float32 materialization), cv2 twin
        otherwise."""
        if native_ok and cv_img.dtype == np.uint8:
            from spec_tpu import native
            plans = self._plans(center, scale, rot, want_disp, reduce)
            crops = [native.crop_affine_u8(cv_img, aff, res, box=box,
                                           reduce=reduce)
                     for res, aff, box in plans]
        else:
            crops = [T.crop_from_reduced(
                cv_img, center, scale, [self.img_res, self.img_res],
                reduce, rot=rot)]
            if want_disp:
                crops.append(T.crop_from_reduced(
                    cv_img, center, scale,
                    [self.render_res, self.render_res], reduce, rot=rot))
        return crops[0], (crops[1] if want_disp else None)

    def _fused_crops(self, imgname, center, scale, rot, want_disp,
                     reduce):
        """Fused native path: probe the header, then decode ONLY the
        crop's scanline window and sample the crop(s) in native code —
        no python-visible frame. None -> caller falls back to cv2."""
        from spec_tpu import native
        try:
            data = np.fromfile(imgname, np.uint8)
        except OSError:
            raise FileNotFoundError(imgname)
        if data.size < 2 or data[0] != 0xFF or data[1] != 0xD8:
            return None                       # not a JPEG
        probe = native.jpeg_probe(data)
        if probe is None or probe[2] != 1:    # undecodable / EXIF-rotated
            return None
        if len(probe) > 3 and probe[3]:
            # progressive JPEG: jpeg_crop_scanline rejects progressive
            # mode AFTER the full multi-scan entropy decode, so the
            # native attempt would pay a whole decode and then fall back
            # to cv2 decoding the frame AGAIN — skip it up front
            return None
        H, W = probe[0], probe[1]
        plans = self._plans(center, scale, rot, want_disp, reduce)
        crops = T.native_jpeg_crops(data, plans, (H, W), reduce=reduce)
        if crops is None:
            return None
        return crops[0], (crops[1] if want_disp else None), \
            np.array([H, W], np.float32)

    # -- region cache -------------------------------------------------------

    def _region_window(self, index):
        """Deterministic per-index decode window covering EVERY crop
        this sample can request under the augmentation bounds: max scale
        jitter (sc <= 1 + scale_factor), random_crop center shifts (the
        sub-box always stays inside the original box, so the
        (1+sf)-scaled box centered at the ORIGINAL center covers it),
        and the rotated box's bounding square (side * sqrt(2))."""
        center = self.center[index]
        scale = float(self.scale[index])
        sf = self.aug.scale_factor if self.is_train else 0.0
        need = self.img_res
        if not self.is_train and self.emit_disp_img:
            need = max(need, self.render_res)
        r = 1
        if self.fast_decode:
            # the FINEST grid any aug needs (smallest possible box):
            # scale jitter (1-sf) AND random_crop, which shrinks the box
            # by up to another (1-crop_factor) before _crops picks its
            # per-sample reduce — the cached region must be stored at
            # that finer grid or the 224 crop would silently upsample
            cf = (self.aug.crop_factor
                  if self.is_train and self.aug.crop_prob > 0 else 0.0)
            r = T.pick_reduce(
                T.BBOX_SIDE * max(scale * (1 - sf) * (1 - cf), 1e-3),
                need)
        side = T.BBOX_SIDE * scale * (1 + sf)
        if self.is_train and self.aug.rot_factor > 0:
            side *= np.sqrt(2.0)
        half = side / 2.0 + 4.0   # corner-truncation + bilinear slack
        return (float(center[0]) - half, float(center[1]) - half,
                float(center[0]) + half, float(center[1]) + half), r

    def _clamped_window(self, u0, v0, u1, v1, r, rh, rw):
        off = (r - 1) / 2.0
        x0 = max(0, int(np.floor((u0 - off) / r)) - 2)
        y0 = max(0, int(np.floor((v0 - off) / r)) - 2)
        x1 = min(rw, int(np.ceil((u1 - off) / r)) + 3)
        y1 = min(rh, int(np.ceil((v1 - off) / r)) + 3)
        return x0, y0, x1, y1

    def _fill_region(self, index, imgname):
        (u0, v0, u1, v1), r = self._region_window(index)
        from spec_tpu import native
        try:
            data = np.fromfile(imgname, np.uint8)
        except OSError:
            raise FileNotFoundError(imgname)
        probe = None
        if data.size >= 2 and data[0] == 0xFF and data[1] == 0xD8:
            probe = native.jpeg_probe(data)
            if probe is not None and (
                    probe[2] != 1              # EXIF-rotated: cv2 path
                    or (len(probe) > 3 and probe[3])):  # progressive
                probe = None
        if probe is not None:
            H, W = probe[0], probe[1]
            x0, y0, x1, y1 = self._clamped_window(
                u0, v0, u1, v1, r, -(-H // r), -(-W // r))
            if x1 <= x0 or y1 <= y0:
                return None                    # box fully off-frame
            got = native.jpeg_decode_roi(data, x0, y0, x1 - x0, y1 - y0,
                                         reduce=r)
            if got is None:
                return None
            region = got[0]
        else:
            cv_img, dims = self._decode(imgname, r)
            H, W = int(dims[0]), int(dims[1])
            x0, y0, x1, y1 = self._clamped_window(
                u0, v0, u1, v1, r, cv_img.shape[0], cv_img.shape[1])
            if x1 <= x0 or y1 <= y0 or cv_img.dtype != np.uint8:
                return None
            region = np.ascontiguousarray(cv_img[y0:y1, x0:x1])
        self._region_cache.put(index, region, x0, y0, r, (H, W))
        return region, {'x0': x0, 'y0': y0, 'reduce': r,
                        'full_hw': (H, W)}

    def _region_covers(self, region, meta, plans, r):
        """Does the cached region contain every bilinear tap of every
        plan? Can go stale when the aug bounds GROW between runs (the
        window is sized to the fill-time config) — a stale region would
        silently zero-pad crop borders, so detect and refill instead."""
        H, W = meta['full_hw']
        for res, aff, box in plans:
            win = T.sample_window(aff, box, res, (H, W), r)
            if win is None:
                continue    # crop misses the frame: all-zero either way
            x0, y0, w, h = win
            if (x0 < meta['x0'] or y0 < meta['y0']
                    or x0 + w > meta['x0'] + region.shape[1]
                    or y0 + h > meta['y0'] + region.shape[0]):
                return False
        return True

    def _region_crops(self, index, imgname, center, scale, rot,
                      want_disp):
        got = self._region_cache.get(index)
        fresh = got is None
        if fresh:
            got = self._fill_region(index, imgname)
        if got is None:
            return None
        region, meta = got
        r = meta['reduce']
        from spec_tpu import native
        plans = self._plans(center, scale, rot, want_disp, r)
        # A cache written under OLD aug bounds can be stale two ways:
        # spatially (coverage check below) or in GRID (its reduce is
        # coarser than the current bounds' finest need — serving it
        # would silently upsample the crop). Both refill.
        stale_grid = r > self._region_window(index)[1]
        if stale_grid or not self._region_covers(region, meta, plans, r):
            if fresh:
                return None       # window math can't cover: cv2 path
            got = self._fill_region(index, imgname)   # stale: refill
            if got is None:
                return None
            region, meta = got
            r = meta['reduce']
            plans = self._plans(center, scale, rot, want_disp, r)
            if not self._region_covers(region, meta, plans, r):
                return None
        origin = (meta['x0'], meta['y0'])
        crops = [native.crop_affine_u8(region, aff, res, box=box,
                                       reduce=r, origin=origin)
                 for res, aff, box in plans]
        return crops[0], (crops[1] if want_disp else None), \
            np.array(meta['full_hw'], np.float32)

    # -- crop post-processing ---------------------------------------------

    def _rgb(self, out, flip, pn, kp2d):
        if flip:
            out = T.flip_img(out)
        if self.occluders is not None and self.aug.use_occlusion:
            out = occlude_with_objects(
                out, self.occluders, rng=self.rng, kp2d=kp2d,
                img_size=self.img_res)
        if self.is_train and self.aug.use_motion_blur:
            out = T.motion_blur(out, self.rng)
        out = np.clip(out * pn[None, None, :], 0, 255)
        out = out.astype(np.float32) / 255.0
        if self.normalize:
            out = T.normalize_img(out)
        return out  # HWC (NHWC batches; the reference emits CHW)

    def _j2d(self, kp, center, scale, rot, flip):
        res = [self.img_res, self.img_res]
        t = T.get_transform(center, scale, res, rot=rot)
        # SPIN semantics (j2d_processing + transform): input kp+1, the
        # transform subtracts 1, applies t, truncates to int, adds 1.
        pts = np.concatenate(
            [kp[:, :2], np.ones((kp.shape[0], 1))], axis=1)
        mapped = (t @ pts.T).T[:, :2]
        kp = kp.copy()
        kp[:, :2] = mapped.astype(int) + 1
        kp[:, :-1] = 2.0 * kp[:, :-1] / self.img_res - 1.0
        if flip:
            kp = T.flip_kp(kp)
        return kp.astype(np.float32)

    def _j3d(self, S, rot, flip):
        if rot != 0:
            rot_rad = -rot * np.pi / 180
            sn, cs = np.sin(rot_rad), np.cos(rot_rad)
            R = np.eye(3)
            R[0, :2] = [cs, -sn]
            R[1, :2] = [sn, cs]
            S[:, :3] = np.einsum('ij,kj->ki', R, S[:, :3])
        if flip:
            S = T.flip_kp(S)
        return S.astype(np.float32)

    def _pose(self, pose, rot, flip):
        pose = pose.copy()
        pose[:3] = T.rot_aa(pose[:3], rot)
        if flip:
            pose = T.flip_pose(pose)
        return pose.astype(np.float32)


def _euler_pitch_roll(pitch, roll):
    """R = Rx(pitch) @ Rz(roll) — the reference's pred-cam rotation
    (cam_dataset.py:637-639 via batch_euler2matrix([pitch, 0, roll]);
    PARE's euler->quaternion composition is qx ⊗ qy ⊗ qz, i.e. the
    x-rotation outermost). One shared definition in core.geometry."""
    from spec_tpu.core.geometry import euler_pitch_roll_np
    return euler_pitch_roll_np(pitch, roll)


def _rotate_global_aa(rotmat, aa):
    import cv2
    R0, _ = cv2.Rodrigues(aa.astype(np.float64))
    out, _ = cv2.Rodrigues(rotmat.astype(np.float64) @ R0)
    return out.reshape(3).astype(np.float32)
