"""SPEC demo CLI: full two-stage pipeline on an image folder, a video
file, or a live webcam/stream (the reference stubs the latter two modes
with NotImplementedError, scripts/spec_demo.py:39-42,67-68).

Mirror of reference ``scripts/spec_demo.py`` + ``spec/tester.py:40-209``
with the TPU-native restructuring (SURVEY.md §2.4):

  * CamCalib runs **in-process** (one jitted batch per shape bucket) —
    the reference forks ``python scripts/camcalib_demo.py`` and round-trips
    through pickle files (spec/tester.py:86-88); the pickles are still
    written for output compatibility.
  * Detections come from a precomputed file (``--bbox_file``) or a
    whole-image fallback (``--full_frame_bbox``) — the reference's YOLOv3
    dependency is pluggable, not baked in.
  * All person crops across all images run as fixed-size padded batches
    through ONE compiled SPEC graph (the reference compiles per image with
    a dynamic person count).

Outputs per image: ``spec_results/<img>.pkl`` with the model output dict
(smpl_vertices/joints3d/joints2d, pred_cam_t, pred_pose/shape/cam), and
overlay renders when rendering is enabled.
"""

from __future__ import annotations

import argparse
import os
import re
import time
from typing import Optional

import joblib
import numpy as np

from spec_tpu.data.detection import (
    bbox_to_center_scale,
    full_image_bboxes,
    load_bboxes_file,
)
from spec_tpu.data.image_folder import list_images
from spec_tpu.data.transforms import crop as spin_crop, normalize_img
from spec_tpu.utils import paths
from spec_tpu.utils.cam_params import read_cam_params


# Process-level cache: the chunked video demo runs the folder pipeline
# once per chunk — checkpoint loads and jit traces must happen once.
_MODEL_CACHE: dict = {}


def _get_spec_model(smpl_model_dir: str, cfg_file: str, spec_ckpt: str,
                    img_res: int):
    import jax
    import jax.numpy as jnp
    from spec_tpu.core import smpl as S
    from spec_tpu.models import HMR
    from spec_tpu.utils.checkpoints import load_spec_variables

    spec_ckpt = spec_ckpt or paths.spec_checkpoint_path()
    key = (smpl_model_dir, cfg_file, spec_ckpt, img_res)
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]

    assets = S.load_assets_or_test(smpl_model_dir, tag='spec')
    # Model hyperparams from the config shipped with the checkpoint
    # (reference builds the tester's HMR from --cfg, spec/tester.py:49-61).
    backbone, use_cam_feats = 'resnet50', False
    if cfg_file:
        from spec_tpu.utils.config import hmr_hparams_from_cfg
        backbone, use_cam_feats = hmr_hparams_from_cfg(cfg_file)
    model = HMR(backbone=backbone, use_cam=True, use_cam_feats=use_cam_feats)
    if os.path.exists(spec_ckpt):
        variables = load_spec_variables(spec_ckpt, backbone=backbone)
    else:
        print(f'[spec] WARNING: checkpoint {spec_ckpt} not found; '
              'using random init')
        ex = jnp.zeros((1, img_res, img_res, 3), jnp.float32)
        eye = jnp.tile(jnp.eye(3), (1, 1, 1))
        one = jnp.ones((1,))
        variables = model.init(
            jax.random.PRNGKey(0), assets, ex, eye, eye, one,
            jnp.ones((1, 2)), one, one)

    # Variables as ARGUMENTS (closure arrays bake into the HLO: compile-
    # cache misses across runs + bloated remote-compile payloads).
    @jax.jit
    def infer(variables, images, cam_rotmat, K, scale, center, img_w,
              img_h):
        return model.apply(variables, assets, images, cam_rotmat, K,
                           scale, center, img_w, img_h)

    _MODEL_CACHE[key] = (assets, model, variables, infer)
    return _MODEL_CACHE[key]


# Bounded decoded-frame cache for the crop loop (work items are grouped
# by image, so a small window suffices even with many crops per image).
_IMAGE_CACHE_MAX = 32


def _stage1_keyframes(image_names, every, cut_threshold=0.5):
    """``--camcalib_every`` keyframe selection over an ordered image
    list: every Nth frame PLUS any frame whose cheap gray-histogram
    signature jumps vs its predecessor (a shot cut — the camera is a
    per-shot quantity, so a cut must re-anchor stage 1 even off-stride;
    the rule is serving.KeyframeSelector, shared with the predictor
    stream and the webcam loop). Signatures come from ~96-px thumbnails
    (PIL ``draft`` does the JPEG downscale in DCT space — ~ms/frame for
    JPEG sources; non-JPEG formats pay a full decode per frame, so on
    e.g. large PNG folders prefer ``cut_threshold=0`` if the source is
    known single-shot). An unreadable frame keeps the previous
    signature, so a cut spanning it still re-anchors."""
    from PIL import Image

    from spec_tpu.serving import KeyframeSelector, frame_signature

    sel = KeyframeSelector(every, cut_threshold)
    keys = []
    for name in image_names:
        sig = None
        if sel.cut_threshold > 0:
            try:
                with Image.open(name) as im:
                    im.draft('L', (96, 96))
                    im = im.convert('L')
                    im.thumbnail((96, 96))
                    sig = frame_signature(np.asarray(im))
            except Exception:
                sig = None
        if sel.is_keyframe(sig):
            keys.append(name)
    return keys


def _carry_cameras_forward(image_names, cam_out, shapes):
    """``--camcalib_every`` keyframe fill: every image without a stage-1
    pickle gets its latest preceding keyframe's camera (the camera is a
    per-shot quantity). f_pix is defined w.r.t. the frame height
    (scripts/camcalib_demo.py:129), so it is rescaled when a skipped
    frame's size differs from its keyframe's."""
    last = None
    last_h = 0
    for name in image_names:
        base = os.path.basename(name)
        pkl = os.path.join(cam_out, base + '.pkl')
        if os.path.exists(pkl):
            last = joblib.load(pkl)
            last_h = shapes[base][0]
        elif last is not None:
            d = dict(last)
            h = shapes[base][0]
            if h != last_h:
                d['f_pix'] = float(h / (2.0 * np.tan(d['vfov'] / 2)))
            joblib.dump(d, pkl)


def run_spec_on_folder(
    image_folder: str,
    output_folder: str,
    spec_ckpt: str = '',
    camcalib_ckpt: str = '',
    bbox_file: str = '',
    batch_size: int = 32,
    img_res: int = 224,
    save_results: bool = True,
    render: bool = True,
    smpl_model_dir: str = '',
    detection_threshold: float = 0.7,
    save_obj: bool = False,
    cfg_file: str = '',
    detector: str = '',
    yolo_weights: str = '',
    yolo_img_size: int = 416,
    min_size: int = 600,
    camcalib_every: int = 1,
    cut_threshold: float = 0.5,
):
    import cv2
    import jax
    import jax.numpy as jnp
    from spec_tpu.cli.camcalib_demo import run_camcalib_on_folder

    t_total_start = time.perf_counter()
    os.makedirs(output_folder, exist_ok=True)
    cam_out = os.path.join(output_folder, 'camcalib')
    res_out = os.path.join(output_folder, 'spec_results')
    img_out = os.path.join(output_folder, 'spec_images')
    for d in (cam_out, res_out, img_out):
        os.makedirs(d, exist_ok=True)

    # Detections.
    image_names = list_images(image_folder)
    shapes = {}
    for name in image_names:
        from PIL import Image
        with Image.open(name) as im:
            w, h = im.size
        shapes[os.path.basename(name)] = (h, w)
    if bbox_file:
        dets = load_bboxes_file(bbox_file)
    elif detector == 'yolo':
        from spec_tpu.data.detection import run_yolo_detections
        dets = run_yolo_detections(
            image_names, yolo_weights, img_size=yolo_img_size,
            conf_thresh=detection_threshold)
        # Persist (merged across video-mode chunk flushes) so tracking
        # and users can consume them like any --bbox_file.
        import json
        det_json = os.path.join(output_folder, 'detections.json')
        merged = {}
        if os.path.exists(det_json):
            with open(det_json) as f:
                merged = json.load(f)
        merged.update({k: np.asarray(v).tolist() for k, v in dets.items()})
        with open(det_json, 'w') as f:
            json.dump(merged, f)
    else:
        print('[spec] no --bbox_file given; using full-frame boxes')
        dets = full_image_bboxes(shapes)

    assets, model, variables, infer = _get_spec_model(
        smpl_model_dir, cfg_file, spec_ckpt, img_res)

    t_start = time.perf_counter()

    # Stage 1: CamCalib, in-process (jitted per shape bucket).
    # min_size != 600 is the reduced-bucket serving trade — pair it with
    # a checkpoint fine-tuned at that bucket
    # (configs/camcalib/config_sa_bias_l2_min*.yaml).
    camcalib_every = max(1, int(camcalib_every))
    cam_list = (image_names if camcalib_every == 1
                else _stage1_keyframes(image_names, camcalib_every,
                                       cut_threshold=cut_threshold))
    run_camcalib_on_folder(
        image_folder, cam_out, ckpt=camcalib_ckpt, save_images=False,
        min_size=min_size, image_list=cam_list)
    if camcalib_every > 1:
        _carry_cameras_forward(image_names, cam_out, shapes)

    # Flatten all detections into one work list.
    work = []  # (imgname, det_idx, center, scale, cam_rotmat, K, w, h)
    images_cache = {}
    for name in image_names:
        base = os.path.basename(name)
        if base not in dets or len(dets[base]) == 0:
            continue
        h, w = shapes[base]
        rotmat, K, *_ = read_cam_params(
            os.path.join(cam_out, base + '.pkl'), w, h)
        centers, scales = bbox_to_center_scale(dets[base])
        for di in range(len(centers)):
            work.append((name, di, centers[di], scales[di], rotmat, K, w, h))

    n_model_time = 0.0
    outputs_per_image: dict = {}
    for s in range(0, len(work), batch_size):
        chunk = work[s:s + batch_size]
        n_valid = len(chunk)
        while len(chunk) < batch_size:
            chunk = chunk + [chunk[-1]]
        from spec_tpu import native

        crops, metas = [], []
        use_native = native.available()
        for (name, di, center, scale, rotmat, K, w, h) in chunk:
            if name not in images_cache:
                # uint8 + bounded LRU: a float32 never-evicted cache
                # holds ~25 MB per 1080p frame — a 500-frame video chunk
                # would pin >12 GB of host RAM.
                while len(images_cache) >= _IMAGE_CACHE_MAX:
                    images_cache.pop(next(iter(images_cache)))
                images_cache[name] = cv2.cvtColor(
                    cv2.imread(name), cv2.COLOR_BGR2RGB)
            else:
                images_cache[name] = images_cache.pop(name)  # LRU touch
            frame = images_cache[name].astype(np.float32)
            if use_native:
                c = native.spin_crop_batch(
                    frame, np.asarray([center], np.float32),
                    np.asarray([scale], np.float32), res=img_res)[0]
            else:
                c = normalize_img(spin_crop(
                    frame, center, scale, [img_res, img_res]) / 255.0)
            crops.append(c)
            metas.append((name, di, center, scale, rotmat, K, w, h))

        arr = jnp.asarray(np.stack(crops))
        rot = jnp.asarray(np.stack([m[4] for m in metas]))
        Ks = jnp.asarray(np.stack([m[5] for m in metas]))
        scl = jnp.asarray(np.array([m[3] for m in metas], np.float32))
        ctr = jnp.asarray(np.stack([m[2] for m in metas]).astype(np.float32))
        ws = jnp.asarray(np.array([m[6] for m in metas], np.float32))
        hs = jnp.asarray(np.array([m[7] for m in metas], np.float32))

        t0 = time.perf_counter()
        out = infer(variables, arr, rot, Ks, scl, ctr, ws, hs)
        jax.block_until_ready(out['smpl_vertices'])
        n_model_time += time.perf_counter() - t0

        out_np = {k: np.asarray(v) for k, v in out.items()}
        for bi in range(n_valid):
            name = metas[bi][0]
            outputs_per_image.setdefault(name, []).append(
                {k: v[bi] for k, v in out_np.items()})

    # Dump per-image results (reference layout spec/tester.py:158-163).
    for name, person_outs in outputs_per_image.items():
        merged = {k: np.stack([p[k] for p in person_outs])
                  for k in person_outs[0]}
        base = os.path.basename(name)
        stem = base.rsplit('.', 1)[0]
        if save_results:
            joblib.dump(merged, os.path.join(res_out, stem + '.pkl'))
        if save_obj:
            mesh_dir = os.path.join(output_folder, 'meshes', stem)
            os.makedirs(mesh_dir, exist_ok=True)
            for pi, verts in enumerate(merged['smpl_vertices']):
                write_obj(os.path.join(mesh_dir, f'{pi:06d}.obj'),
                          verts, np.asarray(assets.faces))
                np.save(os.path.join(mesh_dir, f'{pi:06d}.npy'),
                        merged['pred_cam_t'][pi])
        if render:
            _render_overlays(name, merged, cam_out, img_out, assets)

    n_img = len(outputs_per_image)
    total = time.perf_counter() - t_start
    total_with_load = time.perf_counter() - t_total_start
    # FPS with and without model/checkpoint load (reference
    # scripts/spec_demo.py:81-88 logs both).
    print(f'[spec] {n_img} images / {len(work)} crops; model time '
          f'{n_model_time:.2f}s; e2e {total:.2f}s '
          f'({n_img / max(total, 1e-6):.1f} img/s excl. load, '
          f'{n_img / max(total_with_load, 1e-6):.1f} img/s incl. load)')
    return outputs_per_image


def _smooth_video_tracks(output_folder, vid_file, names, per_frame, ids,
                         fps, frame_hw, folder_kwargs,
                         min_cutoff=None, beta=None):
    """Post-pass for ``--smooth``: One-Euro-filter each track's SMPL
    parameters, recompute vertices/joints with ONE batched jitted
    ``smpl_cam_head`` call, rewrite the result pickles, and re-encode the
    annotated video from the smoothed outputs.

    Implements the reference's dead ``--smooth`` flag
    (scripts/spec_demo.py:138 accepts it, nothing consumes it) — see
    spec_tpu/utils/smoothing.py for the filter/recipe rationale.
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from spec_tpu.core import smpl as S
    from spec_tpu.models.heads.smpl_head import smpl_cam_head
    from spec_tpu.utils.smoothing import smooth_track_params

    res_out = os.path.join(output_folder, 'spec_results')
    cam_out = os.path.join(output_folder, 'camcalib')
    h, w = frame_hw
    img_res = folder_kwargs.get('img_res', 224)
    assets = S.load_assets_or_test(
        folder_kwargs.get('smpl_model_dir', ''), tag='smooth')

    # Load per-frame results + cameras once.
    results, cam_params, cam_raw = {}, {}, {}
    for fi, name in enumerate(names):
        stem = name.rsplit('.', 1)[0]
        p = os.path.join(res_out, stem + '.pkl')
        if os.path.exists(p):
            results[fi] = joblib.load(p)
            rotmat, K, *_ = read_cam_params(
                os.path.join(cam_out, name + '.pkl'), w, h)
            cam_params[fi] = (rotmat, K)
            cam_raw[fi] = joblib.load(os.path.join(cam_out, name + '.pkl'))

    # Group (frame, person) rows into tracks and smooth each track.
    by_track: dict = {}
    for fi, tid_arr in enumerate(ids):
        for pi, tid in enumerate(tid_arr):
            if fi in results and pi < len(results[fi]['pred_pose']):
                by_track.setdefault(int(tid), []).append((fi, pi))
    items = []   # (fi, pi, pose(24,3,3), betas(10), cam(3))
    for tid, fps_pis in by_track.items():
        fps_pis.sort()
        r = {k: np.stack([results[fi][k][pi] for fi, pi in fps_pis])
             for k in ('pred_pose', 'pred_shape', 'pred_cam')}
        kw = {}
        if min_cutoff is not None:
            kw['min_cutoff'] = min_cutoff
        if beta is not None:
            kw['beta'] = beta
        # Pass the track's frame indices: tracks bridge occlusions
        # (IoUTracker max_age), so rows are not always 1/fps apart.
        sm = smooth_track_params(
            r['pred_pose'], r['pred_shape'], r['pred_cam'], fps,
            frames=np.asarray([fi for fi, _ in fps_pis]), **kw)
        for t, (fi, pi) in enumerate(fps_pis):
            items.append((fi, pi, sm['pose'][t], sm['betas'][t],
                          sm['cam'][t]))
    if not items:
        return

    # One padded batched SMPL + projection recompute on device.
    recompute = jax.jit(
        lambda a, pose, betas, cam, rot, K, scl, ctr, ws, hs:
        smpl_cam_head(a, pose, betas, cam, rot, K, scl, ctr, ws, hs,
                      crop_res=img_res))
    from spec_tpu.utils.batching import pad_pow2

    B = 64
    for s0 in range(0, len(items), B):
        chunk = items[s0:s0 + B]
        n_valid = len(chunk)
        while len(chunk) < pad_pow2(n_valid, B):
            chunk = chunk + [chunk[-1]]
        centers, scales = [], []
        for fi, pi, *_ in chunk:
            c, sc = bbox_to_center_scale(
                per_frame[fi][pi][None])
            centers.append(c[0]), scales.append(sc[0])
        out = recompute(
            assets,
            jnp.asarray(np.stack([it[2] for it in chunk])),
            jnp.asarray(np.stack([it[3] for it in chunk])),
            jnp.asarray(np.stack([it[4] for it in chunk])),
            jnp.asarray(np.stack([cam_params[it[0]][0] for it in chunk])),
            jnp.asarray(np.stack([cam_params[it[0]][1] for it in chunk])),
            jnp.asarray(np.array(scales, np.float32)),
            jnp.asarray(np.stack(centers).astype(np.float32)),
            jnp.full((len(chunk),), float(w)),
            jnp.full((len(chunk),), float(h)))
        out = {k: np.asarray(v) for k, v in out.items()}
        for bi in range(n_valid):
            fi, pi, pose, betas, cam = chunk[bi]
            r = results[fi]
            for k in ('smpl_vertices', 'smpl_joints3d', 'smpl_joints2d',
                      'pred_cam_t'):
                if k in r:
                    r[k][pi] = out[k][bi]
            r['pred_pose'][pi] = pose
            r['pred_shape'][pi] = betas
            r['pred_cam'][pi] = cam

    for fi, r in results.items():
        stem = names[fi].rsplit('.', 1)[0]
        joblib.dump(r, os.path.join(res_out, stem + '.pkl'))

    if not folder_kwargs.get('render', True):
        # --no_render: the first-pass video is raw frames; smoothing only
        # updates the result pickles, no overlay re-encode.
        print(f'[spec] smoothed {len(items)} person-frames across '
              f'{len(by_track)} tracks (render off: pickles only)')
        return

    # Re-encode the annotated video from the smoothed results (second
    # decode pass — chunked frames were deleted to bound disk use).
    cap = cv2.VideoCapture(vid_file)
    tmp_path = os.path.join(output_folder, '.spec_video_smooth.mp4')
    out_path = os.path.join(output_folder, 'spec_video_output.mp4')
    vw, fi = None, 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if vw is None:
            fh, fw = frame.shape[:2]
            vw = cv2.VideoWriter(tmp_path,
                                 cv2.VideoWriter_fourcc(*'mp4v'), fps,
                                 (fw, fh))
        if fi in results:
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            vis = _render_overlay_img(rgb, results[fi], cam_raw[fi],
                                      assets)
            frame = cv2.cvtColor(vis, cv2.COLOR_RGB2BGR)
        vw.write(frame)
        fi += 1
    cap.release()
    if vw is not None:
        vw.release()
        os.replace(tmp_path, out_path)
    print(f'[spec] smoothed {len(items)} person-frames across '
          f'{len(by_track)} tracks; re-encoded {out_path}')


def run_spec_on_video(
    vid_file: str,
    output_folder: str,
    keep_frames: bool = False,
    chunk_size: int = 500,
    smooth: bool = False,
    smooth_min_cutoff: Optional[float] = None,
    smooth_beta: Optional[float] = None,
    tracker: str = 'sort',
    **folder_kwargs,
):
    """Video demo: decode frames -> the folder pipeline -> re-encode an
    annotated video (``spec_video_output.mp4`` at the source fps).

    The reference declares ``--mode video`` but raises NotImplementedError
    (scripts/spec_demo.py:39-42,67-68); implemented here on top of the
    folder path so detection/camcalib/crops/rendering behave identically.

    Disk use is bounded: frames are processed in ``chunk_size`` windows
    (decode chunk -> pipeline -> append to the output video -> delete the
    chunk's pngs) so a long clip never materializes in full on disk.
    ``keep_frames`` moves processed frames to ``frames/`` instead of
    deleting them. Returns the output video path.
    """
    import shutil

    import cv2

    cap = cv2.VideoCapture(vid_file)
    if not cap.isOpened():
        raise FileNotFoundError(f'cannot open video: {vid_file}')
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0

    # Video-mode detections are keyed by the internally generated frame
    # names (000000.png, 000001.png, ...). A key mismatch would silently
    # produce zero detections everywhere — fail fast, before decoding.
    vid_dets = None
    if folder_kwargs.get('bbox_file'):
        vid_dets = load_bboxes_file(folder_kwargs['bbox_file'])
        # Frames with no detections may legitimately be omitted, so
        # require only that SOME key follows the convention rather than
        # any specific frame being present.
        if not any(re.fullmatch(r'\d{6}\.(png|jpg)', k)
                   for k in vid_dets):
            raise ValueError(
                f'--bbox_file {folder_kwargs["bbox_file"]!r} has no '
                f"frame-name-convention keys; video-mode bbox files must "
                f"be keyed by decoded frame names '000000.png', "
                f"'000001.png', ... "
                f'(got keys like {sorted(vid_dets)[:3]})')
    work_dir = os.path.join(output_folder, 'frames_chunk')
    kept_dir = os.path.join(output_folder, 'frames')
    os.makedirs(work_dir, exist_ok=True)
    if keep_frames:
        os.makedirs(kept_dir, exist_ok=True)

    img_out = os.path.join(output_folder, 'spec_images')
    out_path = os.path.join(output_folder, 'spec_video_output.mp4')
    vw = None
    names: list = []          # all frame names, in order
    chunk: list = []          # names of the current undecoded-yet chunk

    def flush(chunk_names):
        nonlocal vw
        if not chunk_names:
            return
        run_spec_on_folder(work_dir, output_folder, **folder_kwargs)
        for name in chunk_names:
            src = os.path.join(work_dir, name)
            rend = os.path.join(img_out, name)
            frame = cv2.imread(rend if os.path.exists(rend) else src)
            if vw is None:
                fh, fw = frame.shape[:2]
                vw = cv2.VideoWriter(
                    out_path, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                    (fw, fh))
            vw.write(frame)
            if keep_frames:
                shutil.move(src, os.path.join(kept_dir, name))
            else:
                os.remove(src)

    first_hw = None
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if first_hw is None:
            first_hw = frame.shape[:2]
        name = f'{len(names):06d}.png'  # png: lossless round-trip
        cv2.imwrite(os.path.join(work_dir, name), frame)
        names.append(name)
        chunk.append(name)
        if len(chunk) >= chunk_size:
            flush(chunk)
            chunk = []
    cap.release()
    flush(chunk)
    if not names:
        shutil.rmtree(work_dir, ignore_errors=True)
        raise ValueError(f'no frames decoded from {vid_file}')
    vw.release()
    shutil.rmtree(work_dir, ignore_errors=True)

    # Person-identity tracking across frames (the reference ecosystem
    # gets this from multi_person_tracker; same SORT algorithm in-repo,
    # greedy IoU selectable via --tracker iou).
    from spec_tpu.data.tracking import track_video_boxes

    h, w = first_hw
    if vid_dets is not None:
        dets = vid_dets    # validated before decoding, above
    elif folder_kwargs.get('detector') == 'yolo':
        # run_spec_on_folder persisted its per-chunk YOLO detections.
        dets = load_bboxes_file(
            os.path.join(output_folder, 'detections.json'))
    else:
        dets = full_image_bboxes({n: (h, w) for n in names})
    per_frame = [np.asarray(dets.get(n, np.zeros((0, 4), np.float32)),
                            np.float32).reshape(-1, 4) for n in names]
    ids = track_video_boxes(per_frame, method=tracker)
    tracks: dict = {}
    for fi, (bx, tid_arr) in enumerate(zip(per_frame, ids)):
        for b, tid in zip(bx, tid_arr):
            tr = tracks.setdefault(int(tid), {'frames': [], 'bboxes': []})
            tr['frames'].append(fi)
            tr['bboxes'].append(np.asarray(b))
    tracks = {tid: {'frames': np.asarray(t['frames']),
                    'bboxes': np.stack(t['bboxes'])}
              for tid, t in tracks.items()}
    joblib.dump(tracks, os.path.join(output_folder, 'tracking.pkl'))

    if smooth and folder_kwargs.get('save_results', True):
        _smooth_video_tracks(output_folder, vid_file, names, per_frame,
                             ids, fps, (h, w), folder_kwargs,
                             min_cutoff=smooth_min_cutoff,
                             beta=smooth_beta)
    elif smooth:
        print('[spec] WARNING: --smooth needs saved results; skipped '
              '(drop --no_save)')

    print(f'[spec] wrote {out_path} ({len(names)} frames @ {fps:.1f} fps)')
    return out_path


def run_spec_webcam(
    source: str = '0',
    output_folder: str = 'logs/demo',
    spec_ckpt: str = '',
    camcalib_ckpt: str = '',
    cfg_file: str = '',
    smpl_model_dir: str = '',
    detector: str = '',
    yolo_weights: str = '',
    yolo_img_size: int = 416,
    min_size: int = 600,
    img_res: int = 224,
    max_frames: int = 0,
    display: bool = False,
    save_results: bool = True,
    camcalib_every: int = 1,
    cut_threshold: float = 0.5,
):
    """Webcam / live-stream demo: per-frame low-latency loop.

    The reference declares ``--mode webcam`` but raises
    NotImplementedError (scripts/spec_demo.py:67-68); implemented here on
    the serving engine (:class:`spec_tpu.serving.SpecPredictor`), which is
    the latency path: one compiled graph per padded shape, so a
    single-frame call pays a 1-crop stage-2 batch, not ``batch_size``.

    ``source`` is a camera index ('0', '1', ...) or any cv2-readable
    stream/file path (how the headless tests drive this loop). Each frame:
    detect (``detector='yolo'`` or a full-frame box) -> CamCalib ->
    SPEC -> horizon/skeleton/mesh overlay -> annotated
    ``spec_webcam_output.mp4`` (+ optional ``cv2.imshow`` with ``q`` to
    quit when ``display``). Per-frame results go to
    ``webcam_results/{i:06d}.pkl`` in the folder-mode layout. Prints
    mean/p50/p90 end-to-end latency on exit.

    Returns (n_frames, latencies_ms).
    """
    import cv2

    from spec_tpu.serving import SpecPredictor

    cap = cv2.VideoCapture(int(source) if source.isdigit() else source)
    if not cap.isOpened():
        raise FileNotFoundError(f'cannot open capture source: {source!r}')
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0

    os.makedirs(output_folder, exist_ok=True)
    res_out = os.path.join(output_folder, 'webcam_results')
    if save_results:
        os.makedirs(res_out, exist_ok=True)

    # batch_size bounds the per-call pad ceiling; 8 keeps compile count
    # low (1/2/4/8 person pads) while a lone person costs a 1-crop batch.
    pred = SpecPredictor(
        spec_ckpt=spec_ckpt, camcalib_ckpt=camcalib_ckpt,
        cfg_file=cfg_file, smpl_model_dir=smpl_model_dir,
        img_res=img_res, batch_size=8, min_size=min_size,
        detector=detector, yolo_weights=yolo_weights,
        yolo_img_size=yolo_img_size, cut_threshold=cut_threshold)
    assets = pred.assets

    out_path = os.path.join(output_folder, 'spec_webcam_output.mp4')
    vw = None
    latencies: list = []
    fi = 0
    from spec_tpu.serving import KeyframeSelector, frame_signature
    sel = KeyframeSelector(camcalib_every, pred.cut_threshold)
    while True:
        ok, frame_bgr = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
        h, w = rgb.shape[:2]

        t0 = time.perf_counter()
        # Stage 1 runs explicitly so the horizon overlay exists even on
        # person-less frames; predict() reuses it via ``cameras=``.
        # --camcalib_every N amortizes it: the webcam camera is static,
        # so keyframes every N frames cut the dominant per-frame cost.
        # A shot cut (histogram-delta trigger, serving.KeyframeSelector)
        # forces an off-stride keyframe so file/stream sources with
        # scene changes never hold a stale camera.
        if sel.is_keyframe(frame_signature(rgb)
                           if camcalib_every > 1 and sel.cut_threshold > 0
                           else None):
            cam = pred.estimate_cameras([rgb])[0]
        if pred.detector is not None:
            persons = pred.predict([rgb], cameras=[cam])[0]
        else:
            # Same full-frame box convention as folder/video modes
            # (0.9*max-side square, data/detection.py).
            full = full_image_bboxes({'f': (h, w)})['f']
            persons = pred.predict([rgb], [full], cameras=[cam])[0]
        latencies.append((time.perf_counter() - t0) * 1000.0)

        if persons:
            merged = {k: np.stack([p[k] for p in persons])
                      for k in persons[0] if k != 'camera'}
            vis = _render_overlay_img(rgb, merged, cam, assets)
        else:
            from spec_tpu.utils.vis import draw_horizon_line
            merged = None
            vis = draw_horizon_line(rgb, cam['vfov'], cam['pitch'],
                                    cam['roll'], debug_text=False)

        if save_results:
            dump = dict(merged or {})
            dump['camera'] = cam
            joblib.dump(dump, os.path.join(res_out, f'{fi:06d}.pkl'))

        out_bgr = cv2.cvtColor(vis, cv2.COLOR_RGB2BGR)
        if vw is None:
            vw = cv2.VideoWriter(out_path,
                                 cv2.VideoWriter_fourcc(*'mp4v'), fps,
                                 (w, h))
        vw.write(out_bgr)
        if display:
            try:
                cv2.imshow('spec', out_bgr)
                if (cv2.waitKey(1) & 0xFF) == ord('q'):
                    break
            except cv2.error:
                print('[spec] WARNING: no display available; '
                      'continuing headless')
                display = False
        fi += 1
        if max_frames and fi >= max_frames:
            break
    cap.release()
    if vw is not None:
        vw.release()
    if display:
        cv2.destroyAllWindows()

    if latencies:
        srt = sorted(latencies)
        p = lambda q: srt[min(len(srt) - 1, int(q * len(srt)))]  # noqa: E731
        print(f'[spec] webcam: {fi} frames -> {out_path}; e2e latency '
              f'mean {np.mean(latencies):.1f} ms, p50 {p(0.5):.1f} ms, '
              f'p90 {p(0.9):.1f} ms (first frame incl. compile '
              f'{latencies[0]:.0f} ms)')
    else:
        print(f'[spec] webcam: no frames read from source {source!r}')
    return fi, latencies


def write_obj(path: str, vertices: np.ndarray, faces: np.ndarray):
    """Wavefront OBJ export (the reference's --save_obj path,
    spec/tester.py:183-189 + camera translation sidecar .npy)."""
    with open(path, 'w') as f:
        for v in vertices:
            f.write(f'v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n')
        for tri in faces:
            f.write(f'f {tri[0] + 1} {tri[1] + 1} {tri[2] + 1}\n')


def _render_overlay_img(img_rgb, merged, cam_data, assets):
    """Joints2d + horizon (+ optional mesh) overlay on an in-memory RGB
    frame. Mesh rendering is provided by spec_tpu.utils.renderer."""
    from spec_tpu.utils.vis import draw_horizon_line, draw_skeleton

    vis = draw_horizon_line(img_rgb, float(cam_data['vfov']),
                            float(cam_data['pitch']),
                            float(cam_data['roll']), debug_text=False)
    for kp in merged['smpl_joints2d']:
        vis = draw_skeleton(vis, kp)
    try:
        from spec_tpu.utils.renderer import render_mesh_overlay
        vis = render_mesh_overlay(
            vis, merged['smpl_vertices'], merged['pred_cam_t'],
            np.asarray(assets.faces),
            focal_length=float(cam_data['f_pix']),
            pitch=float(cam_data['pitch']), roll=float(cam_data['roll']))
    except Exception:
        pass  # mesh overlay optional
    return vis


def _render_overlays(imgname, merged, cam_out, img_out, assets):
    """File-based wrapper over :func:`_render_overlay_img`."""
    import cv2

    base = os.path.basename(imgname)
    img = cv2.cvtColor(cv2.imread(imgname), cv2.COLOR_BGR2RGB)
    data = joblib.load(os.path.join(cam_out, base + '.pkl'))
    vis = _render_overlay_img(img, merged, data, assets)
    cv2.imwrite(os.path.join(img_out, base),
                cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))


def main(argv=None):
    parser = argparse.ArgumentParser(description='SPEC demo (TPU)')
    parser.add_argument('--image_folder', type=str, default='',
                        help='input folder (folder mode)')
    parser.add_argument('--output_folder', type=str, default='logs/demo')
    parser.add_argument('--spec_ckpt', type=str, default='')
    parser.add_argument('--cfg', type=str, default='',
                        help='model config yaml shipped with the '
                             'checkpoint (HMR.BACKBONE / USE_CAM_FEATS; '
                             'reference spec/tester.py:49-61)')
    parser.add_argument('--camcalib_ckpt', type=str, default='')
    parser.add_argument('--bbox_file', type=str, default='',
                        help='precomputed detections json/npz '
                             '{img: [[cx,cy,w,h],...]}; in --mode video '
                             'keys must be the decoded frame names '
                             "'000000.png', '000001.png', ...")
    parser.add_argument('--batch_size', type=int, default=32)
    parser.add_argument('--min_size', type=int, default=600,
                        help='stage-1 (CamCalib) min-side resize bucket. '
                             '600 matches the reference fidelity; smaller '
                             'buckets trade accuracy for throughput and '
                             'should be paired with a checkpoint '
                             'fine-tuned at that bucket (configs/'
                             'camcalib/config_sa_bias_l2_min*.yaml)')
    parser.add_argument('--camcalib_every', type=int, default=1,
                        help='run stage 1 (CamCalib) only on every Nth '
                             'frame and reuse the latest keyframe camera '
                             'in between — the camera is a per-shot '
                             'quantity, and stage 1 dominates pipeline '
                             'cost, so N amortizes it ~N-fold for '
                             'video/webcam streams. Hard shot cuts are '
                             'detected (gray-histogram delta) and force '
                             'an off-stride keyframe, so multi-shot '
                             'inputs re-anchor automatically. 1 '
                             '(default) = every frame')
    parser.add_argument('--cut_threshold', type=float, default=0.5,
                        help='shot-cut re-anchor sensitivity for '
                             '--camcalib_every streams: gray-histogram '
                             'L1 delta (in [0, 2]) above which a frame '
                             'becomes an off-stride stage-1 keyframe. '
                             'Raise for strobe/flash footage, 0 '
                             'disables (pure stride; also skips the '
                             'per-frame thumbnail signature — prefer '
                             'that on non-JPEG folders known to be '
                             'single-shot)')
    parser.add_argument('--no_save', action='store_true')
    parser.add_argument('--no_render', action='store_true')
    parser.add_argument('--save_obj', action='store_true')
    parser.add_argument('--smpl_model_dir', type=str, default='')
    parser.add_argument('--vid_file', type=str, default=None,
                        help='video input: runs the full pipeline per '
                             'frame and writes an annotated mp4 '
                             '(implies --mode video)')
    parser.add_argument('--mode', type=str, default='folder',
                        choices=['folder', 'video', 'webcam'])
    parser.add_argument('--chunk_size', type=int, default=500,
                        help='video mode: frames decoded/processed per '
                             'window (bounds disk use on long clips)')
    parser.add_argument('--keep_frames', action='store_true',
                        help='video mode: keep decoded frames on disk')
    # --- reference flag-surface compatibility (scripts/spec_demo.py:94-166).
    # '--ckpt' is the reference's name for the SPEC checkpoint; '--exp'
    # suffixes the output directory (reference :46). '--detector yolo'
    # runs the in-repo TPU-native YOLOv3 (needs --yolo_weights pointed at
    # the official darknet yolov3.weights, reference prepare_data.sh:11);
    # the remaining tracker flags are accepted no-ops; the render-extra
    # flags are accepted and unused exactly as in the reference tester
    # (spec/tester.py); '--smooth' (dead in the reference,
    # scripts/spec_demo.py:138) actually smooths here (video mode).
    parser.add_argument('--ckpt', type=str, default='',
                        help='alias for --spec_ckpt (reference name)')
    parser.add_argument('--exp', type=str, default='',
                        help='experiment suffix appended to the output dir')
    parser.add_argument('--detector', type=str, default='',
                        choices=['', 'yolo', 'maskrcnn'],
                        help="'yolo' runs the in-repo YOLOv3 "
                             '(--yolo_weights required); default is '
                             '--bbox_file / full-frame fallback')
    parser.add_argument('--yolo_weights', type=str, default='',
                        help='path to official darknet yolov3.weights '
                             'for --detector yolo')
    parser.add_argument('--yolo_img_size', type=int, default=416,
                        help='YOLOv3 input size (multiple of 32)')
    for noop in ('--tracking_method', '--staf_dir'):
        parser.add_argument(noop, type=str, default=None,
                            help='accepted for reference CLI parity; '
                                 'detection is pluggable via --bbox_file')
    parser.add_argument('--tracker_batch_size', type=int, default=None,
                        help='accepted for reference CLI parity')
    parser.add_argument('--tracker', type=str, default='sort',
                        choices=['sort', 'iou'],
                        help='[video] identity tracker: sort (Kalman + '
                             'Hungarian, the reference MPT algorithm) or '
                             'iou (greedy last-box IoU)')
    parser.add_argument('--min_cutoff', type=float, default=None,
                        help='[video --smooth] One-Euro cutoff floor Hz '
                             '(default 0.004; lower = smoother at rest)')
    parser.add_argument('--beta', type=float, default=None,
                        help='[video --smooth] One-Euro speed coeff '
                             '(default 0.7; higher = less motion lag)')
    parser.add_argument('--smooth', action='store_true',
                        help='[video mode] One-Euro-smooth each track\'s '
                             'SMPL params and recompute meshes (the '
                             'reference accepts this flag but never '
                             'wires it up; here it works)')
    for noop in ('--wireframe', '--sideview', '--draw_keypoints'):
        parser.add_argument(noop, action='store_true',
                            help='accepted; unused (as in the reference '
                                 'tester) or headless here')
    parser.add_argument('--display', action='store_true',
                        help='[webcam mode] live cv2 window (q quits); '
                             'unused in folder/video mode as in the '
                             'reference tester')
    parser.add_argument('--webcam_source', type=str, default='0',
                        help='[webcam mode] camera index or any '
                             'cv2-readable stream/file URL')
    parser.add_argument('--max_frames', type=int, default=0,
                        help='[webcam mode] stop after N frames '
                             '(0 = until the stream ends / q)')
    args = parser.parse_args(argv)

    from spec_tpu.utils.paths import enable_compilation_cache
    enable_compilation_cache()
    if args.vid_file and args.mode == 'folder':
        args.mode = 'video'
    # ('webcam' needs no input-path validation: --webcam_source defaults
    # to camera 0 and any cv2-readable stream/file works.)
    if args.mode == 'video' and not args.vid_file:
        raise SystemExit('--mode video requires --vid_file')
    if args.mode == 'folder' and not args.image_folder:
        raise SystemExit('--image_folder is required in folder mode')
    if args.ckpt and not args.spec_ckpt:
        args.spec_ckpt = args.ckpt
    out_folder = args.output_folder
    if args.exp:
        # Reference layout: <output>/<input-basename>_<exp>
        # (scripts/spec_demo.py:46).
        src = {'video': args.vid_file,
               'webcam': f'webcam{args.webcam_source}'
                         if args.webcam_source.isdigit()
                         else args.webcam_source,
               }.get(args.mode, args.image_folder)
        out_folder = os.path.join(
            out_folder,
            os.path.basename(src.rstrip('/')).rsplit('.', 1)[0]
            + '_' + args.exp)
    if args.detector == 'maskrcnn':
        raise SystemExit(
            '--detector maskrcnn is not bundled; use --detector yolo '
            '(in-repo) or precompute boxes with any detector and pass '
            '--bbox_file')
    if args.detector == 'yolo' and not args.yolo_weights:
        print('[spec] WARNING: --detector yolo without --yolo_weights '
              'runs a random-init detector (pipeline check only); point '
              '--yolo_weights at the official darknet yolov3.weights')
    common = dict(
        spec_ckpt=args.spec_ckpt, camcalib_ckpt=args.camcalib_ckpt,
        bbox_file=args.bbox_file, batch_size=args.batch_size,
        save_results=not args.no_save, render=not args.no_render,
        smpl_model_dir=args.smpl_model_dir, save_obj=args.save_obj,
        cfg_file=args.cfg, detector=args.detector,
        yolo_weights=args.yolo_weights, yolo_img_size=args.yolo_img_size,
        min_size=args.min_size, camcalib_every=args.camcalib_every,
        cut_threshold=args.cut_threshold)
    if args.mode == 'webcam':
        if args.bbox_file:
            print('[spec] WARNING: --bbox_file is ignored in webcam mode '
                  "(live frames have no precomputed boxes); use "
                  "--detector yolo or the full-frame fallback")
        run_spec_webcam(
            source=args.webcam_source, output_folder=out_folder,
            spec_ckpt=args.spec_ckpt, camcalib_ckpt=args.camcalib_ckpt,
            cfg_file=args.cfg, smpl_model_dir=args.smpl_model_dir,
            detector=args.detector, yolo_weights=args.yolo_weights,
            yolo_img_size=args.yolo_img_size, min_size=args.min_size,
            max_frames=args.max_frames, display=args.display,
            save_results=not args.no_save,
            camcalib_every=args.camcalib_every,
            cut_threshold=args.cut_threshold)
    elif args.mode == 'video':
        run_spec_on_video(args.vid_file, out_folder,
                          chunk_size=args.chunk_size,
                          keep_frames=args.keep_frames,
                          smooth=args.smooth,
                          smooth_min_cutoff=args.min_cutoff,
                          smooth_beta=args.beta,
                          tracker=args.tracker, **common)
    else:
        if args.smooth:
            print('[spec] WARNING: --smooth is temporal and applies to '
                  '--mode video only; ignored in folder mode')
        run_spec_on_folder(args.image_folder, out_folder, **common)


if __name__ == '__main__':
    main()
