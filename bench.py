"""Headline benchmark: CamCalib + SPEC end-to-end inference images/sec.

Measures the fused two-stage pipeline from RAW frames in HBM: on-device
ImageNet normalization -> stage 1 (CamCalib ResNet-50 on full frames ->
softargmax angle decode -> rotmat/intrinsics) -> on-device SPIN-crop +
resize + normalize (ops/preprocess) -> stage 2 (SPEC ResNet-50 + HMR head
+ fused-Pallas SMPL LBS + full-perspective projection). ONE jitted graph,
no host round-trips between stages (the reference crosses a subprocess +
pickle-file boundary per image, ``spec/tester.py:86-88``, runs CamCalib at
batch 1, ``scripts/camcalib_demo.py:95-100``, and crops on the host).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

Baseline: the driver north star of >2,000 img/s on a v5e-8 => 250
img/s/chip; the reference publishes no throughput numbers (BASELINE.md).
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compilation cache: the TPU in this environment compiles
# remotely through a tunnel (minutes for the fused pipeline); cache it.
os.makedirs('/root/repo/.jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def _wait_for_backend(budget_s=1800):
    """Ride out transient axon-tunnel outages instead of failing red
    (round-1 MULTICHIP died to exactly this). Deliberate PARTIAL
    ride-out: observed round-2 outages exceeded an hour, but the
    round-end artifact must complete in bounded time, so we wait at
    most 30 min, then fall back to the last cached real measurement
    (marked stale) or let the failure surface. SPEC_BENCH_BACKEND_BUDGET_S
    overrides the budget (tests use a short one)."""
    from spec_tpu.utils.backend import wait_for_backend
    budget_s = float(os.environ.get('SPEC_BENCH_BACKEND_BUDGET_S',
                                    budget_s))
    return wait_for_backend(budget_s=budget_s)


_CACHE_PATH = '/root/repo/.bench_cache.json'


def _cache_key(args) -> str:
    return (f'{args.mode}|b{args.batch}|{args.frame_h}x{args.frame_w}|'
            f'{args.stage1}|min{args.min_size}|f{args.frames}|'
            f'p{args.persons}|w{getattr(args, "workers", 8)}|'
            f'{getattr(args, "backbone", "resnet50")}|'
            f'det{int(getattr(args, "detector", False))}'
            # appended only when set, so pre-existing cache keys survive
            + ('|fd1' if getattr(args, 'fast_decode', False) else '')
            + (f'|dc{args.decode_cache}'
               if getattr(args, 'decode_cache', 0) else '')
            + ('|gbf1' if getattr(args, 'group_by_frame', False) else '')
            + ('|nd0' if getattr(args, 'no_native_decode', False) else '')
            + (f'|rc-{args.region_cache_format}'
               if getattr(args, 'region_cache', False) else '')
            + ('|co1' if getattr(args, 'compute_only', False) else '')
            + (f'|cce{args.camcalib_every}'
               if getattr(args, 'camcalib_every', 1) > 1 else '')
            + (f'|{args.input_step}'
               if getattr(args, 'input_step', 'train') != 'train' else '')
            + (f'|ccj-{args.camcalib_jitter}'
               if getattr(args, 'camcalib_jitter', 'fused') != 'fused'
               else '')
            + ('|ccval'
               if getattr(args, 'camcalib_split', 'train') == 'val'
               else '')
            + ('|cce2e'
               if getattr(args, 'camcalib_e2e', False) else '')
            + ('|rm1' if getattr(args, 'remat', False) else ''))


def emit(payload: dict, args) -> None:
    """Print the ONE JSON line AND cache it, so an axon-tunnel outage at
    round end can report the last real measurement (clearly marked
    stale) instead of a red artifact."""
    payload = dict(payload, backend=jax.default_backend(),
                   host_cores=os.cpu_count())
    print(json.dumps(payload))
    try:
        cache = {}
        if os.path.exists(_CACHE_PATH):
            with open(_CACHE_PATH) as f:
                cache = json.load(f)
        cache[_cache_key(args)] = {'payload': payload,
                                   'measured_at': time.time()}
        with open(_CACHE_PATH, 'w') as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass


def emit_stale_if_cached(args) -> bool:
    """Backend unreachable: print the last REAL measurement for this
    exact configuration, marked stale. Returns False when there is no
    cached measurement (caller proceeds and surfaces the real error)."""
    try:
        with open(_CACHE_PATH) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        return False
    entry = cache.get(_cache_key(args))
    if not entry:
        return False
    age_h = (time.time() - entry['measured_at']) / 3600.0
    payload = dict(entry['payload'])
    payload['stale'] = True
    payload['stale_reason'] = (
        f'axon backend unavailable after the ride-out budget; value is '
        f'the last real on-chip measurement of this exact configuration '
        f'({age_h:.1f} h old)')
    print(json.dumps(payload))
    return True


def build_pipeline(compute_dtype=jnp.bfloat16, img_res=224,
                   stage1='flax'):
    from spec_tpu.core import bins, constants as C, geometry as G
    from spec_tpu.core import smpl as S
    from spec_tpu.models import HMR, CameraRegressorNetwork
    from spec_tpu.ops.preprocess import crop_resize_normalize

    # Real SMPL shapes (6890 verts), with the fused Pallas LBS kernel.
    assets = S.with_packed_lbs(S.create_test_assets())
    camcalib = CameraRegressorNetwork(
        backbone='resnet50', dtype=compute_dtype)
    spec = HMR(backbone='resnet50', use_cam=True, use_cam_feats=True,
               dtype=compute_dtype)

    if stage1 == 'fused':
        # Imported EAGERLY, outside the traced body below: a first import
        # under the jit trace would create any module-level jnp constants
        # as leaked tracers (CLAUDE.md; bins.py bit this).
        from spec_tpu.models.backbones.fused_resnet import (
            fused_resnet_apply,
        )

    def camcalib_fwd(cc_vars, frames):
        if stage1 == 'fused':
            # Folded-BN inference twin of the flax trunk (same variables).
            tr = {'params': cc_vars['params']['ResNet_0'],
                  'batch_stats': cc_vars['batch_stats']['ResNet_0']}
            feats = fused_resnet_apply(tr, frames, arch='resnet50',
                                       compute_dtype=compute_dtype)
            x = jnp.mean(feats, axis=(1, 2))
            outs = []
            for name in ('fc_vfov', 'fc_pitch', 'fc_roll'):
                p = cc_vars['params'][f'{name}_0']
                y = (x.astype(compute_dtype)
                     @ p['kernel'].astype(compute_dtype)
                     + p['bias'].astype(compute_dtype))
                outs.append(y.astype(jnp.float32))
            return tuple(outs)
        return camcalib.apply(cc_vars, frames)

    mean = jnp.asarray(C.IMG_NORM_MEAN)
    std = jnp.asarray(C.IMG_NORM_STD)

    def pipeline(cc_vars, spec_vars, raw_frames, corners, bbox_center,
                 bbox_scale):
        """raw_frames: (B, H, W, 3) float32 RGB in [0, 255];
        corners: (B, 4) int32 SPIN crop boxes (one person per frame)."""
        B = raw_frames.shape[0]
        img_h = jnp.full((B,), float(raw_frames.shape[1]))
        img_w = jnp.full((B,), float(raw_frames.shape[2]))

        frames = (raw_frames / 255.0 - mean) / std

        vfov_l, pitch_l, roll_l = camcalib_fwd(cc_vars, frames)
        vfov, pitch, roll = bins.convert_preds_to_angles(
            vfov_l, pitch_l, roll_l, loss_type='softargmax_biased_l2')
        f_pix = G.focal_length_from_vfov(vfov, img_h)
        cam_rotmat = G.euler_to_rotmat(
            jnp.stack([pitch, jnp.zeros_like(pitch), roll], -1))
        K = G.build_cam_intrinsics(f_pix, img_w, img_h)

        crops = crop_resize_normalize(raw_frames, corners, res=img_res)

        out = spec.apply(
            spec_vars, assets, crops, cam_rotmat, K,
            bbox_scale, bbox_center, img_w, img_h)
        return (out['smpl_vertices'], out['smpl_joints2d'],
                out['pred_cam_t'], vfov, pitch, roll)

    return camcalib, spec, assets, pipeline


def _fetch_rtt():
    """Median host<->device round-trip of fetching a tiny ready scalar.

    Through the axon remote-execution tunnel ``block_until_ready`` does NOT
    reliably force execution; the only trustworthy timing is one where a
    reduced scalar is fetched to host. That fetch costs a tunnel round-trip
    (~26-45 ms here) which must be subtracted from the measured window.
    """
    vals = [jnp.float32(i) + 1.0 for i in range(5)]
    for v in vals:
        v.block_until_ready()
    rtts = []
    for v in vals:
        t0 = time.perf_counter()
        float(v)
        rtts.append(time.perf_counter() - t0)
    return sorted(rtts)[len(rtts) // 2]


def _train_setup(B, backbone, remat=False):
    """Shared train-step scaffolding for the train/input modes: test SMPL
    assets (packed Pallas LBS off-CPU — the kernel has no compiled CPU
    lowering; plain-jnp LBS measures identical in the train graph,
    CLAUDE.md), HMR trunk, zeroed head decoders, Adam state, and the raw
    train step. One definition so the two modes cannot drift into
    measuring different step semantics."""
    import __graft_entry__ as ge
    from spec_tpu.core import smpl as S
    from spec_tpu.models import HMR
    from spec_tpu.train import adam, create_train_state, make_spec_train_step

    rng = np.random.RandomState(0)
    assets = S.create_test_assets()
    if jax.default_backend() != 'cpu':
        assets = S.with_packed_lbs(assets)
    model = HMR(backbone=backbone, use_cam=True, use_cam_feats=True,
                dtype=jnp.bfloat16, remat=remat)
    ex = ge._example_inputs(B, 224, rng)
    variables = model.init(jax.random.PRNGKey(0), assets, *ex)
    ge._zero_head_decoders(variables)
    tx = adam(1e-4)
    state = create_train_state(variables, tx)
    raw_step = make_spec_train_step(model, assets, tx)
    return ge, rng, ex, state, raw_step


def train_bench(args):
    """SPEC training-step throughput: full fwd+bwd (trunk + HMR head +
    SMPL + HMRCamLoss) + Adam with donated buffers, at the production crop
    resolution. Chained-scalar timing (see _fetch_rtt)."""
    B = args.batch
    ge, rng, ex, state, raw_step = _train_setup(
        B, args.backbone, remat=getattr(args, 'remat', False))
    batch = ge._example_batch(B, rng, ex)

    # Forcing: the final loss fetch transitively depends on every prior
    # step through the state chain; the rng-key chain below is
    # belt-and-braces (a non-provably-zero data dependency, see CLAUDE.md
    # on constant-folded `s*0` carries). State buffers are donated like
    # the real trainer's step.
    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, key):
        new_state, losses = raw_step(state, batch, key)
        total = losses['loss/total_loss']
        # non-provably-zero dependency (see CLAUDE.md: s*0 gets folded)
        key = key + (total * 1e-30).astype(key.dtype)
        return new_state, total, key

    key = jax.random.PRNGKey(1)
    state, total, key = step(state, batch, key)
    assert np.isfinite(float(total))
    rtt = _fetch_rtt()

    iters = args.iters
    t0 = time.perf_counter()
    for _ in range(iters):
        state, total, key = step(state, batch, key)
    final = float(total)  # forces the whole rng-chained sequence
    dt = time.perf_counter() - t0 - rtt
    assert np.isfinite(final)
    emit({
        'metric': f'SPEC train step (fwd+bwd+Adam, donated, '
                  f'{args.backbone}'
                  + (', remat' if getattr(args, 'remat', False) else '')
                  + f'), B={B} 224^2',
        'value': round(B * iters / dt, 2),
        'unit': 'img/s/chip',
        'ms_per_step': round(1000.0 * dt / iters, 3),
    }, args)


def eval_bench(args):
    """Evaluation-step throughput: HMR forward + GENDERED GT SMPL (male
    + female LBS, masked blend) + predicted-params SMPL + J14 H36M
    Procrustes metrics + J24 + V2V, all in one jitted graph at the
    production crop resolution — the work the reference does per batch
    on the GPU (forward) plus per SAMPLE on the CPU (GT SMPL inside
    dataloader workers, spec/dataset/cam_dataset.py:417-478; numpy
    Procrustes, spec/trainer.py:291-302). Chained-scalar timing."""
    import jax

    from spec_tpu.core import smpl as S
    from spec_tpu.eval.eval_loop import make_eval_step
    from spec_tpu.models import HMR

    B, res = args.batch, 224
    rng = np.random.RandomState(0)
    assets = {g: S.create_test_assets(seed=i)
              for i, g in enumerate(('neutral', 'male', 'female'))}
    jreg = np.asarray(assets['neutral'].j_regressor_h36m)
    model = HMR(backbone=args.backbone, use_cam=True, use_cam_feats=True,
                dtype=jnp.bfloat16)

    eye = jnp.tile(jnp.eye(3), (B, 1, 1))
    variables = model.init(
        jax.random.PRNGKey(0), assets['neutral'],
        jnp.zeros((B, res, res, 3)), eye, eye, jnp.ones((B,)),
        jnp.ones((B, 2)), jnp.ones((B,)), jnp.ones((B,)))
    K = np.tile(np.array([[1000., 0., 960.], [0., 1000., 540.],
                          [0., 0., 1.]], 'f4'), (B, 1, 1))
    batch = {
        'img': jnp.asarray(rng.randn(B, res, res, 3).astype('f4')),
        'pose': jnp.asarray((rng.randn(B, 72) * 0.15).astype('f4')),
        'betas': jnp.asarray((rng.randn(B, 10) * 0.3).astype('f4')),
        'gender': jnp.asarray((rng.rand(B) > 0.5).astype(np.int32)),
        'scale': jnp.asarray((rng.rand(B) * 0.8 + 0.8).astype('f4')),
        'center': jnp.asarray(
            (rng.rand(B, 2) * 300 + np.array([600, 300])).astype('f4')),
        'orig_shape': jnp.asarray(
            np.tile(np.array([[1080., 1920.]], 'f4'), (B, 1))),
        'cam_rotmat': eye,
        'cam_intrinsics': jnp.asarray(K),
    }

    step = make_eval_step(model, assets, jreg, use_gender=True)

    @jax.jit
    def bench_step(acc, variables, batch):
        out, j14, j24, v2v = step(variables, batch)
        s = (jnp.sum(v2v)
             + sum(jnp.sum(v) for v in j14.values())
             + sum(jnp.sum(v) for v in j24.values())
             + jnp.sum(out['smpl_vertices'].astype(jnp.float32)))
        return acc + s

    acc = bench_step(jnp.float32(0), variables, batch)
    assert np.isfinite(float(acc))
    rtt = _fetch_rtt()

    iters = args.iters
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(iters):
        acc = bench_step(acc, variables, batch)
    total = float(acc)  # single forcing fetch
    dt = time.perf_counter() - t0 - rtt
    assert np.isfinite(total)
    emit({
        'metric': f'SPEC eval step (fwd + gendered GT LBS + J14 '
                  f'Procrustes/J24/V2V on device, {args.backbone}), '
                  f'B={B} 224^2',
        'value': round(B * iters / dt, 2),
        'unit': 'img/s/chip',
        'ms_per_step': round(1000.0 * dt / iters, 3),
    }, args)


def latency_bench(args):
    """Batch-1 single-frame e2e latency with the compute vs
    transport/host split (reference analogue: the demo's per-frame FPS
    log, scripts/spec_demo.py:81-88).

    Three measured tiers:
      * e2e ms/frame: ``SpecPredictor.predict([frame], [box])`` wall
        clock — host prep + upload + both stages + output fetch. In this
        sandbox the upload/fetch ride the axon tunnel (~15-30 MB/s,
        ~26-45 ms RTT), so e2e is transport-dominated; the split below
        is what transfers to a PCIe host.
      * compute ms: the SAME jitted stage graphs (batch-1 shapes,
        pre-staged HBM inputs), chained-scalar forcing (CLAUDE.md), per
        stage and summed.
      * host ms: the host-side prep (PIL min-side resize + native SPIN
        crop) alone.
    transport_ms = e2e - compute - host (derived; the tunnel's share).
    """
    from spec_tpu import native
    from spec_tpu.core import geometry as G
    from spec_tpu.data.detection import bbox_to_center_scale
    from spec_tpu.data.image_folder import resize_min_side
    from spec_tpu.serving import SpecPredictor
    from PIL import Image

    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    box = np.array([[320.0, 240.0, 100.0, 220.0]], np.float32)

    pred = SpecPredictor(batch_size=32, min_size=args.min_size,
                         dtype=jnp.bfloat16, uint8_crops=True)
    for _ in range(3):          # compile both batch-1 stage shapes
        pred.predict([frame], [box])

    # (a) e2e wall clock: every call fetches all outputs, which forces
    # remote execution (the serving bench's honest-timing argument).
    reps = max(args.iters, 10)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pred.predict([frame], [box])
    e2e_ms = 1000.0 * (time.perf_counter() - t0) / reps
    assert len(out[0]) == 1

    # (b) host prep: stage-1 min-side resize + stage-2 SPIN crop.
    centers, scales = bbox_to_center_scale(box)
    t0 = time.perf_counter()
    for _ in range(reps):
        img = np.asarray(resize_min_side(Image.fromarray(frame),
                                         args.min_size), np.uint8)
        crop = native.spin_crop_batch(
            frame.astype(np.float32), centers[:1], scales[:1],
            res=pred.img_res, normalize=False)
    host_ms = 1000.0 * (time.perf_counter() - t0) / reps
    crop_u8 = np.clip(crop[0] * 255.0 + 0.5, 0, 255).astype(np.uint8)

    # (c) device compute, per stage: same forward bodies the predictor
    # jits, inputs pre-staged in HBM, acc-chained scalar forcing.
    @jax.jit
    def s1_step(acc, cc_vars, img_u8):
        vfov, pitch, roll = pred._cam_forward(cc_vars, img_u8)
        return acc + jnp.sum(vfov) + jnp.sum(pitch) + jnp.sum(roll)

    @jax.jit
    def s2_step(acc, spec_vars, crops, rotmat, K, scale, center, w, h):
        o = pred._spec_forward(spec_vars, crops, rotmat, K, scale,
                               center, w, h)
        return acc + jnp.sum(o['pred_cam_t']) + jnp.sum(
            o['smpl_joints2d'].astype(jnp.float32))

    s1_in = jnp.asarray(img[None])
    cam = pred.estimate_cameras([frame])[0]
    rotmat = jnp.asarray(np.asarray(G.euler_to_rotmat(jnp.asarray(
        [[cam['pitch'], 0.0, cam['roll']]], np.float32))))
    K = jnp.asarray(np.asarray(G.build_cam_intrinsics(
        jnp.asarray([cam['f_pix']], np.float32), jnp.asarray([640.0]),
        jnp.asarray([480.0]))))
    s2_in = (jnp.asarray(crop_u8[None]), rotmat, K,
             jnp.asarray(scales[:1]), jnp.asarray(centers[:1]),
             jnp.asarray([640.0]), jnp.asarray([480.0]))

    acc = s1_step(jnp.float32(0), pred.cc_vars, s1_in)
    acc = s2_step(acc, pred.spec_vars, *s2_in)
    assert np.isfinite(float(acc))
    rtt = _fetch_rtt()

    def timed(fn, *xs):
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(reps):
            acc = fn(acc, *xs)
        assert np.isfinite(float(acc))
        return 1000.0 * (time.perf_counter() - t0 - rtt) / reps

    s1_ms = timed(s1_step, pred.cc_vars, s1_in)
    s2_ms = timed(s2_step, pred.spec_vars, *s2_in)
    compute_ms = s1_ms + s2_ms

    emit({
        'metric': f'single-frame latency (480x640, 1 person, stage-1 '
                  f'min_size={args.min_size}, uint8 uploads)',
        'value': round(e2e_ms, 2),
        'unit': 'ms/frame e2e',
        'compute_ms': round(compute_ms, 2),
        'stage1_ms': round(s1_ms, 2),
        'stage2_ms': round(s2_ms, 2),
        'host_prep_ms': round(host_ms, 2),
        'transport_ms': round(e2e_ms - compute_ms - host_ms, 2),
        'note': 'transport_ms is the axon tunnel share (uint8 frame '
                'upload + output fetch, ~15-30 MB/s, ~26-45 ms RTT '
                'here); a PCIe host pays ~0.3 ms for the same bytes, so '
                'its e2e ~= compute + host_prep',
    }, args)


def serving_bench(args):
    """Multi-person serving-path bench: SpecPredictor's padded batching
    (stage-1 bucket per frame + stage-2 pad-to-power-of-two person
    batches, host SPIN crops) — the realistic demo workload (reference
    ``spec/tester.py:109-133`` runs per-detection).

    Timing is honest without the chained-scalar trick: ``predict``
    fetches every output tensor to host each call, which forces remote
    execution; steady-state wall-clock over many frames amortizes the
    per-call tunnel round-trip.
    """
    from spec_tpu.serving import SpecPredictor

    rng = np.random.RandomState(0)
    F, K = args.frames, args.persons
    frames = [(rng.rand(480, 640, 3) * 255).astype(np.uint8)
              for _ in range(F)]
    boxes = [np.stack([
        np.array([160 + 60 * k + rng.rand() * 30,
                  240 + rng.rand() * 40, 90 + rng.rand() * 30,
                  200 + rng.rand() * 40], np.float32)
        for k in range(K)]) for _ in range(F)]

    pred = SpecPredictor(batch_size=32, min_size=args.min_size,
                         dtype=jnp.bfloat16,
                         detector='yolo' if args.detector else '',
                         yolo_img_size=416,
                         camcalib_every=args.camcalib_every)
    for _ in range(2):           # compile both stages + pad shapes
        pred.predict(frames, boxes)
        pred.reset_camera_stream()

    if args.compute_only:
        # Engine-only serving throughput: the predictor's exact jitted
        # stage bodies at the production chunk shapes, every input
        # PRE-STAGED in HBM, chained-scalar forcing — so regressions in
        # the serving engine itself are visible instead of being masked
        # by the sandbox tunnel (the e2e row below is transport-bound:
        # ~4 MB/frame over 15-30 MB/s).
        from spec_tpu import native
        from spec_tpu.core import geometry as G
        from spec_tpu.data.detection import bbox_to_center_scale
        from spec_tpu.data.image_folder import resize_min_side
        from PIL import Image

        # --camcalib_every N: stage 1 runs on every Nth stream frame
        # only (serving.SpecPredictor stream amortization) — the engine
        # pass carries 1/N of the stage-1 batches.
        prepped = [np.asarray(resize_min_side(Image.fromarray(f),
                                              args.min_size), np.uint8)
                   for f in frames[::max(1, args.camcalib_every)]]
        s1_batches = [jnp.asarray(np.stack(prepped[s0:s0 + 32]))
                      for s0 in range(0, len(prepped), 32)]

        cams = pred.estimate_cameras(frames)
        work = []  # (normalized f32 crop, rotmat, K, scale, center)
        for fi in range(F):
            cam = cams[fi]
            rotmat = np.asarray(G.euler_to_rotmat(jnp.asarray(
                [[cam['pitch'], 0.0, cam['roll']]], np.float32)))[0]
            Kmat = np.asarray(G.build_cam_intrinsics(
                jnp.asarray([cam['f_pix']], np.float32),
                jnp.asarray([640.0]), jnp.asarray([480.0])))[0]
            centers, scales = bbox_to_center_scale(boxes[fi])
            crops = native.spin_crop_batch(
                np.asarray(frames[fi], np.float32), centers, scales,
                res=pred.img_res, normalize=True)
            for pi in range(len(centers)):
                work.append((crops[pi], rotmat, Kmat, scales[pi],
                             centers[pi]))
        s2_batches = []
        for s0 in range(0, len(work), 32):
            ch = work[s0:s0 + 32]
            while len(ch) < pred._padded(len(ch)):
                ch = ch + [ch[-1]]
            s2_batches.append(tuple(
                jnp.asarray(np.stack([np.asarray(c[j], np.float32)
                                      for c in ch]))
                for j in range(5)) + (
                jnp.asarray(np.full(len(ch), 640.0, np.float32)),
                jnp.asarray(np.full(len(ch), 480.0, np.float32))))

        @jax.jit
        def s1_step(acc, cc_vars, img_u8):
            vfov, pitch, roll = pred._cam_forward(cc_vars, img_u8)
            return acc + jnp.sum(vfov) + jnp.sum(pitch) + jnp.sum(roll)

        @jax.jit
        def s2_step(acc, spec_vars, crops, rotmat, K, scale, center,
                    w, h):
            o = pred._spec_forward(spec_vars, crops, rotmat, K, scale,
                                   center, w, h)
            return acc + jnp.sum(o['pred_cam_t']) + jnp.sum(
                o['smpl_joints2d'].astype(jnp.float32))

        def one_pass(acc):
            for b in s1_batches:
                acc = s1_step(acc, pred.cc_vars, b)
            for b in s2_batches:
                acc = s2_step(acc, pred.spec_vars, *b)
            return acc

        acc = one_pass(jnp.float32(0))
        assert np.isfinite(float(acc))
        rtt = _fetch_rtt()
        reps = args.iters
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(reps):
            acc = one_pass(acc)
        assert np.isfinite(float(acc))
        dt = time.perf_counter() - t0 - rtt
        emit({
            'metric': f'serving ENGINE throughput (predictor stage '
                      f'graphs, inputs pre-staged in HBM), {K} '
                      f'persons/frame, stage-1 min_size={args.min_size}'
                      + (f', camcalib_every={args.camcalib_every}'
                         if args.camcalib_every > 1 else ''),
            'value': round(reps * F / dt, 2),
            'unit': 'frames/s/chip',
            'persons_per_s': round(reps * len(work) / dt, 2),
            'ms_per_frame': round(1000.0 * dt / (reps * F), 3),
        }, args)
        return

    t0 = time.perf_counter()
    reps = args.iters
    n_person = 0
    for _ in range(reps):
        results = pred.predict(frames, boxes)
        n_person += sum(len(r) for r in results)
    dt = time.perf_counter() - t0
    assert n_person == reps * F * K
    frames_per_s = reps * F / dt
    payload = {
        'metric': f'serving predict() e2e, {K} persons/frame '
                  f'(480x640 frames, stage-1 min_size={args.min_size})',
        'value': round(frames_per_s, 2),
        'unit': 'frames/s/chip',
        'persons_per_s': round(n_person / dt, 2),
        'ms_per_frame': round(1000.0 * dt / (reps * F), 3),
    }
    if args.detector:
        # Detect->stage-1 overlap delta: the overlapped path dispatches
        # the YOLO forwards and the CamCalib batches before fetching
        # either (host NMS rides stage-1 device compute); the sequential
        # twin is detect() fully fetched first — the pre-r3 behavior.
        # Same weights, frames, and total work in both orderings.
        for _ in range(2):
            pred.predict(frames)                         # compile yolo
        t0 = time.perf_counter()
        for _ in range(reps):
            pred.predict(frames)                         # overlapped
        ms_overlap = 1000.0 * (time.perf_counter() - t0) / (reps * F)
        t0 = time.perf_counter()
        for _ in range(reps):
            dets = pred.detector.detect(frames)          # sequential twin
            pred.predict(frames, boxes=dets)
        ms_seq = 1000.0 * (time.perf_counter() - t0) / (reps * F)
        payload['detect_stage1_overlap_ms_per_frame'] = round(ms_overlap, 3)
        payload['detect_stage1_sequential_ms_per_frame'] = round(ms_seq, 3)
    emit(payload, args)


def _make_input_bench_data(root, n_frames=96, samples_per_frame=4,
                           hw=(1080, 1920)):
    """Synthetic 3DPW-shaped dataset ON DISK: full-HD JPEG frames + the
    npz annotation contract (multiple person samples per frame, like real
    3DPW). Smooth gradient + noise frames compress like photos (~150-400
    KB), not like white noise, so JPEG decode cost is realistic. Cached
    across runs."""
    import cv2

    npz = os.path.join(root, 'annots.npz')
    if os.path.exists(npz):
        # Regenerate when a larger --batch needs more samples than the
        # cached dataset holds (drop_last=True would otherwise yield
        # zero batches and the bench would die on StopIteration).
        if len(np.load(npz)['imgname']) >= n_frames * samples_per_frame:
            return npz, root
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    H, W = hw
    yy, xx = np.mgrid[0:H, 0:W]
    names = []
    for i in range(n_frames):
        base = 128 + 80 * np.sin(xx / (47.0 + i)) * np.cos(yy / (39.0 + i))
        img = np.clip(base[..., None] + rng.randn(H, W, 3) * 10, 0, 255)
        nm = f'im{i:04d}.jpg'
        cv2.imwrite(os.path.join(root, nm), img.astype('u1'))
        names.append(nm)
    n = n_frames * samples_per_frame
    imgname = np.repeat(np.array(names), samples_per_frame)
    np.savez(
        npz,
        imgname=imgname,
        # person-sized boxes in a 1080p frame: side = scale*200 px
        scale=(rng.rand(n) * 1.2 + 1.0).astype('f4'),
        center=np.stack([rng.rand(n) * 1200 + 360,
                         rng.rand(n) * 500 + 290], 1).astype('f4'),
        pose_0yaw_inverseyz=(rng.randn(n, 72) * 0.2).astype('f4'),
        pose_cam=(rng.randn(n, 72) * 0.2).astype('f4'),
        shape=(rng.randn(n, 10) * 0.5).astype('f4'),
        S=rng.randn(n, 24, 4).astype('f4'),
        part=np.concatenate([rng.rand(n, 24, 2) * 800 + 200,
                             np.ones((n, 24, 1))], -1).astype('f4'),
        cam_int=np.tile(np.array(
            [[1000, 0, 960], [0, 1000, 540], [0, 0, 1]], 'f4'),
            (n, 1, 1)),
        camcalib_pitch=(rng.randn(n) * 0.1).astype('f4'),
        camcalib_roll=(rng.randn(n) * 0.05).astype('f4'),
        camcalib_vfov=(rng.rand(n) * 0.5 + 0.6).astype('f4'),
        camcalib_f_pix=(rng.rand(n) * 200 + 900).astype('f4'),
    )
    return npz, root


def _make_camcalib_bench_data(root, n=96):
    """Synthetic Pano360-crop dataset ON DISK in the pano_scalenet
    layout (images/*.jpg + sibling .json annots + split pkls): the
    reference datagen's resolution set (pano_preprocessing.py:323-324),
    gradient+noise content that JPEG-compresses like photos. Cached
    across runs."""
    import cv2
    import joblib

    img_dir = os.path.join(root, 'images')
    split_pkl = os.path.join(root, 'train_images.pkl')
    if os.path.exists(split_pkl):
        return root
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    sizes = [(640, 640), (750, 600), (800, 600), (900, 600),
             (992, 558), (558, 992)]
    names = []
    for i in range(n):
        W, H = sizes[i % len(sizes)]
        yy, xx = np.mgrid[0:H, 0:W]
        base = (128 + 80 * np.sin(xx / (31.0 + i % 7))
                * np.cos(yy / (27.0 + i % 5)))
        img = np.clip(base[..., None] + rng.randn(H, W, 3) * 10, 0, 255)
        nm = f'crop{i:04d}.jpg'
        cv2.imwrite(os.path.join(img_dir, nm), img.astype('u1'))
        with open(os.path.join(img_dir, nm[:-4] + '.json'), 'w') as f:
            json.dump({'vfov': 1.05 + 0.3 * (i % 5) / 5.0,
                       'pitch': 0.05 - 0.02 * (i % 3),
                       'roll': -0.02 + 0.01 * (i % 4)}, f)
        names.append(nm)
    split = max(1, int(n * 0.85))
    joblib.dump(names[:split], split_pkl)
    joblib.dump(names[split:], os.path.join(root, 'val_images.pkl'))
    return root


def camcalib_input_bench(args):
    """CamCalib training/val loader throughput — the reproducible
    harness behind the README/CLAUDE loader rows (the pre-r4 PIL chain
    vs the fused jitter_normalize affine vs the decoded+resized u8
    LRU). Reference analogue: the torchvision per-sample aug chain
    (camcalib/pano_dataset.py:65-78) under an 8-worker torch DataLoader.

    Variants (each its own cache entry):
      --camcalib_jitter pil    4 sequential PIL ColorJitter passes +
                               separate normalize (the pre-r4 item;
                               attribution baseline)
      --camcalib_jitter fused  the shipped jitter_normalize single
                               cv2.transform affine (default)
      --decode_cache N         decoded+RESIZED u8 LRU: epochs 2+ skip
                               decode+resize (DATASET.DECODE_CACHE)
      --camcalib_split val     no jitter (normalize only; cache-exact)

    Items are iterated single-threaded so the value IS img/s/core
    (worker threads only interleave on this 1-core sandbox)."""
    from PIL import Image

    from spec_tpu.data.pano_dataset import (
        CameraRegressorDataset,
        color_jitter,
        normalize_u8,
    )

    if args.camcalib_jitter == 'pil' and (args.decode_cache
                                          or args.camcalib_split == 'val'
                                          or args.camcalib_e2e):
        # The pil closure below is the PRE-r4 attribution item (direct
        # decode, always-jitter); combining it with the decode cache or
        # the val split would cache a row that corresponds to no product
        # or baseline configuration.
        raise SystemExit('--camcalib_jitter pil is the pre-r4 train-item '
                         'baseline: it bypasses the decode cache and '
                         'always jitters — drop --decode_cache/'
                         '--camcalib_split val/--camcalib_e2e')
    root = _make_camcalib_bench_data(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     '.bench_data', 'camcalib_crops'))
    is_train = args.camcalib_split == 'train'
    ds = CameraRegressorDataset(
        root, 'pano_scalenet', is_train=is_train, min_size=600,
        max_size=1000, loss_type='softargmax_biased_l2',
        fast_decode=args.fast_decode, decode_cache=args.decode_cache,
        device_jitter=args.camcalib_jitter == 'device')

    if args.camcalib_jitter == 'pil':
        # The pre-r4 item: decode+resize, then the 4-pass PIL chain,
        # then the separate normalize (reference ColorJitter semantics;
        # jitter_normalize consumes the same rng draw pattern).
        rng = np.random.RandomState(0)

        def item(i):
            imgname = os.path.join(root, 'images', ds.image_filenames[i])
            arr, _ = ds._decode_resized(imgname)
            pil = color_jitter(Image.fromarray(arr), rng)
            return normalize_u8(np.asarray(pil, np.uint8))
    else:
        item = ds.__getitem__          # the product path

    n_ds = len(ds)
    for i in range(n_ds):              # warm-up epoch (fills caches)
        item(i)
    t0 = time.perf_counter()
    n = 0
    while n < n_ds or time.perf_counter() - t0 < args.camcalib_secs:
        for i in range(n_ds):
            item(i)
        n += n_ds
    ips = n / (time.perf_counter() - t0)

    desc = ('PIL 4-pass jitter' if args.camcalib_jitter == 'pil'
            else 'device jitter (u8 + affine out)'
            if args.camcalib_jitter == 'device'
            else 'fused-affine jitter' if is_train else 'no jitter (val)')
    if args.camcalib_e2e:
        return _camcalib_e2e_tail(args, ds, ips, desc)
    if args.decode_cache:
        desc += f' + decode-cache({args.decode_cache})'
    emit({
        'metric': f'camcalib {args.camcalib_split} loader item '
                  f'({desc}), min-600',
        'value': round(ips, 2),
        'unit': 'img/s/core',
        'n_images': n_ds,
        'note': 'single-threaded item loop over the pano_scalenet '
                'dataset (reference aug chain analogue, '
                'camcalib/pano_dataset.py:65-78); decode-cache rows '
                'measure steady-state epochs (warm-up epoch fills the '
                'LRU). Host-only: no device in the timed window.',
    }, args)


def _camcalib_e2e_tail(args, ds, loader_ips, desc, B=8):
    """Loader -> upload -> REAL camcalib train step e2e, one shape
    bucket (bounds remote-compile count to one). The point of the row:
    the DEVICE_JITTER batch uploads raw u8 + (3,3)+(3,) affines + (2,)
    true_shape per image — ~4x less than the host path's normalized f32
    — and in this tunnel-bound sandbox (15-30 MB/s) the upload IS the
    e2e cost, so the two variants bracket what a PCIe host sees at
    ~1000x the bandwidth."""
    import optax

    from spec_tpu.cli.camcalib_train import _bucketed_batches
    from spec_tpu.train import create_train_state, make_camcalib_train_step

    from spec_tpu.models import CameraRegressorNetwork

    model = CameraRegressorNetwork(backbone=args.backbone)
    tx = optax.adam(1e-4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    state = create_train_state(variables, tx)
    step = jax.jit(make_camcalib_train_step(
        model, tx, loss_type='softargmax_biased_l2'),
        donate_argnums=(0,))

    # One bucket only: the largest (most samples -> most batches).
    buckets = ds.shape_buckets()
    hw = max(buckets, key=lambda k: len(buckets[k]))

    def batches():
        for b in _bucketed_batches(ds, B, shuffle=True, seed=0,
                                   num_workers=args.workers,
                                   max_res=1000):
            if b['img'].shape[1:3] == hw:
                yield b

    def to_device(b):
        dev = {'img': jnp.asarray(b['img']),
               'vfov': jnp.asarray(b['vfov']),
               'pitch': jnp.asarray(b['pitch']),
               'roll': jnp.asarray(b['roll'])}
        if 'jitter_A' in b:
            dev['jitter_A'] = jnp.asarray(b['jitter_A'])
            dev['jitter_b'] = jnp.asarray(b['jitter_b'])
            dev['true_shape'] = jnp.asarray(
                b['true_shape'].astype(np.int32))
        return dev

    first = next(iter(batches()))
    dev = to_device(first)
    upload_mb = sum(v.nbytes for v in dev.values()) / 1e6
    state, metrics = step(state, dev)            # compile
    assert np.isfinite(float(metrics['loss']))
    rtt = _fetch_rtt()

    # in-HBM ceiling (same donated step, batch resident)
    t0 = time.perf_counter()
    iters = max(args.iters, 4)
    for _ in range(iters):
        state, metrics = step(state, dev)   # only state is donated
    _ = float(metrics['loss'])
    ceiling_ips = B * iters / (time.perf_counter() - t0 - rtt)

    # loader -> upload -> step e2e, >= 6 steps (whole bucket epochs)
    t0 = time.perf_counter()
    n, steps_done = 0, 0
    while steps_done < 6:
        for b in batches():
            state, metrics = step(state, to_device(b))
            # pad rows on tail chunks are device work but NOT images
            # served — count only real samples or tail buckets inflate
            # the img/s by up to B-1 rows per epoch.
            n += int(b.get('valid_count', B))
            steps_done += 1
    _ = float(metrics['loss'])
    e2e_ips = n / (time.perf_counter() - t0 - rtt)

    emit({
        'metric': f'camcalib train e2e (loader -> upload -> real train '
                  f'step, {desc}, {args.backbone}, bucket '
                  f'{hw[0]}x{hw[1]}, B={B})',
        'value': round(e2e_ips, 2),
        'unit': 'img/s',
        'loader_only_img_s': round(loader_ips, 2),
        'device_step_ceiling_img_s': round(ceiling_ips, 2),
        'upload_mb_per_batch': round(upload_mb, 1),
        'note': 'e2e rides the axon tunnel (~15-30 MB/s) — the upload '
                'dominates, which is exactly what the DEVICE_JITTER '
                'u8 variant shrinks ~4x; a PCIe host pays ~1000x less '
                'for the same bytes, so its e2e ~= min(loader, '
                'ceiling)',
    }, args)


def _input_eval_tail(args, loader, first, B, loader_ips):
    """The eval-side twin of the input bench's step phases: the same
    loader feeding the REAL eval step (fwd + gendered GT LBS + on-device
    J14/J24/V2V — eval_loop.make_eval_step), with the product path's f32
    normalized-image upload (evaluate_dataset uploads f32: eval crops
    are bilinear floats, so a uint8 re-quantization would not be
    lossless the way the train bench's is). Reference analogue:
    spec_eval's 8-worker loader (scripts/spec_eval.py:32)."""
    from spec_tpu.core import constants as C
    from spec_tpu.core import smpl as S
    from spec_tpu.eval.eval_loop import make_eval_step
    from spec_tpu.models import HMR

    assets = {g: S.create_test_assets(seed=i)
              for i, g in enumerate(('neutral', 'male', 'female'))}
    jreg = np.asarray(assets['neutral'].j_regressor_h36m)
    model = HMR(backbone=args.backbone, use_cam=True, use_cam_feats=True,
                dtype=jnp.bfloat16)
    res = first['img'].shape[1]
    eye = jnp.tile(jnp.eye(3), (B, 1, 1))
    variables = model.init(
        jax.random.PRNGKey(0), assets['neutral'],
        jnp.zeros((B, res, res, 3)), eye, eye, jnp.ones((B,)),
        jnp.ones((B, 2)), jnp.ones((B,)), jnp.ones((B,)))
    raw_step = make_eval_step(model, assets, jreg, use_gender=False)

    @jax.jit
    def step(acc, variables, dev):
        out, j14, j24, v2v = raw_step(variables, dev)
        return acc + (jnp.sum(v2v)
                      + sum(jnp.sum(v) for v in j14.values())
                      + sum(jnp.sum(v) for v in j24.values())
                      + jnp.sum(out['pred_cam_t']))

    mean = jnp.asarray(C.IMG_NORM_MEAN)
    std = jnp.asarray(C.IMG_NORM_STD)

    def to_device(batch):
        # the evaluate_dataset batch contract (use_gt_cam=False:
        # CamCalib-predicted camera columns)
        return {
            'img': (jnp.asarray(batch['img']) - mean) / std,
            'pose': jnp.asarray(batch['pose']),
            'betas': jnp.asarray(batch['betas']),
            'gender': jnp.asarray(batch['gender']),
            'scale': jnp.asarray(batch['scale']),
            'center': jnp.asarray(batch['center']),
            'orig_shape': jnp.asarray(batch['orig_shape']
                                      .astype(np.float32)),
            'cam_rotmat': jnp.asarray(batch['pred_cam_rotmat']),
            'cam_intrinsics': jnp.asarray(batch['pred_cam_int']),
        }

    dev = to_device(first)
    acc = step(jnp.float32(0), variables, dev)   # compile
    assert np.isfinite(float(acc))
    rtt = _fetch_rtt()

    # in-HBM ceiling
    iters = max(args.iters, 4)
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(iters):
        acc = step(acc, variables, dev)
    assert np.isfinite(float(acc))
    ceiling_ips = B * iters / (time.perf_counter() - t0 - rtt)

    # loader -> f32 upload -> eval step e2e (whole epochs only)
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    n, steps = 0, 0
    while steps < 8:
        for batch in loader:
            acc = step(acc, variables, to_device(batch))
            n += B
            steps += 1
    assert np.isfinite(float(acc))
    e2e_ips = n / (time.perf_counter() - t0 - rtt)

    emit({
        'metric': f'host input pipeline -> EVAL step (full-HD JPEG '
                  f'decode + SPIN crop, {args.workers} workers), B={B}',
        'value': round(loader_ips, 2),
        'unit': 'img/s',
        'eval_e2e_img_s': round(e2e_ips, 2),
        'device_step_ceiling_img_s': round(ceiling_ips, 2),
        'upload_mb_per_batch': round(B * res * res * 3 * 4 / 1e6, 1),
        'note': 'e2e uploads f32 normalized crops (the product '
                'evaluate_dataset contract) over the axon tunnel '
                '(~15-30 MB/s in this sandbox); on PCIe the same upload '
                'costs ~1.2 ms/batch, so sustained e2e ~= min(loader, '
                'device ceiling)',
    }, args)


def input_bench(args):
    """Host input pipeline: JPEG decode (full-HD frames) + SPIN crop +
    train augmentation through data/loader.py at the production batch,
    then the same batches feeding the REAL train step.

    Headline value = loader-only throughput (can the host keep the chip
    fed? — the reference analogue is the 8-worker torch DataLoader,
    spec/config.py:86-87); extras report the in-HBM device-step ceiling
    and the loader+step e2e. In THIS sandbox host->device rides the axon
    tunnel at ~15-30 MB/s, so the e2e number is transport-bound and
    reported with the upload size for context (a PCIe host pays ~0.3
    ms/frame for the same upload; CLAUDE.md)."""
    from spec_tpu.data import DataLoader
    from spec_tpu.data.cam_dataset import CamDataset

    if args.input_step == 'camcalib':
        return camcalib_input_bench(args)
    B = args.batch
    # Size the on-disk dataset to the requested batch: >=3 batches per
    # epoch at 4 samples/frame (drop_last would otherwise starve large
    # --batch runs).
    npz, img_dir = _make_input_bench_data(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     '.bench_data', 'input_hd'),
        n_frames=max(96, (3 * B + 3) // 4))
    rc_dir = ''
    if args.region_cache:
        rc_dir = os.path.join(os.path.dirname(npz),
                              f'region_cache_{args.region_cache_format}')
    is_train = args.input_step == 'train'
    ds = CamDataset(npz, img_dir, '3dpw-test-cam', is_train=is_train,
                    fast_decode=args.fast_decode,
                    decode_cache=args.decode_cache,
                    native_decode=not args.no_native_decode,
                    region_cache_dir=rc_dir,
                    region_cache_format=args.region_cache_format)
    loader = DataLoader(ds, batch_size=B, shuffle=is_train,
                        num_workers=args.workers, drop_last=True,
                        group_keys=(ds.imgname if args.group_by_frame
                                    else None))
    backbone = getattr(args, 'backbone', 'resnet50')

    # Warm-up epoch, DRAINED to completion: an abandoned iterator keeps
    # its worker threads decoding into the prefetch queue concurrently
    # with the timed window (uncounted work that biases the number low
    # on this 1-core host). `first` doubles as the compile batch below.
    warm = iter(loader)
    first = next(warm)
    for _ in warm:
        pass

    # (a) loader-only host throughput (decode + crop + aug + collate).
    # At B=128 one epoch is only a few batches; loop WHOLE epochs until
    # >=12 measured batches so the number isn't two-sample noise (no
    # mid-epoch break: see the drain note above).
    t0 = time.perf_counter()
    n, batches = 0, 0
    while batches < 12:
        for batch in loader:
            n += len(batch['scale'])
            batches += 1
    loader_ips = n / (time.perf_counter() - t0)

    if args.input_step == 'eval':
        return _input_eval_tail(args, loader, first, B, loader_ips)

    # (b) the real train step consuming loader batches. Upload is uint8
    # (4x smaller than f32; crops re-normalized on device) to keep the
    # tunnel-bound e2e number as honest as possible.
    from functools import partial

    from spec_tpu.core import constants as C

    ge, rng, ex, state, raw_step = _train_setup(B, backbone)
    mean = jnp.asarray(C.IMG_NORM_MEAN)
    std = jnp.asarray(C.IMG_NORM_STD)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, img_u8, key):
        batch = dict(batch,
                     img=(img_u8.astype(jnp.float32) / 255.0 - mean) / std)
        new_state, losses = raw_step(state, batch, key)
        total = losses['loss/total_loss']
        key = key + (total * 1e-30).astype(key.dtype)  # force dependency
        return new_state, total, key

    def to_device(batch):
        img_u8 = np.clip(batch['img'] * 255.0, 0,
                         255).astype(np.uint8)     # (B,224,224,3), 150 KB/img
        dev = {
            'pose': batch['pose'], 'betas': batch['betas'],
            'pose_conf': batch['pose_conf'], 'pose_3d': batch['pose_3d'],
            'keypoints_orig': batch['keypoints_orig'],
            'has_smpl': batch['has_smpl'],
            'has_pose_3d': batch['has_pose_3d'],
            'orig_shape': batch['orig_shape'].astype(np.float32),
            'scale': batch['scale'], 'center': batch['center'],
            'cam_rotmat': batch['cam_rotmat'],
            'cam_intrinsics': batch['cam_int'],
        }
        return ({k: jnp.asarray(v) for k, v in dev.items()},
                jnp.asarray(img_u8))

    key = jax.random.PRNGKey(1)
    dev, img_u8 = to_device(first)   # the drained warm-up epoch's batch
    state, total, key = step(state, dev, img_u8, key)  # compile
    assert np.isfinite(float(total))
    rtt = _fetch_rtt()

    # (b1) in-HBM ceiling: same compiled step, batch already on device.
    iters = max(args.iters, 4)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, total, key = step(state, dev, img_u8, key)
    _ = float(total)
    ceiling_ips = B * iters / (time.perf_counter() - t0 - rtt)

    # (b2) loader -> upload -> step e2e (>= 8 steps; whole epochs only,
    # so no abandoned prefetch threads run past the timed window).
    t0 = time.perf_counter()
    n, steps = 0, 0
    while steps < 8:
        for batch in loader:
            dev, img_u8 = to_device(batch)
            state, total, key = step(state, dev, img_u8, key)
            n += B
            steps += 1
    _ = float(total)
    e2e_ips = n / (time.perf_counter() - t0 - rtt)

    emit({
        'metric': f'host input pipeline (full-HD JPEG decode + SPIN crop '
                  f'+ aug, {args.workers} workers), B={B}',
        'value': round(loader_ips, 2),
        'unit': 'img/s',
        'train_e2e_img_s': round(e2e_ips, 2),
        'device_step_ceiling_img_s': round(ceiling_ips, 2),
        'upload_mb_per_batch': round(B * 224 * 224 * 3 / 1e6, 1),
        'note': 'e2e upload rides the axon tunnel (~15-30 MB/s) in this '
                'sandbox; on PCIe the same upload costs ~0.3 ms/frame, so '
                'sustained e2e ~= min(loader, device ceiling)',
    }, args)


def detect_bench(args):
    """YOLOv3 detector throughput: jitted bf16 forward + device-side
    top-K person filter at the standard 416 input. Chained-scalar
    timing (see _fetch_rtt) — the (B, 256, 5) candidate fetch itself is
    excluded so the number is the device-side detection rate."""
    from spec_tpu.models.detector import YoloV3, top_person_candidates

    rng = np.random.RandomState(0)
    B, S = args.batch, 416
    model = YoloV3()
    x = jnp.asarray(rng.rand(B, S, S, 3).astype('f4'))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, S, S, 3), jnp.float32))

    @jax.jit
    def step(acc, v, x):
        cand = top_person_candidates(model.apply(v, x, mutable=False))
        return acc + jnp.sum(cand.astype(jnp.float32))

    acc = step(jnp.float32(0), variables, x)
    assert np.isfinite(float(acc))
    rtt = _fetch_rtt()
    iters = args.iters
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(iters):
        acc = step(acc, variables, x)
    total = float(acc)
    dt = time.perf_counter() - t0 - rtt
    assert np.isfinite(total)
    emit({
        'metric': f'yolov3 person detection (416^2 bf16, device top-K), '
                  f'B={B}',
        'value': round(B * iters / dt, 2),
        'unit': 'img/s/chip',
        'ms_per_batch': round(1000.0 * dt / iters, 3),
    }, args)


def main(argv=None):
    import argparse

    from spec_tpu.ops.preprocess import spin_crop_corners

    parser = argparse.ArgumentParser(description='spec_tpu e2e bench')
    parser.add_argument('--batch', type=int, default=None,
                        help='default: 128 (pipeline) / 64 (train)')
    parser.add_argument('--frame_h', type=int, default=512)
    parser.add_argument('--frame_w', type=int, default=672)
    parser.add_argument('--stage1', choices=['flax', 'fused'],
                        default='flax',
                        help='stage-1 trunk: flax ResNet or the '
                             'folded-BN fused_resnet inference twin')
    parser.add_argument('--iters', type=int, default=10)
    parser.add_argument('--mode',
                        choices=['pipeline', 'serving', 'train', 'detect',
                                 'input', 'eval', 'latency'],
                        default='pipeline',
                        help='pipeline: fused one-graph headline bench; '
                             'serving: SpecPredictor multi-person path; '
                             'train: full train-step throughput; '
                             'detect: YOLOv3 person-detector throughput; '
                             'input: host loader (JPEG decode + SPIN '
                             'crop) feeding the real train step; '
                             'eval: eval step (fwd + gendered GT LBS + '
                             'on-device J14/J24/V2V metrics); '
                             'latency: batch-1 single-frame e2e with '
                             'the compute/transport split')
    parser.add_argument('--backbone', type=str, default='resnet50',
                        help='[train/input] HMR trunk (the production '
                             'model is resnet50; smaller trunks for '
                             'CPU smoke runs)')
    parser.add_argument('--workers', type=int, default=8,
                        help='[input] loader worker threads (reference '
                             'NUM_WORKERS=8, spec/config.py:86-87)')
    parser.add_argument('--profile', type=str, default='',
                        help='[pipeline] dump a jax.profiler trace of '
                             'the measured window to this directory')
    parser.add_argument('--frames', type=int, default=16,
                        help='[serving] frames per predict() call')
    parser.add_argument('--persons', type=int, default=4,
                        help='[serving] persons per frame')
    parser.add_argument('--min_size', type=int, default=600,
                        help='[serving] stage-1 resize target')
    parser.add_argument('--fast_decode', action='store_true',
                        help='[input] reduced-scale JPEG decode in the '
                             'loader (CamDataset fast_decode)')
    parser.add_argument('--decode_cache', type=int, default=0,
                        help='[input] decoded-frame LRU capacity '
                             '(frames; 0 = off)')
    parser.add_argument('--group_by_frame', action='store_true',
                        help='[input] frame-grouped shuffle so cache '
                             'siblings share a batch')
    parser.add_argument('--no_native_decode', action='store_true',
                        help='[input] disable the native fused JPEG '
                             'ROI decode+crop engine (python/cv2 '
                             'oracle path)')
    parser.add_argument('--region_cache', action='store_true',
                        help='[input] per-sample crop-region cache '
                             '(data/region_cache.py); warm-up epoch '
                             'fills it, measured epochs serve from it')
    parser.add_argument('--region_cache_format', type=str,
                        default='jpeg', choices=['jpeg', 'raw'],
                        help='[input] region cache file format')
    parser.add_argument('--detector', action='store_true',
                        help='[serving] also run in-process YOLOv3 '
                             'detection (random init) and measure the '
                             'detect->stage-1 overlap vs the sequential '
                             'ordering')
    parser.add_argument('--compute_only', action='store_true',
                        help='[serving] engine-only throughput: the '
                             'predictor stage graphs with inputs '
                             'pre-staged in HBM (no host prep/tunnel '
                             'in the timed window)')
    parser.add_argument('--camcalib_every', type=int, default=1,
                        help='[serving] stage-1 stream amortization: '
                             'CamCalib runs on every Nth frame only '
                             '(video/webcam semantics; '
                             'SpecPredictor(camcalib_every=N))')
    parser.add_argument('--input_step',
                        choices=['train', 'eval', 'camcalib'],
                        default='train',
                        help='[input] device step the loader feeds: '
                             'the train step (default), the eval '
                             'step (fwd + gendered GT LBS + metrics), '
                             'or "camcalib" = host-only CamCalib '
                             'loader-item throughput (jitter/cache '
                             'variants via --camcalib_jitter / '
                             '--camcalib_split / --decode_cache)')
    parser.add_argument('--camcalib_jitter',
                        choices=['fused', 'pil', 'device'],
                        default='fused',
                        help='[input camcalib] train-aug variant: the '
                             'shipped fused jitter_normalize affine, '
                             'the pre-r4 4-pass PIL ColorJitter chain '
                             '(attribution baseline), or "device" = '
                             'DATASET.DEVICE_JITTER (u8 items + '
                             'per-image affine; jitter/normalize run on '
                             'device, so the host item is '
                             'decode+resize+affine-sample only)')
    parser.add_argument('--camcalib_split', choices=['train', 'val'],
                        default='train',
                        help='[input camcalib] split (val = no jitter, '
                             'decode-cache-exact)')
    parser.add_argument('--camcalib_secs', type=float, default=8.0,
                        help='[input camcalib] minimum timed window')
    parser.add_argument('--camcalib_e2e', action='store_true',
                        help='[input camcalib] also run loader -> '
                             'upload -> the real camcalib train step '
                             'e2e on one shape bucket (fused = f32 '
                             'upload, device = u8+affine upload — the '
                             'DEVICE_JITTER transfer comparison)')
    parser.add_argument('--remat', action='store_true',
                        help='[train] rematerialize backbone blocks in '
                             'the backward pass (TRAINING.REMAT memory '
                             'knob; measured throughput-negative at the '
                             'B=128 sweet spot)')
    args = parser.parse_args(argv)
    if args.batch is None:
        args.batch = {'train': 64, 'detect': 32}.get(args.mode, 128)

    host_only = (args.mode == 'input' and args.input_step == 'camcalib'
                 and not args.camcalib_e2e)
    if not host_only and not _wait_for_backend():
        # Chip unreachable: a clearly-marked stale line beats a red
        # artifact, but only if this exact config was really measured.
        if emit_stale_if_cached(args):
            return
        # else proceed — the real backend error is the honest failure

    if args.mode == 'serving':
        return serving_bench(args)
    if args.mode == 'train':
        return train_bench(args)
    if args.mode == 'eval':
        return eval_bench(args)
    if args.mode == 'detect':
        return detect_bench(args)
    if args.mode == 'input':
        return input_bench(args)
    if args.mode == 'latency':
        return latency_bench(args)

    rng = np.random.RandomState(0)
    B = args.batch
    # Default: the CamCalib full-frame bucket (aspect ~4:3). NB the
    # reference demo resizes min-side to 600 (600x800 at 4:3); smaller
    # buckets trade stage-1 accuracy for throughput — measured variants
    # are recorded in CLAUDE.md, the headline stays at 512x672.
    frame_hw = (args.frame_h, args.frame_w)

    camcalib, spec, assets, pipeline = build_pipeline(stage1=args.stage1)

    raw = jnp.asarray((rng.rand(B, *frame_hw, 3) * 255).astype('f4'))
    center = (rng.rand(B, 2) * 300 + np.array([180, 100])).astype('f4')
    scale = (rng.rand(B) * 0.8 + 0.8).astype('f4')
    corners = jnp.asarray(spin_crop_corners(center, scale))
    center_d = jnp.asarray(center)
    scale_d = jnp.asarray(scale)

    cc_vars = camcalib.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *frame_hw, 3)))
    from spec_tpu.core import geometry as G
    img_h = jnp.full((1,), float(frame_hw[0]))
    img_w = jnp.full((1,), float(frame_hw[1]))
    K0 = G.build_cam_intrinsics(jnp.full((1,), 500.0), img_w, img_h)
    R0 = jnp.tile(jnp.eye(3), (1, 1, 1))
    spec_vars = spec.init(
        jax.random.PRNGKey(1), assets, jnp.zeros((1, 224, 224, 3)), R0, K0,
        jnp.ones((1,)), jnp.ones((1, 2)), img_w, img_h)

    # Timing that provably forces remote execution: every iteration folds a
    # reduction over ALL pipeline outputs into a carried scalar, and the
    # final float() fetch transitively depends on every iteration's full
    # compute. (block_until_ready alone can report 0.2 ms for a full ResNet
    # forward through the axon tunnel — async-dispatch artifact.)
    @jax.jit
    def bench_step(acc, cc_vars, spec_vars, raw, corners, center, scale):
        out = pipeline(cc_vars, spec_vars, raw, corners, center, scale)
        s = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
        return acc + s

    acc = bench_step(jnp.float32(0), cc_vars, spec_vars, raw, corners,
                     center_d, scale_d)
    assert np.isfinite(float(acc))  # warmup/compile + force
    rtt = _fetch_rtt()

    import contextlib

    prof = contextlib.nullcontext()
    if args.profile:
        # XLA-level op/HBM breakdown of the measured window, viewable in
        # tensorboard/xprof (how the 70%-HBM-util figure was obtained).
        from spec_tpu.utils.profiling import trace
        prof = trace(args.profile)

    iters = args.iters
    with prof:
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(iters):
            acc = bench_step(acc, cc_vars, spec_vars, raw, corners,
                             center_d, scale_d)
        total = float(acc)  # single forcing fetch
        dt = time.perf_counter() - t0 - rtt
    assert np.isfinite(total)

    n_chips = max(1, len([d for d in jax.devices()
                          if d.platform == 'tpu'])) if \
        jax.default_backend() == 'tpu' else 1
    img_per_s = B * iters / dt / n_chips
    baseline = 250.0  # img/s/chip (2000 img/s on v5e-8)
    bucket = f'{args.frame_h}x{args.frame_w}'
    payload = {
        'metric': 'camcalib+spec e2e inference throughput '
                  '(raw frames in, on-device preprocessing, '
                  f'stage-1 bucket {bucket})',
        'value': round(img_per_s, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(img_per_s / baseline, 3),
        'stage1_bucket': bucket,
    }
    if bucket != '600x800':
        payload['fidelity_note'] = (
            'reference CamCalib serves at min-side 600 (600x800 at 4:3, '
            'pano_dataset.py:184-220); buckets below 600 need a '
            'checkpoint fine-tuned at that min_size '
            '(configs/camcalib/config_sa_bias_l2_min{512,448,384}.yaml; '
            'the 512 and 448 recipes carry on-chip recovery '
            'measurements, FT_RECOVERY_r0*.json) to hold angle '
            'accuracy — see CLAUDE.md bucket ladder')
    emit(payload, args)


if __name__ == '__main__':
    main()
