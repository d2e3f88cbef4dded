"""Real-chip validation harness for the TPU-only numerics.

The unit suite (tests/) runs on a forced-CPU mesh; Pallas kernels run
there in interpret mode, which does NOT catch Mosaic lowering bugs
(measured: a (K, B) row-broadcast that passes interpret mode lowers to
garbage on hardware — see CLAUDE.md). This script drives every custom
kernel and the fp32-pinned geometry/metric math on the REAL chip and
compares against CPU goldens, enforcing the parity budgets the framework
is built to (±0.3 mm end-to-end → components held well under that).

Run on a TPU host:  python tools/tpu_checks.py [--json OUT.json]
Exit code 0 = all checks pass. ``--json`` writes a per-round auditable
artifact (check name -> value/budget/pass + timestamp, the same pattern
as the bench cache) — commit it as TPU_CHECKS_r{N}.json.
"""

from __future__ import annotations

import os
import sys

# `python tools/tpu_checks.py` puts tools/ (not the repo root) on
# sys.path; make the spec_tpu import work for any invocation style.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

FAILURES = []
RESULTS = []


def check(name: str, err: float, budget: float, unit: str = 'mm'):
    ok = bool(np.isfinite(err)) and err < budget
    print(f'[{"PASS" if ok else "FAIL"}] {name}: {err:.3e} {unit} '
          f'(budget {budget:g})')
    RESULTS.append({'name': name, 'value': float(err),
                    'budget': float(budget), 'unit': unit, 'pass': ok})
    if not ok:
        FAILURES.append(name)


def _cpu():
    return jax.devices('cpu')[0]


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--json', type=str, default='',
                        help='write the auditable per-round artifact '
                             '(TPU_CHECKS_r{N}.json) here')
    args = parser.parse_args(argv)
    if jax.default_backend() not in ('tpu', 'axon'):
        print(f'WARNING: default backend is {jax.default_backend()!r}, '
              'not a TPU — checks degrade to backend self-consistency')

    from spec_tpu.core import geometry as G, smpl as S
    from spec_tpu.core.geometry import rodrigues
    from spec_tpu.eval.metrics import pa_mpjpe
    from spec_tpu.ops.pallas.lbs import pack_lbs_operands
    from spec_tpu.ops.pallas.projection import project_points
    from spec_tpu.ops.preprocess import (
        crop_resize_normalize,
        spin_crop_corners,
    )

    rng = np.random.RandomState(0)

    # ---- 1. Fused LBS kernel: chip vs CPU jnp reference (metres -> mm).
    assets = S.create_test_assets(num_vertices=6890)
    packed = pack_lbs_operands(assets)
    B = 32
    betas = rng.randn(B, 10).astype('f4') * 0.5
    aa = rng.randn(B, 24, 3).astype('f4') * 0.3

    v_chip, _, _ = jax.jit(
        lambda b, a: S.lbs_fused(assets, b, rodrigues(a), packed=packed)
    )(jnp.asarray(betas), jnp.asarray(aa))
    with jax.default_device(_cpu()):
        v_ref, _, _ = S.lbs(assets, jnp.asarray(betas),
                            rodrigues(jnp.asarray(aa)))
    err = float(np.abs(np.asarray(v_chip) - np.asarray(v_ref)).max()) * 1000
    check('pallas LBS kernel vs CPU jnp path', err, 0.01)

    # ---- 2. LBS custom VJP on chip vs CPU autodiff of the jnp path.
    def loss_fused(b, a):
        v, _, _ = S.lbs_fused(assets, b, rodrigues(a), packed=packed)
        return jnp.sum(jnp.sin(v))

    def loss_ref(b, a):
        v, _, _ = S.lbs(assets, b, rodrigues(a))
        return jnp.sum(jnp.sin(v))

    gb_chip, ga_chip = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(
        jnp.asarray(betas), jnp.asarray(aa))
    with jax.default_device(_cpu()):
        gb_ref, ga_ref = jax.grad(loss_ref, argnums=(0, 1))(
            jnp.asarray(betas), jnp.asarray(aa))
    gerr = max(
        float(np.abs(np.asarray(gb_chip) - np.asarray(gb_ref)).max()),
        float(np.abs(np.asarray(ga_chip) - np.asarray(ga_ref)).max()))
    rel = gerr / max(float(np.abs(np.asarray(ga_ref)).max()), 1e-9)
    check('pallas LBS custom VJP vs CPU autodiff (rel)', rel, 1e-4, unit='')

    # ---- 3. Fused projection kernel vs CPU jnp reference (pixels).
    pts = rng.randn(B, 49, 3).astype('f4') + np.array([0, 0, 5], 'f4')
    R = np.asarray(G.euler_to_rotmat(
        jnp.asarray(rng.randn(B, 3).astype('f4') * 0.2)))
    t = rng.randn(B, 3).astype('f4') * 0.5
    K = np.asarray(G.build_cam_intrinsics(
        jnp.full((B,), 1500.0), jnp.full((B,), 1920.0),
        jnp.full((B,), 1080.0)))

    p_chip = jax.jit(project_points)(
        jnp.asarray(pts), jnp.asarray(R), jnp.asarray(t), jnp.asarray(K))
    with jax.default_device(_cpu()):
        p_ref = G.perspective_projection(
            jnp.asarray(pts), rotation=jnp.asarray(R),
            translation=jnp.asarray(t), cam_intrinsics=jnp.asarray(K))
    perr = float(np.abs(np.asarray(p_chip) - np.asarray(p_ref)).max())
    check('pallas projection kernel vs CPU jnp path', perr, 1e-2,
          unit='px')

    # ---- 4. On-device crop/resize vs the host (SPIN) path, FULL image
    # including the border ring (box-edge clamping matches cv2 exactly);
    # values compared in [0, 1] pixel units.
    from spec_tpu.data.transforms import crop as host_crop

    frames = (rng.rand(8, 240, 320, 3) * 255).astype('f4')
    centers = (rng.rand(8, 2) * 100 + np.array([160, 120])).astype('f4')
    scales = (rng.rand(8) * 0.5 + 0.5).astype('f4')
    corners = spin_crop_corners(centers, scales)
    op = lambda f, c: crop_resize_normalize(f, c, res=224, normalize=False)
    crops_chip = np.asarray(jax.jit(op)(jnp.asarray(frames),
                                        jnp.asarray(corners)))
    worst = 0.0
    for k in range(8):
        hc = host_crop(frames[k], centers[k], float(scales[k]),
                       (224, 224)) / 255.0
        worst = max(worst, float(
            np.abs(crops_chip[k] - hc).max()))
    check('on-device preprocess vs host SPIN crop (full image)', worst,
          2e-3, unit='(px/255)')

    # Same op chip vs CPU backend, full image — catches TPU-specific
    # lowering/precision drift that the host comparison cannot see.
    with jax.default_device(_cpu()):
        crops_cpu = np.asarray(op(jnp.asarray(frames),
                                  jnp.asarray(corners)))
    xerr = float(np.abs(crops_chip - crops_cpu).max())
    check('on-device preprocess chip vs CPU backend', xerr, 2e-3,
          unit='(px/255)')

    # ---- 5. fp32-pinned metric math: batched Procrustes on chip vs CPU.
    gt = rng.randn(B, 14, 3).astype('f4') * 0.3
    pred = gt + rng.randn(B, 14, 3).astype('f4') * 0.05
    pa_chip = np.asarray(
        jax.jit(lambda p, g: pa_mpjpe(p, g)[0])(jnp.asarray(pred),
                                                jnp.asarray(gt)))
    with jax.default_device(_cpu()):
        pa_ref = np.asarray(pa_mpjpe(jnp.asarray(pred),
                                     jnp.asarray(gt))[0])
    paerr = float(np.abs(pa_chip - pa_ref).max()) * 1000
    check('batched SVD Procrustes (PA-MPJPE) chip vs CPU', paerr, 0.05)

    # ---- 5b. In-graph SMPLify: the fitting loop runs 60+ Adam steps of
    # grads through LBS + projection on-chip; bf16 leakage anywhere in
    # that chain diverges the minimum (CPU run is the golden).
    from spec_tpu.train.smplify import smplify_fit

    B = 2
    fit_assets = S.create_test_assets(num_vertices=128)
    go = (rng.randn(B, 1, 3) * 0.1).astype('f4')
    bp = (rng.randn(B, 23, 3) * 0.1).astype('f4')
    t = np.tile(np.array([[0, 0, 5]], 'f4'), (B, 1))
    Rm = np.tile(np.eye(3, dtype='f4'), (B, 1, 1))
    Km = np.tile(np.array([[1000., 0, 500], [0, 1000., 500],
                           [0, 0, 1]], 'f4'), (B, 1, 1))
    gt_fit = S.smpl_forward(fit_assets, jnp.zeros((B, 10)),
                            jnp.asarray(bp), jnp.asarray(go),
                            pose2rot=True, joint_set='spin49')
    jj = np.asarray(gt_fit.joints)
    pp = np.einsum('brc,bjc->bjr', Rm, jj) + t[:, None]
    px = np.einsum('brc,bjc->bjr', Km, pp)
    px = px[..., :2] / px[..., 2:3]
    kpf = np.concatenate([px, np.ones((B, 49, 1), 'f4')], -1).astype('f4')
    fit_args = (fit_assets, jnp.asarray(go), jnp.asarray(bp + 0.05),
                jnp.zeros((B, 10)), jnp.asarray(t), jnp.asarray(kpf),
                jnp.asarray(Rm), jnp.asarray(Km))
    fit_kw = dict(num_iters=60, lr=2e-2, pose_prior_weight=1.0,
                  shape_prior_weight=1.0, angle_prior_weight=0.0)
    res_chip = smplify_fit(*fit_args, **fit_kw)
    with jax.default_device(_cpu()):
        res_cpu = smplify_fit(*fit_args, **fit_kw)
    fit_err = float(np.abs(np.asarray(res_chip.vertices)
                           - np.asarray(res_cpu.vertices)).max()) * 1000
    check('smplify 60-iter fit chip vs CPU (fitted mesh)', fit_err, 5.0)

    # ---- 5c. HRNet-W32 trunk on the real chip, both head variants
    # (-interp default and -conv, reference spec/models/hmr.py:44-53):
    # forward + a loss gradient, cross-checked against the CPU backend.
    # Converter/activation parity is CPU-tested (tests/test_hrnet.py) but
    # CPU/interp passes do not catch Mosaic/layout lowering surprises —
    # this is the one-time hardware drive VERDICT r1 asked for.
    from spec_tpu.models import backbones as BB

    x_h = jnp.asarray(rng.rand(2, 224, 224, 3).astype('f4'))
    for variant in ('hrnet_w32', 'hrnet_w32-conv'):
        trunk = BB.get_backbone(variant, dtype=jnp.float32)
        hvars = trunk.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3)), train=False)
        fwd = jax.jit(lambda v, x, t=trunk: t.apply(v, x, train=False))
        y_chip = np.asarray(fwd(hvars, x_h))
        with jax.default_device(_cpu()):
            y_cpu = np.asarray(fwd(hvars, x_h))
        rel = float(np.abs(y_chip - y_cpu).max()) / (
            float(np.abs(y_cpu).max()) + 1e-9)
        # fp32 convs run as bf16 passes on TPU (~1e-3/layer drift).
        check(f'{variant} forward chip vs CPU (rel)', rel, 2e-2, unit='')

        def hloss(v, x, t=trunk):
            y = t.apply(v, x, train=False)
            return jnp.mean(jnp.sin(y.astype(jnp.float32) * 0.1))

        # Grad parity runs fp32-PINNED: at default precision the TPU's
        # bf16 conv passes legitimately flip ReLU masks and accumulate
        # through the deep multi-branch trunk to ~0.28 entrywise grad
        # deviation vs the f32 CPU reference (measured; collapses to
        # 2e-3 at HIGHEST) — that is a precision-policy fact, not a
        # lowering bug, and pinning isolates what this check is for:
        # that the backward lowering computes the right thing.
        with jax.default_matmul_precision('highest'):
            g_chip = jax.jit(
                jax.grad(lambda p, x: hloss(
                    {'params': p, 'batch_stats': hvars['batch_stats']},
                    x)))(hvars['params'], x_h)
            with jax.default_device(_cpu()):
                g_cpu = jax.grad(lambda p, x: hloss(
                    {'params': p,
                     'batch_stats': hvars['batch_stats']}, x))(
                    hvars['params'], x_h)
        flat_c = np.concatenate([np.ravel(l) for l in
                                 jax.tree_util.tree_leaves(g_chip)])
        flat_r = np.concatenate([np.ravel(l) for l in
                                 jax.tree_util.tree_leaves(g_cpu)])
        grel = float(np.abs(flat_c - flat_r).max()) / (
            float(np.abs(flat_r).max()) + 1e-9)
        check(f'{variant} loss-grad chip vs CPU (fp32-pinned, rel)',
              grel, 1e-2, unit='')

    # ---- 5d. YOLOv3 detector on the real chip: forward + device-side
    # top-K candidate filter, cross-checked vs the CPU backend (the
    # decode tail — sigmoid/exp/meshgrid/top_k over (B, N, 85) — is new
    # lowering surface; interpret/CPU passes do not catch Mosaic bugs).
    from spec_tpu.models.detector import YoloV3, top_person_candidates

    ym = YoloV3(compute_dtype=jnp.bfloat16)
    x_y = jnp.asarray(rng.rand(2, 416, 416, 3).astype('f4'))
    yvars = ym.init(jax.random.PRNGKey(2), x_y)
    yfwd = jax.jit(lambda v, x: ym.apply(v, x, mutable=False))
    y_chip = np.asarray(yfwd(yvars, x_y))
    with jax.default_device(_cpu()):
        y_cpu = np.asarray(yfwd(yvars, x_y))
    # Elementwise on the full decode: same index = same anchor, so this
    # is ordering-insensitive (a top-K rank comparison reshuffles
    # near-tie random-init scores and measures nothing). Boxes in px.
    box_med = float(np.median(np.abs(y_chip[..., :4] - y_cpu[..., :4])))
    check('yolov3 decoded boxes chip vs CPU (median px)', box_med, 2.0,
          unit='px')
    score_med = float(np.median(np.abs(y_chip[..., 4:] - y_cpu[..., 4:])))
    check('yolov3 obj/cls scores chip vs CPU (median)', score_med, 5e-3,
          unit='')
    # top_k + take_along_axis lowering sanity on chip: shape, finiteness,
    # descending scores.
    y_top = np.asarray(jax.jit(top_person_candidates)(jnp.asarray(y_chip)))
    assert y_top.shape == (2, 256, 5) and np.isfinite(y_top).all()
    assert (np.diff(y_top[..., 4], axis=-1) <= 1e-6).all()
    check('yolov3 device top-K monotone scores', 0.0, 1.0, unit='')

    # ---- 5b. Training LEARNS on chip: camcalib on synthetic horizon
    # images (sky/ground two-tone; geometry = reference vis_utils.py:
    # 86-88). Guards the whole bf16 train graph (conv backward, BN stats,
    # optax update) against hardware lowering surprises that forward-only
    # checks and the CPU suite (tests/test_learning.py) cannot see.
    from spec_tpu.core import bins as CB
    from spec_tpu.data.pano_dataset import encode_targets
    from spec_tpu.models import CameraRegressorNetwork
    from spec_tpu.train import adam, create_train_state, make_camcalib_train_step

    from spec_tpu.datagen.synthetic import render_horizon_batch

    def _horizon_imgs(n, res=64, vfov=1.2):
        return render_horizon_batch(rng, n, res=res, vfov=vfov)

    cm = CameraRegressorNetwork(backbone='resnet18')
    imgs, pitch, roll = _horizon_imgs(128)
    tx = adam(3e-4)
    cvars = cm.init(jax.random.PRNGKey(3), jnp.asarray(imgs[:2]))
    cstate = create_train_state(cvars, tx)
    cstep = jax.jit(make_camcalib_train_step(cm, tx, loss_type='ce'))
    cl_losses = []
    for ep in range(10):                       # 40 steps, fixed 128-set
        order = rng.permutation(128)
        for s0 in range(0, 128, 32):
            idx = order[s0:s0 + 32]
            enc = encode_targets(np.full(32, 1.2, 'f4'), pitch[idx],
                                 roll[idx], 'ce')
            cstate, d = cstep(cstate, {
                'img': jnp.asarray(imgs[idx]),
                'vfov': jnp.asarray(enc['vfov']),
                'pitch': jnp.asarray(enc['pitch']),
                'roll': jnp.asarray(enc['roll'])})
            cl_losses.append(float(d['loss']))   # scalar fetch = honest
    ratio = float(np.mean(cl_losses[-4:]) / np.mean(cl_losses[:4]))
    check('camcalib train step learns on chip (late/early loss)',
          ratio, 0.6, unit='ratio')
    logits = cm.apply({'params': cstate.params,
                       'batch_stats': cstate.batch_stats},
                      jnp.asarray(imgs[:64]), train=False)
    _, p_pred, _ = CB.convert_preds_to_angles(*logits, loss_type='ce')
    mae_p = float(np.abs(np.asarray(p_pred) - pitch[:64]).mean())
    check('camcalib on-chip trained pitch MAE (train set)', mae_p, 0.15,
          unit='rad')

    # ---- 5c. .specx AOT artifact executes on chip and matches the CPU
    # deserialization (the cross-platform lowering claim of export.py:
    # one artifact, cpu AND tpu platforms; parity budget = bf16-conv
    # forward, same as the live-pipeline checks).
    import tempfile

    from spec_tpu.export import export_predictor, load_predictor
    from spec_tpu.serving import SpecPredictor

    sp = SpecPredictor(backbone='resnet18', camcalib_backbone='resnet18',
                       batch_size=2, min_size=64, use_fused_lbs=False)
    with tempfile.TemporaryDirectory() as td:
        art = os.path.join(td, 'm.specx')
        export_predictor(sp, art, platforms=('cpu', 'tpu'))
        ld = load_predictor(art)
        frame = (rng.rand(80, 112, 3) * 255).astype('u1')
        boxes = np.array([[56, 40, 50, 64]], 'f4')
        r_tpu = ld.predict([frame], [boxes])[0][0]
        with jax.default_device(_cpu()):
            ld_cpu = load_predictor(art)
            r_cpu = ld_cpu.predict([frame], [boxes])[0][0]
        verr = float(np.abs(np.asarray(r_tpu['smpl_vertices'])
                            - np.asarray(r_cpu['smpl_vertices'])).max())
        check('.specx artifact chip-vs-cpu vertices', verr * 1000.0, 5.0,
              unit='mm (bf16 conv budget)')

    # ---- 5d. Serving predict() e2e on chip with the in-process detector:
    # the overlapped dispatch path (detect_dispatch -> stage-1 dispatch ->
    # NMS fetch -> camera fetch, serving.py) must produce the SAME
    # cameras/outputs as the explicit sequential ordering.
    sp2 = SpecPredictor(backbone='resnet18', camcalib_backbone='resnet18',
                        batch_size=4, min_size=64, detector='yolo',
                        yolo_img_size=64, uint8_crops=True)
    frames = [(rng.rand(64, 96, 3) * 255).astype('u1') for _ in range(3)]
    res_overlap = sp2.predict(frames)               # overlapped ordering
    dets = sp2.detector.detect(frames)              # sequential twin
    cams = sp2.estimate_cameras(frames)
    res_seq = sp2.predict(frames, boxes=dets, cameras=cams)
    assert [len(r) for r in res_overlap] == [len(r) for r in res_seq]
    cam_err = max(
        abs(a['camera'][k] - b['camera'][k])
        for ra, rb in zip(res_overlap, res_seq)
        for a, b in zip(ra, rb) for k in ('vfov', 'pitch', 'roll')
    ) if any(res_overlap) else 0.0
    check('serving overlapped vs sequential detect+stage1 cameras',
          cam_err, 1e-6, unit='rad')

    # ---- 6. Rotation math roundtrip under fp32 pinning.
    aa2 = rng.randn(256, 3).astype('f4')
    R2 = jax.jit(lambda a: rodrigues(a[:, None, :]))(jnp.asarray(aa2))[:, 0]
    back = np.asarray(jax.jit(G.rotmat_to_aa)(R2))
    fwd = np.asarray(rodrigues(jnp.asarray(back)[:, None, :]))[:, 0]
    rerr = float(np.abs(fwd - np.asarray(R2)).max())
    check('rodrigues <-> rotmat roundtrip on chip', rerr, 1e-5, unit='')

    print()
    if args.json:
        import json
        import time

        with open(args.json, 'w') as f:
            json.dump({
                'measured_at': time.time(),
                'backend': jax.default_backend(),
                'n_checks': len(RESULTS),
                'n_failed': len(FAILURES),
                'checks': RESULTS,
            }, f, indent=1)
        print(f'wrote {args.json} ({len(RESULTS)} checks, '
              f'{len(FAILURES)} failed)')
    if FAILURES:
        print(f'{len(FAILURES)} check(s) FAILED: {FAILURES}')
        return 1
    print('all real-chip checks passed')
    return 0


if __name__ == '__main__':
    sys.exit(main())
