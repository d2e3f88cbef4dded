"""Headline benchmark: CamCalib + SPEC end-to-end inference images/sec.

Measures the fused two-stage pipeline on the available accelerator(s):
stage 1 (CamCalib ResNet-50 on full frames -> softargmax angle decode ->
rotmat/intrinsics, all on device) feeding stage 2 (SPEC ResNet-50 + HMR
head + SMPL LBS + full-perspective projection) — one jitted graph, no
host round-trip between stages (the reference crosses a subprocess +
pickle-file boundary per image, ``spec/tester.py:86-88``, and runs
CamCalib at batch 1, ``scripts/camcalib_demo.py:95-100``).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

Baseline: the driver north star of >2,000 img/s on a v5e-8 => 250
img/s/chip; no throughput number is published by the reference itself
(BASELINE.md).
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


def build_pipeline(compute_dtype=jnp.bfloat16):
    from spec_tpu.core import bins, geometry as G
    from spec_tpu.core import smpl as S
    from spec_tpu.models import HMR, CameraRegressorNetwork

    # Real SMPL shapes (6890 verts), with the fused Pallas LBS kernel.
    assets = S.with_packed_lbs(S.create_test_assets())
    camcalib = CameraRegressorNetwork(
        backbone='resnet50', dtype=compute_dtype)
    spec = HMR(backbone='resnet50', use_cam=True, use_cam_feats=True,
               dtype=compute_dtype)

    def pipeline(cc_vars, spec_vars, frames, crops, bbox_center, bbox_scale):
        B = frames.shape[0]
        img_h = jnp.full((B,), float(frames.shape[1]))
        img_w = jnp.full((B,), float(frames.shape[2]))

        vfov_l, pitch_l, roll_l = camcalib.apply(cc_vars, frames)
        vfov, pitch, roll = bins.convert_preds_to_angles(
            vfov_l, pitch_l, roll_l, loss_type='softargmax_biased_l2')
        f_pix = G.focal_length_from_vfov(vfov, img_h)
        cam_rotmat = G.euler_to_rotmat(
            jnp.stack([pitch, jnp.zeros_like(pitch), roll], -1))
        K = G.build_cam_intrinsics(f_pix, img_w, img_h)

        out = spec.apply(
            spec_vars, assets, crops, cam_rotmat, K,
            bbox_scale, bbox_center, img_w, img_h)
        return (out['smpl_vertices'], out['smpl_joints2d'],
                out['pred_cam_t'], vfov, pitch, roll)

    return camcalib, spec, assets, pipeline


def main():
    rng = np.random.RandomState(0)
    B = 64
    frame_hw = (512, 672)  # CamCalib full-frame bucket (aspect ~4:3)

    camcalib, spec, assets, pipeline = build_pipeline()

    frames = jnp.asarray(rng.randn(B, *frame_hw, 3).astype('f4'))
    crops = jnp.asarray(rng.randn(B, 224, 224, 3).astype('f4'))
    center = jnp.asarray(rng.rand(B, 2).astype('f4') * 400 + 100)
    scale = jnp.asarray(rng.rand(B).astype('f4') + 1.0)

    cc_vars = camcalib.init(jax.random.PRNGKey(0), frames)
    img_h = jnp.full((B,), float(frame_hw[0]))
    img_w = jnp.full((B,), float(frame_hw[1]))
    from spec_tpu.core import geometry as G
    K0 = G.build_cam_intrinsics(jnp.full((B,), 500.0), img_w, img_h)
    R0 = jnp.tile(jnp.eye(3), (B, 1, 1))
    spec_vars = spec.init(jax.random.PRNGKey(1), assets, crops, R0, K0,
                          scale, center, img_w, img_h)

    fn = jax.jit(pipeline)
    # Warmup / compile.
    out = fn(cc_vars, spec_vars, frames, crops, center, scale)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(cc_vars, spec_vars, frames, crops, center, scale)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    n_chips = max(1, len([d for d in jax.devices()
                          if d.platform == 'tpu'])) if \
        jax.default_backend() == 'tpu' else 1
    img_per_s = B * iters / dt / n_chips
    baseline = 250.0  # img/s/chip (2000 img/s on v5e-8)
    print(json.dumps({
        'metric': 'camcalib+spec e2e inference throughput',
        'value': round(img_per_s, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(img_per_s / baseline, 3),
    }))


if __name__ == '__main__':
    main()
