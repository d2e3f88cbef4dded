"""Fused full-perspective reprojection Pallas TPU kernel.

Projects batched HBM-resident point sets (SMPL meshes / joint sets) to
pixel coordinates in one VMEM pass: camera rotation + translation +
perspective divide + intrinsics, fused (the BASELINE.json north-star op;
the jnp path in core/geometry.perspective_projection materializes the
rotated points and the homogeneous divide as separate HBM tensors).

Layout: points ride as SoA planes (3, B, Vp) like the LBS kernel, so a
point never straddles lanes; the per-batch camera (R, t, K collapsed to a
single 3x4 matrix P = [K_rot | K_t]) rides in (12, B, 1) columns. Each
(batch-tile, point-tile) step is 9 VPU fmas + a reciprocal + 4 fmas.

Measured on v5e (B=64, V=6890): 0.061 ms vs 0.041 ms for the jitted jnp
path under HIGHEST — XLA already fuses this elementwise chain, so the
model heads (49-joint projection, models/heads/smpl_head.py) keep the
jnp path; this kernel exists as the standalone full-mesh primitive
(renderer / eval vertex projection) and as the verified SoA-layout
reference for fusing projection into larger Pallas pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V_TILE = 512


from spec_tpu.ops.pallas._util import round_up as _round_up



def _proj_kernel(pts_ref, cam_ref, out_ref):
    """pts_ref: (3, Bt, Vt); cam_ref: (12, Bt, 1) rows of the 3x4 camera
    matrix P (row-major); out_ref: (2, Bt, Vt) pixel coords.

    The camera rides with a trailing singleton lane so each row is
    already a (Bt, 1) column — broadcasting over the Vt lanes is native;
    a (12, Bt) layout would need a lane->sublane transpose per row,
    which Mosaic lowers incorrectly on real hardware (verified)."""
    x, y, z = pts_ref[0], pts_ref[1], pts_ref[2]          # (Bt, Vt)

    def row(i):
        c0 = cam_ref[4 * i + 0]                           # (Bt, 1)
        c1 = cam_ref[4 * i + 1]
        c2 = cam_ref[4 * i + 2]
        c3 = cam_ref[4 * i + 3]
        return c0 * x + c1 * y + c2 * z + c3

    u = row(0)
    v = row(1)
    w = jnp.maximum(row(2), 1e-8)
    inv_w = 1.0 / w
    out_ref[0] = u * inv_w
    out_ref[1] = v * inv_w


@functools.partial(jax.jit, static_argnames=('interpret',))
def project_points(
    points: jnp.ndarray,        # (B, V, 3) fp32
    rotation: jnp.ndarray,      # (B, 3, 3)
    translation: jnp.ndarray,   # (B, 3)
    cam_intrinsics: jnp.ndarray,  # (B, 3, 3)
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (B, V, 2) pixels; x_pix = K (R X + t), perspective-divided.

    Matches geometry.perspective_projection exactly (same clamp on the
    depth); the camera collapse P = [K R | K t] happens in fp32 HIGHEST
    on the host side of the graph (tiny 3x3s).
    """
    B, V, _ = points.shape
    Bp = _round_up(B, 8)
    Vp = _round_up(V, V_TILE)
    BT = min(Bp, 64)
    Bp = _round_up(Bp, BT)  # grid = Bp // BT: BT must divide Bp exactly
    VT = V_TILE

    # The reference-layout K leaves the homogeneous row unset (it divides
    # by depth before applying K — cam_params.py:39-47); the collapsed
    # P = K [R | t] form needs K[2] = [0, 0, 1].
    K = cam_intrinsics.astype(jnp.float32)
    K = K.at[:, 2, :].set(jnp.array([0.0, 0.0, 1.0], jnp.float32))
    with jax.default_matmul_precision('highest'):
        KR = jnp.matmul(K, rotation.astype(jnp.float32))     # (B, 3, 3)
        Kt = jnp.einsum('bij,bj->bi', K,
                        translation.astype(jnp.float32))     # (B, 3)
    P = jnp.concatenate([KR, Kt[:, :, None]], axis=-1)       # (B, 3, 4)

    pts = jnp.transpose(points.astype(jnp.float32), (2, 0, 1))  # (3, B, V)
    pts = jnp.pad(pts, ((0, 0), (0, Bp - B), (0, Vp - V)))
    cam = jnp.transpose(P.reshape(B, 12), (1, 0))[:, :, None]  # (12, B, 1)
    cam = jnp.pad(cam, ((0, 0), (0, Bp - B), (0, 0)))
    # Padded rows project to w=eps; keep depth row harmless.
    out = pl.pallas_call(
        _proj_kernel,
        grid=(Vp // VT, Bp // BT),
        in_specs=[
            pl.BlockSpec((3, BT, VT), lambda v, b: (0, b, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, BT, 1), lambda v, b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, BT, VT), lambda v, b: (0, b, v),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, Bp, Vp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=Bp * Vp * 27,
            bytes_accessed=(3 * Bp * Vp + 12 * Bp + 2 * Bp * Vp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pts, cam)
    return jnp.transpose(out, (1, 2, 0))[:B, :V]
