"""Fused SMPL blendshape + linear-blend-skinning Pallas TPU kernel.

The hot op of the framework (BASELINE.json north star): batched SMPL
vertex generation. The straightforward jnp path (core/smpl.lbs)
materializes three (B, V, 3) intermediates in HBM — v_shaped, v_posed,
and the blended per-vertex transforms (B, V, 3, 4) — ~5.3 MB + 5.3 MB +
21 MB of HBM traffic per batch-64 call. This kernel fuses the whole
vertex pipeline so only the operands (read once) and the output
(written once) touch HBM.

Design (structure-of-arrays, MXU-shaped):
  * All blendshapes + the template collapse into ONE GEMM:
    ``coeffs (B, 218) @ dirs (218, V)`` per coordinate, where
    coeffs = [betas(10) | pose_feat(207) | 1] (218 rows) and dirs stacks
    [shapedirs | posedirs | v_template] — x/y/z kept as separate lanes-
    major planes so a vertex never straddles lanes.
  * Skinning coefficients come from 12 small MXU matmuls
    ``A_c (Bt, 24) @ weights_T (24, Vt)`` (one per row-major element of
    the 3x4 rigid transform), applied as VPU fmas:
    ``out_i = T_{i0}*px + T_{i1}*py + T_{i2}*pz + T_{i3}``.
  * Grid is (vertex tiles, batch tiles) with the vertex axis OUTER, so
    the big dirs planes stream through VMEM exactly once per call while
    small per-batch operands re-stream.

Rest joints do not need the mesh: the joint regressor is pre-projected
onto the shape blendshapes (J = J_template + betas @ shapedirs_j, a
(B,10)@(10,72) matmul), so the kinematic chain runs on tiny tensors in
plain jnp (core/smpl) and only vertices go through the kernel.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
V_TILE = 512  # vertex tile; V is padded to a multiple of this


from spec_tpu.ops.pallas._util import round_up as _round_up


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedLBSOperands:
    """Kernel-ready SMPL tensors (see :func:`pack_lbs_operands`)."""

    dirs: jnp.ndarray         # (3, 218, Vp) [shapedirs|posedirs|template]
    weights_t: jnp.ndarray    # (24, Vp)
    joints_template: jnp.ndarray  # (24, 3)
    shapedirs_j: jnp.ndarray  # (10, 72) regressor-projected shape dirs
    num_vertices: int = dataclasses.field(metadata=dict(static=True))


def pack_lbs_operands(assets) -> PackedLBSOperands:
    """Precompute the packed layout from :class:`SMPLAssets` (one-time)."""
    V = assets.num_vertices
    Vp = _round_up(V, V_TILE)
    J = assets.num_joints
    P = (J - 1) * 9

    shapedirs = np.asarray(assets.shapedirs)            # (10, V*3)
    posedirs = np.asarray(assets.posedirs)              # (207, V*3)
    v_template = np.asarray(assets.v_template)          # (V, 3)
    jreg = np.asarray(assets.j_regressor)               # (24, V)
    weights = np.asarray(assets.lbs_weights)            # (V, 24)

    dirs = np.zeros((3, 10 + P + 1, Vp), np.float32)
    sd = shapedirs.reshape(10, V, 3)
    pd = posedirs.reshape(P, V, 3)
    for c in range(3):
        dirs[c, :10, :V] = sd[..., c]
        dirs[c, 10:10 + P, :V] = pd[..., c]
        dirs[c, 10 + P, :V] = v_template[:, c]

    weights_t = np.zeros((J, Vp), np.float32)
    weights_t[:, :V] = weights.T

    joints_template = jreg @ v_template                  # (24, 3)
    shapedirs_j = np.einsum('jv,kvc->kjc', jreg, sd).reshape(10, J * 3)

    return PackedLBSOperands(
        dirs=jnp.asarray(dirs),
        weights_t=jnp.asarray(weights_t),
        joints_template=jnp.asarray(joints_template),
        shapedirs_j=jnp.asarray(shapedirs_j),
        num_vertices=V,
    )


def _lbs_kernel(dirs_ref, wt_ref, coef_ref, a_ref, out_ref):
    """One (vertex-tile, batch-tile) step.

    dirs_ref: (3, 218, Vt); wt_ref: (24, Vt); coef_ref: (Bt, 218);
    a_ref: (12, Bt, 24); out_ref: (3, Bt, Vt).
    """
    coef = coef_ref[:]
    posed = [
        jnp.dot(coef, dirs_ref[c], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        for c in range(3)
    ]  # 3 x (Bt, Vt)

    wt = wt_ref[:]
    for i in range(3):
        t = [
            jnp.dot(a_ref[4 * i + k], wt,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            for k in range(4)
        ]  # 4 x (Bt, Vt)
        out_ref[i] = (t[0] * posed[0] + t[1] * posed[1]
                      + t[2] * posed[2] + t[3])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_core(interpret, dirs, wt, coeffs, a_packed):
    """Padded fused vertex pipeline -> (3, Bp, Vp).

    Bilinear in (coeffs, a_packed) given the constant (dirs, wt) operands:
    ``out[i] = sum_k (a[4i+k] @ wt) * posed_k + (a[4i+3] @ wt)`` with
    ``posed_c = coeffs @ dirs[c]`` — which gives the closed-form VJP below
    (forward-speed Pallas kernel, jnp-einsum backward), making the kernel
    usable inside training graphs.
    """
    Bp, C = coeffs.shape
    Vp = dirs.shape[-1]
    BT = min(_round_up(Bp, 8), 64)
    VT = V_TILE
    grid = (Vp // VT, Bp // BT)
    return pl.pallas_call(
        _lbs_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, C, VT), lambda v, b: (0, 0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24, VT), lambda v, b: (0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, C), lambda v, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, BT, 24), lambda v, b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, BT, VT), lambda v, b: (0, b, v),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Bp, Vp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Vp * (3 * C + 12 * 24) + 7 * 3 * Bp * Vp,
            bytes_accessed=(3 * C * Vp + 24 * Vp + Bp * C
                            + 12 * Bp * 24 + 3 * Bp * Vp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dirs, wt, coeffs, a_packed)


def _fused_core_fwd(interpret, dirs, wt, coeffs, a_packed):
    out = _fused_core(interpret, dirs, wt, coeffs, a_packed)
    return out, (dirs, wt, coeffs, a_packed)


def _fused_core_bwd(interpret, res, g):
    """Closed-form cotangents of the bilinear vertex pipeline.

    g: (3, Bp, Vp). Recomputes the two small intermediates (posed, t)
    instead of saving (B, Vp) residuals — one forward-equivalent of MXU
    work, zero extra HBM residency.
    """
    del interpret
    dirs, wt, coeffs, a_packed = res
    hi = jax.lax.Precision.HIGHEST

    posed = jnp.einsum('bm,cmv->cbv', coeffs, dirs, precision=hi,
                       preferred_element_type=jnp.float32)  # (3, Bp, Vp)
    t4 = jnp.einsum('kbj,jv->kbv', a_packed, wt, precision=hi,
                    preferred_element_type=jnp.float32
                    ).reshape(3, 4, *g.shape[1:])           # (3, 4, Bp, Vp)

    # d posed_c = sum_i g_i * t_{ic}  (c < 3)
    dposed = jnp.einsum('ibv,icbv->cbv', g, t4[:, :3], precision=hi,
                        preferred_element_type=jnp.float32)
    dcoeffs = jnp.einsum('cbv,cmv->bm', dposed, dirs, precision=hi,
                         preferred_element_type=jnp.float32)

    # d t_{ik} = g_i * posed_k (k < 3);  d t_{i3} = g_i
    dt4 = jnp.concatenate(
        [jnp.einsum('ibv,kbv->ikbv', g, posed, precision=hi,
                    preferred_element_type=jnp.float32),
         g[:, None]], axis=1)                               # (3, 4, Bp, Vp)
    da = jnp.einsum('ikbv,jv->ikbj', dt4, wt, precision=hi,
                    preferred_element_type=jnp.float32
                    ).reshape(12, g.shape[1], 24)

    # True cotangents for the packed operands too (template/skinning
    # fitting differentiates them; zeros here would silently no-op such
    # training). In the standard pipelines they are constants and XLA
    # DCEs these einsums.
    ddirs = jnp.einsum('bm,cbv->cmv', coeffs, dposed, precision=hi,
                       preferred_element_type=jnp.float32)
    dwt = jnp.einsum('ikbj,ikbv->jv',
                     a_packed.reshape(3, 4, *a_packed.shape[1:]), dt4,
                     precision=hi, preferred_element_type=jnp.float32)
    return ddirs, dwt, dcoeffs, da


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_lbs_vertices(
    packed: PackedLBSOperands,
    coeffs: jnp.ndarray,     # (B, 218) [betas | pose_feat | 1]
    rel_tf: jnp.ndarray,     # (B, 24, 3, 4) rest-corrected transforms
    interpret: bool = False,
) -> jnp.ndarray:
    """-> vertices (B, V, 3). Differentiable (custom VJP on the kernel)."""
    B = coeffs.shape[0]
    C = packed.dirs.shape[1]

    BT = min(_round_up(B, 8), 64)
    Bp = _round_up(B, BT)

    if Bp != B:
        pad = Bp - B
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros((pad, C), coeffs.dtype)], 0)
        rel_tf = jnp.concatenate(
            [rel_tf, jnp.zeros((pad,) + rel_tf.shape[1:], rel_tf.dtype)], 0)

    # (B, 24, 3, 4) -> (12, B, 24) with c = 4*i + k (row-major 3x4).
    a_packed = jnp.transpose(
        rel_tf.reshape(Bp, 24, 12), (2, 0, 1)).astype(jnp.float32)

    out = _fused_core(interpret, packed.dirs, packed.weights_t,
                      coeffs.astype(jnp.float32), a_packed)
    verts = jnp.transpose(out, (1, 2, 0))  # (Bp, Vp, 3)
    return verts[:B, :packed.num_vertices]


def lbs_coeffs(betas: jnp.ndarray, rotmats: jnp.ndarray) -> jnp.ndarray:
    """[betas | (R - I) pose features | 1] -> (B, 218)."""
    B = betas.shape[0]
    eye = jnp.eye(3, dtype=jnp.float32)
    pose_feat = (rotmats[:, 1:].astype(jnp.float32) - eye).reshape(B, -1)
    ones = jnp.ones((B, 1), jnp.float32)
    return jnp.concatenate(
        [betas.astype(jnp.float32), pose_feat, ones], axis=-1)
