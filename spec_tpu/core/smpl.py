"""SMPL body model as a pure-functional JAX module.

TPU-native replacement for the reference's external SMPL stack (``smplx.SMPL``
and the PARE 49-joint wrapper; import sites: reference ``spec/trainer.py:24,36``,
``spec/dataset/cam_dataset.py:20,29``, ``spec/utils/compute_error.py:24,26``).

Design: model parameters (template, blendshapes, regressors, skinning weights)
live in an immutable :class:`SMPLAssets` pytree of device arrays; the forward
pass is a pure function over (betas, pose rotmats) — fully batched, jit/vmap/
grad-safe, and laid out so the three dominant contractions (shape blendshapes,
pose blendshapes, skinning-weight blend) are single large MXU matmuls:

  * shape:   (B, 10)  @ (10, V*3)    — shapedirs stored pre-flattened
  * pose:    (B, 207) @ (207, V*3)   — posedirs stored pre-flattened
  * skin:    (B*?, V, 24) @ (24, 16) — W @ per-joint 4x4 transforms

Everything runs in fp32 (`preferred_element_type`) to hold the ±0.3 mm parity
budget (SURVEY.md §7.4 item 1). The kinematic chain (24 joints) is unrolled in
Python — static, tiny, XLA-fusable.

Real SMPL asset files are licensed and must be supplied by the user (same
policy as the reference, ``prepare_data.sh``); :func:`load_smpl_assets` reads
both smplx-style ``.pkl`` (chumpy-tolerant) and ``.npz`` dumps.
:func:`create_test_assets` builds a structurally-identical synthetic model for
unit tests.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spec_tpu.core import constants as C
from spec_tpu.core.geometry import fp32_matmuls


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SMPLAssets:
    """Immutable SMPL model tensors (a JAX pytree).

    Shapes use V = num vertices (6890 for real SMPL), J = 24 joints,
    B = num shape betas (10), P = 23*9 = 207 pose-feature dims.
    """

    v_template: jnp.ndarray        # (V, 3)
    shapedirs: jnp.ndarray         # (B, V*3)  pre-flattened for MXU
    posedirs: jnp.ndarray          # (P, V*3)
    j_regressor: jnp.ndarray       # (J, V)
    lbs_weights: jnp.ndarray       # (V, J)
    # Static fields must be hashable (jit treedef equality across distinct
    # asset instances) — plain tuples, not arrays.
    parents: tuple = dataclasses.field(metadata=dict(static=True))  # len J
    faces: jnp.ndarray = None                                       # (F, 3)
    # Optional extra keypoint machinery (49-joint superset path).
    extra_vertex_ids: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True))                   # len 21
    j_regressor_extra: Optional[jnp.ndarray] = None                       # (9, V)
    j_regressor_h36m: Optional[jnp.ndarray] = None                        # (17, V)
    # Optional kernel-ready packed operands for the fused Pallas LBS
    # (ops/pallas/lbs.py); attach with :func:`with_packed_lbs`.
    packed_lbs: Optional[object] = None

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.j_regressor.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SMPLOutput:
    vertices: jnp.ndarray       # (B, V, 3)
    joints: jnp.ndarray         # (B, K, 3) — K depends on the joint set
    joints_native: jnp.ndarray  # (B, 24, 3) kinematic joints post-pose
    global_transforms: jnp.ndarray  # (B, 24, 4, 4) world transforms per joint


# ---------------------------------------------------------------------------
# Asset loading
# ---------------------------------------------------------------------------


class _ChumpyTolerantUnpickler(pickle.Unpickler):
    """Unpickles smplx-style SMPL .pkl files without chumpy installed by
    mapping chumpy arrays onto a numpy-backed stub."""

    def find_class(self, module, name):  # noqa: D102
        if module.startswith('chumpy'):
            return _ChArrayStub
        if module == 'scipy.sparse.csc' or module == 'scipy.sparse._csc':
            import scipy.sparse
            return scipy.sparse.csc_matrix
        return super().find_class(module, name)


class _ChArrayStub:
    """Minimal stand-in for chumpy.Ch: keeps only the ndarray payload."""

    def __setstate__(self, state):
        self.__dict__.update(state)

    def __array__(self, dtype=None):
        arr = np.asarray(self.__dict__.get('x'))
        return arr.astype(dtype) if dtype is not None else arr


def _to_np(x) -> np.ndarray:
    if hasattr(x, 'toarray'):  # scipy sparse
        return np.asarray(x.toarray())
    return np.asarray(x)


def load_smpl_assets(
    model_path: str,
    gender: str = 'neutral',
    j_regressor_extra_path: Optional[str] = None,
    j_regressor_h36m_path: Optional[str] = None,
    dtype=jnp.float32,
) -> SMPLAssets:
    """Load SMPL model tensors from a .pkl/.npz file or a model directory.

    Directory layout follows the reference's ``data/body_models/smpl``
    (``spec/config.py:38``): ``SMPL_{GENDER}.pkl``.
    """
    path = model_path
    if os.path.isdir(path):
        fname = f'SMPL_{gender.upper()}.pkl'
        cand = os.path.join(path, fname)
        if not os.path.exists(cand):
            cand = os.path.join(path, f'SMPL_{gender.upper()}.npz')
        path = cand

    if path.endswith('.pkl'):
        with open(path, 'rb') as f:
            data = _ChumpyTolerantUnpickler(f, encoding='latin1').load()
    else:
        data = dict(np.load(path, allow_pickle=True))

    v_template = _to_np(data['v_template']).astype(np.float32)       # (V, 3)
    shapedirs = _to_np(data['shapedirs']).astype(np.float32)         # (V, 3, B*)
    shapedirs = shapedirs[:, :, :C.NUM_BETAS]
    posedirs = _to_np(data['posedirs']).astype(np.float32)           # (V, 3, P)
    j_regressor = _to_np(data['J_regressor']).astype(np.float32)     # (J, V)
    lbs_weights = _to_np(data['weights']).astype(np.float32)         # (V, J)
    parents = _to_np(data['kintree_table'])[0].astype(np.int64)
    parents[0] = -1
    faces = _to_np(data['f']).astype(np.int32)

    V = v_template.shape[0]
    jre = None
    if j_regressor_extra_path and os.path.exists(j_regressor_extra_path):
        jre = jnp.asarray(np.load(j_regressor_extra_path), dtype)
    jrh = None
    if j_regressor_h36m_path and os.path.exists(j_regressor_h36m_path):
        jrh = jnp.asarray(np.load(j_regressor_h36m_path), dtype)

    return SMPLAssets(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(
            shapedirs.reshape(V * 3, -1).T.copy(), dtype),  # (B, V*3)
        posedirs=jnp.asarray(posedirs.reshape(V * 3, -1).T.copy(), dtype),
        j_regressor=jnp.asarray(j_regressor, dtype),
        lbs_weights=jnp.asarray(lbs_weights, dtype),
        parents=tuple(int(x) for x in parents),
        faces=jnp.asarray(faces),
        extra_vertex_ids=tuple(int(x) for x in C.EXTRA_VERTEX_JOINT_IDS),
        j_regressor_extra=jre,
        j_regressor_h36m=jrh,
    )


def create_test_assets(
    num_vertices: int = C.NUM_SMPL_VERTICES, seed: int = 0,
    with_extra: bool = True,
) -> SMPLAssets:
    """Deterministic synthetic SMPL-shaped assets for unit tests.

    Same tensor shapes and kinematic tree as real SMPL; blendshape magnitudes
    scaled so outputs stay in a human-plausible ~1 m range.
    """
    rng = np.random.RandomState(seed)
    V, J, B = num_vertices, C.NUM_SMPL_JOINTS, C.NUM_BETAS
    P = (J - 1) * 9
    v_template = rng.randn(V, 3).astype(np.float32) * 0.3
    shapedirs = rng.randn(B, V * 3).astype(np.float32) * 0.01
    posedirs = rng.randn(P, V * 3).astype(np.float32) * 0.001
    # Row-stochastic joint regressor / skinning weights.
    jr = rng.rand(J, V).astype(np.float32)
    jr /= jr.sum(axis=1, keepdims=True)
    w = rng.rand(V, J).astype(np.float32) ** 4
    w /= w.sum(axis=1, keepdims=True)
    faces = rng.randint(0, V, size=(V * 2, 3)).astype(np.int32)
    extra_ids = (tuple(int(x) for x in
                       C.EXTRA_VERTEX_JOINT_IDS % num_vertices)
                 if with_extra else None)
    jre = None
    jrh = None
    if with_extra:
        jre = rng.rand(9, V).astype(np.float32)
        jre /= jre.sum(axis=1, keepdims=True)
        jrh = rng.rand(17, V).astype(np.float32)
        jrh /= jrh.sum(axis=1, keepdims=True)
    return SMPLAssets(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(jr),
        lbs_weights=jnp.asarray(w),
        parents=tuple(int(x) for x in C.SMPL_PARENTS),
        faces=jnp.asarray(faces),
        extra_vertex_ids=extra_ids,
        j_regressor_extra=jre,
        j_regressor_h36m=jrh,
    )


# ---------------------------------------------------------------------------
# Forward (LBS)
# ---------------------------------------------------------------------------


@fp32_matmuls
def _rigid_transform_chain(
    rotmats: jnp.ndarray, joints: jnp.ndarray, parents
) -> jnp.ndarray:
    """Compose per-joint world transforms along the kinematic tree.

    Args:
      rotmats: (B, J, 3, 3) local joint rotations (index 0 = global orient).
      joints: (B, J, 3) rest-pose joint locations.
      parents: static (J,) parent table.
    Returns:
      (B, J, 4, 4) world transforms ``A_j`` mapping rest-frame offsets.
    """
    B, J = rotmats.shape[:2]
    parents = np.asarray(parents)
    rel = joints.at[:, 1:].add(-joints[:, parents[1:]])  # local offsets

    def make_tf(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)       # (B, 3, 4)
        bot = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), (B, 1, 4))
        return jnp.concatenate([top, bot], axis=-2)             # (B, 4, 4)

    # Unrolled chain — J = 24 is static and tiny.
    world = [make_tf(rotmats[:, 0], rel[:, 0])]
    for j in range(1, J):
        world.append(world[parents[j]] @ make_tf(rotmats[:, j], rel[:, j]))
    return jnp.stack(world, axis=1)  # (B, J, 4, 4)


@fp32_matmuls
def lbs(
    assets: SMPLAssets,
    betas: jnp.ndarray,
    rotmats: jnp.ndarray,
    pose2rot_input_is_aa: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shape + pose blendshapes, joint regression, linear blend skinning.

    Args:
      betas: (B, 10) shape coefficients.
      rotmats: (B, 24, 3, 3) rotation matrices, or (B, 72) axis-angle if
        ``pose2rot_input_is_aa``.
    Returns:
      (vertices (B, V, 3), posed joints (B, 24, 3), world tfs (B, 24, 4, 4)).
    """
    from spec_tpu.core.geometry import rodrigues

    if pose2rot_input_is_aa:
        rotmats = rodrigues(rotmats.reshape(-1, 24, 3))
    betas = betas.astype(jnp.float32)
    rotmats = rotmats.astype(jnp.float32)
    Bn = betas.shape[0]
    V = assets.num_vertices
    J = assets.num_joints

    # Shape blendshapes: one (B, 10) @ (10, V*3) matmul.
    v_shaped = assets.v_template[None] + jnp.matmul(
        betas, assets.shapedirs, preferred_element_type=jnp.float32
    ).reshape(Bn, V, 3)

    # Rest joints.
    joints_rest = jnp.einsum(
        'jv,bvc->bjc', assets.j_regressor, v_shaped,
        preferred_element_type=jnp.float32)

    # Pose blendshapes: (B, 207) @ (207, V*3).
    eye = jnp.eye(3, dtype=jnp.float32)
    pose_feat = (rotmats[:, 1:] - eye).reshape(Bn, (J - 1) * 9)
    v_posed = v_shaped + jnp.matmul(
        pose_feat, assets.posedirs, preferred_element_type=jnp.float32
    ).reshape(Bn, V, 3)

    # Kinematic chain.
    world_tf = _rigid_transform_chain(rotmats, joints_rest, assets.parents)
    joints_posed = world_tf[..., :3, 3]

    # Remove the rest-pose joint locations from the transforms so they act on
    # rest-frame vertex coordinates: A'_j = A_j - [0 | A_j[:3,:3] @ J_j].
    correction = jnp.einsum(
        'bjxy,bjy->bjx', world_tf[..., :3, :3], joints_rest,
        preferred_element_type=jnp.float32)
    rel_tf = world_tf.at[..., :3, 3].add(-correction)

    # Skinning: blend 4x4s with one (V, J) @ (B, J, 16) matmul.
    T = jnp.einsum(
        'vj,bjpq->bvpq', assets.lbs_weights, rel_tf,
        preferred_element_type=jnp.float32)
    verts = (
        jnp.einsum('bvpq,bvq->bvp', T[..., :3, :3], v_posed,
                   preferred_element_type=jnp.float32)
        + T[..., :3, 3])
    return verts, joints_posed, world_tf


@fp32_matmuls
def lbs_fused(
    assets: SMPLAssets,
    betas: jnp.ndarray,
    rotmats: jnp.ndarray,
    packed=None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LBS with the fused Pallas vertex kernel (ops/pallas/lbs.py).

    Numerically equivalent to :func:`lbs`; the kinematic chain stays in
    jnp (tiny), vertices go through one fused TPU kernel. Rest joints come
    from the regressor pre-projected onto the shape blendshapes, so the
    (B, V, 3) shaped mesh is never materialized.

    Args mirror :func:`lbs`; ``packed`` is a cached
    :func:`spec_tpu.ops.pallas.lbs.pack_lbs_operands` result.
    """
    from spec_tpu.ops.pallas.lbs import (
        fused_lbs_vertices,
        lbs_coeffs,
        pack_lbs_operands,
    )

    if packed is None:
        packed = pack_lbs_operands(assets)
    betas = betas.astype(jnp.float32)
    rotmats = rotmats.astype(jnp.float32)
    Bn = betas.shape[0]
    J = assets.num_joints

    joints_rest = packed.joints_template[None] + jnp.matmul(
        betas, packed.shapedirs_j,
        preferred_element_type=jnp.float32).reshape(Bn, J, 3)
    world_tf = _rigid_transform_chain(rotmats, joints_rest, assets.parents)
    correction = jnp.einsum(
        'bjxy,bjy->bjx', world_tf[..., :3, :3], joints_rest,
        preferred_element_type=jnp.float32)
    rel_tf = world_tf.at[..., :3, 3].add(-correction)[..., :3, :]

    coeffs = lbs_coeffs(betas, rotmats)
    verts = fused_lbs_vertices(packed, coeffs, rel_tf, interpret=interpret)
    return verts, world_tf[..., :3, 3], world_tf


def smpl_forward(
    assets: SMPLAssets,
    betas: jnp.ndarray,
    body_pose: jnp.ndarray,
    global_orient: jnp.ndarray,
    transl: Optional[jnp.ndarray] = None,
    pose2rot: bool = True,
    joint_set: str = 'smpl54',
    fused: Optional[bool] = None,
) -> SMPLOutput:
    """Canonical SMPL forward.

    Args:
      betas: (B, 10).
      body_pose: (B, 23, 3) axis-angle if ``pose2rot`` else (B, 23, 3, 3).
      global_orient: (B, 1, 3) axis-angle if ``pose2rot`` else (B, 1, 3, 3).
      transl: optional (B, 3) root translation.
      joint_set: 'native' (24), 'smpl54', or 'spin49' (the reference's
        49-joint superset, requires j_regressor_extra).
      fused: use the fused Pallas LBS kernel; default auto (on when the
        assets carry packed operands — see :func:`with_packed_lbs`).
    """
    from spec_tpu.core.geometry import rodrigues

    if pose2rot:
        full_aa = jnp.concatenate([global_orient, body_pose], axis=1)
        rotmats = rodrigues(full_aa)
    else:
        rotmats = jnp.concatenate([global_orient, body_pose], axis=1)

    if fused is None:
        fused = assets.packed_lbs is not None
    if fused:
        verts, joints24, world_tf = lbs_fused(
            assets, betas, rotmats, packed=assets.packed_lbs)
    else:
        verts, joints24, world_tf = lbs(assets, betas, rotmats)

    if joint_set == 'native':
        joints = joints24
    else:
        # The 54/49-joint supersets index up to slot 53; missing extra
        # rows (either source) would leave too few joints and jnp's
        # out-of-range take CLAMPS under jit (silent garbage), so fail
        # loudly instead.
        if assets.j_regressor_extra is None or assets.extra_vertex_ids is None:
            missing = ('j_regressor_extra' if assets.j_regressor_extra is None
                       else 'extra_vertex_ids')
            raise ValueError(
                f'joint_set={joint_set!r} requires assets.{missing} '
                '(load assets with j_regressor_extra_path / default '
                'extra_vertex_ids)')
        parts = [joints24]
        if assets.extra_vertex_ids is not None:
            parts.append(verts[:, np.asarray(assets.extra_vertex_ids)])
        # Metric-path matmul: pin to fp32 HIGHEST (bf16 passes cost ~1e-3
        # relative on mesh-scale coordinates — above the parity budget).
        with jax.default_matmul_precision('highest'):
            parts.append(jnp.einsum(
                'jv,bvc->bjc', assets.j_regressor_extra, verts,
                preferred_element_type=jnp.float32))
        joints = jnp.concatenate(parts, axis=1)
        if joint_set == 'spin49':
            joints = joints[:, C.JOINT49_TO_SMPL54]

    if transl is not None:
        t = transl[:, None, :]
        verts = verts + t
        joints = joints + t
        joints24 = joints24 + t

    return SMPLOutput(
        vertices=verts, joints=joints, joints_native=joints24,
        global_transforms=world_tf)


@fp32_matmuls
def regress_h36m_joints(
    assets: SMPLAssets, vertices: jnp.ndarray, subset: str = 'j14'
) -> jnp.ndarray:
    """H36M 17-joint regression from the mesh + LSP-14 selection — the eval
    protocol joints (reference ``spec/trainer.py:272-302``)."""
    assert assets.j_regressor_h36m is not None, 'load J_regressor_h36m'
    j17 = jnp.einsum(
        'jv,bvc->bjc', assets.j_regressor_h36m, vertices,
        preferred_element_type=jnp.float32)
    if subset == 'j17':
        return j17[:, C.H36M_TO_J17]
    return j17[:, C.H36M_TO_J14]


def load_assets_or_test(smpl_model_dir: str = '',
                        tag: str = 'smpl') -> SMPLAssets:
    """Neutral SMPL assets from the registry dir, or synthetic test
    assets (with a loud warning) when the released files are absent —
    the shared fallback of the demo/serving surfaces."""
    from spec_tpu.utils import paths

    smpl_dir = smpl_model_dir or paths.smpl_model_dir()
    if os.path.isdir(smpl_dir) and os.listdir(smpl_dir):
        return load_smpl_assets(
            smpl_dir, gender='neutral',
            j_regressor_extra_path=paths.j_regressor_extra_path(),
            j_regressor_h36m_path=paths.j_regressor_h36m_path())
    print(f'[{tag}] WARNING: SMPL assets not found at {smpl_dir}; '
          'using synthetic test assets (meshes will be meaningless)')
    return create_test_assets()


def with_packed_lbs(assets: SMPLAssets) -> SMPLAssets:
    """Return a copy of the assets carrying the fused-kernel operands —
    every :func:`smpl_forward` over it then uses the Pallas LBS path."""
    from spec_tpu.ops.pallas.lbs import pack_lbs_operands

    return dataclasses.replace(assets, packed_lbs=pack_lbs_operands(assets))
