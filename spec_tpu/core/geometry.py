"""Rotation representations and camera projection math (pure JAX).

TPU-native re-derivation of the geometry layer the reference delegates to
``pare.utils.geometry`` (import sites: reference ``spec/trainer.py:30``,
``spec/losses.py:23``, ``spec/utils/cam_params.py:21``). Everything here is a
pure ``jnp`` function, batched over a leading axis, jit/vmap/grad-safe, and
runs in fp32 regardless of the surrounding bf16 policy — rotation math must
stay fp32 to hold the ±0.3 mm metric budget (SURVEY.md §7.4).

Conventions
-----------
* Rotation matrices are row-major, right-multiply column vectors: ``x' = R x``.
* Euler order follows the reference camera model: ``R = Rx(pitch) @ Ry(yaw)
  @ Rz(roll)`` — see ``euler_to_rotmat``.
* Axis-angle vectors encode axis * angle (Rodrigues form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def fp32_matmuls(fn):
    """Force HIGHEST matmul precision inside ``fn``.

    On TPU the default matmul path rounds fp32 inputs to bf16 passes
    (~1e-3 relative error) — far outside the ±0.3 mm parity budget for
    rotation/projection math. These matrices are 3x3: the fp32 passes are
    free. (``preferred_element_type`` alone only fixes the accumulator.)
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision('highest'):
            return fn(*args, **kwargs)

    return wrapped


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """Convert a 6D rotation representation to a 3x3 rotation matrix.

    Gram-Schmidt on the two 3-vectors stored column-major (the SPIN/HMR
    convention, consumed by the iterative regressor head: the reference head
    emits 24*6 values reshaped to (B*24, 6); cf. reference
    ``spec/models/hmr.py:96-98`` output ``pred_pose`` (B,24,3,3)).

    Args:
      x: (..., 6) array; ``x[..., :3]`` and ``x[..., 3:]`` are the first two
        columns of the (pre-orthogonalization) rotation matrix.
    Returns:
      (..., 3, 3) rotation matrices.
    """
    x = x.astype(jnp.float32)
    a1 = x[..., 0:3]
    a2 = x[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    proj = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = a2 - proj * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    # Columns are b1, b2, b3.
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rot6d_to_rotmat` (drops the third column)."""
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


@fp32_matmuls
def rodrigues(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Numerically-stable Rodrigues formula; the Taylor branch keeps gradients
    finite at theta -> 0. Mirrors the role of ``batch_rodrigues`` at reference
    ``spec/losses.py:419`` (GT pose aa -> rotmat for the SMPL param loss).
    """
    aa = aa.astype(jnp.float32)
    # norm() is non-differentiable at 0 and its NaN leaks through the
    # UNSELECTED where-branch gradient (0 * nan = nan), so theta must be
    # computed from an input masked away from 0: the Taylor branch gets a
    # dummy theta = 1 (finite grads, never used in its output).
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    small = sq < jnp.asarray(1e-8, aa.dtype)
    theta = jnp.sqrt(jnp.where(small, jnp.ones_like(sq), sq))
    # Safe normalized axis (divided by 1 in the small branch).
    axis = aa / theta
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    t = theta[..., None]
    sin_t = jnp.sin(t)
    cos_t = jnp.cos(t)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    R_exact = eye + sin_t * K + (1.0 - cos_t) * (K @ K)
    # First-order expansion exp([aa]_x) ~ I + [aa]_x for tiny angles. In
    # the small branch the "axis" above is the UN-normalized aa (divided
    # by 1), so K already IS [aa]_x — multiplying by theta again would
    # shrink the linear term (and its gradient) by an extra theta.
    R_taylor = eye + K
    return jnp.where(small[..., None], R_taylor, R_exact)


batch_rodrigues = rodrigues  # reference-parity alias


def rotmat_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Log map via quaternion for numerical robustness near theta = 0 and pi
    (equivalent of the reference's ``batch_rot2aa``, used when dumping
    predicted poses at reference ``spec/trainer.py:195-197``).
    """
    q = rotmat_to_quat(R)
    return quat_to_aa(q)


@fp32_matmuls
def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), w >= 0.

    Branch-free Shepperd's method: compute all four candidate constructions
    and select the best-conditioned one — XLA-friendly (no data-dependent
    control flow).
    """
    R = R.astype(jnp.float32)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], axis=-1)

    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11],
                       axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(
        jnp.stack([q0, q1, q2, q3], axis=-2), best[..., None, None], axis=-2
    )[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_to_aa(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> axis-angle."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(sin_half[..., 0], w)[..., None]
    small = sin_half < 1e-6
    axis = xyz / jnp.where(small, jnp.ones_like(sin_half), sin_half)
    # For tiny angles aa ~ 2 * xyz (since q ~ [1, aa/2]).
    return jnp.where(small, 2.0 * xyz, axis * theta)


batch_rot2aa = rotmat_to_aa  # reference-parity alias


@fp32_matmuls
def euler_to_rotmat(euler: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (pitch, yaw, roll) -> rotation matrix.

    Matches the camera-rotation convention of the reference's
    ``batch_euler2matrix`` as consumed at ``spec/utils/cam_params.py:37``:
    ``R = euler([pitch, 0, roll])`` maps world coordinates into the tilted
    camera frame. Composition order: **R = Rx(pitch) @ Ry(yaw) @ Rz(roll)**
    — PARE's implementation goes euler -> quaternion ``qx ⊗ qy ⊗ qz`` ->
    matrix, which composes x-rotation outermost (verified numerically
    against that construction to 2e-7; see test_geometry cross-check).

    Args:
      euler: (..., 3) angles in radians ordered (pitch, yaw, roll) —
        rotations about camera (x, y, z) axes respectively.
    """
    euler = euler.astype(jnp.float32)
    pitch, yaw, roll = euler[..., 0], euler[..., 1], euler[..., 2]
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    one = jnp.ones_like(cp)
    zero = jnp.zeros_like(cp)

    def mat(rows):
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    Rx = mat([[one, zero, zero], [zero, cp, -sp], [zero, sp, cp]])
    Ry = mat([[cy, zero, sy], [zero, one, zero], [-sy, zero, cy]])
    Rz = mat([[cr, -sr, zero], [sr, cr, zero], [zero, zero, one]])
    return Rx @ Ry @ Rz


batch_euler2matrix = euler_to_rotmat  # reference-parity alias


def euler_pitch_roll_np(pitch: float, roll: float) -> 'np.ndarray':
    """Host-side (numpy) twin of ``euler_to_rotmat([pitch, 0, roll])`` —
    the camera rotation built from CamCalib predictions. ONE definition for
    every host call site (data pipeline, pickle IO, renderer): these copies
    diverged once (Rz@Rx vs Rx@Rz), see test_euler_rotation_sites_agree."""
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]], np.float32)
    Rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]], np.float32)
    return (Rx @ Rz).astype(np.float32)


@fp32_matmuls
def perspective_projection(
    points: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
    cam_intrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """Full-perspective projection of 3D points to pixel coordinates.

    ``x_pix = K @ (R @ X + t)`` followed by perspective divide — the math
    behind the reference's SMPLCamHead joints2d output (consumed at
    ``spec/losses.py:188-195`` in pixel units of the original image).

    Args:
      points: (B, N, 3).
      rotation: (B, 3, 3) camera rotation (world -> camera).
      translation: (B, 3) camera-frame translation.
      cam_intrinsics: (B, 3, 3) K matrix (fx, fy on the diagonal; principal
        point in the last column).
    Returns:
      (B, N, 2) pixel coordinates.
    """
    points = points.astype(jnp.float32)
    cam_pts = jnp.einsum('bij,bnj->bni', rotation.astype(jnp.float32), points)
    cam_pts = cam_pts + translation[:, None, :].astype(jnp.float32)
    z = jnp.maximum(cam_pts[..., 2:3], _EPS)
    uv1 = cam_pts / z
    proj = jnp.einsum('bij,bnj->bni', cam_intrinsics.astype(jnp.float32), uv1)
    return proj[..., :2]


def weak_perspective_to_full_translation(
    cam: jnp.ndarray,
    bbox_center: jnp.ndarray,
    bbox_scale: jnp.ndarray,
    img_w: jnp.ndarray,
    img_h: jnp.ndarray,
    focal_length: jnp.ndarray,
    crop_res: int = 224,
) -> jnp.ndarray:
    """Lift a crop-frame weak-perspective camera to a full-image translation.

    The crop regressor predicts ``cam = (s, tx, ty)`` in the 224x224 crop
    frame. Given the bbox (center in original pixels, scale where bbox side =
    scale * 200) and the full-image intrinsics, recover the camera-frame
    translation ``t`` such that perspective projection with focal ``f``
    reproduces the weak-perspective placement (the ``convert_pare_to_full_img
    _cam`` semantics behind the reference SMPLCamHead; consumed at reference
    ``spec/models/hmr.py:100-113`` as ``pred_cam_t``).

    Derivation: weak perspective in the crop maps X -> s * (X_xy + (tx, ty)).
    A perspective camera at depth tz with focal f maps X -> f/tz * X_xy. The
    crop of side ``b = scale*200`` was resized to ``crop_res``; matching
    scales gives ``tz = 2 f / (s * b)`` (f measured in full-image pixels),
    and the bbox offset from the principal point adds
    ``2*(c - img_size/2) / (s*b)`` to the in-plane translation.

    Args:
      cam: (B, 3) weak-perspective (s, tx, ty).
      bbox_center: (B, 2) bbox center (pixels, original image).
      bbox_scale: (B,) bbox scale (side = scale * 200).
      img_w, img_h: (B,) full-image size in pixels.
      focal_length: (B,) focal length in pixels.
    Returns:
      (B, 3) translation in camera frame.
    """
    s = cam[:, 0].astype(jnp.float32)
    tx = cam[:, 1].astype(jnp.float32)
    ty = cam[:, 2].astype(jnp.float32)
    b = bbox_scale.astype(jnp.float32) * 200.0
    s = jnp.maximum(s, _EPS)
    tz = 2.0 * focal_length.astype(jnp.float32) / (s * b)
    cx = 2.0 * (bbox_center[:, 0].astype(jnp.float32) - img_w.astype(jnp.float32) / 2.0) / (s * b)
    cy = 2.0 * (bbox_center[:, 1].astype(jnp.float32) - img_h.astype(jnp.float32) / 2.0) / (s * b)
    return jnp.stack([tx + cx, ty + cy, tz], axis=-1)


@fp32_matmuls
def weak_perspective_cam_t(
    cam: jnp.ndarray, focal_length: float = 5000.0, img_res: int = 224,
) -> jnp.ndarray:
    """Weak-perspective (s, tx, ty) -> camera translation
    ``(tx, ty, 2f / (res * s))`` — the single definition of the depth
    placement used by both SMPL head variants and the projection below."""
    s = jnp.maximum(cam[:, 0], _EPS)
    return jnp.stack(
        [cam[:, 1], cam[:, 2], 2.0 * focal_length / (img_res * s)],
        axis=-1)


def weak_perspective_projection(
    points: jnp.ndarray, cam: jnp.ndarray, focal_length: float = 5000.0,
    img_res: int = 224,
) -> jnp.ndarray:
    """Crop-frame projection used by the non-cam SMPLHead path (reference
    ``spec/models/hmr.py:114-121``): place the mesh at depth
    ``2f/(res*s)`` and perspective-project with a centered principal point,
    returning coordinates normalized to [-1, 1].
    """
    B = points.shape[0]
    t = weak_perspective_cam_t(cam, focal_length, img_res)
    K = jnp.zeros((B, 3, 3), jnp.float32)
    K = K.at[:, 0, 0].set(focal_length).at[:, 1, 1].set(focal_length)
    K = K.at[:, 2, 2].set(1.0)
    K = K.at[:, 0, 2].set(img_res / 2.0).at[:, 1, 2].set(img_res / 2.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    pix = perspective_projection(points, eye, t, K)
    return pix / (img_res / 2.0) - 1.0


@fp32_matmuls
def procrustes_align(
    S1: jnp.ndarray, S2: jnp.ndarray
) -> jnp.ndarray:
    """Batched similarity (Procrustes) alignment of S1 onto S2.

    Returns S1_hat = s * R @ S1 + t minimizing ||S1_hat - S2||_F — the math
    behind the reference's ``reconstruction_error`` (PA-MPJPE, reference
    ``spec/trainer.py:291-302``), computed on device via jnp SVD instead of
    per-sample numpy.

    Args:
      S1, S2: (B, N, 3) point sets (pred, gt).
    Returns:
      (B, N, 3) aligned S1.
    """
    S1 = S1.astype(jnp.float32)
    S2 = S2.astype(jnp.float32)
    # Work in (B, 3, N) like the classical derivation.
    X1 = jnp.swapaxes(S1, -1, -2)
    X2 = jnp.swapaxes(S2, -1, -2)
    mu1 = X1.mean(axis=-1, keepdims=True)
    mu2 = X2.mean(axis=-1, keepdims=True)
    X1c = X1 - mu1
    X2c = X2 - mu2
    var1 = jnp.sum(X1c ** 2, axis=(-2, -1))
    K = X1c @ jnp.swapaxes(X2c, -1, -2)  # (B, 3, 3) covariance
    U, s, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)
    # Reflection guard: det(V @ U^T) must be +1.
    det = jnp.linalg.det(V @ jnp.swapaxes(U, -1, -2))
    z_diag = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1
    )
    Z = jax.vmap(jnp.diag)(z_diag) if z_diag.ndim == 2 else jnp.diag(z_diag)
    R = V @ Z @ jnp.swapaxes(U, -1, -2)
    # trace(diag(s) @ Z) = sum of s with the last singular value sign-flipped.
    trace = jnp.sum(s * z_diag, axis=-1)
    scale = trace / jnp.maximum(var1, _EPS)
    t = mu2 - scale[..., None, None] * (R @ mu1)
    X1_hat = scale[..., None, None] * (R @ X1c) + scale[..., None, None] * (R @ mu1) + t
    return jnp.swapaxes(X1_hat, -1, -2)


def focal_length_from_vfov(vfov: jnp.ndarray, img_h: jnp.ndarray) -> jnp.ndarray:
    """f_pix = (H/2) / tan(vfov/2) (reference ``scripts/camcalib_demo.py:129``)."""
    return img_h / 2.0 / jnp.tan(vfov / 2.0)


def vfov_from_focal_length(f_pix: jnp.ndarray, img_h: jnp.ndarray) -> jnp.ndarray:
    """vfov = 2 atan(H / (2 f)) (reference ``spec/models/hmr.py:95``)."""
    return 2.0 * jnp.arctan(img_h / (2.0 * f_pix))


def build_cam_intrinsics(
    focal_length: jnp.ndarray, img_w: jnp.ndarray, img_h: jnp.ndarray
) -> jnp.ndarray:
    """K with fx = fy = f and principal point at the image center (the
    intrinsics layout of reference ``spec/utils/cam_params.py:39-47``)."""
    f = jnp.asarray(focal_length, jnp.float32)
    B = f.shape[0]
    K = jnp.zeros((B, 3, 3), jnp.float32)
    K = K.at[:, 0, 0].set(f).at[:, 1, 1].set(f)
    K = K.at[:, 0, 2].set(jnp.asarray(img_w, jnp.float32) / 2.0)
    K = K.at[:, 1, 2].set(jnp.asarray(img_h, jnp.float32) / 2.0)
    return K
