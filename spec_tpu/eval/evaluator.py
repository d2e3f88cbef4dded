"""Two-protocol SPEC evaluator — the reference's two-pass design collapsed
into chunked on-device passes.

Reference structure (SURVEY.md §3.3): in-loop diagnostics accumulate
per-sample MPJPE/PA-MPJPE/V2V during ``validation_step``
(``spec/trainer.py:230-364``) into ``evaluation_results_{ds}`` dicts, and
the published table comes from the offline ``compute_error`` pass
(``spec/utils/compute_error.py:89-223``) that re-runs GT SMPL in world and
camera frames and rotates predictions by the predicted camera.

Here both passes run the same batched on-device kernels; the offline pass
streams chunks through one jitted step (GT LBS x2 + rotations + metrics)
instead of the reference's per-chunk torch/numpy mix.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from spec_tpu.core.smpl import SMPLAssets, smpl_forward
from spec_tpu.eval import metrics as M


class MetricAccumulator:
    """Accumulates per-sample eval rows across batches (the in-loop pass).

    Mirrors the ``evaluation_results`` dict of reference
    ``spec/trainer.py:117-136`` so downstream analysis tooling stays
    compatible: keys mpjpe/pampjpe (B, 14 per-joint), mpjpe_24/pampjpe_24
    (B, 24), v2v (B,), imgname, dataset_name, and optionally
    pose/shape/cam/vertices when ``save_results``.
    """

    def __init__(self, save_results: bool = True):
        self.save_results = save_results
        self.reset()

    def reset(self):
        self.rows = {
            'mpjpe': [], 'pampjpe': [], 'mpjpe_24': [], 'pampjpe_24': [],
            'v2v': [], 'imgname': [], 'dataset_name': [],
        }
        if self.save_results:
            self.rows.update(
                {'pose': [], 'shape': [], 'cam': [], 'vertices': []})

    def add_batch(self, imgnames, dataset_names, j14: dict, j24: dict,
                  v2v, pred=None, valid_count: Optional[int] = None):
        """``j14``/``j24`` are outputs of eval_mesh_j14 / eval_joints_24.

        ``valid_count`` trims padding rows (static-shape batches pad the
        tail; the reference never pads because torch allows ragged final
        batches)."""
        n = valid_count if valid_count is not None else len(imgnames)
        self.rows['mpjpe'] += np.asarray(j14['per_joint_mpjpe'])[:n].tolist()
        self.rows['pampjpe'] += np.asarray(j14['per_joint_pa'])[:n].tolist()
        self.rows['mpjpe_24'] += np.asarray(
            j24['per_joint_mpjpe'])[:n].tolist()
        self.rows['pampjpe_24'] += np.asarray(j24['per_joint_pa'])[:n].tolist()
        self.rows['v2v'] += np.asarray(v2v)[:n].tolist()
        self.rows['imgname'] += list(imgnames[:n])
        self.rows['dataset_name'] += list(dataset_names[:n])
        if self.save_results and pred is not None:
            self.rows['pose'] += np.asarray(pred['pred_pose'])[:n].tolist()
            self.rows['shape'] += np.asarray(pred['pred_shape'])[:n].tolist()
            self.rows['cam'] += np.asarray(pred['pred_cam'])[:n].tolist()
            self.rows['vertices'] += np.asarray(
                pred['smpl_vertices'])[:n].tolist()

    def summary(self) -> dict:
        """Mean metrics in mm (the reference logs means of per-sample means,
        spec/trainer.py:425-470)."""
        out = {}
        for k in ('mpjpe', 'pampjpe', 'mpjpe_24', 'pampjpe_24'):
            arr = np.asarray(self.rows[k])
            out[f'val_{k}'] = float(arr.mean(-1).mean() * 1000) if arr.size \
                else float('nan')
        v = np.asarray(self.rows['v2v'])
        out['val_v2v'] = float(v.mean() * 1000) if v.size else float('nan')
        return out

    def results_dict(self) -> dict:
        """`evaluation_results_{ds}`-compatible payload (numpy arrays)."""
        out = {}
        for k, v in self.rows.items():
            out[k] = np.asarray(v) if k not in (
                'imgname', 'dataset_name') else list(v)
        return out


@functools.partial(jax.jit, static_argnames=('protocol',))
def _offline_chunk(
    assets: SMPLAssets,
    j_reg_h36m: jnp.ndarray,
    gt_pose: jnp.ndarray,          # (B, 72) world-frame aa
    gt_pose_cam: jnp.ndarray,      # (B, 72) cam-frame aa (or world for syn)
    gt_betas: jnp.ndarray,         # (B, 10)
    gt_cam_rotmat: jnp.ndarray,    # (B, 3, 3) (identity when unused)
    use_gt_cam_rotmat: jnp.ndarray,  # () bool — spec-syn path
    pred_vertices: jnp.ndarray,    # (B, V, 3) predicted, world frame
    pred_cam_rotmat: jnp.ndarray,  # (B, 3, 3) predicted camera rotation
    protocol: str = 'j14',
) -> dict:
    """One chunk of the offline metric pass (reference
    compute_error.py:140-200), entirely on device."""

    def gt_mesh(pose):
        out = smpl_forward(
            assets, betas=gt_betas,
            body_pose=pose[:, 3:].reshape(-1, 23, 3),
            global_orient=pose[:, :3].reshape(-1, 1, 3),
            pose2rot=True, joint_set='native')
        return out.vertices, out.joints_native

    gt_verts_w, gt_j24_w = gt_mesh(gt_pose)

    # Camera-frame GT: spec-syn rotates the world mesh by the GT camera;
    # 3dpw/mtp re-run SMPL with the cam-frame pose (compute_error 146-181).
    gt_verts_c_pose, gt_j24_c_pose = gt_mesh(gt_pose_cam)
    gt_verts_c_rot = M.rotate_points(gt_cam_rotmat, gt_verts_w)
    gt_j24_c_rot = M.rotate_points(gt_cam_rotmat, gt_j24_w)
    sel = use_gt_cam_rotmat.astype(jnp.float32).reshape(1, 1, 1)
    gt_verts_c = sel * gt_verts_c_rot + (1 - sel) * gt_verts_c_pose
    gt_j24_c = sel * gt_j24_c_rot + (1 - sel) * gt_j24_c_pose
    rot = jnp.where(
        use_gt_cam_rotmat.reshape(1, 1, 1), gt_cam_rotmat, pred_cam_rotmat)

    pred_verts_c = M.rotate_points(rot, pred_vertices)

    out = {}
    if protocol == 'j14':
        w = M.eval_mesh_j14(pred_vertices, gt_verts_w, j_reg_h36m)
        c = M.eval_mesh_j14(pred_verts_c, gt_verts_c, j_reg_h36m)
        out['wmpjpe'] = w['mpjpe']
        out['pampjpe'] = w['pa_mpjpe']
        out['mpjpe'] = c['mpjpe']
        out['wv2v'] = w['v2v']
        out['v2v'] = c['v2v']
    else:  # j24
        # Metric-path matmuls: fp32 HIGHEST (CLAUDE.md precision rule;
        # preferred_element_type alone only fixes the accumulator).
        with jax.default_matmul_precision('highest'):
            pred_j24 = jnp.einsum(
                'jv,bvc->bjc', assets.j_regressor, pred_vertices,
                preferred_element_type=jnp.float32)
            pred_j24_c = jnp.einsum(
                'jv,bvc->bjc', assets.j_regressor, pred_verts_c,
                preferred_element_type=jnp.float32)
        w = M.eval_joints_24(pred_j24, gt_j24_w)
        c = M.eval_joints_24(pred_j24_c, gt_j24_c)
        out['wmpjpe'] = w['mpjpe']
        out['pampjpe'] = w['pa_mpjpe']
        out['mpjpe'] = c['mpjpe']
        # V2V always via the mesh protocol: pelvis = H36M joint 0
        # (compute_error 190-191) — computed directly, without the
        # discarded J14 metrics/Procrustes of eval_mesh_j14.
        pelvis_reg = j_reg_h36m[0:1]  # only the pelvis row is needed
        pp = M.regress_h36m(pred_vertices, pelvis_reg)
        ppc = M.regress_h36m(pred_verts_c, pelvis_reg)
        gp = M.regress_h36m(gt_verts_w, pelvis_reg)
        gpc = M.regress_h36m(gt_verts_c, pelvis_reg)
        out['wv2v'] = M.v2v_error(pred_vertices - pp, gt_verts_w - gp)
        out['v2v'] = M.v2v_error(pred_verts_c - ppc, gt_verts_c - gpc)
    return out


def compute_error(
    dataset_name: str,
    pred_vertices: np.ndarray,       # (N, V, 3)
    pred_cam_rotmat: np.ndarray,     # (N, 3, 3)
    gt_pose: np.ndarray,             # (N, 72) world (pose_0yaw_inverseyz for
                                     # 3dpw, compute_error.py:105)
    gt_betas: np.ndarray,            # (N, 10)
    assets: SMPLAssets,
    j_regressor_h36m: np.ndarray,    # (17, V)
    gt_pose_cam: Optional[np.ndarray] = None,   # (N, 72), 3dpw/mtp
    gt_cam_rotmat: Optional[np.ndarray] = None,  # (N, 3, 3), spec-syn
    chunk: int = 256,
) -> dict:
    """Offline headline metrics (reference compute_error.py:89-223), in mm.

    Protocol: 14-joint H36M regressor for 3dpw*, 24 native joints for
    spec-syn/spec-mtp (compute_error.py:207-219). W- = world frame;
    plain = camera frame (pred rotated by its own predicted camera —
    or the GT camera for spec-syn).
    """
    N = pred_vertices.shape[0]
    protocol = 'j14' if dataset_name.startswith('3dpw') else 'j24'
    use_gt_rot = dataset_name == 'spec-syn'
    if gt_pose_cam is None:
        gt_pose_cam = gt_pose
    if gt_cam_rotmat is None:
        gt_cam_rotmat = np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))

    jreg = jnp.asarray(j_regressor_h36m, jnp.float32)
    acc = {k: [] for k in ('wmpjpe', 'mpjpe', 'pampjpe', 'wv2v', 'v2v')}
    for s in range(0, N, chunk):
        e = min(s + chunk, N)
        pad = chunk - (e - s)

        def p(x, s=s, e=e, pad=pad):
            arr = np.asarray(x[s:e], np.float32)
            if pad:
                arr = np.concatenate([arr, arr[-1:].repeat(pad, 0)], 0)
            return jnp.asarray(arr)

        res = _offline_chunk(
            assets, jreg, p(gt_pose), p(gt_pose_cam), p(gt_betas),
            p(gt_cam_rotmat), jnp.asarray(use_gt_rot),
            p(pred_vertices), p(pred_cam_rotmat), protocol=protocol)
        for k, v in res.items():
            acc[k].append(np.asarray(v)[:e - s])

    out = {k: float(np.concatenate(v).mean() * 1000) for k, v in acc.items()}
    # Reference table naming (README.md:153-159).
    return {
        'W-MPJPE': out['wmpjpe'],
        'MPJPE': out['mpjpe'],
        'PA-MPJPE': out['pampjpe'],
        'W-PVE': out['wv2v'],
        'PVE': out['v2v'],
        'protocol': protocol,
    }
