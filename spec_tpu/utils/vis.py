"""Horizon-line visualization (reference ``camcalib/vis_utils.py:63-144``).

Geometry: for a pinhole camera with vertical fov, pitch, roll, the horizon
crosses the vertical image midline at
``ctr = 0.5 - 0.5 * tan(pitch) / tan(vfov / 2)`` (fraction of height), and
tilts by the roll: the endpoints at the left/right edges are offset by
``-/+ w * tan(roll) / 2``.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def horizon_points(vfov, pitch, roll, img_w, img_h):
    """Left/right horizon intersections with the image borders ((2,2) px)."""
    ctr = img_h * (0.5 - 0.5 * np.tan(pitch) / np.tan(vfov / 2.0))
    dy = img_w * np.tan(roll) / 2.0
    return np.array([[0.0, ctr - dy], [img_w, ctr + dy]], np.float32)


def get_horizon_line(vfov, pitch, roll, img_w, img_h):
    """Normalized (by height) midline crossing — reference
    ``get_horizon_line`` (vis_utils.py:139-144)."""
    return 0.5 - 0.5 * np.tan(pitch) / np.tan(vfov / 2.0)


def draw_horizon_line(img, vfov, pitch, roll, color=(0, 255, 255),
                      thickness=None, debug_text=True):
    """Draw the horizon on an RGB uint8/float image (reference
    ``show_horizon_line``)."""
    out = np.ascontiguousarray(img.astype(np.uint8))
    h, w = out.shape[:2]
    pts = horizon_points(vfov, pitch, roll, w, h).astype(int)
    t = thickness or max(2, h // 200)
    cv2.line(out, tuple(pts[0]), tuple(pts[1]), color, t)
    if debug_text:
        txt = (f'vfov={np.degrees(vfov):.1f} pitch={np.degrees(pitch):.1f} '
               f'roll={np.degrees(roll):.1f}')
        cv2.putText(out, txt, (10, max(20, h // 20)),
                    cv2.FONT_HERSHEY_SIMPLEX, max(0.4, h / 1500.0),
                    (255, 40, 40), 2)
    return out


def draw_skeleton(img, kp2d, color=(0, 255, 0), radius=None):
    """Scatter 2D keypoints (pixel coords, (J,2) or (J,3) with conf)."""
    out = np.ascontiguousarray(img.astype(np.uint8))
    h = out.shape[0]
    r = radius or max(2, h // 200)
    for j in kp2d:
        if len(j) > 2 and j[2] <= 0:
            continue
        cv2.circle(out, (int(j[0]), int(j[1])), r, color, -1)
    return out


def plot_error_cdf(errors_deg, out_path, label='error'):
    """Cumulative error plot (reference camcalib/vis_utils.py:14-35):
    fraction of images vs angular error in degrees."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    errors = np.sort(np.asarray(errors_deg))
    frac = np.arange(1, len(errors) + 1) / len(errors)
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(errors, frac)
    ax.set_xlabel(f'{label} (degrees)')
    ax.set_ylabel('fraction of images')
    ax.set_ylim(0, 1)
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)


def gt_vs_pred_horizon(img, gt_angles, pred_angles):
    """GT (green) vs predicted (yellow) horizon overlay — the CamCalib
    validation image dump (reference camcalib/trainer.py:118-169)."""
    out = draw_horizon_line(img, *gt_angles, color=(0, 255, 0),
                            debug_text=False)
    return draw_horizon_line(out, *pred_angles, color=(255, 255, 0),
                             debug_text=False)


# ---------------------------------------------------------------------------
# Joint-error / uncertainty / heatmap visualization
# (pare.utils.vis_utils surface used by PARE-style debugging — SURVEY §2.2)
# ---------------------------------------------------------------------------

def _error_color(t):
    """0 → green, 1 → red (linear blend), uint8 RGB."""
    t = float(np.clip(t, 0.0, 1.0))
    return (int(255 * t), int(255 * (1.0 - t)), 0)


def draw_joint_errors(img, kp2d, errors, max_error=None, radius=None):
    """Per-joint circles color-coded by error magnitude (green=0 → red=max).

    Equivalent of PARE's joint-error visualization: overlays each 2D joint
    with a disc whose color encodes its (e.g. MPJPE or reprojection) error.

    Args:
      img: (H, W, 3) uint8 RGB.
      kp2d: (J, 2) pixel coordinates (a trailing confidence column is
        accepted and ignored).
      errors: (J,) non-negative per-joint scalars.
      max_error: color-scale ceiling; defaults to ``errors.max()``.
      radius: disc radius in px; defaults to ~1% of the image diagonal.
    """
    if cv2 is None:  # pragma: no cover
        raise ImportError('draw_joint_errors requires cv2')
    out = np.ascontiguousarray(np.asarray(img).copy())
    kp2d = np.asarray(kp2d)[:, :2]
    errors = np.asarray(errors, np.float64)
    hi = float(max_error) if max_error else max(float(errors.max()), 1e-9)
    if radius is None:
        radius = max(2, int(0.01 * np.hypot(*out.shape[:2])))
    for (x, y), e in zip(kp2d, errors):
        if not (np.isfinite(x) and np.isfinite(y)):
            continue
        cv2.circle(out, (int(round(x)), int(round(y))), radius,
                   _error_color(e / hi), -1)
    return out


def draw_joint_uncertainties(img, kp2d, sigmas, radius_scale=2.0):
    """Aleatoric-uncertainty overlay: one ring per joint with radius
    proportional to its predicted sigma (the uncertainty-head diagnostic
    paired with losses.gaussian_nll)."""
    if cv2 is None:  # pragma: no cover
        raise ImportError('draw_joint_uncertainties requires cv2')
    out = np.ascontiguousarray(np.asarray(img).copy())
    kp2d = np.asarray(kp2d)[:, :2]
    sigmas = np.asarray(sigmas, np.float64)
    hi = max(float(sigmas.max()), 1e-9)
    for (x, y), s in zip(kp2d, sigmas):
        if not (np.isfinite(x) and np.isfinite(y)):
            continue
        r = max(1, int(round(radius_scale * 10.0 * s / hi)))
        cv2.circle(out, (int(round(x)), int(round(y))), r,
                   _error_color(s / hi), 1)
    return out


def visualize_heatmaps(img, heatmaps, alpha=0.5):
    """Overlay (J, h, w) keypoint heatmaps on an image.

    Heatmaps are max-reduced over joints, bilinearly resized to the image,
    normalized to [0, 1], mapped green→red, and alpha-blended — the standard
    PARE/HRNet heatmap debug view.
    """
    if cv2 is None:  # pragma: no cover
        raise ImportError('visualize_heatmaps requires cv2')
    img = np.asarray(img)
    H, W = img.shape[:2]
    hm = np.asarray(heatmaps, np.float32).max(axis=0)
    hm = cv2.resize(hm, (W, H), interpolation=cv2.INTER_LINEAR)
    lo, hi = float(hm.min()), float(hm.max())
    hm = (hm - lo) / max(hi - lo, 1e-9)
    color = np.stack([255 * hm, 255 * (1 - hm), np.zeros_like(hm)], -1)
    out = (1 - alpha * hm[..., None]) * img.astype(np.float32) \
        + alpha * hm[..., None] * color
    return np.clip(out, 0, 255).astype(np.uint8)
