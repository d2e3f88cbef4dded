"""CamCalib angle-bin tables and decoders (JAX, batched, jit-safe).

Re-derivation of the reference's bin machinery
(``camcalib/cam_utils.py:23-145``): each camera angle (vfov, pitch, roll) is
predicted as a 256-logit distribution over 255 bin *edges*; decoding is either
argmax -> bin center (for ce/kl losses) or a differentiable softargmax ->
continuous soft index in [-1, 1] -> angle (for softargmax losses).

All tables are precomputed with numpy at import time (they are tiny constants)
and exposed as fp32 jnp arrays; decoders are pure jnp and run on device — the
reference decodes on host per image (``camcalib/cam_utils.py:66-91``), which
is the batch-1 bottleneck the TPU pipeline removes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

NUM_BINS = 256  # logits per head
NUM_EDGES = 255

# ---------------------------------------------------------------------------
# Bin tables (reference camcalib/cam_utils.py:39-63)
# ---------------------------------------------------------------------------

VFOV_RANGE = (0.2617, 2.1)   # radians (~15 deg .. ~120 deg)
PITCH_RANGE = (-0.6, 0.6)    # radians
ROLL_RANGE = (-0.6, 0.6)     # radians (new uniform table)
HORIZON_RANGE = (-0.5, 1.5)  # fraction of image height


def _centers(edges: np.ndarray) -> np.ndarray:
    """Bin centers: midpoints between consecutive edges, last center = last
    edge (the reference's append convention, ``camcalib/cam_utils.py:40-42``)."""
    c = edges.copy()
    c[:-1] += np.diff(edges) / 2
    return np.append(c, edges[-1])


def _legacy_roll_edges(
    minval: float = -np.pi / 6,
    maxval: float = np.pi / 6,
    sigma: float = 0.5,
    alpha: float = 0.04,
    beta: float = 1.1,
    kappa: float = np.pi,
) -> np.ndarray:
    """Non-uniform legacy roll bins: edges are the normalized cumulative sum
    of an inverted, scaled Gaussian bump — denser bins near roll = 0
    (reference ``camcalib/cam_utils.py:23-36,49``). Gaussian pdf implemented
    directly (exp(-x^2/2 sigma^2)); the normalization by pdf.max() cancels the
    1/(sigma sqrt(2 pi)) constant."""
    x = np.linspace(minval, maxval, NUM_EDGES)
    pdf = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    pdf = pdf / pdf.max()
    pdf = pdf * alpha
    pdf = pdf.max() * beta - pdf
    cumsum = np.cumsum(pdf)
    cumsum = cumsum / cumsum.max() * kappa
    cumsum -= cumsum[pdf.size // 2]
    return cumsum


_vfov_edges_np = np.linspace(*VFOV_RANGE, NUM_EDGES)
_pitch_edges_np = np.linspace(*PITCH_RANGE, NUM_EDGES)
_roll_edges_np = np.linspace(*ROLL_RANGE, NUM_EDGES)
_horizon_edges_np = np.linspace(*HORIZON_RANGE, NUM_EDGES)
_legacy_roll_edges_np = _legacy_roll_edges()

# ensure_compile_time_eval: if this module's FIRST import happens inside a
# jitted function (e.g. a lazy import in a traced body), plain jnp.asarray
# would stage these constants onto the trace — the module globals would be
# LEAKED TRACERS poisoning every later caller. Forcing compile-time eval
# makes them concrete regardless of import context.
with jax.ensure_compile_time_eval():
    VFOV_EDGES = jnp.asarray(_vfov_edges_np, jnp.float32)
    PITCH_EDGES = jnp.asarray(_pitch_edges_np, jnp.float32)
    ROLL_EDGES = jnp.asarray(_roll_edges_np, jnp.float32)
    HORIZON_EDGES = jnp.asarray(_horizon_edges_np, jnp.float32)
    LEGACY_ROLL_EDGES = jnp.asarray(_legacy_roll_edges_np, jnp.float32)

    VFOV_CENTERS = jnp.asarray(_centers(_vfov_edges_np), jnp.float32)
    PITCH_CENTERS = jnp.asarray(_centers(_pitch_edges_np), jnp.float32)
    ROLL_CENTERS = jnp.asarray(_centers(_roll_edges_np), jnp.float32)
    HORIZON_CENTERS = jnp.asarray(_centers(_horizon_edges_np), jnp.float32)
    LEGACY_ROLL_CENTERS = jnp.asarray(
        _centers(_legacy_roll_edges_np), jnp.float32)

# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------


def softargmax1d(logits: jnp.ndarray, temperature: float = 1.0) -> jnp.ndarray:
    """Differentiable argmax over the last axis, normalized to [-1, 1].

    Equivalent to the reference's ``softargmax1d(..., normalize_keypoints=
    True)`` (import site ``camcalib/cam_utils.py:114-118``): softmax expectation
    of the index, mapped by idx/(D-1)*2-1.
    """
    logits = logits.astype(jnp.float32)
    dim = logits.shape[-1]
    probs = jnp.exp(
        logits * temperature
        - jnp.max(logits * temperature, axis=-1, keepdims=True)
    )
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    idx = jnp.arange(dim, dtype=jnp.float32)
    expected = jnp.sum(probs * idx, axis=-1)
    return expected / (dim - 1) * 2.0 - 1.0


def angle_to_soft_idx(angle, lo: float, hi: float):
    """Angle -> soft index in [-1, 1] (reference ``cam_utils.py:106-107``)."""
    return 2.0 * ((angle - lo) / (hi - lo)) - 1.0


def soft_idx_to_angle(soft_idx, lo: float, hi: float):
    """Soft index in [-1, 1] -> angle (reference ``cam_utils.py:110-111``)."""
    return (hi - lo) * ((soft_idx + 1.0) / 2.0) + lo


def bins_to_angle_argmax(logits: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """argmax over logits -> bin-center lookup (ce/kl decode path,
    reference ``cam_utils.py:66-91``)."""
    idx = jnp.argmax(logits, axis=-1)
    return centers[idx]


def bins2vfov(logits):
    return bins_to_angle_argmax(logits, VFOV_CENTERS)


def bins2pitch(logits):
    return bins_to_angle_argmax(logits, PITCH_CENTERS)


def bins2roll(logits, legacy: bool = True):
    # NB: the reference's argmax ``bins2roll`` always uses the *legacy*
    # warped table (``cam_utils.py:80-84``); the uniform table is only used
    # by the softargmax path.
    return bins_to_angle_argmax(
        logits, LEGACY_ROLL_CENTERS if legacy else ROLL_CENTERS
    )


def bins2horizon(logits):
    return bins_to_angle_argmax(logits, HORIZON_CENTERS)


def convert_preds_to_angles(
    vfov_logits: jnp.ndarray,
    pitch_logits: jnp.ndarray,
    roll_logits: jnp.ndarray,
    loss_type: str = 'softargmax_biased_l2',
    legacy: bool = False,
):
    """Unified decode (reference ``cam_utils.py:121-145``), fully on device.

    Returns (vfov, pitch, roll) angle arrays of shape (B,).
    """
    if loss_type in ('kl', 'ce'):
        return (
            bins2vfov(vfov_logits),
            bins2pitch(pitch_logits),
            bins2roll(roll_logits),
        )
    elif loss_type in ('softargmax_l2', 'softargmax_biased_l2'):
        vfov = soft_idx_to_angle(
            softargmax1d(vfov_logits), float(_vfov_edges_np.min()),
            float(_vfov_edges_np.max()))
        pitch = soft_idx_to_angle(
            softargmax1d(pitch_logits), float(_pitch_edges_np.min()),
            float(_pitch_edges_np.max()))
        if legacy:
            roll = bins2roll(roll_logits)
        else:
            roll = soft_idx_to_angle(softargmax1d(roll_logits), -0.6, 0.6)
        return vfov, pitch, roll
    raise ValueError(f'unknown loss_type: {loss_type}')


def angle_to_bin_index(angle: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Quantize angles into hard bin targets for ce/kl training — numpy
    ``digitize`` semantics (reference ``camcalib/pano_dataset.py:135-142``:
    bin 0 = below the first edge)."""
    return np.digitize(np.asarray(angle), np.asarray(edges))


def vfov2soft_idx(angle):
    return angle_to_soft_idx(angle, float(_vfov_edges_np.min()), float(_vfov_edges_np.max()))


def pitch2soft_idx(angle):
    return angle_to_soft_idx(angle, float(_pitch_edges_np.min()), float(_pitch_edges_np.max()))


def roll2soft_idx(angle):
    return angle_to_soft_idx(angle, -0.6, 0.6)
