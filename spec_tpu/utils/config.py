"""Config system: attribute-tree configs, YAML merge, CLI opts, grid search.

Self-contained rebuild of the reference's yacs-based machinery
(``spec/config.py:62-336``, ``camcalib/config.py:36-164``): hierarchical
defaults, ``update_hparams(yaml)`` merging, ``--opts K V`` overrides, and
the distinctive **grid-search expansion** — any list-valued YAML leaf
spawns the cartesian product of configs, ``cfg_id`` selects one, and the
chosen hyper-param values are baked into the logdir name
(``spec/config.py:186-244,288-297``).
"""

from __future__ import annotations

import itertools
import operator
import os
import time
from functools import reduce
from typing import List, Optional, Union

import yaml


class CfgNode(dict):
    """Nested attribute dict (yacs-lite)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @classmethod
    def from_dict(cls, d: dict) -> 'CfgNode':
        node = cls()
        for k, v in d.items():
            node[k] = cls.from_dict(v) if isinstance(v, dict) else v
        return node

    def clone(self) -> 'CfgNode':
        return CfgNode.from_dict(self.to_dict())

    def to_dict(self) -> dict:
        return {k: v.to_dict() if isinstance(v, CfgNode) else v
                for k, v in self.items()}

    def merge_from_dict(self, other: dict):
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), CfgNode):
                self[k].merge_from_dict(v)
            else:
                self[k] = CfgNode.from_dict(v) if isinstance(v, dict) else v

    def merge_from_file(self, path: str):
        with open(path) as f:
            self.merge_from_dict(yaml.safe_load(f) or {})

    def merge_from_list(self, opts: List[str]):
        """``['TRAINING.MAX_EPOCHS', '10', ...]`` CLI override pairs
        (the reference's ``--opts``, spec/config.py:270). Unknown keys
        are REJECTED, matching yacs: a typo'd override that silently
        no-ops is worse than an error (yaml preset merges stay
        permissive — presets may carry forward-compat keys)."""
        assert len(opts) % 2 == 0, f'odd --opts list: {opts}'
        for key, val in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split('.')
            for p in parts[:-1]:
                node = node[p]
            if parts[-1] not in node:
                raise KeyError(
                    f'--opts key {key!r} does not exist in the config '
                    f'(yacs rejects unknown keys; check for typos)')
            old = node[parts[-1]]
            node[parts[-1]] = _coerce(val, old)

    def dump(self, path: str):
        with open(path, 'w') as f:
            yaml.safe_dump(self.to_dict(), f, default_flow_style=False)


def _coerce(val: str, old):
    if isinstance(old, bool):
        return val in ('True', 'true', '1')
    if isinstance(old, int) and not isinstance(old, bool):
        try:
            return int(val)
        except ValueError:
            return float(val)
    if isinstance(old, float):
        return float(val)
    if isinstance(old, list):
        return yaml.safe_load(val)
    try:
        return yaml.safe_load(val)
    except Exception:
        return val


# ---------------------------------------------------------------------------
# Grid search (reference spec/config.py:186-244)
# ---------------------------------------------------------------------------


def _flatten(d: dict, prefix: str = '') -> dict:
    out = {}
    for k, v in d.items():
        key = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(d: dict) -> dict:
    out: dict = {}
    for k, v in d.items():
        node = out
        parts = k.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def hmr_hparams_from_cfg(cfg_file: str) -> tuple:
    """(backbone, use_cam_feats) from a SPEC config yaml — the model
    hyperparams shipped next to a checkpoint (reference builds the
    tester's HMR from --cfg, spec/tester.py:49-61)."""
    cfg = spec_default_config()
    cfg.merge_from_file(cfg_file)
    return cfg.HMR.BACKBONE, bool(cfg.HMR.USE_CAM_FEATS)


def split_ds_names(value: Union[str, list]) -> List[str]:
    """``'a_b'`` or ``['a_b', 'c']`` -> ``['a', 'b', 'c']``.

    Dataset names never contain '_' (it is the reference's separator,
    spec/trainer.py:625); grid-search may deliver excluded keys as lists.
    """
    items = value if isinstance(value, list) else [value]
    return [n for it in items for n in str(it).split('_') if n]


def get_grid_search_configs(config: dict, excluded_keys: List[str] = ()):
    """Expand list-valued leaves into the cartesian product of configs.

    Booleans round-trip through strings so itertools.product treats them as
    single values (the reference quirk at spec/config.py:192-239).
    Returns (experiments, hyper_param_keys).
    """
    flat = _flatten(config)
    hyper_params = []
    joined_excluded = set()

    for k, v in flat.items():
        if isinstance(v, list):
            if k in excluded_keys:
                # Protect a genuinely list-valued excluded leaf from the
                # cartesian product; round-tripped through '+' below.
                flat[k] = ['+'.join(str(x) for x in v)]
                joined_excluded.add(k)
            elif len(v) > 1:
                hyper_params.append(k)
            if v and isinstance(v[0], bool):
                flat[k] = [str(x) for x in v]
        elif isinstance(v, bool):
            flat[k] = [str(v)]
        else:
            flat[k] = [v]

    keys, values = zip(*flat.items()) if flat else ((), ())
    experiments = [dict(zip(keys, combo))
                   for combo in itertools.product(*values)]

    for exp in experiments:
        # Only keys that were actually '+'-joined get split back — a
        # scalar excluded key (e.g. the default VAL_DS string) must stay
        # a scalar, or downstream '_'-splitting consumers silently see a
        # one-element list.
        for param in joined_excluded:
            if param in exp:
                exp[param] = str(exp[param]).strip().split('+')
        for k, v in exp.items():
            if v == 'True':
                exp[k] = True
            elif v == 'False':
                exp[k] = False
    return [_unflatten(e) for e in experiments], hyper_params


def run_grid_search_experiments(
    cfg_file: Optional[str],
    default_config: CfgNode,
    script: str = 'train.py',
    cfg_id: int = 0,
    opts: Optional[List[str]] = None,
    log_root: str = 'logs',
) -> CfgNode:
    """Select one grid-search experiment, build its logdir, snapshot the
    resolved config (reference spec/config.py:247-336)."""
    cfg = default_config.clone()
    if cfg_file:
        cfg.merge_from_file(cfg_file)
    if opts:
        cfg.merge_from_list(list(opts))

    experiments, hyper_params = get_grid_search_configs(
        cfg.to_dict(),
        excluded_keys=['DATASET/DATASETS_AND_RATIOS', 'DATASET/VAL_DS'],
    )
    assert 0 <= cfg_id < len(experiments), (
        f'cfg_id {cfg_id} out of range ({len(experiments)} experiments)')
    exp = experiments[cfg_id]

    resolved = default_config.clone()
    resolved.merge_from_dict(exp)

    # Logdir: logs/<script>/<exp_name>/<timestamp>_<hyperparams>
    def get_from(d, key):
        return reduce(operator.getitem, key.split('/'), d)

    suffix = '_'.join(
        f"{k.split('/')[-1]}-{get_from(exp, k)}" for k in hyper_params)
    exp_name = getattr(resolved, 'EXP_NAME', 'spec')
    timestamp = time.strftime('%d-%m-%Y_%H-%M-%S')
    logdir = os.path.join(
        log_root, script.replace('.py', ''), exp_name,
        f'{timestamp}_{suffix}' if suffix else timestamp)
    os.makedirs(logdir, exist_ok=True)
    resolved['LOGDIR'] = logdir
    resolved['CFG_ID'] = cfg_id
    resolved['NUM_EXPERIMENTS'] = len(experiments)
    resolved.dump(os.path.join(logdir, 'config_to_run.yaml'))
    _copy_code(logdir)
    return resolved


def _copy_code(logdir: str):
    """Snapshot the framework source into the logdir for reproducibility
    (reference copy_code, scripts/spec_train.py:54-57)."""
    import shutil

    src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(logdir, 'code', 'spec_tpu')
    if os.path.isdir(src) and not os.path.exists(dst):
        try:
            shutil.copytree(
                src, dst,
                ignore=shutil.ignore_patterns('__pycache__', '*.so'))
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Default trees (reference spec/config.py:62-163, camcalib/config.py:36-87)
# ---------------------------------------------------------------------------


def update_hparams(cfg_file: str = None, dialect: str = 'spec') -> CfgNode:
    """Defaults merged with a YAML file — the reference's public config
    entry point (``spec/config.py:173-176`` / ``camcalib/config.py:97-100``).

    Args:
      cfg_file: optional YAML to overlay (reference dialect tolerated).
      dialect: 'spec' or 'camcalib' default tree.
    """
    base = (camcalib_default_config() if dialect == 'camcalib'
            else spec_default_config())
    cfg = base.clone()
    if cfg_file:
        cfg.merge_from_file(cfg_file)
    return cfg


def spec_default_config() -> CfgNode:
    return CfgNode.from_dict({
        'EXP_NAME': 'spec',
        'LOGDIR': '',
        'LOG_DIR': 'logs/experiments',
        'LOG_FREQ_TB_IMAGES': 500,
        'SEED_VALUE': -1,
        'METHOD': 'hmr_cam',
        'PROJECT_NAME': 'spec',
        'SYSTEM': {'GPU': '', 'CLUSTER_NODE': 0.0},
        'DATASET': {
            'LOAD_TYPE': 'Base',
            'NOISE_FACTOR': 0.4,
            'ROT_FACTOR': 0.0,
            'SCALE_FACTOR': 0.25,
            'FLIP_PROB': 0.0,
            'CROP_PROB': 0.0,
            'CROP_FACTOR': 0.0,
            'BATCH_SIZE': 64,
            'NUM_WORKERS': 8,
            # Opt-in reduced-scale JPEG decode for train loaders when the
            # person box dwarfs IMG_RES (spec_tpu extension; no reference
            # key). See CamDataset(fast_decode=...).
            'FAST_DECODE': False,
            # Decoded-frame LRU capacity (frames, uint8) shared by the
            # loader threads — multi-person frames decode once. 0 = off.
            # Spec_tpu extension; pair with GROUP_BY_FRAME for shuffled
            # training (eval iterates frame-contiguously already).
            'DECODE_CACHE': 0,
            # Permute frames (groups of samples sharing an imgname)
            # instead of samples when shuffling train epochs, so cache
            # siblings land in the same batch. Spec_tpu extension.
            'GROUP_BY_FRAME': False,
            # Native fused JPEG ROI decode+crop host engine
            # (native/jpegroi.cpp) — decodes only the crop's scanline
            # window. True = use when available, per-item cv2 fallback;
            # False = always the python/cv2 oracle. Spec_tpu extension.
            'NATIVE_DECODE': True,
            # Per-sample crop-region cache directory (''=off): epoch 1
            # decodes frames once, later epochs decode only the small
            # cached region (data/region_cache.py). Spec_tpu extension.
            'REGION_CACHE_DIR': '',
            'REGION_CACHE_FORMAT': 'jpeg',
            'PIN_MEMORY': True,
            'SHUFFLE_TRAIN': True,
            'TRAIN_DS': 'all',
            'VAL_DS': 'spec-syn_spec-mtp_3dpw-test-cam',
            'NUM_IMAGES': -1,
            'TRAIN_NUM_IMAGES': -1,
            'TEST_NUM_IMAGES': -1,
            'IGNORE_3D': False,
            'IMG_RES': 224,
            'RENDER_RES': 480,
            'FOCAL_LENGTH': 5000.0,
            'MESH_COLOR': 'pinkish',
            'DATASETS_AND_RATIOS': 'spec-syn_1.0',
            'USE_SYNTHETIC_OCCLUSION': False,
            'OCC_AUG_DATASET': 'pascal',
            'USE_3D_CONF': False,
            'USE_GENDER': False,
            'BASELINE_CAM_ROT': False,
            'BASELINE_CAM_F': False,
            'BASELINE_CAM_C': False,
            'TEACHER_FORCE': 0.0,
            # 'epoch+value' pairs, e.g. '0+0.0 50+0.5' (reference
            # spec/trainer.py:573-579; its consumption site in the
            # reference dataset is commented out, cam_dataset.py:603-604,
            # so the schedule only updates the hparam — kept for parity).
            'TEACHER_FORCE_SCHEDULE': '',
            'STAGE_DATASETS': '',
            'NONPARAMETRIC': False,
        },
        # TYPE/LR/WD are the reference surface (fixed-LR Adam,
        # spec/config.py:116-119); the rest are beyond-reference knobs,
        # all off by default (see train/state.py make_optimizer).
        'OPTIMIZER': {'TYPE': 'adam', 'LR': 1e-4, 'WD': 0.0,
                      'SCHEDULE': '', 'WARMUP_STEPS': 0,
                      'DECAY_STEPS': 0, 'DECAY_RATE': 0.1,
                      'MIN_LR_RATIO': 0.0, 'CLIP_GRAD_NORM': 0.0,
                      'MOMENTUM': 0.9},
        'TRAINING': {
            'RESUME': None,
            'PRETRAINED': None,
            'PRETRAINED_LIT': None,
            'MAX_EPOCHS': 100,
            'LOG_SAVE_INTERVAL': 50,
            'LOG_FREQ_TB_IMAGES': 500,
            'CHECK_VAL_EVERY_N_EPOCH': 1,
            'RELOAD_DATALOADERS_EVERY_EPOCH': True,
            'NUM_SMPLIFY_ITERS': 100,
            'RUN_SMPLIFY': False,
            'SMPLIFY_THRESHOLD': 100,
            'DROPOUT_P': 0.2,
            'TEST_BEFORE_TRAINING': False,
            'SAVE_IMAGES': False,
            'USE_PART_SEGM_LOSS': False,
            'USE_AMP': False,
            # ZeRO/FSDP-style param+optimizer sharding over the data mesh
            # (capacity knob; off = replicated, the throughput default).
            'FSDP': False,
            # HSDP group size: 0/1 = shard over the FULL data axis (1-D
            # ZeRO); k>1 = 2-D ('data','fsdp') hybrid mesh with params
            # sharded over k-device groups (all-gathers bounded to the
            # group — keep the group within a slice on multi-host).
            'FSDP_GROUP_SIZE': 0,
            # k>1: mean-accumulate gradients over k micro-batches per
            # optimizer update (effective batch k*BATCH_SIZE; beyond
            # reference — see train/state.py make_optimizer).
            'GRAD_ACCUM_STEPS': 1,
            # Rematerialize backbone blocks in the backward pass
            # (jax.checkpoint) — memory-capacity knob for larger
            # batches/trunks; numerically identical, measured throughput
            # negative at the B=128 sweet spot (HBM-bandwidth-bound step).
            'REMAT': False,
        },
        'TESTING': {
            'SAVE_IMAGES': False,
            'SAVE_FREQ': 1,
            'SAVE_RESULTS': True,
            'SAVE_MESHES': False,
            'SIDEVIEW': True,
            'TEST_ON_TRAIN_END': True,
            'MULTI_SIDEVIEW': False,
            'USE_GT_CAM': False,
        },
        'HMR': {
            'BACKBONE': 'resnet50',
            'DTYPE': 'float32',  # compute dtype: float32 | bfloat16
            'USE_CAM_FEATS': False,
            'SHAPE_LOSS_WEIGHT': 0.0,
            'KEYPOINT_LOSS_WEIGHT': 5.0,
            'KEYPOINT_NATIVE_LOSS_WEIGHT': 5.0,
            'SMPL_PART_LOSS_WEIGHT': 1.0,
            'POSE_LOSS_WEIGHT': 1.0,
            'BETA_LOSS_WEIGHT': 0.001,
            'OPENPOSE_TRAIN_WEIGHT': 0.0,
            'GT_TRAIN_WEIGHT': 1.0,
            'LOSS_WEIGHT': 60.0,
            'ESTIMATE_UNCERTAINTY': False,
            'UNCERTAINTY_ACTIVATION': '',
            'USE_SEPARATE_VAR_BRANCH': False,
            'UNCERTAINTY_LOSS': 'MultivariateGaussianNegativeLogLikelihood',
        },
        'RUN_TEST': False,
    })


def camcalib_default_config() -> CfgNode:
    return CfgNode.from_dict({
        'EXP_NAME': 'camcalib',
        'LOGDIR': '',
        'LOG_DIR': 'logs/camcalib',
        'METHOD': 'camcalib',
        'PROJECT_NAME': 'camcalib',
        'SEED_VALUE': -1,
        'SYSTEM': {'GPU': '', 'CLUSTER_NODE': 0.0},
        'DATASET': {
            'TRAIN_DS': 'pano',
            'VAL_DS': 'pano',
            'MIN_RES': 600,
            'MAX_RES': 1000,
            'BATCH_SIZE': 32,
            'NUM_WORKERS': 8,
            'PIN_MEMORY': True,
            'SHUFFLE_TRAIN': True,
            'IMG_RES': 224,
            # Opt-in JPEG DCT-scaled decode for the train loader (PIL
            # draft; spec_tpu extension, no reference key). Safe-by-
            # construction here: samples resize DOWN to MIN_RES anyway.
            'FAST_DECODE': False,
            # Decoded+resized crop LRU capacity (images, uint8) shared
            # by the loader threads — epochs 2+ skip decode+resize
            # entirely (spec_tpu extension; pre-jitter pixels, so train
            # aug stays fresh per epoch). 0 = off.
            'DECODE_CACHE': 0,
            # Subsample the split without replacement (smoke runs; the
            # reference dataset exposes the arg but never wires it,
            # camcalib/pano_dataset.py:56,90-91). -1 = all.
            'NUM_IMAGES': -1,
            # On-device ColorJitter+normalize for the TRAIN loader
            # (spec_tpu extension): items carry raw uint8 + a per-image
            # 3x3+3 jitter affine; the train step applies affine/clip/
            # normalize on device (ops/preprocess.device_jitter_
            # normalize) — 4x less host->device transfer, host item
            # cost drops to decode+resize.
            'DEVICE_JITTER': False,
            # Legacy alias; the reference dialect is MODEL.LOSS_TYPE
            # (camcalib/config.py:87). resolve_camcalib_loss() arbitrates.
            'LOSS_TYPE': 'ce',
        },
        'OPTIMIZER': {'TYPE': 'adam', 'LR': 1e-3, 'WD': 0.0,
                      'SCHEDULE': '', 'WARMUP_STEPS': 0,
                      'DECAY_STEPS': 0, 'DECAY_RATE': 0.1,
                      'MIN_LR_RATIO': 0.0, 'CLIP_GRAD_NORM': 0.0,
                      'MOMENTUM': 0.9},
        'TRAINING': {
            'RESUME': None,
            'PRETRAINED': None,
            'PRETRAINED_LIT': None,
            'MAX_EPOCHS': 100,
            'LOG_SAVE_INTERVAL': 50,
            'LOG_FREQ_TB_IMAGES': 500,
            'CHECK_VAL_EVERY_N_EPOCH': 1,
            'RELOAD_DATALOADERS_EVERY_EPOCH': True,
            'SAVE_IMAGES': False,
            'GRAD_ACCUM_STEPS': 1,
        },
        'MODEL': {
            'BACKBONE': 'resnet34',
            'DTYPE': 'float32',
            'NUM_FC_LAYERS': 1,
            'NUM_FC_CHANNELS': 1024,
            'LOSS_VFOV_WEIGHT': 1.0,
            'LOSS_PITCH_WEIGHT': 1.0,
            'LOSS_ROLL_WEIGHT': 1.0,
            'LOSS_TYPE': 'ce',
        },
        'RUN_TEST': False,
    })


def resolve_camcalib_loss(cfg: CfgNode) -> str:
    """Loss type from either config dialect.

    The reference stores it at MODEL.LOSS_TYPE (``camcalib/config.py:87``,
    and all shipped ``camcalib/configs/*.yaml``); early spec_tpu configs used
    DATASET.LOSS_TYPE. A non-default value in either location wins, with
    MODEL (the reference location) taking precedence when both are set.
    """
    model_lt = cfg.get('MODEL', {}).get('LOSS_TYPE', 'ce')
    dataset_lt = cfg.get('DATASET', {}).get('LOSS_TYPE', 'ce')
    return model_lt if model_lt != 'ce' else dataset_lt
