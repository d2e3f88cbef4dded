"""Train state: params + BN stats + optax optimizer, as a pytree.

Replaces the reference's PyTorch-Lightning module state (``spec/trainer.py``,
``camcalib/trainer.py``) with an explicit functional state that pjit can
shard/replicate and orbax can checkpoint directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: Any          # scalar int32
    params: Any        # model parameters pytree
    batch_stats: Any   # BatchNorm running stats pytree
    opt_state: Any     # optax state

    def variables(self) -> dict:
        return {'params': self.params, 'batch_stats': self.batch_stats}


def adam(learning_rate: float = 1e-4, weight_decay: float = 0.0):
    """The reference optimizer: plain Adam, optional (off-by-default)
    weight decay (reference ``spec/trainer.py:564-569``, LR default
    ``spec/config.py:118``).

    NB: torch's Adam(weight_decay=wd) is L2 folded into the GRADIENT
    before the adaptive moments — NOT AdamW's decoupled decay. The
    faithful port adds the decay term ahead of the Adam transform;
    optax.adamw would be a materially different update rule."""
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(learning_rate))
    return optax.adam(learning_rate)


def lr_schedule(
    lr: float,
    schedule: str = '',
    warmup_steps: int = 0,
    decay_steps: int = 0,
    decay_rate: float = 0.1,
    min_lr_ratio: float = 0.0,
):
    """Learning-rate schedule factory (beyond reference — the reference
    trains both stages at a fixed Adam LR, ``spec/trainer.py:564-569``,
    ``camcalib/trainer.py:201-206``; every knob defaults to that).

    Args:
      schedule: '' / 'constant' (fixed LR, optional linear warmup),
        'cosine' (linear warmup to ``lr`` then cosine to
        ``lr * min_lr_ratio`` over ``decay_steps``), or 'step'
        (staircase ``lr * decay_rate**(step // decay_steps)``).
      warmup_steps: linear ramp 0 -> lr over this many optimizer steps.
    Returns a float (constant, no warmup) or an optax schedule. Steps
    count OPTIMIZER updates — under gradient accumulation the schedule
    advances once per accumulated step, not per micro-batch.
    """
    schedule = (schedule or 'constant').lower()
    if schedule == 'constant':
        if warmup_steps:
            return optax.linear_schedule(0.0, lr, warmup_steps)
        return lr
    if schedule == 'cosine':
        if decay_steps <= 0:
            raise ValueError("SCHEDULE='cosine' needs DECAY_STEPS > 0 "
                             '(length of the cosine ramp-down, not '
                             'counting WARMUP_STEPS)')
        # optax's decay_steps is the TOTAL schedule length including the
        # warmup segment; DECAY_STEPS here is the ramp-down length, so a
        # config can never silently produce a degenerate (<= warmup)
        # cosine segment.
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else lr,
            peak_value=lr,
            warmup_steps=warmup_steps,
            decay_steps=warmup_steps + decay_steps,
            end_value=lr * min_lr_ratio,
        )
    if schedule == 'step':
        if decay_steps <= 0:
            raise ValueError("SCHEDULE='step' needs DECAY_STEPS > 0 "
                             '(interval between LR drops)')
        return optax.exponential_decay(
            lr, transition_steps=decay_steps, decay_rate=decay_rate,
            staircase=True)
    raise ValueError(f'unknown OPTIMIZER.SCHEDULE {schedule!r}; '
                     "use '', 'constant', 'cosine', or 'step'")


def make_optimizer(
    opt_cfg,
    freeze_buffers: bool = False,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    """Build the optimizer from an ``OPTIMIZER`` config node.

    Reference-faithful by default (plain fixed-LR Adam with torch-style
    L2, see :func:`adam`); the extra keys are framework capabilities the
    reference lacks and are all off by default. ``getattr`` defaults keep
    old ``config_to_run.yaml`` snapshots resumable.

    Args:
      opt_cfg: node with TYPE/LR/WD (+ optional SCHEDULE, WARMUP_STEPS,
        DECAY_STEPS, DECAY_RATE, MIN_LR_RATIO, CLIP_GRAD_NORM, MOMENTUM).
      freeze_buffers: zero updates for the HMR head's init_* buffers
        (:func:`freeze_init_buffers` — SPEC trainer path).
      grad_accum_steps: k>1 wraps in ``optax.MultiSteps``: gradients are
        MEAN-accumulated over k micro-batches and one update is applied
        per k calls (effective batch = k * DATASET.BATCH_SIZE). BN stats
        still update every micro-batch, like torch accumulation loops.
    """
    lr = lr_schedule(
        float(opt_cfg.LR),
        schedule=getattr(opt_cfg, 'SCHEDULE', ''),
        warmup_steps=int(getattr(opt_cfg, 'WARMUP_STEPS', 0) or 0),
        decay_steps=int(getattr(opt_cfg, 'DECAY_STEPS', 0) or 0),
        decay_rate=float(getattr(opt_cfg, 'DECAY_RATE', 0.1)),
        min_lr_ratio=float(getattr(opt_cfg, 'MIN_LR_RATIO', 0.0)),
    )
    opt_type = (getattr(opt_cfg, 'TYPE', 'adam') or 'adam').lower()
    wd = float(getattr(opt_cfg, 'WD', 0.0) or 0.0)
    if opt_type == 'adam':
        tx = adam(lr, wd)
    elif opt_type == 'adamw':
        tx = optax.adamw(lr, weight_decay=wd)
    elif opt_type == 'sgd':
        momentum = float(getattr(opt_cfg, 'MOMENTUM', 0.9))
        tx = optax.sgd(lr, momentum=momentum or None)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    else:
        raise ValueError(f'unknown OPTIMIZER.TYPE {opt_type!r}; '
                         "use 'adam', 'adamw', or 'sgd'")
    clip = float(getattr(opt_cfg, 'CLIP_GRAD_NORM', 0.0) or 0.0)
    if clip:
        # Clip raw grads BEFORE any decay/moment transform (torch
        # clip_grad_norm_-then-step semantics).
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    if freeze_buffers:
        tx = freeze_init_buffers(tx)
    if grad_accum_steps and grad_accum_steps > 1:
        ms = optax.MultiSteps(tx, every_k_schedule=int(grad_accum_steps))
        tx = optax.GradientTransformation(ms.init, ms.update)
    return tx


def create_train_state(
    variables: dict, tx: optax.GradientTransformation
) -> TrainState:
    import jax.numpy as jnp

    params = variables['params']
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(params),
    )


def freeze_init_buffers(tx: optax.GradientTransformation
                        ) -> optax.GradientTransformation:
    """Zero the optimizer updates for the HMR head's ``init_pose`` /
    ``init_shape`` / ``init_cam`` leaves.

    The reference keeps these as fixed ``register_buffer`` mean-param
    buffers (SPIN/PARE HMRHead); as flax params they would otherwise be
    trained (and weight-decayed) away from the SPIN means — a silent
    training-recipe divergence.
    """
    def label(params):
        def leaf_label(path, _):
            keys = {getattr(p, 'key', getattr(p, 'name', '')) for p in path}
            frozen = keys & {'init_pose', 'init_shape', 'init_cam'}
            return 'frozen' if frozen else 'train'
        import jax
        return jax.tree_util.tree_map_with_path(leaf_label, params)

    return optax.multi_transform(
        {'train': tx, 'frozen': optax.set_to_zero()}, label)
