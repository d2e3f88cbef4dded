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
