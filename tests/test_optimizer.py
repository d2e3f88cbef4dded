"""Optimizer factory tests: schedules, clipping, gradient accumulation.

The reference trains both stages with a fixed-LR Adam
(``spec/trainer.py:564-569``, ``camcalib/trainer.py:201-206``);
``make_optimizer`` must reproduce that bit-exactly at the default config
and layer the beyond-reference knobs (SCHEDULE / WARMUP_STEPS /
CLIP_GRAD_NORM / GRAD_ACCUM_STEPS) on top without touching the defaults.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from spec_tpu.train.state import adam, lr_schedule, make_optimizer
from spec_tpu.utils.config import camcalib_default_config, spec_default_config


def _toy_params(rng):
    return {
        'dense': {'kernel': jnp.asarray(rng.standard_normal((8, 4)),
                                        jnp.float32),
                  'bias': jnp.zeros((4,), jnp.float32)},
    }


def _toy_grads(params, seed=0):
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape), p.dtype), params)


def _tree_allclose(a, b, **kw):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


class TestLrSchedule:
    def test_constant_is_float(self):
        assert lr_schedule(1e-3) == 1e-3

    def test_constant_warmup_ramps_linearly(self):
        sched = lr_schedule(1e-2, warmup_steps=10)
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(5)), 5e-3, rtol=1e-6)
        np.testing.assert_allclose(float(sched(10)), 1e-2, rtol=1e-6)
        np.testing.assert_allclose(float(sched(100)), 1e-2, rtol=1e-6)

    def test_cosine(self):
        """DECAY_STEPS is the ramp-down LENGTH (not counting warmup):
        warmup 10 + cosine 100 -> floor reached at step 110."""
        sched = lr_schedule(1e-2, schedule='cosine', warmup_steps=10,
                            decay_steps=100, min_lr_ratio=0.1)
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(10)), 1e-2, rtol=1e-6)
        # halfway through the cosine: mean of peak and floor
        np.testing.assert_allclose(float(sched(60)), (1e-2 + 1e-3) / 2,
                                   rtol=1e-5)
        np.testing.assert_allclose(float(sched(110)), 1e-3, rtol=1e-5)
        np.testing.assert_allclose(float(sched(10 ** 6)), 1e-3, rtol=1e-5)

    def test_cosine_short_decay_not_degenerate(self):
        """DECAY_STEPS < WARMUP_STEPS must still yield a real cosine
        segment after warmup (the optax total-length trap)."""
        sched = lr_schedule(1e-2, schedule='cosine', warmup_steps=1000,
                            decay_steps=500, min_lr_ratio=0.0)
        np.testing.assert_allclose(float(sched(1000)), 1e-2, rtol=1e-6)
        # midway down the 500-step cosine, LR is half the peak
        np.testing.assert_allclose(float(sched(1250)), 5e-3, rtol=1e-5)
        assert float(sched(1500)) < 1e-8

    def test_step_staircase(self):
        sched = lr_schedule(1e-2, schedule='step', decay_steps=100,
                            decay_rate=0.1)
        np.testing.assert_allclose(float(sched(99)), 1e-2, rtol=1e-6)
        np.testing.assert_allclose(float(sched(100)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(sched(250)), 1e-4, rtol=1e-6)

    def test_bad_schedule_raises(self):
        with pytest.raises(ValueError, match='unknown OPTIMIZER.SCHEDULE'):
            lr_schedule(1e-3, schedule='linear')
        with pytest.raises(ValueError, match='DECAY_STEPS'):
            lr_schedule(1e-3, schedule='cosine')
        with pytest.raises(ValueError, match='DECAY_STEPS'):
            lr_schedule(1e-3, schedule='step')


class TestMakeOptimizer:
    def test_default_config_bit_exact_vs_reference_adam(self, rng):
        """Untouched OPTIMIZER nodes (both stages) must step identically
        to the reference-faithful plain Adam."""
        for cfg in (spec_default_config(), camcalib_default_config()):
            params = _toy_params(rng)
            grads = _toy_grads(params)
            tx_new = make_optimizer(cfg.OPTIMIZER)
            tx_ref = adam(cfg.OPTIMIZER.LR, cfg.OPTIMIZER.WD)
            u_new, _ = tx_new.update(grads, tx_new.init(params), params)
            u_ref, _ = tx_ref.update(grads, tx_ref.init(params), params)
            for a, b in zip(jax.tree_util.tree_leaves(u_new),
                            jax.tree_util.tree_leaves(u_ref)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_old_config_snapshot_resumable(self, rng):
        """A pre-knob OPTIMIZER node (resume from an old
        config_to_run.yaml) must still build."""
        from spec_tpu.utils.config import CfgNode
        old = CfgNode.from_dict({'TYPE': 'adam', 'LR': 1e-4, 'WD': 0.0})
        params = _toy_params(rng)
        tx = make_optimizer(old)
        tx.update(_toy_grads(params), tx.init(params), params)

    def test_clip_grad_norm_matches_torch_semantics(self, rng):
        """CLIP_GRAD_NORM rescales the GLOBAL grad norm to the threshold
        before the Adam transform (torch clip_grad_norm_ then step)."""
        cfg = spec_default_config().OPTIMIZER
        cfg.CLIP_GRAD_NORM = 1.0
        params = _toy_params(rng)
        grads = _toy_grads(params, seed=3)
        gnorm = float(optax.global_norm(grads))
        assert gnorm > 1.0  # the clip must actually engage
        tx = make_optimizer(cfg)
        u_clip, _ = tx.update(grads, tx.init(params), params)
        scaled = jax.tree_util.tree_map(lambda g: g / gnorm, grads)
        tx_ref = adam(cfg.LR, cfg.WD)
        u_ref, _ = tx_ref.update(scaled, tx_ref.init(params), params)
        _tree_allclose(u_clip, u_ref, rtol=1e-6, atol=1e-9)

    def test_sgd_and_adamw_build(self, rng):
        cfg = spec_default_config().OPTIMIZER
        params = _toy_params(rng)
        for t in ('sgd', 'adamw'):
            cfg.TYPE = t
            tx = make_optimizer(cfg)
            tx.update(_toy_grads(params), tx.init(params), params)
        cfg.TYPE = 'rmsprop'
        with pytest.raises(ValueError, match='unknown OPTIMIZER.TYPE'):
            make_optimizer(cfg)

    def test_schedule_advances_per_update_not_per_micro_batch(self, rng):
        """Under GRAD_ACCUM_STEPS=k the LR schedule must see ONE step per
        optimizer update, not k."""
        cfg = spec_default_config().OPTIMIZER
        cfg.SCHEDULE = 'step'
        cfg.DECAY_STEPS = 1          # LR drops 10x after every update
        params = _toy_params(rng)
        grads = _toy_grads(params)

        tx_k = make_optimizer(cfg, grad_accum_steps=2)
        st = tx_k.init(params)
        updates = []
        for _ in range(4):           # 4 micro-steps = 2 updates
            u, st = tx_k.update(grads, st, params)
            updates.append(u)
        tx_1 = make_optimizer(cfg)
        st1 = tx_1.init(params)
        u1a, st1 = tx_1.update(grads, st1, params)
        u1b, _ = tx_1.update(grads, st1, params)
        # boundary micro-steps (1 and 3) carry the two updates
        _tree_allclose(updates[1], u1a, rtol=1e-6, atol=1e-9)
        _tree_allclose(updates[3], u1b, rtol=1e-6, atol=1e-9)


class TestGradAccumulation:
    def test_mean_accumulation_equivalence(self, rng):
        """k=2 accumulation over two micro-grads == one update on their
        mean; off-boundary micro-steps apply zero updates."""
        cfg = spec_default_config().OPTIMIZER
        params = _toy_params(rng)
        g1, g2 = _toy_grads(params, 1), _toy_grads(params, 2)

        tx = make_optimizer(cfg, grad_accum_steps=2)
        st = tx.init(params)
        u_mid, st = tx.update(g1, st, params)
        for leaf in jax.tree_util.tree_leaves(u_mid):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
        u_fin, st = tx.update(g2, st, params)

        g_mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
        tx_ref = make_optimizer(cfg)
        u_ref, _ = tx_ref.update(g_mean, tx_ref.init(params), params)
        _tree_allclose(u_fin, u_ref, rtol=1e-5, atol=1e-8)

    def test_camcalib_step_with_accumulation(self, rng):
        """Wiring smoke on the real jitted camcalib step: params frozen on
        off-boundary micro-steps, move on boundaries; state donation and
        the TrainState contract hold."""
        from spec_tpu.models import CameraRegressorNetwork
        from spec_tpu.train import create_train_state, make_camcalib_train_step
        from spec_tpu.utils.config import camcalib_default_config

        cfg = camcalib_default_config()
        cfg.TRAINING.GRAD_ACCUM_STEPS = 2
        model = CameraRegressorNetwork(backbone='resnet18')
        img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img)
        tx = make_optimizer(
            cfg.OPTIMIZER,
            grad_accum_steps=cfg.TRAINING.GRAD_ACCUM_STEPS)
        state = create_train_state(variables, tx)
        step = jax.jit(make_camcalib_train_step(model, tx, loss_type='ce'))
        batch = {'img': img,
                 'vfov': jnp.zeros((2,), jnp.int32),
                 'pitch': jnp.zeros((2,), jnp.int32),
                 'roll': jnp.zeros((2,), jnp.int32)}

        p0 = jax.device_get(state.params)
        state, _ = step(state, batch)
        p1 = jax.device_get(state.params)
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            np.testing.assert_array_equal(a, b)   # accumulating only
        state, _ = step(state, batch)
        p2 = jax.device_get(state.params)
        changed = any(
            not np.array_equal(a, b)
            for a, b in zip(jax.tree_util.tree_leaves(p1),
                            jax.tree_util.tree_leaves(p2)))
        assert changed                            # boundary applied
        assert int(state.step) == 2
