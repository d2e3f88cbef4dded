"""Fused Pallas LBS kernel vs the reference jnp path (interpret mode on
the CPU test backend; the same kernel compiles natively on TPU)."""

import numpy as np
import jax.numpy as jnp

from spec_tpu.core import smpl as S
from spec_tpu.core.geometry import rodrigues
from spec_tpu.ops.pallas.lbs import pack_lbs_operands


def _random_inputs(rng, B, V):
    assets = S.create_test_assets(num_vertices=V)
    betas = jnp.asarray(rng.randn(B, 10).astype('f4') * 0.3)
    rotmats = rodrigues(jnp.asarray(rng.randn(B, 24, 3).astype('f4') * 0.3))
    return assets, betas, rotmats


def test_fused_matches_reference_path(rng):
    assets, betas, rotmats = _random_inputs(rng, B=4, V=640)
    v_ref, j_ref, tf_ref = S.lbs(assets, betas, rotmats)
    packed = pack_lbs_operands(assets)
    v_fused, j_fused, tf_fused = S.lbs_fused(
        assets, betas, rotmats, packed=packed, interpret=True)

    np.testing.assert_allclose(np.asarray(j_fused), np.asarray(j_ref),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(tf_fused), np.asarray(tf_ref),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_ref),
                               atol=1e-5)


def test_fused_nondivisible_batch_and_vertices(rng):
    """B and V not multiples of the tile sizes exercise the padding."""
    assets, betas, rotmats = _random_inputs(rng, B=3, V=333)
    v_ref, _, _ = S.lbs(assets, betas, rotmats)
    v_fused, _, _ = S.lbs_fused(assets, betas, rotmats, interpret=True)
    assert v_fused.shape == (3, 333, 3)
    np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_ref),
                               atol=1e-5)


def test_fused_full_smpl_size(rng):
    assets, betas, rotmats = _random_inputs(rng, B=2,
                                            V=S.C.NUM_SMPL_VERTICES)
    v_ref, _, _ = S.lbs(assets, betas, rotmats)
    v_fused, _, _ = S.lbs_fused(assets, betas, rotmats, interpret=True)
    np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_ref),
                               atol=1e-5)


def test_fused_lbs_gradients_match_jnp_path(rng):
    """The kernel's custom VJP must match reverse-mode grads of the plain
    jnp LBS (training differentiates through SMPL: reference
    spec/trainer.py:141-176 runs GT SMPL + the model's SMPL head in the
    loss graph)."""
    import jax

    assets = S.create_test_assets(num_vertices=640)
    packed = pack_lbs_operands(assets)
    B = 3
    betas = jnp.asarray(rng.randn(B, 10).astype('f4') * 0.5)
    aa = jnp.asarray(rng.randn(B, 24, 3).astype('f4') * 0.3)

    def loss_fused(betas, aa):
        rotmats = rodrigues(aa)
        v, j, _ = S.lbs_fused(assets, betas, rotmats, packed=packed,
                              interpret=True)
        return jnp.sum(v * jnp.cos(jnp.arange(v.size).reshape(v.shape)))

    def loss_ref(betas, aa):
        rotmats = rodrigues(aa)
        v, j, _ = S.lbs(assets, betas, rotmats)
        return jnp.sum(v * jnp.cos(jnp.arange(v.size).reshape(v.shape)))

    gb_f, ga_f = jax.grad(loss_fused, argnums=(0, 1))(betas, aa)
    gb_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(betas, aa)

    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_r),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_r),
                               atol=2e-4, rtol=2e-4)


def test_fused_core_full_vjp_all_operands(rng):
    """Every cotangent of the kernel's custom VJP (including the packed
    dirs/weights operands, used by template/skinning fitting) must match
    autodiff of a pure-jnp twin of the kernel math."""
    import jax

    from spec_tpu.ops.pallas.lbs import _fused_core

    Bp, C, Vp, J = 8, 219, 512, 24
    dirs = jnp.asarray(rng.randn(3, C, Vp).astype('f4') * 0.1)
    wt = jnp.asarray(np.abs(rng.randn(J, Vp)).astype('f4'))
    coeffs = jnp.asarray(rng.randn(Bp, C).astype('f4') * 0.1)
    a = jnp.asarray(rng.randn(12, Bp, J).astype('f4') * 0.1)
    gw = jnp.asarray(rng.randn(3, Bp, Vp).astype('f4'))

    def ref_core(dirs, wt, coeffs, a):
        posed = jnp.einsum('bm,cmv->cbv', coeffs, dirs)
        t = jnp.einsum('kbj,jv->kbv', a, wt).reshape(3, 4, Bp, Vp)
        return jnp.stack([
            t[i, 0] * posed[0] + t[i, 1] * posed[1]
            + t[i, 2] * posed[2] + t[i, 3] for i in range(3)])

    def loss_fused(*args):
        return jnp.sum(_fused_core(True, *args) * gw)

    def loss_ref(*args):
        return jnp.sum(ref_core(*args) * gw)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(dirs, wt, coeffs, a)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(dirs, wt, coeffs, a)
    for name, a_, b_ in zip(('dirs', 'wt', 'coeffs', 'a'), gf, gr):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), atol=2e-3, rtol=2e-4,
            err_msg=name)
