"""Fused (vocab-streaming) KL vs the reference kd_kl_loss — values and
student-side gradients, interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.losses.kd_losses import (
    kd_kl_loss,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_kl import (

    fused_kl_loss,
)

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("n,ds,dt,v,vt,temp", [
    (64, 128, 256, 300, 340, 1.0),
    (50, 96, 96, 513, 513, 0.8),
])
def test_fused_kl_value_and_grads(n, ds, dt, v, vt, temp):
    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(ds, v)).astype(np.float32) * 0.05)
    wt = jnp.asarray(rng.normal(size=(dt, vt)).astype(np.float32) * 0.05)

    def ref(hs_, ws_):
        s_logits = (hs_ @ ws_)[None]          # [1, N, V]
        t_logits = (ht @ wt)[None]            # [1, N, Vt] (truncated inside)
        return kd_kl_loss(s_logits, t_logits, temp)

    def fused(hs_, ws_):
        return fused_kl_loss(hs_, ws_, ht, wt, temperature=temp)

    with pltpu.force_tpu_interpret_mode():
        got = fused(hs, ws)
        g_h, g_w = jax.grad(fused, argnums=(0, 1))(hs, ws)

    want = ref(hs, ws)
    r_h, r_w = jax.grad(ref, argnums=(0, 1))(hs, ws)

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(r_h),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(r_w),
                               atol=1e-6, rtol=1e-4)


def test_fused_kl_vd_layout_matches_dv():
    """[V, D] student head (tied embedding natively) == transposed dv path."""
    n, ds, dt, v, vt, temp = 64, 128, 256, 300, 340, 0.8
    rng = np.random.default_rng(5)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(ds, v)).astype(np.float32) * 0.05)
    wt = jnp.asarray(rng.normal(size=(dt, vt)).astype(np.float32) * 0.05)

    with pltpu.force_tpu_interpret_mode():
        want, (rh, rw) = jax.value_and_grad(
            lambda h_, w_: fused_kl_loss(h_, w_, ht, wt, temperature=temp),
            argnums=(0, 1),
        )(hs, ws)
        got, (gh, gwvd) = jax.value_and_grad(
            lambda h_, w_: fused_kl_loss(h_, w_, ht, wt, temperature=temp,
                                         student_head_layout="vd"),
            argnums=(0, 1),
        )(hs, ws.T)

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(rh),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gwvd), np.asarray(rw).T,
                               atol=1e-6, rtol=1e-4)


def test_smaller_teacher_vocab_fails_loudly():
    """cols<v_real masking assumes teacher_vocab >= student_vocab; a
    smaller teacher head must raise instead of contributing garbage
    (ADVICE r2 #3)."""
    import pytest
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_kl import (
        fused_kl_sum,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_loca import (
        fused_loca_sum,
        fused_loca_ce_sums,
    )

    n, d, vs, vt = 8, 32, 64, 48  # teacher vocab < student vocab
    hs = jnp.zeros((n, d), jnp.float32)
    ws = jnp.zeros((d, vs), jnp.float32)
    ht = jnp.zeros((n, d), jnp.float32)
    wt = jnp.zeros((d, vt), jnp.float32)
    lab = jnp.zeros((n,), jnp.int32)
    with pytest.raises(ValueError, match="teacher head vocab"):
        fused_kl_sum(hs, ws, ht, wt)
    with pytest.raises(ValueError, match="teacher head vocab"):
        fused_loca_sum(hs, ws, ht, wt, lab)
    with pytest.raises(ValueError, match="teacher head vocab"):
        fused_loca_ce_sums(hs, ws, ht, wt, lab, lab)


@pytest.mark.parametrize("vd_layout", ["dv", "vd"])
def test_fused_kl_materialized_teacher_matches_recompute(vd_layout):
    """teacher_logits="materialize" must reproduce the recompute form
    (same dot + scale, f32-accumulation-order differences only)."""
    import numpy as np
    n, ds, dt, v, vt, temp = 64, 128, 256, 300, 340, 0.8
    rng = np.random.default_rng(5)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws0 = rng.normal(size=(ds, v)).astype(np.float32) * 0.05
    ws = jnp.asarray(ws0.T if vd_layout == "vd" else ws0)
    wt = jnp.asarray(rng.normal(size=(dt, vt)).astype(np.float32) * 0.05)

    def run(mode):
        def f(hs_, ws_):
            return fused_kl_loss(hs_, ws_, ht, wt, temperature=temp,
                                 student_head_layout=vd_layout,
                                 teacher_logits=mode)
        with pltpu.force_tpu_interpret_mode():
            val, (gh, gw) = jax.value_and_grad(f, argnums=(0, 1))(hs, ws)
        return val, gh, gw

    v_r, gh_r, gw_r = run("recompute")
    v_m, gh_m, gw_m = run("materialize")
    np.testing.assert_allclose(float(v_m), float(v_r), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gh_m), np.asarray(gh_r),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gw_m), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-7)


def test_fused_kl_int8_teacher_head():
    """Int8 teacher head through the one-sweep KL kernels (fwd + both
    backward sweeps) matches the dense dequantized head."""
    from jax.experimental.pallas import tpu as pltpu

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
        absmax_quantize_weight,
    )

    n, ds, dt, v, vt = 64, 128, 96, 280, 300
    rng = np.random.default_rng(9)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(ds, v)).astype(np.float32) * 0.05)
    wt_f = jnp.asarray(rng.normal(size=(dt, vt)).astype(np.float32) * 0.05)
    wq, wsc = absmax_quantize_weight(wt_f)
    wt_dense = wq.astype(jnp.float32) * wsc[None, :]

    def run(head):
        def f(hs_, ws_):
            return fused_kl_loss(hs_, ws_, ht, head, temperature=0.8)
        with pltpu.force_tpu_interpret_mode():
            loss, grads = jax.value_and_grad(f, argnums=(0, 1))(hs, ws)
        return float(loss), grads

    loss_q, (gh_q, gw_q) = run((wq, wsc))
    loss_d, (gh_d, gw_d) = run(wt_dense)
    np.testing.assert_allclose(loss_q, loss_d, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gh_q), np.asarray(gh_d),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_q), np.asarray(gw_d),
                               atol=1e-5, rtol=1e-4)
    # r5 vocab-major storage (what quantize_lm_params_int8 now emits)
    loss_v, (gh_v, gw_v) = run((wq.T, wsc))
    np.testing.assert_allclose(loss_v, loss_d, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gh_v), np.asarray(gh_d),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_v), np.asarray(gw_d),
                               atol=1e-5, rtol=1e-4)
