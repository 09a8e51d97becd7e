"""Combined fused LoCa+CE pipeline vs the separate fused ops — values and
student-side gradients must match exactly (same math, 4 head sweeps
instead of 13), interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_ce import (
    fused_ce_loss,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_loca import (
    fused_loca_ce_loss,
    fused_loca_loss,
)

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("n,ds,dt,v,vt,temp,alpha,gamma", [
    (64, 128, 256, 300, 340, 0.8, 0.8, 0.8),   # double-trouble p3 preset
    (50, 96, 96, 513, 513, 1.0, 0.8, 1.0),     # logit_based preset (T=1)
])
def test_fused_loca_ce_value_and_grads(n, ds, dt, v, vt, temp, alpha, gamma):
    rng = np.random.default_rng(1)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(ds, v)).astype(np.float32) * 0.05)
    wt = jnp.asarray(rng.normal(size=(dt, vt)).astype(np.float32) * 0.05)
    loca_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    loca_labels[:7] = -100
    ce_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    ce_labels[-9:] = -100
    loca_labels, ce_labels = jnp.asarray(loca_labels), jnp.asarray(ce_labels)

    def ref(hs_, ws_):
        # the separate fused ops, each parity-tested against the reference
        # path on its own (tests/test_fused_loca.py, tests/test_fused_ce.py)
        loca = fused_loca_loss(hs_, ws_, ht, wt, loca_labels,
                               temperature=temp, alpha=alpha)
        ce = fused_ce_loss(hs_, ws_, ce_labels)
        return gamma * loca + ce, (loca, ce)

    def fused(hs_, ws_):
        loca, ce = fused_loca_ce_loss(
            hs_, ws_, ht, wt, loca_labels, ce_labels,
            temperature=temp, alpha=alpha,
        )
        return gamma * loca + ce, (loca, ce)

    with pltpu.force_tpu_interpret_mode():
        (got, (got_loca, got_ce)), (gh, gw) = jax.value_and_grad(
            fused, argnums=(0, 1), has_aux=True
        )(hs, ws)
        (want, (want_loca, want_ce)), (rh, rw) = jax.value_and_grad(
            ref, argnums=(0, 1), has_aux=True
        )(hs, ws)

    np.testing.assert_allclose(float(got_loca), float(want_loca),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(got_ce), float(want_ce),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(rh),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=2e-4, atol=2e-6)


def test_fused_loca_ce_vd_layout_matches_dv():
    """[V, D] student head (the tied embedding's native layout) must give
    the same losses and the transposed gradient of the dv path."""
    n, ds, dt, v, vt, temp, alpha = 64, 128, 256, 300, 340, 0.8, 0.8
    rng = np.random.default_rng(3)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(ds, v)).astype(np.float32) * 0.05)
    wt = jnp.asarray(rng.normal(size=(dt, vt)).astype(np.float32) * 0.05)
    loca_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    loca_labels[:5] = -100
    ce_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    ce_labels[-4:] = -100
    loca_labels, ce_labels = jnp.asarray(loca_labels), jnp.asarray(ce_labels)

    def dv(hs_, ws_):
        loca, ce = fused_loca_ce_loss(
            hs_, ws_, ht, wt, loca_labels, ce_labels,
            temperature=temp, alpha=alpha,
        )
        return 0.8 * loca + ce

    def vd(hs_, wvd_):
        loca, ce = fused_loca_ce_loss(
            hs_, wvd_, ht, wt, loca_labels, ce_labels,
            temperature=temp, alpha=alpha, student_head_layout="vd",
        )
        return 0.8 * loca + ce

    with pltpu.force_tpu_interpret_mode():
        want, (rh, rw) = jax.value_and_grad(dv, argnums=(0, 1))(hs, ws)
        got, (gh, gwvd) = jax.value_and_grad(vd, argnums=(0, 1))(hs, ws.T)

    np.testing.assert_allclose(float(got), float(want), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(rh),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gwvd), np.asarray(rw).T,
                               rtol=2e-4, atol=2e-6)

@pytest.mark.parametrize("vd_layout", ["dv", "vd"])
def test_fused_loca_ce_materialized_teacher_matches_recompute(vd_layout):
    """teacher_logits="materialize" (one XLA teacher matmul streamed into
    the sweeps) must reproduce the recompute form: same dot + scale, so
    values/grads agree to f32 accumulation order."""
    n, ds, dt, v, vt, temp, alpha = 64, 128, 256, 300, 340, 0.8, 0.8
    rng = np.random.default_rng(7)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws0 = rng.normal(size=(ds, v)).astype(np.float32) * 0.05
    ws = jnp.asarray(ws0.T if vd_layout == "vd" else ws0)
    wt = jnp.asarray(rng.normal(size=(dt, vt)).astype(np.float32) * 0.05)
    loca_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    loca_labels[:7] = -100
    ce_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    ce_labels[-9:] = -100
    loca_labels, ce_labels = jnp.asarray(loca_labels), jnp.asarray(ce_labels)

    def run(mode):
        def f(hs_, ws_):
            loca, ce = fused_loca_ce_loss(
                hs_, ws_, ht, wt, loca_labels, ce_labels,
                temperature=temp, alpha=alpha,
                student_head_layout=vd_layout, teacher_logits=mode,
            )
            return 0.8 * loca + ce, (loca, ce)
        with pltpu.force_tpu_interpret_mode():
            (tot, (loca, ce)), (gh, gw) = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True
            )(hs, ws)
        return tot, loca, ce, gh, gw

    tot_r, loca_r, ce_r, gh_r, gw_r = run("recompute")
    tot_m, loca_m, ce_m, gh_m, gw_m = run("materialize")

    np.testing.assert_allclose(float(loca_m), float(loca_r),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(ce_m), float(ce_r),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gh_m), np.asarray(gh_r),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_m), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-6)

@pytest.mark.parametrize("vd_layout", ["dv", "vd"])
def test_fused_loca_ce_bf16_tmat_matches_rounded_oracle(vd_layout):
    """teacher_logits="materialize_bf16" stores the [N, V] teacher logits
    (already at 1/T) in bfloat16.  The ONLY deviation from the f32 form
    is that one rounding, so a dense oracle with the teacher logits
    rounded at the same point must agree to kernel accumulation order —
    and CE (student-only math) must match the recompute run exactly."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.losses.kd_losses import (
        loca_loss,
    )

    n, ds, dt, v, vt, temp, alpha = 64, 128, 256, 300, 340, 0.8, 0.8
    rng = np.random.default_rng(11)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws0 = rng.normal(size=(ds, v)).astype(np.float32) * 0.05
    ws = jnp.asarray(ws0.T if vd_layout == "vd" else ws0)
    wt = jnp.asarray(rng.normal(size=(dt, vt)).astype(np.float32) * 0.05)
    loca_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    loca_labels[:7] = -100
    ce_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    ce_labels[-9:] = -100
    loca_labels, ce_labels = jnp.asarray(loca_labels), jnp.asarray(ce_labels)

    def run(mode):
        def f(hs_, ws_):
            loca, ce = fused_loca_ce_loss(
                hs_, ws_, ht, wt, loca_labels, ce_labels,
                temperature=temp, alpha=alpha,
                student_head_layout=vd_layout, teacher_logits=mode,
            )
            return 0.8 * loca + ce, (loca, ce)
        with pltpu.force_tpu_interpret_mode():
            (tot, (loca, ce)), (gh, gw) = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True
            )(hs, ws)
        return tot, loca, ce, gh, gw

    _, loca_b, ce_b, gh_b, gw_b = run("materialize_bf16")
    _, _, ce_r, _, _ = run("recompute")

    # dense oracle: round the 1/T-scaled teacher logits through bf16 at
    # exactly the point _materialize_t does, then the reference loss
    t_rounded = ((ht @ wt) * (1.0 / temp)).astype(jnp.bfloat16).astype(
        jnp.float32) * temp
    s_logits = (hs @ (ws.T if vd_layout == "vd" else ws))[None]
    want_loca = loca_loss(t_rounded[None], s_logits, loca_labels[None],
                          temperature=temp, alpha=alpha)
    np.testing.assert_allclose(float(loca_b), float(want_loca),
                               rtol=1e-4, atol=1e-7)
    # CE never touches the teacher: identical to the recompute run
    np.testing.assert_allclose(float(ce_b), float(ce_r),
                               rtol=1e-6, atol=0)
    # gradients: bound against the f32 materialize arm — same CE math,
    # loca differs only by the one bf16 rounding of the teacher logits
    _, _, _, gh_m, gw_m = run("materialize")
    np.testing.assert_allclose(np.asarray(gh_b), np.asarray(gh_m),
                               rtol=5e-2, atol=5e-4)
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_m),
                               rtol=5e-2, atol=5e-4)


@pytest.mark.parametrize("vd_layout,tmode,bwd_mode", [
    ("dv", "recompute", "1"), ("vd", "recompute", "1"),
    ("vd", "materialize", "1"),
    ("dv", "recompute", "2"), ("vd", "materialize", "2"),
])
def test_fused_loca_ce_fused_bwd_matches_separate(monkeypatch, vd_layout,
                                                  tmode, bwd_mode):
    """KDSS_LOCA_FUSED_BWD=1 (one dhs+dws sweep, persistent-VMEM d_hidden
    accumulator) and =2 (d_hidden partials to HBM, summed in XLA) must
    reproduce the two-kernel backward exactly."""
    n, ds, dt, v, vt, temp, alpha = 64, 128, 256, 300, 340, 0.8, 0.8
    rng = np.random.default_rng(11)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws0 = rng.normal(size=(ds, v)).astype(np.float32) * 0.05
    ws = jnp.asarray(ws0.T if vd_layout == "vd" else ws0)
    wt = jnp.asarray(rng.normal(size=(dt, vt)).astype(np.float32) * 0.05)
    loca_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    loca_labels[:7] = -100
    ce_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    ce_labels[-9:] = -100
    loca_labels, ce_labels = jnp.asarray(loca_labels), jnp.asarray(ce_labels)

    def f(hs_, ws_):
        loca, ce = fused_loca_ce_loss(
            hs_, ws_, ht, wt, loca_labels, ce_labels,
            temperature=temp, alpha=alpha,
            student_head_layout=vd_layout, teacher_logits=tmode,
        )
        return 0.8 * loca + ce

    monkeypatch.setenv("KDSS_LOCA_FUSED_BWD", "0")
    with pltpu.force_tpu_interpret_mode():
        gh_r, gw_r = jax.grad(f, argnums=(0, 1))(hs, ws)
    monkeypatch.setenv("KDSS_LOCA_FUSED_BWD", bwd_mode)
    with pltpu.force_tpu_interpret_mode():
        gh_f, gw_f = jax.grad(f, argnums=(0, 1))(hs, ws)

    np.testing.assert_allclose(np.asarray(gh_f), np.asarray(gh_r),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("tmode", ["recompute", "materialize"])
def test_fused_loca_ce_int8_teacher_head(tmode):
    """Int8 teacher head streamed through the combined pipeline: the
    kernels dequantize per vocab block in VMEM ((h @ q) * scale — the
    per-column scale factors out of the dot exactly), so values/grads must
    match the same pipeline fed the DENSE dequantized head to float
    associativity (no bf16 rounding anywhere at f32 test dtypes)."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
        absmax_quantize_weight,
    )

    n, ds, dt, v, vt = 64, 128, 256, 300, 340
    temp, alpha = 0.8, 0.8
    rng = np.random.default_rng(5)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(ds, v)).astype(np.float32) * 0.05)
    wt_f = jnp.asarray(rng.normal(size=(dt, vt)).astype(np.float32) * 0.05)
    wq, wsc = absmax_quantize_weight(wt_f)
    wt_dense = wq.astype(jnp.float32) * wsc[None, :]
    loca_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    loca_labels[:5] = -100
    ce_labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    ce_labels[-4:] = -100
    loca_labels, ce_labels = jnp.asarray(loca_labels), jnp.asarray(ce_labels)

    def run(head):
        def f(hs_, ws_):
            loca, ce = fused_loca_ce_loss(
                hs_, ws_, ht, head, loca_labels, ce_labels,
                temperature=temp, alpha=alpha, teacher_logits=tmode,
            )
            return loca + ce, (loca, ce)
        with pltpu.force_tpu_interpret_mode():
            (total, (loca, ce)), grads = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True)(hs, ws)
        return (float(loca), float(ce)), grads

    (loca_q, ce_q), (gh_q, gw_q) = run((wq, wsc))
    (loca_d, ce_d), (gh_d, gw_d) = run(wt_dense)
    np.testing.assert_allclose(loca_q, loca_d, rtol=1e-5)
    np.testing.assert_allclose(ce_q, ce_d, rtol=1e-5)
    # r5 vocab-major storage ([Vt, Dt] + per-row scales — what
    # quantize_lm_params_int8 now emits; kernels read it in place)
    (loca_v, ce_v), (gh_v, gw_v) = run((wq.T, wsc))
    np.testing.assert_allclose(loca_v, loca_d, rtol=1e-5)
    np.testing.assert_allclose(ce_v, ce_d, rtol=1e-5)
    for a, b in ((gh_v, gh_d), (gw_v, gw_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gh_q), np.asarray(gh_d),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_q), np.asarray(gw_d),
                               atol=1e-5, rtol=1e-4)
