"""Flash-attention kernel vs the XLA reference implementation (values and
gradients), run in Pallas interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.attention import (
    dot_product_attention,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.flash_attention import (
    flash_attention,
)


def _mk(b, sq, skv, hq, hkv, d, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, sq, hq, d)).astype(np.float32)
    k = rng.normal(size=(b, skv, hkv, d)).astype(np.float32)
    v = rng.normal(size=(b, skv, hkv, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


CASES = [
    # (b, sq, skv, hq, hkv, d, causal, masked)
    (1, 256, 256, 2, 2, 64, False, False),
    (2, 256, 256, 4, 2, 64, True, True),   # GQA + causal + padding
    (1, 384, 384, 2, 1, 128, True, False),
    (1, 200, 200, 2, 2, 64, True, True),   # non-multiple seq (padding path)
]


@pytest.mark.parametrize("b,sq,skv,hq,hkv,d,causal,masked", CASES)
def test_flash_forward_matches_xla(b, sq, skv, hq, hkv, d, causal, masked):
    q, k, v = _mk(b, sq, skv, hq, hkv, d)
    mask = None
    if masked:
        m = np.ones((b, skv), dtype=bool)
        m[:, skv - 37 :] = False
        mask = jnp.asarray(m)

    ref = dot_product_attention(
        q, k, v,
        mask=mask[:, None, None, :] if mask is not None else None,
        causal=causal,
    )
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, mask=mask, causal=causal)

    valid_q = np.ones((b, sq), dtype=bool)  # all queries attend something
    np.testing.assert_allclose(
        np.asarray(got)[valid_q], np.asarray(ref)[valid_q], atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("b,sq,skv,hq,hkv,d,causal,masked", CASES)
def test_xla_chunked_matches_xla(b, sq, skv, hq, hkv, d, causal, masked):
    q, k, v = _mk(b, sq, skv, hq, hkv, d)
    mask = None
    if masked:
        m = np.ones((b, skv), dtype=bool)
        m[:, skv - 37 :] = False
        mask = jnp.asarray(m)
    ref = dot_product_attention(
        q, k, v,
        mask=mask[:, None, None, :] if mask is not None else None,
        causal=causal,
    )
    got = dot_product_attention(
        q, k, v,
        mask=mask[:, None, None, :] if mask is not None else None,
        causal=causal, impl="xla_chunked",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_xla_chunked_grads():
    b, sq, skv, hq, hkv, d = 1, 200, 200, 4, 2, 64
    q, k, v = _mk(b, sq, skv, hq, hkv, d, seed=3)

    def loss(impl):
        def f(q_, k_, v_):
            o = dot_product_attention(q_, k_, v_, causal=True, impl=impl)
            return (o * jnp.sin(o)).sum()
        return f

    g_ref = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    g_chk = jax.grad(loss("xla_chunked"), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_chk):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


def test_flash_grads_match_xla():
    b, sq, skv, hq, hkv, d = 1, 256, 256, 4, 2, 64
    q, k, v = _mk(b, sq, skv, hq, hkv, d, seed=1)
    m = np.ones((b, skv), dtype=bool)
    m[:, -29:] = False
    mask = jnp.asarray(m)

    def loss_ref(q_, k_, v_):
        o = dot_product_attention(
            q_, k_, v_, mask=mask[:, None, None, :], causal=True
        )
        return (o * jnp.cos(o)).sum()

    def loss_flash(q_, k_, v_):
        o = flash_attention(q_, k_, v_, mask=mask, causal=True)
        return (o * jnp.cos(o)).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_flash):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=5e-4, rtol=5e-4
        )


# ---------------------------------------------------------------------------
# Head-batched GQA variant (KDSS_FLASH_GQA=1 opt-in)
# ---------------------------------------------------------------------------

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.flash_attention import (  # noqa: E402

    flash_attention_gqa,
)

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("b,sq,skv,hq,hkv,d,causal,masked", CASES)
def test_gqa_flash_forward_matches_xla(b, sq, skv, hq, hkv, d, causal, masked):
    q, k, v = _mk(b, sq, skv, hq, hkv, d)
    mask = None
    if masked:
        m = np.ones((b, skv), dtype=bool)
        m[:, skv - 37 :] = False
        mask = jnp.asarray(m)
    ref = dot_product_attention(
        q, k, v,
        mask=mask[:, None, None, :] if mask is not None else None,
        causal=causal,
    )
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_gqa(q, k, v, mask=mask, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gqa_flash_grads_match_xla():
    b, s, hq, hkv, d = 2, 256, 4, 2, 64
    q, k, v = _mk(b, s, s, hq, hkv, d)
    m = np.ones((b, s), dtype=bool)
    m[:, -37:] = False
    mask = jnp.asarray(m)

    def ref_loss(q, k, v):
        o = dot_product_attention(q, k, v, mask=mask[:, None, None, :],
                                  causal=True)
        return jnp.sum(o**2)

    def gqa_loss(q, k, v):
        o = flash_attention_gqa(q, k, v, mask=mask, causal=True)
        return jnp.sum(o**2)

    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gg = jax.grad(gqa_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("b,sq,hq,hkv,d", [
    (1, 1, 14, 2, 64),   # 0.5B student decode shape
    (2, 1, 4, 4, 64),    # MHA (no grouping)
    (3, 2, 8, 2, 32),    # few-token decode, odd batch
])
def test_gqa_decode_matches_xla(b, sq, hq, hkv, d):
    """gqa_decode_attention (grouped einsum, no K/V re-broadcast) must be
    numerically identical to the repeat_kv XLA path on decode shapes."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.attention import (
        gqa_decode_attention,
    )

    skv = 97  # cache length, non-multiple on purpose
    q, k, v = _mk(b, sq, skv, hq, hkv, d, seed=11)
    # decode mask: [B, 1, Sq, Skv], padding tail masked out
    m = np.ones((b, 1, sq, skv), dtype=bool)
    m[:, :, :, skv - 13:] = False
    mask = jnp.asarray(m)

    ref = dot_product_attention(q, k, v, mask=mask, causal=False)
    got = gqa_decode_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)

    # 3D mask form and the all-masked row guard
    m3 = np.ones((b, sq, skv), dtype=bool)
    m3[0, :, :] = False  # fully-masked row must produce finite output
    got3 = gqa_decode_attention(q, k, v, mask=jnp.asarray(m3))
    assert np.isfinite(np.asarray(got3)).all()


@pytest.mark.parametrize("hq,hkv", [(2, 2), (4, 2)])  # plain + GQA kernels
def test_fully_masked_sample_zero_output_and_grads(hq, hkv):
    """A sample whose kv mask is all False must produce out=0 and ZERO
    gradients, not mean(V) / garbage: masked columns sit at MASK_VALUE so
    exp(s - m_new) == 1 for fully-masked rows unless explicitly zeroed
    (the l==0 finalize guard alone never fires)."""
    b, s, d = 2, 128, 64
    q, k, v = _mk(b, s, s, hq, hkv, d, seed=5)
    m = np.ones((b, s), dtype=bool)
    m[1, :] = False  # sample 1 fully masked
    mask = jnp.asarray(m)

    def loss(q, k, v):
        out = flash_attention(q, k, v, mask=mask, causal=False)
        return (out.astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, mask=mask, causal=False)
        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    np.testing.assert_array_equal(np.asarray(out)[1], 0.0)
    for g in (gq, gk, gv):
        ga = np.asarray(g)
        assert np.all(np.isfinite(ga))
        np.testing.assert_array_equal(ga[1], 0.0)
    # the valid sample still matches the XLA reference
    ref = dot_product_attention(q, k, v, mask=mask[:, None, None, :])
    np.testing.assert_allclose(
        np.asarray(out)[0], np.asarray(ref)[0], atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("fn", [flash_attention, flash_attention_gqa])
def test_prescale_matches_default(fn, monkeypatch):
    """KDSS_FLASH_PRESCALE folds the softmax scale into q and runs the
    kernels with scale==1.0 (statically dropping the per-block ``s*scale``
    and ``ds*scale`` VPU passes); values and grads must match the default
    in-kernel scaling."""
    b, sq, skv, hq, hkv, d = 1, 256, 256, 4, 2, 64
    q, k, v = _mk(b, sq, skv, hq, hkv, d, seed=7)
    m = np.ones((b, skv), dtype=bool)
    m[:, -17:] = False
    mask = jnp.asarray(m)

    def loss(q_, k_, v_):
        o = fn(q_, k_, v_, mask=mask, causal=True)
        return (o * jnp.cos(o)).sum()

    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("KDSS_FLASH_PRESCALE", "0")
        base = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        o_base = fn(q, k, v, mask=mask, causal=True)
        monkeypatch.setenv("KDSS_FLASH_PRESCALE", "1")
        pre = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        o_pre = fn(q, k, v, mask=mask, causal=True)
    np.testing.assert_allclose(
        np.asarray(o_pre), np.asarray(o_base), atol=5e-4, rtol=5e-4)
    for a, b_ in zip(base, pre):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("causal,masked", [(True, True), (True, False),
                                           (False, True)])
def test_gqa_ilp_fwd_matches_default(causal, masked, monkeypatch):
    """KDSS_FLASH_ILP splits each kv block into two independent (m, l, acc)
    chains merged at finalize; values (and the lse the backward consumes,
    exercised via grads) must match the sequential single-chain kernel."""
    b, sq, skv, hq, hkv, d = 2, 256, 256, 4, 2, 64
    q, k, v = _mk(b, sq, skv, hq, hkv, d, seed=11)
    mask = None
    if masked:
        m = np.ones((b, skv), dtype=bool)
        m[:, -37:] = False
        mask = jnp.asarray(m)

    def loss(q_, k_, v_):
        o = flash_attention_gqa(q_, k_, v_, mask=mask, causal=causal)
        return (o * jnp.cos(o)).sum()

    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("KDSS_FLASH_ILP", "0")
        o_base = flash_attention_gqa(q, k, v, mask=mask, causal=causal)
        g_base = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        monkeypatch.setenv("KDSS_FLASH_ILP", "1")
        # Guard against a vacuous base-vs-base pass: the block picker must
        # still choose an ILP-eligible bk for this skv, or the env var
        # silently dispatches the default kernel.
        from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops import (
            flash_attention as fa,
        )

        assert fa._gqa_fwd_ilp_enabled(fa._pick_block_big(skv, fa._GQA_BK))
        o_ilp = flash_attention_gqa(q, k, v, mask=mask, causal=causal)
        g_ilp = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(
        np.asarray(o_ilp), np.asarray(o_base), atol=5e-5, rtol=5e-5)
    for a, b_ in zip(g_base, g_ilp):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=5e-4, rtol=5e-4)


def test_gqa_ilp_gate_warns_on_fallback(monkeypatch):
    """KDSS_FLASH_ILP=1 with an ineligible block size must warn (once)
    rather than silently benchmarking the default kernel."""
    import warnings

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops import (
        flash_attention as fa,
    )

    monkeypatch.setenv("KDSS_FLASH_ILP", "1")
    monkeypatch.setattr(fa, "_ILP_GATE_WARNED", False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert not fa._gqa_fwd_ilp_enabled(384)
        assert not fa._gqa_fwd_ilp_enabled(128)  # one-time: no second warn
    assert len(w) == 1 and "KDSS_FLASH_ILP" in str(w[0].message)
    assert fa._gqa_fwd_ilp_enabled(256)


# ---------------------------------------------------------------------------
# Streaming-bound fwd kernels (KDSS_FLASH_STREAM=1): exp's argument is the
# wrapper-computed Cauchy-Schwarz row bound, constant across kv blocks, so
# the kernel has no cross-lane reduce in exp's path and pure-+= accumulators
# (see the r4 phase-accounting section of docs/PERF_NOTES.md).  Exact math:
# the e^-m factor cancels in acc/l and lse = m + log(l) is the same value.
# ---------------------------------------------------------------------------


STREAM_CASES = [
    # (b, sq, hq, hkv, d, causal, masked)
    (1, 256, 4, 4, 64, True, False),    # base (MHA) path
    (2, 256, 4, 2, 64, True, True),     # GQA packed-pair + causal + mask
    (1, 256, 6, 2, 72, False, False),   # GQA, padded d
    (1, 200, 4, 4, 72, False, True),    # base path, seq+lane padding
]


@pytest.mark.parametrize("mode", ["max", "bound"])
@pytest.mark.parametrize("b,sq,hq,hkv,d,causal,masked", STREAM_CASES)
def test_stream_matches_default(monkeypatch, mode, b, sq, hq, hkv, d,
                                causal, masked):
    q, k, v = _mk(b, sq, sq, hq, hkv, d, seed=11)
    mask = None
    if masked:
        m = np.ones((b, sq), dtype=bool)
        m[:, sq - 37:] = False
        mask = jnp.asarray(m)

    def loss(q_, k_, v_):
        o = flash_attention(q_, k_, v_, mask=mask, causal=causal)
        return (o * jnp.cos(o)).sum()

    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("KDSS_FLASH_STREAM", "0")
        o_ref = flash_attention(q, k, v, mask=mask, causal=causal)
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        monkeypatch.setenv("KDSS_FLASH_STREAM", mode)
        o_st = flash_attention(q, k, v, mask=mask, causal=causal)
        g_st = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(o_st), np.asarray(o_ref),
                               atol=5e-5, rtol=5e-5)
    for a, b_ in zip(g_ref, g_st):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("mode", ["max", "bound"])
def test_stream_fully_masked_rows_zero(monkeypatch, mode):
    """Rows whose kv mask blanks every column return 0 under every kernel
    (the l == 0 finalize guard; mode="max" exercises the mh==MASK_VALUE
    where pass, mode="bound" the natural underflow)."""
    b, sq, hq, hkv, d = 1, 256, 4, 2, 64
    q, k, v = _mk(b, sq, sq, hq, hkv, d, seed=5)
    mask = jnp.zeros((b, sq), dtype=bool)  # nothing to attend
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("KDSS_FLASH_STREAM", mode)
        o_st = flash_attention(q, k, v, mask=mask, causal=False)
    assert not np.any(np.asarray(o_st))


def test_stream_large_scale_exact_max_holds_bound_degrades(monkeypatch):
    """4x-magnitude random inputs: the Cauchy-Schwarz bound overshoots the
    true max by ~130 (random vectors are near-orthogonal), beyond the f32
    exp range — mode="bound" rows degrade to NaN (PINNED: the documented
    LOUD failure — never a silent finite answer), while mode="max" (exact
    row max) stays at parity."""
    b, sq, hq, hkv, d = 1, 256, 4, 2, 64
    q, k, v = _mk(b, sq, sq, hq, hkv, d, seed=7)
    q, k = q * 4.0, k * 4.0
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("KDSS_FLASH_STREAM", "0")
        o_ref = flash_attention(q, k, v, causal=True)
        monkeypatch.setenv("KDSS_FLASH_STREAM", "max")
        o_max = flash_attention(q, k, v, causal=True)
        monkeypatch.setenv("KDSS_FLASH_STREAM", "bound")
        o_bnd = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(o_max), np.asarray(o_ref),
                               atol=5e-5, rtol=5e-5)
    o_bnd = np.asarray(o_bnd)
    nan_rows = np.isnan(o_bnd).all(axis=-1)
    assert nan_rows.mean() > 0.9   # the degrade is loud-NaN
    # surviving rows are EXACT, not garbage
    ok = ~nan_rows
    np.testing.assert_allclose(o_bnd[ok], np.asarray(o_ref)[ok],
                               atol=5e-5, rtol=5e-5)


def test_stream_beyond_envelope_rows_degrade_to_nan(monkeypatch):
    """PINS mode="bound"'s documented failure mode: rows whose every score
    sits >~127 below the row's C-S bound (here |q||k|*scale ~ 11k with
    q ⟂ k, true scores 0) underflow l to 0 and are POISONED to NaN —
    loud, never a silently-wrong finite answer.  mode="max" is exact on
    the same input."""
    b, sq, hq, hkv, d = 1, 256, 2, 2, 64
    q = np.zeros((b, sq, hq, d), dtype=np.float32)
    k = np.zeros((b, sq, hkv, d), dtype=np.float32)
    v = np.random.default_rng(0).normal(size=(b, sq, hkv, d)).astype(
        np.float32)
    q[..., 0] = 300.0   # all along e0
    k[..., 1] = 300.0   # all along e1 — orthogonal to every query
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("KDSS_FLASH_STREAM", "0")
        o_ref = flash_attention(q, k, v, causal=False)
        monkeypatch.setenv("KDSS_FLASH_STREAM", "max")
        o_max = flash_attention(q, k, v, causal=False)
        monkeypatch.setenv("KDSS_FLASH_STREAM", "bound")
        o_bnd = flash_attention(q, k, v, causal=False)
    assert np.any(np.asarray(o_ref))        # exact kernels: uniform softmax
    np.testing.assert_allclose(np.asarray(o_max), np.asarray(o_ref),
                               atol=5e-5, rtol=5e-5)
    assert np.all(np.isnan(np.asarray(o_bnd)))  # bound: loud degrade


def test_stream_bound_is_the_default_and_masked_rows_coexist(monkeypatch):
    """The r4 default flip, pinned end-to-end: with KDSS_FLASH_STREAM
    unset the sbound kernel is dispatched, fully-masked rows return
    exact 0 (all-kernels convention) while valid-but-underflowed rows in
    the SAME call are NaN-poisoned — the vc row-validity tracking
    distinguishes the two."""
    import knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.flash_attention as fa

    monkeypatch.delenv("KDSS_FLASH_STREAM", raising=False)
    assert fa._stream_mode() == "bound"

    b, sq, hq, hkv, d = 1, 256, 4, 2, 64  # grouped -> the GQA sbound path
    q = np.zeros((b, sq, hq, d), dtype=np.float32)
    k = np.zeros((b, sq, hkv, d), dtype=np.float32)
    v = np.random.default_rng(1).normal(size=(b, sq, hkv, d)).astype(
        np.float32)
    q[..., 0] = 300.0   # orthogonal to every key -> underflow vs the bound
    k[..., 1] = 300.0
    mask = np.ones((b, sq), dtype=bool)
    mask[:, 128:] = False  # columns gone; rows stay valid (non-causal)
    q, k, v, mask = map(jnp.asarray, (q, k, v, mask))

    calls = []
    orig = fa._gqa_fwd_kernel_sbound

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "_gqa_fwd_kernel_sbound", spy)
    with pltpu.force_tpu_interpret_mode():
        # valid rows, underflowed scores -> NaN
        o_under = flash_attention(q, k, v, mask=mask, causal=False)
        # no attendable column at all -> exact 0
        o_dead = flash_attention(
            q, k, v, mask=jnp.zeros((b, sq), dtype=bool), causal=False)
    assert calls, "default dispatch must hit the sbound kernel"
    assert np.all(np.isnan(np.asarray(o_under)))
    assert not np.any(np.asarray(o_dead))

    # training path (with_lse): the WRAPPER poison (lse + row validity)
    # must fire the same way — NaN loss, never a silent finite answer
    def loss(q_):
        return flash_attention(q_, k, v, mask=mask, causal=False).sum()

    with pltpu.force_tpu_interpret_mode():
        val = jax.value_and_grad(loss)(q)[0]
    assert np.isnan(float(val))


# ---------------------------------------------------------------------------
# r5 advisor regressions: bound-mode dead rows in the BACKWARD, and the
# near-underflow gray band in the forward.
# ---------------------------------------------------------------------------


def _aligned_qkv(b, sq, skv, hq, hkv, d, a, seed=3):
    """q/k rows all along e0 with magnitude ``a``: every real score is
    exactly scale*a^2 (== the Cauchy-Schwarz bound, tight), so the bound
    kernel is exact on real rows while the head scalar c = scale*a^2 - 40
    is large enough that ZERO rows (q padding) underflow dead."""
    rng = np.random.default_rng(seed)
    q = np.zeros((b, sq, hq, d), dtype=np.float32)
    k = np.zeros((b, skv, hkv, d), dtype=np.float32)
    q[..., 0] = a
    k[..., 0] = a
    v = rng.normal(size=(b, skv, hkv, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("sq,skv,hq,hkv", [
    (200, 256, 2, 2),   # base path, kv aligned -> in-kernel "dead" poison
    (200, 200, 2, 2),   # base path, kv padded -> auto mask, wrapper poison
    (200, 200, 4, 2),   # GQA packed-pair path, wrapper poison
])
def test_bound_padded_q_rows_keep_grads_finite(monkeypatch, sq, skv, hq, hkv):
    """ADVICE r4 (high): zero-padded q rows (sq not block-aligned) underflow
    dead whenever the head scalar c > ~69, carrying lse == MASK_VALUE and a
    NaN-poisoned residual into the backward.  Before the r5 wrapper fix
    (_neutralize_dead_rows) the clean-block p = exp(s - MASK_VALUE) = inf
    and delta = 0 * NaN made dk/dv NaN for ALL tokens while the sliced loss
    stayed finite — silent gradient corruption on fully in-envelope data.
    Pins: bound-mode grads finite AND equal to the exact kernel's."""
    d = 64
    # scale*a^2 = 220 -> c = 180 >> 69: zero rows are far past the poison
    # threshold; real rows sit exactly AT the bound (gap 0), fully exact.
    q, k, v = _aligned_qkv(1, sq, skv, hq, hkv, d, a=np.sqrt(220.0 * 8))

    def loss(q_, k_, v_):
        o = flash_attention(q_, k_, v_, causal=False)
        return (o * jnp.sin(o)).sum()

    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("KDSS_FLASH_STREAM", "0")
        l_ref = loss(q, k, v)
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        monkeypatch.setenv("KDSS_FLASH_STREAM", "bound")
        l_bnd = loss(q, k, v)
        g_bnd = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert np.isfinite(float(l_bnd))
    np.testing.assert_allclose(float(l_bnd), float(l_ref), rtol=1e-5)
    for name, a_, b_ in zip("qkv", g_ref, g_bnd):
        b_ = np.asarray(b_)
        assert np.all(np.isfinite(b_)), f"d{name} contains non-finite values"
        np.testing.assert_allclose(b_, np.asarray(a_), atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name}")


def test_bound_gray_band_rows_poison_not_silent(monkeypatch):
    """ADVICE r4 (medium): rows whose best score sits ~69-104 nats below c
    used to evade the l == 0 poison (f32 l stays > 0 while p flushes out of
    the accumulator on hardware) and return a silently degraded finite
    output.  The r5 threshold l < _SBOUND_DEAD_L poisons them.  Three row
    populations in one call: hot rows exact, mildly-cold rows (gap 60)
    exact, gray-band rows (gap 80) NaN."""
    b, s, h, d = 1, 256, 2, 64
    scale = d ** -0.5
    a = float(np.sqrt(220.0 / scale))     # scale*a^2 = 220, c = 180
    q = np.zeros((b, s, h, d), dtype=np.float32)
    k = np.zeros((b, s, h, d), dtype=np.float32)
    k[..., 0] = a
    q[..., 0] = a                          # hot rows: score 220 == c + 40
    q[:, 10, :, 0] = a * (120.0 / 220.0)   # cold row: score 120, gap -60
    q[:, 20, :, 0] = a * (100.0 / 220.0)   # gray row: score 100, gap -80
    v = np.random.default_rng(9).normal(size=(b, s, h, d)).astype(np.float32)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)

    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("KDSS_FLASH_STREAM", "0")
        o_ref = np.asarray(flash_attention(q, k, v, causal=False))
        monkeypatch.setenv("KDSS_FLASH_STREAM", "bound")
        o_bnd = np.asarray(flash_attention(q, k, v, causal=False))

    # gray-band row: loud NaN (interpret mode preserves the subnormal l>0
    # that used to evade the poison — the threshold must catch it anyway)
    assert np.all(np.isnan(o_bnd[:, 20])), "gray-band row must poison"
    # every other row (hot + mildly cold): exact
    keep = np.ones(s, dtype=bool)
    keep[20] = False
    np.testing.assert_allclose(o_bnd[:, keep], o_ref[:, keep],
                               atol=5e-5, rtol=5e-5)


def test_sbound_fwd_poison_lse_matches_vc(monkeypatch):
    """KDSS_SBOUND_FWD_POISON=lse (r5 A/B knob): the lse-emit wrapper
    poison must behave identically to the in-kernel vc tracking on
    fwd-only masked calls — same exact values on live rows, same NaN on
    valid-but-underflowed rows, same exact-0 on fully-masked rows."""
    b, sq, hq, hkv, d = 1, 256, 4, 2, 64
    monkeypatch.setenv("KDSS_FLASH_STREAM", "bound")

    # healthy magnitudes: all rows live
    q, k, v = _mk(b, sq, sq, hq, hkv, d, seed=2)
    mask = np.ones((b, sq), dtype=bool)
    mask[:, 200:] = False
    mask_j = jnp.asarray(mask)
    outs = {}
    for pmode in ("vc", "lse"):
        monkeypatch.setenv("KDSS_SBOUND_FWD_POISON", pmode)
        with pltpu.force_tpu_interpret_mode():
            outs[pmode] = np.asarray(
                flash_attention(q, k, v, mask=mask_j, causal=False))
    np.testing.assert_allclose(outs["lse"], outs["vc"], atol=1e-6)

    # underflow + fully-masked coexistence (the vc test's scenario)
    qz = np.zeros((b, sq, hq, d), dtype=np.float32)
    kz = np.zeros((b, sq, hkv, d), dtype=np.float32)
    qz[..., 0] = 300.0
    kz[..., 1] = 300.0
    qz, kz = jnp.asarray(qz), jnp.asarray(kz)
    monkeypatch.setenv("KDSS_SBOUND_FWD_POISON", "lse")
    with pltpu.force_tpu_interpret_mode():
        o_under = np.asarray(
            flash_attention(qz, kz, v, mask=mask_j, causal=False))
        o_dead = np.asarray(flash_attention(
            qz, kz, v, mask=jnp.zeros((b, sq), dtype=bool), causal=False))
    assert np.all(np.isnan(o_under[:, :200]))  # valid rows underflow loud
    assert not np.any(o_dead)                  # fully-masked stay exact 0
