"""Chunked (never-materialized) KD losses must equal the full-tensor
reference implementations in losses/kd_losses.py."""

import numpy as np
import jax.numpy as jnp

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.losses import (
    kd_kl_loss,
    loca_loss,
    masked_cross_entropy,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.losses.chunked import (
    chunked_kd_terms,
)

B, S, DS, DT, VS, VT = 2, 13, 8, 12, 37, 41


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    sh = rng.normal(size=(B, S, DS)).astype(np.float32)
    th = rng.normal(size=(B, S, DT)).astype(np.float32)
    ws = rng.normal(size=(DS, VS)).astype(np.float32)
    wt = rng.normal(size=(DT, VT)).astype(np.float32)
    labels = rng.integers(0, VS, size=(B, S)).astype(np.int32)
    labels[0, :3] = -100
    labels[1, -2:] = -100
    return map(jnp.asarray, (sh, th, ws, wt, labels))


def test_chunked_matches_full_tensors():
    sh, th, ws, wt, labels = _setup()
    s_logits = sh @ ws
    t_logits = th @ wt

    for chunk in (4, 5, 13, 32):  # non-divisible sizes exercise padding
        terms = chunked_kd_terms(
            sh, ws, labels,
            teacher_hidden=th, teacher_head=wt,
            temperature=0.8, loca_alpha=0.8, chunk_size=chunk,
            need_ce=True, need_kl=True, need_loca=True,
        )
        np.testing.assert_allclose(
            terms["ce"], masked_cross_entropy(s_logits, labels),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            terms["kl"], kd_kl_loss(s_logits, t_logits, 0.8),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            terms["loca"],
            loca_loss(t_logits, s_logits, labels, temperature=0.8, alpha=0.8,
                      faithful_indexing=False),
            rtol=1e-5, atol=1e-6,
        )


def test_chunked_grads_flow():
    import jax

    sh, th, ws, wt, labels = _setup(1)

    def loss(sh_, ws_):
        t = chunked_kd_terms(
            sh_, ws_, labels, teacher_hidden=th, teacher_head=wt,
            temperature=1.0, chunk_size=4,
            need_ce=True, need_kl=True, need_loca=True,
        )
        return t["ce"] + t["kl"] + t["loca"]

    g_sh, g_ws = jax.grad(loss, argnums=(0, 1))(sh, ws)
    assert np.isfinite(np.asarray(g_sh)).all()
    assert np.isfinite(np.asarray(g_ws)).all()
    assert np.abs(np.asarray(g_ws)).max() > 0

    # Matches grads of the unchunked composition.
    def loss_full(sh_, ws_):
        s_logits = sh_ @ ws_
        t_logits = th @ wt
        return (
            masked_cross_entropy(s_logits, labels)
            + kd_kl_loss(s_logits, t_logits, 1.0)
            + loca_loss(t_logits, s_logits, labels, temperature=1.0)
        )

    f_sh, f_ws = jax.grad(loss_full, argnums=(0, 1))(sh, ws)
    np.testing.assert_allclose(g_sh, f_sh, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(g_ws, f_ws, rtol=2e-4, atol=2e-5)


def test_chunked_faithful_loca_matches_materialized():
    """VERDICT r4 #4: the faithful fancy-indexing LoCa, seq-chunked — must
    equal kd_losses.loca_loss(faithful_indexing=True) on materialized
    logits exactly (incl. the write-order and ignore-label-writes-column-0
    quirks), for chunk sizes that split the last-occurrence scatter across
    chunk boundaries, and for value AND student gradients."""
    import jax
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.losses.chunked import (
        chunked_faithful_loca,
    )

    for seed in (0, 3):
        sh, th, ws, wt, labels = _setup(seed)
        t_logits = th @ wt

        def full(sh_, ws_):
            return loca_loss(
                t_logits, sh_ @ ws_, labels,
                temperature=0.8, alpha=0.8, faithful_indexing=True)

        want, (gsh_w, gws_w) = jax.value_and_grad(full, argnums=(0, 1))(
            sh, ws)

        for chunk in (4, 5, 13, 32):
            def chunked(sh_, ws_):
                return chunked_faithful_loca(
                    sh_, ws_, labels, th, wt,
                    temperature=0.8, alpha=0.8, chunk_size=chunk)

            got, (gsh, gws) = jax.value_and_grad(
                chunked, argnums=(0, 1))(sh, ws)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(gsh, gsh_w, rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(gws, gws_w, rtol=1e-4, atol=1e-6)


def test_chunked_faithful_loca_all_ignore_labels():
    """The no-valid-label special case (lbl writes suppressed entirely)
    must survive chunking too."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.losses.chunked import (
        chunked_faithful_loca,
    )

    sh, th, ws, wt, labels = _setup(1)
    labels = jnp.full_like(labels, -100)
    t_logits = th @ wt
    want = loca_loss(t_logits, sh @ ws, labels, temperature=0.8, alpha=0.8,
                     faithful_indexing=True)
    got = chunked_faithful_loca(sh, ws, labels, th, wt,
                                temperature=0.8, alpha=0.8, chunk_size=5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_chunked_faithful_loca_int8_tuple_head():
    """The int8 (kernel_q, kernel_scale) teacher head streams through the
    chunked faithful path without a dense [Dt, Vt] temp — both storage
    orientations must match the dense dequantized head exactly."""
    import jax
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.losses.chunked import (
        chunked_faithful_loca,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
        absmax_quantize_weight,
    )

    sh, th, ws, wt, labels = _setup(2)
    wq, wsc = absmax_quantize_weight(wt)
    wt_dense = wq.astype(jnp.float32) * wsc[None, :]

    def run(head):
        def f(sh_, ws_):
            return chunked_faithful_loca(
                sh_, ws_, labels, th, head,
                temperature=0.8, alpha=0.8, chunk_size=5)
        return jax.value_and_grad(f, argnums=(0, 1))(sh, ws)

    want, (gsh_w, gws_w) = run(wt_dense)
    for head in ((wq, wsc), (wq.T, wsc)):       # legacy dv / r5 vd
        got, (gsh, gws) = run(head)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(gsh, gsh_w, rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(gws, gws_w, rtol=1e-4, atol=1e-7)
