"""Fused (vocab-streaming) cross-entropy vs the reference masked CE —
values and gradients, interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_ce import (

    fused_ce_loss,
)

pytestmark = pytest.mark.slow


def _ref_ce(hidden, w, labels):
    logits = (hidden @ w).astype(jnp.float32)
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    nll = (logz - gold) * valid
    return nll.sum() / jnp.maximum(valid.sum(), 1)


@pytest.mark.parametrize("n,d,v", [(64, 128, 300), (100, 96, 700)])
def test_fused_ce_value_and_grads(n, d, v):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, v)).astype(np.float32) * 0.05)
    labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    labels[:5] = -100
    labels = jnp.asarray(labels)

    with pltpu.force_tpu_interpret_mode():
        got = fused_ce_loss(h, w, labels)
        g_h, g_w = jax.grad(
            lambda h_, w_: fused_ce_loss(h_, w_, labels), argnums=(0, 1)
        )(h, w)

    want = _ref_ce(h, w, labels)
    r_h, r_w = jax.grad(
        lambda h_, w_: _ref_ce(h_, w_, labels), argnums=(0, 1)
    )(h, w)

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(r_h),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(r_w),
                               atol=1e-5, rtol=1e-4)


def test_fused_ce_vd_layout_matches_dv():
    """[V, D] head (tied embedding natively) == transposed dv path."""
    n, d, v = 64, 128, 300
    rng = np.random.default_rng(4)
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, v)).astype(np.float32) * 0.05)
    labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    labels[:5] = -100
    labels = jnp.asarray(labels)

    with pltpu.force_tpu_interpret_mode():
        want, (rh, rw) = jax.value_and_grad(
            lambda h_, w_: fused_ce_loss(h_, w_, labels), argnums=(0, 1)
        )(h, w)
        got, (gh, gwvd) = jax.value_and_grad(
            lambda h_, w_: fused_ce_loss(h_, w_, labels, w_layout="vd"),
            argnums=(0, 1),
        )(h, w.T)

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(rh),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gwvd), np.asarray(rw).T,
                               atol=1e-5, rtol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware OOB-block semantics only exist on TPU")
def test_fused_ce_partial_edge_block_on_hardware():
    """The unpadded-vocab ceil-div grids rely on Pallas TPU edge blocks
    returning readable garbage on OOB reads and dropping OOB writes; the
    kernels sanitize via the in_vocab masks.  Interpret mode cannot
    reproduce hardware garbage (e.g. NaN bit patterns), so this smoke test
    pins the behavior on the real chip: V = BV*k + 1 forces a 1-column
    partial edge block and loss/grads must come back finite (ADVICE r2 #2).
    """
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_ce import (
        BV,
    )

    n, d = 256, 128
    v = BV * 2 + 1  # partial edge block of a single real column
    rng = np.random.default_rng(7)
    hidden = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, v)).astype(np.float32) * 0.05)
    labels = np.asarray(rng.integers(0, v, size=(n,)), np.int32)
    labels[5] = v - 1  # gold inside the partial block
    labels[:3] = -100
    labels = jnp.asarray(labels)

    loss, (gh, gw) = jax.value_and_grad(
        lambda h, w_: fused_ce_loss(h, w_, labels), argnums=(0, 1)
    )(hidden, w)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(gh)).all()
    assert np.isfinite(np.asarray(gw)).all()
    np.testing.assert_allclose(
        float(loss), float(_ref_ce(hidden, w, labels)), rtol=5e-3)
