"""Fused (vocab-streaming) LoCa KL vs the reference-path loca_loss —
values and student-side gradients, interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.losses.kd_losses import (
    loca_loss,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_loca import (

    fused_loca_loss,
)

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("n,ds,dt,v,vt,temp,alpha", [
    (64, 128, 256, 300, 340, 1.0, 0.8),
    (50, 96, 96, 513, 513, 0.8, 0.8),
])
def test_fused_loca_value_and_grads(n, ds, dt, v, vt, temp, alpha):
    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(ds, v)).astype(np.float32) * 0.05)
    wt = jnp.asarray(rng.normal(size=(dt, vt)).astype(np.float32) * 0.05)
    labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    labels[:7] = -100  # ignore rows keep the raw teacher distribution
    labels = jnp.asarray(labels)

    def ref(hs_, ws_):
        s_logits = (hs_ @ ws_)[None]
        t_logits = (ht @ wt)[None]
        return loca_loss(t_logits, s_logits, labels[None],
                         temperature=temp, alpha=alpha,
                         faithful_indexing=False)

    def fused(hs_, ws_):
        return fused_loca_loss(hs_, ws_, ht, wt, labels,
                               temperature=temp, alpha=alpha)

    with pltpu.force_tpu_interpret_mode():
        got = fused(hs, ws)
        g_h, g_w = jax.grad(fused, argnums=(0, 1))(hs, ws)

    want = ref(hs, ws)
    r_h, r_w = jax.grad(ref, argnums=(0, 1))(hs, ws)

    np.testing.assert_allclose(float(got), float(want), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(r_h),
                               atol=2e-6, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(r_w),
                               atol=2e-6, rtol=2e-4)


def test_fused_loca_duplicate_teacher_max():
    """Exact duplicate max inside one vocab block: torch.topk(2) semantics
    say p_2nd == p_max, so the calibration scale must use b2 = b1.  The
    pre-r3 kernels masked ALL occurrences of the block max before taking
    the second max, under-reporting p_2nd (ADVICE r2 #1)."""
    n, ds, dt, v = 16, 64, 64, 300
    rng = np.random.default_rng(3)
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(ds, v)).astype(np.float32) * 0.05)
    wt = np.asarray(rng.normal(size=(dt, v)).astype(np.float32) * 0.05)
    # columns 5 and 7 identical and dominant -> every row's teacher top-2
    # is an exact tie inside the first vocab block
    wt[:, 5] = np.abs(wt[:, 5]) + 0.5
    wt[:, 7] = wt[:, 5]
    ht = jnp.abs(ht)  # keep the tied columns on top for every row
    wt = jnp.asarray(wt)
    labels = jnp.asarray(rng.integers(0, v, size=(n,)).astype(np.int32))

    want = loca_loss((ht @ wt)[None], (hs @ ws)[None], labels[None],
                     temperature=1.0, alpha=0.8, faithful_indexing=False)
    with pltpu.force_tpu_interpret_mode():
        got = fused_loca_loss(hs, ws, ht, wt, labels,
                              temperature=1.0, alpha=0.8)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4, atol=1e-7)
