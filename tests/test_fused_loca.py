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
