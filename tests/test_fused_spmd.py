"""Mesh-sharded fused losses (ops/fused_spmd.py) vs the reference loss
math, on the 8-device virtual CPU mesh.

Two layers of coverage:

* direct: each *_loss_spmd wrapper (xla local impl — interpret-mode
  Pallas hangs inside shard_map on CPU) matches the single-device
  reference loss in value AND gradients, including d/dW of the
  replicated heads (the shard_map transpose inserts the psum);
* end-to-end: the phase-3 KD train step with ``ce_impl="fused"`` on a
  (1,2,4) mesh matches the chunked single-device step — exactly the
  program multi-chip phases 2/3 execute (VERDICT r1 weak #4).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
    TrainConfig,
    llava_onevision_tiny,
    llava_onevision_tiny_teacher,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.losses.kd_losses import (
    kd_kl_loss,
    loca_loss,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models import (
    LlavaOnevision,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_spmd import (
    fused_ce_loss_spmd,
    fused_kl_loss_spmd,
    fused_loca_loss_spmd,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.parallel import (
    MeshConfig,
    make_mesh,
    shard_params,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.parallel.sharding import (
    shard_batch,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.train import (
    KDModels,
    make_train_step,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.utils.synthetic import (
    synthetic_kd_batch,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(jax.device_count() < 8,
                       reason="needs 8 virtual devices"),
]

N, DS, DT, V, VT = 24, 16, 24, 40, 48


def _data(seed=0):
    rng = np.random.default_rng(seed)
    hs = jnp.asarray(rng.normal(size=(N, DS)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(N, DT)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(DS, V)).astype(np.float32) * 0.05)
    wt = jnp.asarray(rng.normal(size=(DT, VT)).astype(np.float32) * 0.05)
    labels = rng.integers(0, V, size=(N,)).astype(np.int32)
    labels[:5] = -100
    return hs, ht, ws, wt, jnp.asarray(labels)


def _check(fn_spmd, fn_ref, args_spmd, args_ref, mesh):
    with jax.set_mesh(mesh):
        got = jax.jit(fn_spmd)(*args_spmd)
        g = jax.jit(jax.grad(fn_spmd, argnums=(0, 1)))(*args_spmd)
    want = fn_ref(*args_ref)
    r = jax.grad(fn_ref, argnums=(0, 1))(*args_ref)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-7)
    for a, b in zip(g, r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-4
        )


def test_fused_ce_spmd_matches_reference():
    hs, _, ws, _, labels = _data()
    mesh = make_mesh(MeshConfig(2, 2, 2))  # rows 24 % (data*fsdp=4) == 0

    def spmd(h, w):
        return fused_ce_loss_spmd(h, w, labels, local_impl="xla")

    def ref(h, w):
        # independent formulation (the fused path consumes pre-shifted
        # labels; single-device parity vs masked_cross_entropy is covered
        # by tests/test_fused_ce.py)
        logits = h @ w
        valid = labels != -100
        nll = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.where(valid, labels, 0)
        )
        return (nll * valid).sum() / valid.sum()

    _check(spmd, ref, (hs, ws), (hs, ws), mesh)


def test_fused_kl_spmd_matches_reference():
    hs, ht, ws, wt, _ = _data(1)
    mesh = make_mesh(MeshConfig(2, 2, 2))

    def spmd(h, w):
        return fused_kl_loss_spmd(h, w, ht, wt, temperature=0.8,
                                  local_impl="xla")

    def ref(h, w):
        return kd_kl_loss((h @ w)[None], (ht @ wt)[None], 0.8)

    _check(spmd, ref, (hs, ws), (hs, ws), mesh)


def test_fused_loca_spmd_matches_reference():
    hs, ht, ws, wt, labels = _data(2)
    mesh = make_mesh(MeshConfig(1, 2, 4))  # fsdp-only row sharding

    def spmd(h, w):
        return fused_loca_loss_spmd(h, w, ht, wt, labels, temperature=0.8,
                                    alpha=0.8, local_impl="xla")

    def ref(h, w):
        return loca_loss((ht @ wt)[None], (h @ w)[None], labels[None],
                         temperature=0.8, alpha=0.8)

    _check(spmd, ref, (hs, ws), (hs, ws), mesh)


def test_fused_loca_ce_spmd_matches_reference():
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_spmd import (
        fused_loca_ce_loss_spmd,
    )

    hs, ht, ws, wt, labels = _data(3)
    rng = np.random.default_rng(7)
    ce_labels = rng.integers(0, V, size=(N,)).astype(np.int32)
    ce_labels[-6:] = -100
    ce_labels = jnp.asarray(ce_labels)
    mesh = make_mesh(MeshConfig(2, 2, 2))

    def spmd(h, w):
        loca, ce = fused_loca_ce_loss_spmd(
            h, w, ht, wt, labels, ce_labels, temperature=0.8, alpha=0.8,
            local_impl="xla",
        )
        return 0.8 * loca + ce

    def ref(h, w):
        loca = loca_loss((ht @ wt)[None], (h @ w)[None], labels[None],
                         temperature=0.8, alpha=0.8)
        logits = h @ w
        valid = ce_labels != -100
        nll = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.where(valid, ce_labels, 0)
        )
        return 0.8 * loca + (nll * valid).sum() / valid.sum()

    _check(spmd, ref, (hs, ws), (hs, ws), mesh)


def test_sharded_baseline_fused_step_matches_chunked_single_device():
    """Baseline (CE-only) step with ce_impl=fused under a mesh — the tied
    student head rides the [V, D] vd layout (no transpose copy)."""
    scfg = llava_onevision_tiny()
    student = LlavaOnevision(scfg)
    batch = synthetic_kd_batch(scfg, batch_size=2, seq_len=96, accum=1, seed=9)
    batch = jax.tree.map(jnp.asarray, batch)
    micro = jax.tree.map(lambda x: x[0], batch)
    sparams = student.init(
        jax.random.PRNGKey(0),
        input_ids=micro["student_input_ids"],
        attention_mask=micro["student_attention_mask"],
        pixel_values=micro["student_pixel_values"],
        pack_idx=micro["pack_idx"],
        pack_weight=micro["pack_weight"],
        pack_valid=micro["pack_valid"],
        tile_valid=micro["tile_valid"],
    )["params"]
    assert scfg.text.tie_word_embeddings  # the vd path is what's under test
    models = KDModels(student, None)
    tx = optax.adamw(1e-3)

    ref_cfg = TrainConfig(kd_mode="baseline", loss_chunk_size=32,
                          ce_impl="chunked")
    state0 = TrainState.create(apply_fn=None, params=sparams, tx=tx)
    _, ref_metrics = jax.jit(make_train_step(models, ref_cfg))(
        state0, None, batch
    )

    fused_cfg = TrainConfig(kd_mode="baseline", loss_chunk_size=32,
                            ce_impl="fused", fused_local_impl="xla")
    mesh = make_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
    with jax.set_mesh(mesh):
        sp = shard_params(sparams, mesh)
        sb = shard_batch(batch, mesh)
        state1 = TrainState.create(apply_fn=None, params=sp, tx=tx)
        _, metrics = jax.jit(make_train_step(models, fused_cfg))(
            state1, None, sb
        )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )


def test_sharded_kd_fused_step_matches_chunked_single_device():
    """Phase-3 KD step, ce_impl=fused, under the (1,2,4) mesh == the
    chunked single-device step (the multi-chip phases 2/3 program)."""
    scfg = llava_onevision_tiny()
    tcfg = llava_onevision_tiny_teacher()
    student, teacher = LlavaOnevision(scfg), LlavaOnevision(tcfg)

    batch = synthetic_kd_batch(scfg, batch_size=2, seq_len=96, accum=2, seed=7)
    batch = jax.tree.map(jnp.asarray, batch)
    micro = jax.tree.map(lambda x: x[0], batch)

    def init_params(model, key, prefix):
        return model.init(
            jax.random.PRNGKey(key),
            input_ids=micro[f"{prefix}_input_ids"],
            attention_mask=micro[f"{prefix}_attention_mask"],
            pixel_values=micro[f"{prefix}_pixel_values"],
            pack_idx=micro["pack_idx"],
            pack_weight=micro["pack_weight"],
            pack_valid=micro["pack_valid"],
            tile_valid=micro["tile_valid"],
        )["params"]

    sparams = init_params(student, 0, "student")
    tparams = init_params(teacher, 1, "teacher")
    models = KDModels(student, teacher)
    tx = optax.adamw(1e-3)

    ref_cfg = TrainConfig(
        kd_mode="double_trouble", phase=3, loss_chunk_size=32,
        learning_rate=1e-3, ce_impl="chunked",
    )
    state0 = TrainState.create(apply_fn=None, params=sparams, tx=tx)
    ref_state, ref_metrics = jax.jit(make_train_step(models, ref_cfg))(
        state0, tparams, batch
    )

    fused_cfg = TrainConfig(
        kd_mode="double_trouble", phase=3, loss_chunk_size=32,
        learning_rate=1e-3, ce_impl="fused", fused_local_impl="xla",
    )
    mesh = make_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
    with jax.set_mesh(mesh):
        sp = shard_params(sparams, mesh)
        tp = shard_params(tparams, mesh)
        sb = shard_batch(batch, mesh)
        state1 = TrainState.create(apply_fn=None, params=sp, tx=tx)
        new_state, metrics = jax.jit(make_train_step(models, fused_cfg))(
            state1, tp, sb
        )

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(metrics["loca"]), float(ref_metrics["loca"]), rtol=2e-4
    )
    a = np.asarray(ref_state.params["language_model"]["norm"]["weight"])
    b = np.asarray(new_state.params["language_model"]["norm"]["weight"])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_no_mesh_dispatch_uses_materialized_teacher(monkeypatch):
    """Without an active mesh the spmd wrappers must dispatch to the
    single-device fused ops with teacher_logits="materialize" by default
    (KDSS_LOCA_TMAT), and honor KDSS_LOCA_TMAT=0."""
    import knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_spmd as fs

    seen = {}

    def fake_loca_ce(*a, **k):
        seen["loca_ce"] = k.get("teacher_logits")
        return jnp.zeros(()), jnp.zeros(())

    def fake_kl(*a, **k):
        seen["kl"] = k.get("teacher_logits")
        return jnp.zeros(())

    monkeypatch.setattr(fs, "fused_loca_ce_loss", fake_loca_ce)
    monkeypatch.setattr(fs, "fused_kl_loss", fake_kl)
    hs = jnp.zeros((8, 16)); ht = jnp.zeros((8, 16))
    ws = jnp.zeros((16, 32)); wt = jnp.zeros((16, 32))
    lab = jnp.zeros((8,), jnp.int32)

    monkeypatch.delenv("KDSS_LOCA_TMAT", raising=False)
    fs.fused_loca_ce_loss_spmd(hs, ws, ht, wt, lab, lab)
    fs.fused_kl_loss_spmd(hs, ws, ht, wt)
    assert seen == {"loca_ce": "materialize", "kl": "materialize"}

    monkeypatch.setenv("KDSS_LOCA_TMAT", "0")
    fs.fused_loca_ce_loss_spmd(hs, ws, ht, wt, lab, lab)
    fs.fused_kl_loss_spmd(hs, ws, ht, wt)
    assert seen == {"loca_ce": "recompute", "kl": "recompute"}


def test_mesh_dispatch_tmat_knob(monkeypatch):
    """Under a mesh the pallas arm defaults to teacher_logits="recompute"
    (per-shard buffers multiply per chip) and honors the opt-in
    KDSS_LOCA_TMAT_MESH=1 per-shard materialization (_mesh_tmode)."""
    import knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_spmd as fs

    seen = {}

    def fake_loca_ce_sums(*a, **k):
        seen["loca_ce"] = k.get("teacher_logits")
        return jnp.zeros(()), jnp.zeros(()), jnp.zeros(())

    def fake_kl_sum(*a, **k):
        seen["kl"] = k.get("teacher_logits")
        return jnp.zeros(())

    monkeypatch.setattr(fs, "fused_loca_ce_sums", fake_loca_ce_sums)
    monkeypatch.setattr(fs, "fused_kl_sum", fake_kl_sum)
    hs = jnp.zeros((8, 16)); ht = jnp.zeros((8, 16))
    ws = jnp.zeros((16, 32)); wt = jnp.zeros((16, 32))
    lab = jnp.zeros((8,), jnp.int32)

    mesh = make_mesh(MeshConfig(2, 2, 2))
    monkeypatch.delenv("KDSS_LOCA_TMAT_MESH", raising=False)
    with jax.set_mesh(mesh):
        fs.fused_loca_ce_loss_spmd(hs, ws, ht, wt, lab, lab,
                                   local_impl="pallas")
        fs.fused_kl_loss_spmd(hs, ws, ht, wt, local_impl="pallas")
    assert seen == {"loca_ce": "recompute", "kl": "recompute"}

    monkeypatch.setenv("KDSS_LOCA_TMAT_MESH", "1")
    with jax.set_mesh(mesh):
        fs.fused_loca_ce_loss_spmd(hs, ws, ht, wt, lab, lab,
                                   local_impl="pallas")
        fs.fused_kl_loss_spmd(hs, ws, ht, wt, local_impl="pallas")
    assert seen == {"loca_ce": "materialize", "kl": "materialize"}


def test_fused_spmd_int8_teacher_head_streams_through_mesh():
    """The int8 (kernel_q, kernel_scale) teacher head rides shard_map as
    two replicated operands (each chip holds only the int8 bytes — half
    the bf16 head) and the per-shard arm computes (h @ q) * scale; values
    and grads must equal the same wrapper fed the dense dequantized head
    (exact at f32: the per-column scale factors out of the dot)."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_spmd import (
        fused_loca_ce_loss_spmd,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
        absmax_quantize_weight,
    )

    hs, ht, ws, wt_f, labels = _data(11)
    rng = np.random.default_rng(13)
    ce_labels = rng.integers(0, V, size=(N,)).astype(np.int32)
    ce_labels[-6:] = -100
    ce_labels = jnp.asarray(ce_labels)
    wq, wsc = absmax_quantize_weight(wt_f)
    wt_dense = wq.astype(jnp.float32) * wsc[None, :]
    mesh = make_mesh(MeshConfig(2, 2, 2))

    def make(head):
        def f(h, w):
            loca, ce = fused_loca_ce_loss_spmd(
                h, w, ht, head, labels, ce_labels, temperature=0.8,
                alpha=0.8, local_impl="xla",
            )
            return 0.8 * loca + ce
        return f

    def make_kl(head):
        def f(h, w):
            return fused_kl_loss_spmd(h, w, ht, head, temperature=0.8,
                                      local_impl="xla")
        return f

    # both forms under the SAME mesh (a no-mesh reference would dispatch
    # to the single-device Pallas kernels, which can't run on CPU)
    for mk in (make, make_kl):
        with jax.set_mesh(mesh):
            got = jax.jit(mk((wq, wsc)))(hs, ws)
            want = jax.jit(mk(wt_dense))(hs, ws)
            g_q = jax.jit(jax.grad(mk((wq, wsc)), argnums=(0, 1)))(hs, ws)
            g_d = jax.jit(jax.grad(mk(wt_dense), argnums=(0, 1)))(hs, ws)
        np.testing.assert_allclose(float(got), float(want),
                                   rtol=1e-6, atol=1e-8)
        for a, b in zip(g_q, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, rtol=1e-5)


def test_bf16_tmat_row_chunked_matches_single_shot(monkeypatch):
    """KDSS_LOCA_TMAT=bf16 row-chunks the materialized teacher logits
    through a checkpointed scan (_tmat_row_chunk) — the 7B single-chip
    fit lever.  Chunked must equal single-shot (KDSS_LOCA_TMAT_CHUNK=0)
    to f32 sum association, for values and student grads, on both the
    loca_ce and kl wrappers.  KDSS_ROWCHUNK_REMAT=0 because interpret-
    mode pallas carries an IO effect that cannot live under remat."""
    import knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_spmd as fs
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    n, ds, dt, v = 128, 128, 256, 300
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws = jnp.asarray((rng.normal(size=(ds, v)) * 0.05).astype(np.float32)).T
    wt = jnp.asarray((rng.normal(size=(dt, 340)) * 0.05).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, v, size=(n,)).astype(np.int32))
    lab = lab.at[:5].set(-100)
    labce = jnp.asarray(rng.integers(0, v, size=(n,)).astype(np.int32))
    labce = labce.at[-7:].set(-100)

    monkeypatch.setenv("KDSS_ROWCHUNK_REMAT", "0")
    monkeypatch.setenv("KDSS_LOCA_TMAT", "bf16")

    def run(chunk):
        monkeypatch.setenv("KDSS_LOCA_TMAT_CHUNK", chunk)

        def f(hs_, ws_):
            loca, ce = fs.fused_loca_ce_loss_spmd(
                hs_, ws_, ht, wt, lab, labce, temperature=0.8, alpha=0.8,
                student_head_layout="vd")
            return 0.8 * loca + ce, (loca, ce)

        with pltpu.force_tpu_interpret_mode():
            (_, (loca, ce)), (gh, gw) = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True)(hs, ws)
            kl = fs.fused_kl_loss_spmd(hs, ws, ht, wt, temperature=2.0,
                                       student_head_layout="vd")
        return float(loca), float(ce), np.asarray(gh), np.asarray(gw), float(kl)

    l_c, ce_c, gh_c, gw_c, kl_c = run("64")   # 2 chunks
    l_s, ce_s, gh_s, gw_s, kl_s = run("0")    # single-shot
    np.testing.assert_allclose(l_c, l_s, rtol=1e-5)
    np.testing.assert_allclose(ce_c, ce_s, rtol=1e-6)
    np.testing.assert_allclose(kl_c, kl_s, rtol=1e-5)
    np.testing.assert_allclose(gh_c, gh_s, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gw_c, gw_s, rtol=1e-4, atol=1e-6)


def test_bf16_tmat_int8_head_pallas_materializer(monkeypatch):
    """With an int8 (kernel_q, scale) teacher head, the bf16 tmat form
    materializes through the vocab-streaming Pallas kernel
    (fused_loca._materialize_t_int8) — no dense bf16 head copy (the XLA
    dot's int8→bf16 convert is hoisted out of row-chunk scans as a
    1.01 GB loop-invariant; r5 b2_tmat_chunk arm).  Values must match
    the dense-head tmat run to f32-dot + bf16-rounding order, and the
    int8 recompute run to the bf16-tmat envelope."""
    import knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.fused_spmd as fs
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
        absmax_quantize_weight,
    )
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(5)
    n, ds, dt, v = 128, 128, 256, 300
    hs = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    ht = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    ws = jnp.asarray((rng.normal(size=(ds, v)) * 0.05).astype(np.float32)).T
    wt_f = jnp.asarray((rng.normal(size=(dt, 340)) * 0.05).astype(np.float32))
    wq, wsc = absmax_quantize_weight(wt_f)
    wt_dense = wq.astype(jnp.float32) * wsc[None, :]
    lab = jnp.asarray(rng.integers(0, v, size=(n,)).astype(np.int32))
    labce = jnp.asarray(rng.integers(0, v, size=(n,)).astype(np.int32))

    monkeypatch.setenv("KDSS_ROWCHUNK_REMAT", "0")
    monkeypatch.setenv("KDSS_LOCA_TMAT_CHUNK", "64")

    def run(tmat_env, head):
        monkeypatch.setenv("KDSS_LOCA_TMAT", tmat_env)
        with pltpu.force_tpu_interpret_mode():
            loca, ce = fs.fused_loca_ce_loss_spmd(
                hs, ws, ht, head, lab, labce, temperature=0.8, alpha=0.8,
                student_head_layout="vd")
        return float(loca), float(ce)

    l_q, ce_q = run("bf16", (wq, wsc))       # pallas int8 materializer
    l_d, ce_d = run("bf16", wt_dense)        # XLA dense materializer
    l_r, ce_r = run("0", (wq, wsc))          # int8 recompute reference
    np.testing.assert_allclose(l_q, l_d, rtol=1e-3)
    np.testing.assert_allclose(ce_q, ce_d, rtol=1e-6)
    np.testing.assert_allclose(l_q, l_r, rtol=5e-3)
    np.testing.assert_allclose(ce_q, ce_r, rtol=1e-6)
