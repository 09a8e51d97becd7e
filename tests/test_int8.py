"""Int8 (w8a8) frozen-teacher path: QDense numerics, param quantization
tree transform, logit fidelity on the tiny model, and an int8-teacher KD
train step (net-new TPU machinery; the reference's teacher runs eager fp16
under torch.no_grad, `phase1/OnlineKnowledgeDistillationLLavaOneVision.py:206-225`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
    TrainConfig,
    kd_loss_config_for,
    llava_onevision_tiny,
    llava_onevision_tiny_teacher,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models import (
    LlavaOnevision,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
    QUANTIZED_PROJ_NAMES,
    absmax_quantize_weight,
    int8_matmul,
    quantize_lm_params_int8,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.train import (
    KDModels,
    make_optimizer,
    make_train_step,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.utils.synthetic import (
    synthetic_kd_batch,
)

SCFG = llava_onevision_tiny()
TCFG = llava_onevision_tiny_teacher()


def test_int8_matmul_close_to_f32():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (4, 7, 96), jnp.float32)
    w = jax.random.normal(k2, (96, 160), jnp.float32) * 0.05
    wq, ws = absmax_quantize_weight(w)
    assert wq.dtype == jnp.int8 and ws.shape == (160,)
    # dequantized weights round-trip within one quantization step
    np.testing.assert_allclose(
        np.asarray(wq, np.float32) * np.asarray(ws),
        np.asarray(w),
        atol=float(np.max(np.asarray(ws))) * 0.51,
    )
    y = int8_matmul(x, wq, ws, out_dtype=jnp.float32)
    ref = x @ w
    err = np.abs(np.asarray(y - ref))
    scale = np.abs(np.asarray(ref)).mean() + 1e-6
    assert err.mean() / scale < 0.02, err.mean() / scale


def test_quantize_tree_scope():
    """Only decoder-block projections are converted; everything else —
    embeddings, norms, lm_head, vision tower — passes through untouched."""
    teacher = LlavaOnevision(TCFG)
    batch = synthetic_kd_batch(TCFG, batch_size=1, seq_len=64, seed=0)
    micro = jax.tree.map(jnp.asarray, batch)  # no accum axis requested
    params = teacher.init(
        jax.random.PRNGKey(1),
        input_ids=micro["teacher_input_ids"],
        attention_mask=micro["teacher_attention_mask"],
        pixel_values=micro["teacher_pixel_values"],
        pack_idx=micro["pack_idx"],
        pack_weight=micro["pack_weight"],
        pack_valid=micro["pack_valid"],
        tile_valid=micro["tile_valid"],
    )["params"]
    qparams = quantize_lm_params_int8(params)

    flat = jax.tree_util.tree_flatten_with_path(qparams)[0]
    q_leaves = [jax.tree_util.keystr(p) for p, l in flat if l.dtype == jnp.int8]
    assert q_leaves, "no int8 leaves produced"
    for path in q_leaves:
        assert "language_model" in path and "kernel_q" in path
        assert any(n in path for n in QUANTIZED_PROJ_NAMES)
    # vision tower and lm head bit-identical
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params["vision_tower"], qparams["vision_tower"],
    )
    emb = params["language_model"]["embed_tokens"]["embedding"]
    qemb = qparams["language_model"]["embed_tokens"]["embedding"]
    np.testing.assert_array_equal(np.asarray(emb), np.asarray(qemb))


def test_int8_teacher_logit_fidelity():
    """bf16 vs int8 teacher on the tiny model: low-KL, high argmax
    agreement — the quantized teacher still teaches the same distribution."""
    teacher16 = LlavaOnevision(TCFG, dtype=jnp.float32)
    teacher8 = LlavaOnevision(TCFG, dtype=jnp.float32, lm_quant="int8")
    batch = synthetic_kd_batch(TCFG, batch_size=1, seq_len=64, seed=2)
    micro = jax.tree.map(jnp.asarray, batch)  # no accum axis requested
    kwargs = dict(
        input_ids=micro["teacher_input_ids"],
        attention_mask=micro["teacher_attention_mask"],
        pixel_values=micro["teacher_pixel_values"],
        pack_idx=micro["pack_idx"],
        pack_weight=micro["pack_weight"],
        pack_valid=micro["pack_valid"],
        tile_valid=micro["tile_valid"],
    )
    params = teacher16.init(jax.random.PRNGKey(3), **kwargs)["params"]
    qparams = quantize_lm_params_int8(params)

    logits16, _, _ = teacher16.apply({"params": params}, **kwargs)
    logits8, _, _ = teacher8.apply({"params": qparams}, **kwargs)
    p = jax.nn.softmax(logits16.astype(jnp.float32), -1)
    logq = jax.nn.log_softmax(logits8.astype(jnp.float32), -1)
    logp = jax.nn.log_softmax(logits16.astype(jnp.float32), -1)
    kl = float((p * (logp - logq)).sum(-1).mean())
    assert kl < 0.02, kl
    agree = float(
        (logits16.argmax(-1) == logits8.argmax(-1)).astype(jnp.float32).mean()
    )
    assert agree > 0.9, agree


def test_kd_step_with_int8_teacher():
    """Phase-3 double-trouble step with an int8 teacher: runs, finite, and
    close to the bf16-teacher loss."""
    student = LlavaOnevision(SCFG)
    batch = synthetic_kd_batch(SCFG, batch_size=1, seq_len=96, accum=1, seed=4)
    batch = jax.tree.map(jnp.asarray, batch)
    micro = jax.tree.map(lambda x: x[0], batch)

    def init(model, key, prefix):
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

    teacher16 = LlavaOnevision(TCFG)
    teacher8 = LlavaOnevision(TCFG, lm_quant="int8")
    sparams = init(student, 0, "student")
    tparams = init(teacher16, 1, "teacher")
    qtparams = quantize_lm_params_int8(tparams)

    cfg = TrainConfig(
        kd_mode="double_trouble", phase=3,
        loss=kd_loss_config_for("double_trouble"),
        loss_chunk_size=32,
    )

    def run(teacher, tp):
        tx = make_optimizer(sparams, 1e-3)
        state = TrainState.create(apply_fn=None, params=sparams, tx=tx)
        step = jax.jit(make_train_step(KDModels(student, teacher), cfg))
        _, metrics = step(state, tp, batch)
        return float(metrics["loss"])

    loss16 = run(teacher16, tparams)
    loss8 = run(teacher8, qtparams)
    assert np.isfinite(loss8)
    assert abs(loss8 - loss16) < 0.05 * abs(loss16) + 0.05, (loss8, loss16)


def test_int8_full_teacher_vision_fidelity_and_kd_step():
    """int8_full additionally quantizes the SigLIP encoder: vision features
    stay close to bf16 and the KD step still runs with a close loss."""
    student = LlavaOnevision(SCFG)
    teacher16 = LlavaOnevision(TCFG)
    teacher8f = LlavaOnevision(TCFG, lm_quant="int8", vision_quant="int8")
    batch = synthetic_kd_batch(SCFG, batch_size=1, seq_len=96, accum=1, seed=5)
    batch = jax.tree.map(jnp.asarray, batch)
    micro = jax.tree.map(lambda x: x[0], batch)

    def init(model, key, prefix):
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

    sparams = init(student, 0, "student")
    tparams = init(teacher16, 1, "teacher")
    qtparams = quantize_lm_params_int8(tparams, include_vision=True)
    # vision projections converted, patch conv untouched
    flat = jax.tree_util.tree_flatten_with_path(qtparams["vision_tower"])[0]
    q_paths = [jax.tree_util.keystr(p) for p, l in flat
               if l.dtype == jnp.int8]
    assert q_paths and all("patch_embedding" not in p for p in q_paths)

    kwargs = dict(
        input_ids=micro["teacher_input_ids"],
        attention_mask=micro["teacher_attention_mask"],
        pixel_values=micro["teacher_pixel_values"],
        pack_idx=micro["pack_idx"],
        pack_weight=micro["pack_weight"],
        pack_valid=micro["pack_valid"],
        tile_valid=micro["tile_valid"],
    )
    _, vis16, _ = teacher16.apply({"params": tparams}, **kwargs)
    _, vis8, _ = teacher8f.apply({"params": qtparams}, **kwargs)
    err = float(jnp.abs(vis8 - vis16).mean())
    scale = float(jnp.abs(vis16).mean()) + 1e-6
    assert err / scale < 0.05, err / scale

    cfg = TrainConfig(
        kd_mode="double_trouble", phase=3,
        loss=kd_loss_config_for("double_trouble"), loss_chunk_size=32,
    )
    tx = make_optimizer(sparams, 1e-3)
    state = TrainState.create(apply_fn=None, params=sparams, tx=tx)

    def run(teacher, tp):
        step = jax.jit(make_train_step(KDModels(student, teacher), cfg))
        _, metrics = step(state, tp, batch)
        return float(metrics["loss"])

    loss16 = run(teacher16, tparams)
    loss8 = run(teacher8f, qtparams)
    assert np.isfinite(loss8)
    assert abs(loss8 - loss16) < 0.05 * abs(loss16) + 0.05, (loss8, loss16)


@pytest.mark.slow
def test_int8_teacher_kd_step_sharded_matches_single_device():
    """Int8-teacher KD step on a (1,2,4) mesh ≡ single device: the
    kernel_q/kernel_scale partition rules must produce the same numerics
    once XLA inserts the collectives."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.parallel import (
        MeshConfig,
        make_mesh,
        shard_params,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.parallel.sharding import (
        shard_batch,
    )

    student = LlavaOnevision(SCFG)
    teacher8 = LlavaOnevision(TCFG, lm_quant="int8", vision_quant="int8")
    batch = synthetic_kd_batch(SCFG, batch_size=2, seq_len=96, accum=2, seed=6)
    batch = jax.tree.map(jnp.asarray, batch)
    micro = jax.tree.map(lambda x: x[0], batch)

    def init(model, key, prefix):
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

    sparams = init(student, 0, "student")
    # int8_full: vision kernel_q/kernel_scale exercise their own partition
    # rules (parallel/sharding.py) under the mesh
    tparams = quantize_lm_params_int8(
        init(LlavaOnevision(TCFG), 1, "teacher"), include_vision=True
    )

    cfg = TrainConfig(
        kd_mode="double_trouble", phase=3,
        loss=kd_loss_config_for("double_trouble"), loss_chunk_size=32,
    )
    models = KDModels(student, teacher8)
    tx = optax.adamw(1e-3)

    state0 = TrainState.create(apply_fn=None, params=sparams, tx=tx)
    _, ref_metrics = jax.jit(make_train_step(models, cfg))(
        state0, tparams, batch
    )

    mesh = make_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
    with jax.set_mesh(mesh):
        sp = shard_params(sparams, mesh)
        tp = shard_params(tparams, mesh)
        sb = shard_batch(batch, mesh)
        state1 = TrainState.create(apply_fn=None, params=sp, tx=tx)
        _, metrics = jax.jit(make_train_step(models, cfg))(state1, tp, sb)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )


# ---------------------------------------------------------------------------
# Fused Pallas w8a8 kernel (ops/int8.py::int8_matmul_pallas): folds
# activation quant into the matmul's VMEM pipeline; per-row-per-K-block
# scales, f32 accumulation across K blocks.  Opt-in (KDSS_INT8_IMPL=pallas):
# measured at isolated parity with the XLA int8 dot but -21% end-to-end on
# the KD step (see ops/int8.py for the A/B record) — these tests keep the
# kernel correct for future mesh-shape/XLA-version re-evaluation.
# ---------------------------------------------------------------------------

from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (  # noqa: E402
    int8_matmul_pallas,
    int8_matmul_xla,
)


def test_int8_pallas_matches_xla_single_kblock():
    """K <= BK -> one K block, so the per-block scale IS the per-row global
    scale and the Pallas kernel must agree with the XLA form to float-
    association noise."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = (jax.random.normal(k1, (2, 384, 512), jnp.float32) * 3).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (512, 256), jnp.float32) * 0.05
    wq, ws = absmax_quantize_weight(w)
    ref = int8_matmul_xla(x, wq, ws, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = int8_matmul_pallas(x, wq, ws, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_int8_pallas_multi_kblock_fidelity():
    """K > BK -> per-row-per-K-block scales: no longer bit-comparable to the
    per-row-global XLA form, but quantization error vs the f32 matmul must
    be no worse (finer scale granularity can only help)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (1, 256, 1024), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (1024, 512), jnp.float32) * 0.05
    wq, ws = absmax_quantize_weight(w)
    f32 = x.astype(jnp.float32) @ w
    with pltpu.force_tpu_interpret_mode():
        out = int8_matmul_pallas(x, wq, ws, jnp.float32)
    xla = int8_matmul_xla(x, wq, ws, jnp.float32)

    def relerr(a, b):
        return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))

    assert relerr(out, f32) < relerr(xla, f32) * 1.05


def test_int8_pallas_ragged_rows():
    """Row count not a multiple of the row block: padded rows must not
    pollute real outputs (the dot is row-local in x)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (300, 512), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (512, 128), jnp.float32) * 0.05
    wq, ws = absmax_quantize_weight(w)
    ref = int8_matmul_xla(x, wq, ws, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = int8_matmul_pallas(x, wq, ws, jnp.float32)
    assert out.shape == (300, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_int8_matmul_dispatch():
    """auto -> XLA form (bit-identical); explicit impl args route."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(k1, (256, 256), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (256, 128), jnp.float32) * 0.05
    wq, ws = absmax_quantize_weight(w)
    auto = int8_matmul(x, wq, ws, jnp.float32)
    xla = int8_matmul(x, wq, ws, jnp.float32, impl="xla")
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(xla))


def test_qdense_int8_xla_mode_matches_int8_on_cpu():
    """quant="int8_xla" (mesh programs) and "int8" (auto) agree on CPU,
    where auto also resolves to the XLA form."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models.qwen2 import (
        qdense_cls,
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.normal(k1, (4, 96), jnp.bfloat16)
    cls_auto = qdense_cls("int8")
    cls_xla = qdense_cls("int8_xla")
    m_auto = cls_auto(64, dtype=jnp.float32)
    m_xla = cls_xla(64, dtype=jnp.float32)
    p = m_auto.init(k2, x)
    y_auto = m_auto.apply(p, x)
    y_xla = m_xla.apply(p, x)
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_xla))
    import flax.linen as nn

    assert qdense_cls("none") is nn.Dense


def test_quantize_include_embed_head_layout_and_qembed():
    """include_embed_head=True replaces the token embedding with
    (embedding_q int8 [V,D], embedding_scale f32 [V,1]) and the untied
    lm_head with (kernel_q, kernel_scale); a QEmbed model's lookup equals
    the dense embedding of the dequantized table exactly."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models.qwen2 import (
        QEmbed,
    )

    teacher16 = LlavaOnevision(TCFG)
    batch = synthetic_kd_batch(TCFG, batch_size=1, seq_len=64, seed=3)
    micro = jax.tree.map(jnp.asarray, batch)  # no accum axis requested
    tparams = teacher16.init(
        jax.random.PRNGKey(1),
        input_ids=micro["teacher_input_ids"],
        attention_mask=micro["teacher_attention_mask"],
        pixel_values=micro["teacher_pixel_values"],
        pack_idx=micro["pack_idx"], pack_weight=micro["pack_weight"],
        pack_valid=micro["pack_valid"], tile_valid=micro["tile_valid"],
    )["params"]
    q = quantize_lm_params_int8(tparams, include_embed_head=True)
    lm = q["language_model"]
    emb = lm["embed_tokens"]
    assert set(emb) == {"embedding_q", "embedding_scale"}
    vocab, d = tparams["language_model"]["embed_tokens"]["embedding"].shape
    assert emb["embedding_q"].shape == (vocab, d)
    assert emb["embedding_q"].dtype == jnp.int8
    assert emb["embedding_scale"].shape == (vocab, 1)
    assert set(lm["lm_head"]) == {"kernel_q", "kernel_scale"}
    # r5: the head is stored VOCAB-MAJOR [Vt, Dt] so the fused loss
    # kernels stream row blocks in place (no 520 MB retiled copy)
    dk, vk = tparams["language_model"]["lm_head"]["kernel"].shape
    assert lm["lm_head"]["kernel_q"].shape == (vk, dk)
    assert lm["lm_head"]["kernel_scale"].shape == (vk,)

    ids = jnp.asarray([[1, 5, 7, 0, vocab - 1]])
    qe = QEmbed(vocab, d, dtype=jnp.float32)
    got = qe.apply({"params": emb}, ids)
    dense = (emb["embedding_q"].astype(jnp.float32)
             * emb["embedding_scale"])
    want = jnp.take(dense, ids, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kd_step_with_int8_embed_head_teacher():
    """Phase-3 step with the fully-quantized teacher (projections +
    vision + embedding + head): runs via the quantization-aware
    teacher_head extraction, finite, and close to the bf16-teacher loss.
    This is the bench --teacher 7b configuration at tiny shapes."""
    student = LlavaOnevision(SCFG)
    batch = synthetic_kd_batch(SCFG, batch_size=1, seq_len=96, accum=1, seed=4)
    batch = jax.tree.map(jnp.asarray, batch)
    micro = jax.tree.map(lambda x: x[0], batch)

    def init(model, key, prefix):
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

    teacher16 = LlavaOnevision(TCFG)
    teacher8 = LlavaOnevision(TCFG, lm_quant="int8", vision_quant="int8",
                              embed_quant="int8")
    sparams = init(student, 0, "student")
    tparams = init(teacher16, 1, "teacher")
    qtparams = quantize_lm_params_int8(tparams, include_vision=True,
                                       include_embed_head=True)

    cfg = TrainConfig(
        kd_mode="double_trouble", phase=3,
        loss=kd_loss_config_for("double_trouble"),
        loss_chunk_size=32,
    )

    def run(teacher, tp):
        tx = make_optimizer(sparams, 1e-3)
        state = TrainState.create(apply_fn=None, params=sparams, tx=tx)
        step = jax.jit(make_train_step(KDModels(student, teacher), cfg))
        _, metrics = step(state, tp, batch)
        return float(metrics["loss"])

    loss16 = run(teacher16, tparams)
    loss8 = run(teacher8, qtparams)
    assert np.isfinite(loss8)
    assert abs(loss8 - loss16) < 0.05 * abs(loss16) + 0.05, (loss8, loss16)
