"""Multi-device sharding tests on the 8-device virtual CPU mesh
(conftest sets xla_force_host_platform_device_count=8, SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState
from jax.sharding import PartitionSpec as P

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
    TrainConfig,
    llava_onevision_tiny,
    llava_onevision_tiny_teacher,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models import (
    LlavaOnevision,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.parallel import (
    MeshConfig,
    make_mesh,
    param_partition_specs,
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


def test_mesh_and_param_specs():
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    assert mesh.shape == {"data": 2, "fsdp": 2, "tensor": 2}

    cfg = llava_onevision_tiny()
    model = LlavaOnevision(cfg)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 8), jnp.int32)
    )["params"]
    specs = param_partition_specs(params, mesh)

    # attn qkv sharded on (fsdp, tensor) when divisible
    q_spec = specs["language_model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert q_spec == P("fsdp", "tensor")
    # norm weights replicated
    assert specs["language_model"]["norm"]["weight"] == P(None)

    sharded = shard_params(params, mesh)
    emb = sharded["language_model"]["embed_tokens"]["embedding"]
    # (fsdp, tensor), NOT (tensor, fsdp): D must not shard over an axis the
    # batch also shards over, or the embed-gather output reshard triggers
    # SPMD involuntary full rematerialization (see sharding._rule_for_path)
    assert emb.sharding.spec == P("fsdp", "tensor")


def test_sharded_generation_matches_single_device():
    """Greedy decode over a TP/fsdp-sharded model must be token-exact vs
    single-device (the multi-chip eval path for the 7B teacher)."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.decode import (
        GenerateConfig,
        Generator,
    )

    cfg = llava_onevision_tiny()
    model = LlavaOnevision(cfg)
    batch = synthetic_kd_batch(cfg, 2, 96, seed=11)
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not k.startswith("teacher_")}
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jb["student_input_ids"],
        attention_mask=jb["student_attention_mask"],
        pixel_values=jb["student_pixel_values"],
        pack_idx=jb["pack_idx"], pack_weight=jb["pack_weight"],
        pack_valid=jb["pack_valid"], tile_valid=jb["tile_valid"],
    )["params"]
    gcfg = GenerateConfig(max_new_tokens=6, repetition_penalty=1.0,
                          no_repeat_ngram_size=0, eos_token_id=-1)
    ref = np.asarray(Generator(model, cfg, gcfg).generate(params, jb)["tokens"])
    mesh = make_mesh(MeshConfig(1, 2, 4))
    with jax.set_mesh(mesh):
        sp = shard_params(params, mesh)
        got = np.asarray(Generator(model, cfg, gcfg).generate(sp, jb)["tokens"])
    np.testing.assert_array_equal(got, ref)


def test_sharded_kd_train_step_matches_single_device():
    """The pjit KD step on a (1,2,4) mesh must agree numerically with the
    unsharded step (same program, XLA inserts the collectives)."""
    scfg = llava_onevision_tiny()
    tcfg = llava_onevision_tiny_teacher()
    student, teacher = LlavaOnevision(scfg), LlavaOnevision(tcfg)

    batch = synthetic_kd_batch(scfg, batch_size=2, seq_len=96, accum=2, seed=5)
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

    cfg = TrainConfig(
        kd_mode="double_trouble", phase=3, loss_chunk_size=32,
        learning_rate=1e-3,
    )
    models = KDModels(student, teacher)
    tx = optax.adamw(1e-3)

    # --- single-device reference ---
    state0 = TrainState.create(apply_fn=None, params=sparams, tx=tx)
    ref_state, ref_metrics = jax.jit(make_train_step(models, cfg))(
        state0, tparams, batch
    )

    # --- sharded run ---
    mesh = make_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
    with jax.set_mesh(mesh):
        sp = shard_params(sparams, mesh)
        tp = shard_params(tparams, mesh)
        sb = shard_batch(batch, mesh)
        state1 = TrainState.create(apply_fn=None, params=sp, tx=tx)
        step = jax.jit(make_train_step(models, cfg))
        new_state, metrics = step(state1, tp, sb)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )
    # a couple of updated params agree
    a = np.asarray(
        ref_state.params["language_model"]["norm"]["weight"]
    )
    b = np.asarray(new_state.params["language_model"]["norm"]["weight"])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_sharded_int8_generation_matches_single_device():
    """Int8-served (int8_full) decode over the TP/fsdp mesh must be
    token-exact vs single-device int8 — pins the kernel_q/kernel_scale
    partition rules on the serving path."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.decode import (
        GenerateConfig,
        Generator,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
        quantize_lm_params_int8,
    )

    cfg = llava_onevision_tiny()
    model16 = LlavaOnevision(cfg)
    model8 = LlavaOnevision(cfg, lm_quant="int8", vision_quant="int8")
    batch = synthetic_kd_batch(cfg, 2, 96, seed=12)
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not k.startswith("teacher_")}
    params = model16.init(
        jax.random.PRNGKey(1),
        input_ids=jb["student_input_ids"],
        attention_mask=jb["student_attention_mask"],
        pixel_values=jb["student_pixel_values"],
        pack_idx=jb["pack_idx"], pack_weight=jb["pack_weight"],
        pack_valid=jb["pack_valid"], tile_valid=jb["tile_valid"],
    )["params"]
    qparams = quantize_lm_params_int8(params, include_vision=True)
    gcfg = GenerateConfig(max_new_tokens=6, repetition_penalty=1.0,
                          no_repeat_ngram_size=0, eos_token_id=-1)
    ref = np.asarray(
        Generator(model8, cfg, gcfg).generate(qparams, jb)["tokens"]
    )
    mesh = make_mesh(MeshConfig(1, 2, 4))
    with jax.set_mesh(mesh):
        sp = shard_params(qparams, mesh)
        got = np.asarray(
            Generator(model8, cfg, gcfg).generate(sp, jb)["tokens"]
        )
    np.testing.assert_array_equal(got, ref)
