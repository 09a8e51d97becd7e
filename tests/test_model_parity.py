"""Numerical parity of the Flax LLaVA-OneVision against HF torch on tiny
random-weight configs (float32, CPU).  Validates model math, the HF->Flax
weight converter, and the host-side anyres pack spec in one shot: if packing
order/geometry diverged from HF ``pack_image_features``, the final logits
would differ."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
    llava_onevision_tiny,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models import (
    LlavaOnevision,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models.convert import (
    convert_hf_state_dict,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.anyres import (

    build_pack_spec,
    num_image_tokens,
    num_tiles,
    stack_pack_specs,
)

pytestmark = pytest.mark.slow

CFG = llava_onevision_tiny()


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (
        LlavaOnevisionConfig,
        LlavaOnevisionForConditionalGeneration,
        Qwen2Config,
        SiglipVisionConfig,
    )

    torch.manual_seed(0)
    v = CFG.vision
    t = CFG.text
    hf_cfg = LlavaOnevisionConfig(
        vision_config=SiglipVisionConfig(
            hidden_size=v.hidden_size,
            intermediate_size=v.intermediate_size,
            num_hidden_layers=v.num_hidden_layers,
            num_attention_heads=v.num_attention_heads,
            image_size=v.image_size,
            patch_size=v.patch_size,
            vision_use_head=False,
        ),
        text_config=Qwen2Config(
            vocab_size=t.vocab_size,
            hidden_size=t.hidden_size,
            intermediate_size=t.intermediate_size,
            num_hidden_layers=t.num_hidden_layers,
            num_attention_heads=t.num_attention_heads,
            num_key_value_heads=t.num_key_value_heads,
            rope_theta=t.rope_theta,
            rms_norm_eps=t.rms_norm_eps,
            tie_word_embeddings=t.tie_word_embeddings,
            max_position_embeddings=2048,
        ),
        image_token_index=CFG.image_token_id,
        video_token_index=CFG.video_token_id,
        pad_token_id=CFG.pad_token_id,
        image_grid_pinpoints=[list(p) for p in CFG.image_grid_pinpoints],
        vision_feature_select_strategy="full",
        vision_feature_layer=-1,
        vision_aspect_ratio="anyres_max_9",
        tie_word_embeddings=t.tie_word_embeddings,
    )
    model = LlavaOnevisionForConditionalGeneration(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def flax_params(hf_model):
    sd = {k: v for k, v in hf_model.state_dict().items()}
    return convert_hf_state_dict(sd, CFG)


def test_text_only_parity(hf_model, flax_params):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 400, size=(2, 9)).astype(np.int32)
    mask = np.ones_like(ids)

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).logits.numpy()

    model = LlavaOnevision(CFG)
    logits, _, _ = model.apply(
        {"params": flax_params},
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-4, rtol=2e-4)


def _hf_image_inputs(orig_sizes, seed=1):
    """Build pixel_values via the HF image processor for the tiny config."""
    from transformers.models.llava_onevision.image_processing_llava_onevision import (
        LlavaOnevisionImageProcessor,
    )

    proc = LlavaOnevisionImageProcessor(
        size={"height": CFG.vision.image_size, "width": CFG.vision.image_size},
        image_grid_pinpoints=[list(p) for p in CFG.image_grid_pinpoints],
        image_mean=[0.5, 0.5, 0.5],
        image_std=[0.5, 0.5, 0.5],
        do_convert_rgb=False,
    )
    rng = np.random.default_rng(seed)
    images = [
        rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8) for h, w in orig_sizes
    ]
    out = proc(images, return_tensors="np")
    return out["pixel_values"], out["image_sizes"], images


@pytest.mark.parametrize("orig_sizes", [[(45, 67)], [(45, 67), (80, 30)]])
def test_multimodal_parity(hf_model, flax_params, orig_sizes):
    pv, image_sizes, _ = _hf_image_inputs(orig_sizes)
    bsz = len(orig_sizes)
    v = CFG.vision
    ts = v.tokens_per_side
    pins = CFG.image_grid_pinpoints

    # Build input ids: prefix text, expanded image tokens, suffix text.
    rng = np.random.default_rng(2)
    counts = [
        num_image_tokens((h, w), pins, v.image_size, ts, CFG.vision_aspect_ratio_max)
        for h, w in orig_sizes
    ]
    max_len = 4 + max(counts) + 3
    ids = np.full((bsz, max_len), CFG.pad_token_id, dtype=np.int64)
    mask = np.zeros((bsz, max_len), dtype=np.int64)
    for b, n in enumerate(counts):
        seq = (
            list(rng.integers(0, 400, size=4))
            + [CFG.image_token_id] * n
            + list(rng.integers(0, 400, size=3))
        )
        ids[b, : len(seq)] = seq
        mask[b, : len(seq)] = 1

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pv, dtype=torch.float32),
            image_sizes=torch.tensor(np.asarray(image_sizes)),
        ).logits.numpy()

    # ---- flax side: pad tiles to max_tiles, NHWC, pack specs ----
    max_tiles = CFG.max_tiles
    pv_padded = np.zeros(
        (bsz, max_tiles, v.image_size, v.image_size, 3), dtype=np.float32
    )
    tile_valid = np.zeros((bsz, max_tiles), dtype=bool)
    for b, (h, w) in enumerate(orig_sizes):
        nt = num_tiles((h, w), pins, v.image_size)
        pv_padded[b, :nt] = pv[b, :nt].transpose(0, 2, 3, 1)
        tile_valid[b, :nt] = True

    specs = [
        build_pack_spec(
            (h, w), pins, v.image_size, ts, CFG.vision_aspect_ratio_max,
            max_tiles, CFG.max_image_tokens,
        )
        for h, w in orig_sizes
    ]
    for s, n in zip(specs, counts):
        assert s.n_tokens == n, "pack spec token count must match processor math"
    pack_idx, pack_w, pack_valid = stack_pack_specs(specs)

    model = LlavaOnevision(CFG)
    logits, vis_feats, _ = model.apply(
        {"params": flax_params},
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        pixel_values=jnp.asarray(pv_padded),
        pack_idx=jnp.asarray(pack_idx),
        pack_weight=jnp.asarray(pack_w),
        pack_valid=jnp.asarray(pack_valid),
        tile_valid=jnp.asarray(tile_valid),
    )
    got = np.asarray(logits)

    # Compare only at positions that attend (padding rows diverge by design)
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], hf_logits[m], atol=5e-4, rtol=5e-4)

    # vision features exist per tile and are zero at padded tiles
    vf = np.asarray(vis_feats)
    assert vf.shape[:2] == (bsz, max_tiles)
    assert np.all(vf[~tile_valid] == 0.0)
    assert np.any(vf[tile_valid] != 0.0)


def test_multimodal_generate_matches_hf(hf_model, flax_params):
    """FULL eval-path parity: multimodal prefill + greedy decode with the
    reference's penalty config, token-exact vs HF ``generate`` (the
    library the reference decodes with, `evaluate_onevision.py:186-195`)."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.decode import (
        GenerateConfig,
        Generator,
    )

    orig_sizes = [(45, 67)]
    pv, image_sizes, _ = _hf_image_inputs(orig_sizes)
    v, ts, pins = CFG.vision, CFG.vision.tokens_per_side, CFG.image_grid_pinpoints
    n = num_image_tokens(orig_sizes[0], pins, v.image_size, ts,
                         CFG.vision_aspect_ratio_max)
    rng = np.random.default_rng(4)
    seq = (list(rng.integers(5, 400, size=4)) + [CFG.image_token_id] * n
           + list(rng.integers(5, 400, size=3)))
    ids = np.asarray([seq], dtype=np.int64)
    mask = np.ones_like(ids)
    new = 8

    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pv, dtype=torch.float32),
            image_sizes=torch.tensor(np.asarray(image_sizes)),
            max_new_tokens=new, do_sample=False,
            repetition_penalty=1.2, no_repeat_ngram_size=2,
            eos_token_id=None, pad_token_id=0,
        )
    want = np.asarray(hf_out)[:, ids.shape[1]:]

    max_tiles = CFG.max_tiles
    nt = num_tiles(orig_sizes[0], pins, v.image_size)
    pv_padded = np.zeros((1, max_tiles, v.image_size, v.image_size, 3),
                         np.float32)
    pv_padded[0, :nt] = pv[0, :nt].transpose(0, 2, 3, 1)
    tile_valid = np.zeros((1, max_tiles), bool)
    tile_valid[0, :nt] = True
    spec = build_pack_spec(orig_sizes[0], pins, v.image_size, ts,
                           CFG.vision_aspect_ratio_max, max_tiles,
                           CFG.max_image_tokens)
    pack_idx, pack_w, pack_valid = stack_pack_specs([spec])

    gen = Generator(LlavaOnevision(CFG), CFG,
                    GenerateConfig(max_new_tokens=new, eos_token_id=-1))
    out = gen.generate(flax_params, {
        "student_input_ids": jnp.asarray(ids),
        "student_attention_mask": jnp.asarray(mask),
        "student_pixel_values": jnp.asarray(pv_padded),
        "pack_idx": jnp.asarray(pack_idx),
        "pack_weight": jnp.asarray(pack_w),
        "pack_valid": jnp.asarray(pack_valid),
        "tile_valid": jnp.asarray(tile_valid),
    })
    got = np.asarray(out["sequences"])[:, ids.shape[1]:ids.shape[1] + new]
    np.testing.assert_array_equal(got, want)
