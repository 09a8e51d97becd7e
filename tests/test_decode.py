"""Greedy KV-cache decoding vs step-by-step full re-forward (no cache), plus
penalty/ngram behaviors."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
    llava_onevision_tiny,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.decode import (
    GenerateConfig,
    Generator,
    _bigram_ban_mask,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models import (
    LlavaOnevision,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.utils.synthetic import (

    synthetic_kd_batch,
)

pytestmark = pytest.mark.slow

CFG = llava_onevision_tiny()
N_NEW = 6


@pytest.fixture(scope="module")
def setup():
    model = LlavaOnevision(CFG)
    batch = synthetic_kd_batch(CFG, batch_size=2, seq_len=96, seed=11)
    jb = {
        k: jnp.asarray(v) for k, v in batch.items()
        if not k.startswith("teacher_")
    }
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jb["student_input_ids"],
        attention_mask=jb["student_attention_mask"],
        pixel_values=jb["student_pixel_values"],
        pack_idx=jb["pack_idx"],
        pack_weight=jb["pack_weight"],
        pack_valid=jb["pack_valid"],
        tile_valid=jb["tile_valid"],
    )["params"]
    return model, params, jb


def _full_forward_argmax(model, params, jb, ids, mask):
    logits, _, _ = model.apply(
        {"params": params},
        input_ids=ids,
        attention_mask=mask,
        pixel_values=jb["student_pixel_values"],
        pack_idx=jb["pack_idx"],
        pack_weight=jb["pack_weight"],
        pack_valid=jb["pack_valid"],
        tile_valid=jb["tile_valid"],
    )
    return logits


def test_cached_greedy_matches_uncached(setup):
    """With penalties disabled, the KV-cache decode must produce the same
    tokens as repeatedly re-running the full (uncached) forward."""
    model, params, jb = setup
    gcfg = GenerateConfig(
        max_new_tokens=N_NEW, repetition_penalty=1.0, no_repeat_ngram_size=0,
        eos_token_id=-1,  # never triggers
    )
    gen = Generator(model, CFG, gcfg)
    out = gen.generate(params, jb)
    got = np.asarray(out["tokens"])  # [B, N]

    ids = np.asarray(jb["student_input_ids"]).copy()
    mask = np.asarray(jb["student_attention_mask"]).copy()
    lens = mask.sum(axis=1)
    b = ids.shape[0]
    want = np.zeros((b, N_NEW), dtype=ids.dtype)
    for step in range(N_NEW):
        logits = np.asarray(
            _full_forward_argmax(model, params, jb, jnp.asarray(ids), jnp.asarray(mask))
        )
        for i in range(b):
            pos = lens[i] - 1
            tok = int(np.argmax(logits[i, pos].astype(np.float32)))
            want[i, step] = tok
            if lens[i] < ids.shape[1]:
                ids[i, lens[i]] = tok
                mask[i, lens[i]] = 1
                lens[i] += 1
    np.testing.assert_array_equal(got, want)


def test_no_repeat_bigram(setup):
    model, params, jb = setup
    gcfg = GenerateConfig(
        max_new_tokens=8, repetition_penalty=1.2, no_repeat_ngram_size=2,
        eos_token_id=-1,
    )
    gen = Generator(model, CFG, gcfg)
    out = gen.generate(params, jb)
    seqs = np.asarray(out["sequences"])
    valid = np.asarray(out["valid"])
    plens = np.asarray(out["prompt_lengths"])
    for i in range(seqs.shape[0]):
        toks = seqs[i][valid[i]]
        bigrams = list(zip(toks[:-1], toks[1:]))
        # HF semantics: a *generated* token may not complete a bigram that
        # already occurred (prompt-internal repeats, e.g. the image-token
        # run, are expected and allowed)
        n_prompt = int(plens[i])
        for j in range(n_prompt - 1, len(bigrams)):
            assert bigrams[j] not in bigrams[:j], (
                f"generated bigram {bigrams[j]} repeats an earlier one"
            )


def test_bigram_ban_mask():
    ids = jnp.asarray([[5, 7, 5, 9, 0]])
    valid = jnp.asarray([[True, True, True, True, False]])
    ban = np.asarray(_bigram_ban_mask(ids, valid, jnp.asarray([5]), 12))
    assert ban[0, 7] and ban[0, 9]
    assert not ban[0, 0] and not ban[0, 5]


def test_eos_stops(setup):
    model, params, jb = setup
    # pick the first greedily generated token as "eos" so generation stops
    g0 = Generator(model, CFG, GenerateConfig(
        max_new_tokens=2, repetition_penalty=1.0, no_repeat_ngram_size=0,
        eos_token_id=-1))
    first = int(np.asarray(g0.generate(params, jb)["tokens"])[0, 0])
    gen = Generator(model, CFG, GenerateConfig(
        max_new_tokens=4, repetition_penalty=1.0, no_repeat_ngram_size=0,
        eos_token_id=first))
    out = gen.generate(params, jb)
    toks = np.asarray(out["tokens"])[0]
    assert toks[0] == first
    assert (toks[1:] == first).all()  # finished rows emit eos
    valid = np.asarray(out["valid"])[0]
    plen = int(np.asarray(out["prompt_lengths"])[0])
    # only the eos token itself marked valid after the prompt
    assert valid[plen:].sum() == 1


def test_pallas_prefill_matches_xla(setup):
    """Prefill with s>=128 routes through the flash kernel when
    attn_impl="pallas" (qwen2.py cached-prefill branch); generated tokens
    must match the XLA path exactly."""
    from jax.experimental.pallas import tpu as pltpu
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.utils.synthetic import (
        synthetic_kd_batch,
    )

    _, params, _ = setup
    batch = synthetic_kd_batch(CFG, batch_size=2, seq_len=160, seed=5)
    jb = {
        k: jnp.asarray(v) for k, v in batch.items()
        if not k.startswith("teacher_")
    }
    gcfg = GenerateConfig(max_new_tokens=4, eos_token_id=-1)

    gen_xla = Generator(LlavaOnevision(CFG, attn_impl="xla"), CFG, gcfg)
    ref = np.asarray(gen_xla.generate(params, jb)["tokens"])

    gen_fl = Generator(LlavaOnevision(CFG, attn_impl="pallas"), CFG, gcfg)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(gen_fl.generate(params, jb)["tokens"])
    np.testing.assert_array_equal(got, ref)


def test_ngram_ban_mask_general():
    """r5: arbitrary-n no-repeat (HF semantics).  n=3: ban t where
    (prefix0, prefix1, t) occurs anywhere among valid windows."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.decode import (
        _ngram_ban_mask,
    )
    #           0  1  2  3  4  5
    ids = jnp.asarray([[5, 7, 9, 5, 7, 2]])
    valid = jnp.asarray([[True] * 6])
    ban = np.asarray(_ngram_ban_mask(ids, valid, jnp.asarray([[5, 7]]), 12))
    assert ban[0, 9] and ban[0, 2]        # 5,7 -> 9 and 5,7 -> 2 occur
    assert not ban[0, 5] and not ban[0, 7]
    # invalidating the window's third slot removes that ban
    valid2 = jnp.asarray([[True, True, True, True, True, False]])
    ban2 = np.asarray(_ngram_ban_mask(ids, valid2, jnp.asarray([[5, 7]]), 12))
    assert ban2[0, 9] and not ban2[0, 2]


def test_no_repeat_trigram_decode(setup):
    """Generated tokens must never complete a trigram that already
    occurred (n=3 end-to-end through the generator)."""
    model, params, jb = setup
    gcfg = GenerateConfig(
        max_new_tokens=8, repetition_penalty=1.2, no_repeat_ngram_size=3,
        eos_token_id=-1,
    )
    gen = Generator(model, CFG, gcfg)
    out = gen.generate(params, jb)
    seqs = np.asarray(out["sequences"])
    valid = np.asarray(out["valid"])
    plens = np.asarray(out["prompt_lengths"])
    for i in range(seqs.shape[0]):
        toks = [int(t) for t in seqs[i][valid[i]]]
        tris = list(zip(toks[:-2], toks[1:-1], toks[2:]))
        n_prompt = int(plens[i])
        for j in range(n_prompt - 2, len(tris)):
            assert tris[j] not in tris[:j], (
                f"generated trigram {tris[j]} repeats an earlier one")
