"""Token-level decode parity vs HF ``generate`` — the library the
reference actually decodes with (`evaluate_onevision.py:186-195`:
greedy, repetition_penalty=1.2, no_repeat_ngram_size=2).

Text-only prompts on a converted tiny model isolate the decode chain
(embeddings → LM → cache → penalties → argmax) from the image path,
whose logits parity is pinned separately (tests/test_model_parity.py)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
    llava_onevision_tiny,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.decode import (
    GenerateConfig,
    Generator,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models import (
    LlavaOnevision,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models.convert import (
    convert_hf_state_dict,
)
from tests.test_convert_cli import _tiny_hf_model

pytestmark = pytest.mark.slow

CFG = llava_onevision_tiny()


@pytest.mark.parametrize("rep_penalty,ngram", [(1.2, 2), (1.0, 0)])
def test_greedy_decode_matches_hf_generate(rep_penalty, ngram):
    hf = _tiny_hf_model().eval()
    params = convert_hf_state_dict(
        {k: v for k, v in hf.state_dict().items()}, CFG
    )
    model = LlavaOnevision(CFG, dtype=jnp.float32)

    rng = np.random.default_rng(11)
    b, s, new = 2, 24, 8
    # plain text ids only — keep clear of the image/video/pad specials
    ids = rng.integers(5, CFG.text.vocab_size - 10, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)

    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            max_new_tokens=new,
            do_sample=False,
            repetition_penalty=rep_penalty,
            no_repeat_ngram_size=ngram if ngram else None,
            eos_token_id=None,
            pad_token_id=0,
        )
    want = np.asarray(hf_out)[:, s:]

    gcfg = GenerateConfig(
        max_new_tokens=new,
        repetition_penalty=rep_penalty,
        no_repeat_ngram_size=ngram,
        eos_token_id=-1,  # unreachable: compare full lengths
    )
    gen = Generator(model, CFG, gcfg)
    out = gen.generate(params, {
        "student_input_ids": jnp.asarray(ids),
        "student_attention_mask": jnp.asarray(mask),
    })
    got = np.asarray(out["sequences"])[:, s:s + new]

    np.testing.assert_array_equal(got, want)
