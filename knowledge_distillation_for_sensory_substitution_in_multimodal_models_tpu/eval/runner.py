"""Reusable single-question answerer over a (model, params) pair.

Factors the per-row answer path of the evaluator
(`evaluation/onevisionv3/evaluate_onevision.py:160-210` — prompt build,
generate, "assistant"-split, numbers->words) into one object so the
inference demo, the dataset-creation color backend, and the external-model
evaluators can share it.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class StudentAnswerer:
    """``answer(rgb_image, question) -> str`` with a jit KV-cache generator.

    ``image`` is an HxWx3 uint8 RGB array (the caller picks the stream:
    dataset-creation color questions are asked on RGB, matching the
    reference's BLIP call on the raw image, `color_questions.py:154-181`).
    """

    def __init__(self, model, cfg, tokenizer, params, *,
                 max_new_tokens: int = 32, buckets=None):
        from ..data.collate import OneVisionCollator
        from .decode import GenerateConfig, Generator

        self.cfg = cfg
        self.tok = tokenizer
        self.params = params
        self.collator = OneVisionCollator(
            cfg, tokenizer, eval_mode=True,
            **(dict(buckets=buckets) if buckets else {}),
        )
        self.gen = Generator(model, cfg, GenerateConfig(
            max_new_tokens=max_new_tokens, eos_token_id=cfg.eos_token_id,
        ))

    def answer(self, image: np.ndarray, question: str) -> str:
        import jax.numpy as jnp

        from ..utils.numwords import digits_to_words

        image = np.asarray(image)
        # collator sample contract: (question, answer, rgb, depth3, idx)
        batch = self.collator([(question, "", image, image, 0)])
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if not k.startswith("teacher_") and k != "question_id"}
        out = self.gen.generate(self.params, jb)
        seqs = np.asarray(out["sequences"])
        plens = np.asarray(out["prompt_lengths"])
        valid = np.asarray(out["valid"])
        ids = [int(t) for t, v in zip(seqs[0, plens[0]:], valid[0, plens[0]:])
               if v]
        if ids and ids[-1] == self.cfg.eos_token_id:
            ids = ids[:-1]
        return digits_to_words(self.tok.decode(ids).strip()).lower().strip()


def load_student_for_eval(
    checkpoint_dir: Optional[str],
    processor_path: Optional[str] = None,
    *,
    tiny: bool = False,
    cpu: bool = False,
    max_new_tokens: int = 10,
):
    """Build ``answer(image, question)`` from a checkpoint directory.

    ``tiny=True`` (tests) uses the tiny config + byte tokenizer and random
    weights when no checkpoint exists.
    """
    import argparse

    import jax

    from ..cli import common
    from ..configs import llava_onevision_0_5b, llava_onevision_tiny
    from ..models import LlavaOnevision
    from ..train.checkpoint import CheckpointManager, find_best_checkpoint

    import jax.numpy as jnp

    cfg = llava_onevision_tiny() if tiny else llava_onevision_0_5b()
    dtype = jnp.float32 if (cpu or tiny) else jnp.bfloat16
    attn = "xla" if (cpu or tiny) else "pallas"
    model = LlavaOnevision(cfg, dtype=dtype, attn_impl=attn)
    shim = argparse.Namespace(tokenizer_path=processor_path)
    tok = common.make_tokenizer(shim, cfg)

    params = common.init_or_load_params(model, cfg, None, seed=0)
    if checkpoint_dir and os.path.isdir(checkpoint_dir):
        best = find_best_checkpoint(checkpoint_dir)
        if best:
            mgr = CheckpointManager(checkpoint_dir)
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
                {"params": params},
            )
            params = mgr.restore(best, abstract, partial=True)["params"]

    buckets = (256,) if tiny else None
    ans = StudentAnswerer(model, cfg, tok, params,
                          max_new_tokens=max_new_tokens, buckets=buckets)
    return ans.answer
