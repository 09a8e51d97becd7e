"""Jit-compiled autoregressive decoding with the reference's effective
generation config.

Reference decode (`evaluation/onevisionv3/evaluate_onevision.py:186-195`):
``generate(max_new_tokens=32, repetition_penalty=1.2, no_repeat_ngram_size=2,
temperature=0.7)`` — **without** ``do_sample``, so decoding is greedy and
temperature is ignored (SURVEY.md §2.5 #7); we reproduce exactly that.

TPU-native structure: one jitted prefill (full prompt through the model,
KV caches seeded, Sq x Skv causal+padding mask) and one jitted
``lax.scan`` over ``max_new_tokens`` single-token steps.  All state —
generated ids, per-sample lengths, eos-finished flags, the token-presence
table for repetition penalty and the full id buffer for the no-repeat
bigram ban — is carried functionally through the scan.  Static shapes
throughout: one compile per (bucket, max_new_tokens).

``RestrictedLogitsProcessor`` closed-vocab masking exists in the reference
but is commented out of the generate call (`evaluate_onevision.py:141-158,
187-190`); provided here behind ``allowed_token_ids`` (default off, parity).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..configs import LlavaOnevisionConfig
from ..models.llava_onevision import LlavaOnevision


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 32
    repetition_penalty: float = 1.2
    # any n >= 2 (HF semantics; the reference's value is 2), 0/None = off
    no_repeat_ngram_size: int = 2
    eos_token_id: int = 151645
    # temperature accepted for flag parity; greedy decode ignores it, as the
    # reference's generate call effectively does (no do_sample).
    temperature: float = 0.7
    allowed_token_ids: Optional[tuple] = None

    def __post_init__(self):
        if self.no_repeat_ngram_size not in (0, None) and (
                self.no_repeat_ngram_size < 2):
            raise ValueError(
                f"no_repeat_ngram_size={self.no_repeat_ngram_size}: "
                "use 0/None (off) or n >= 2")
        if self.max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")


def _tpu_compiler_options():
    """Raised scoped-VMEM limit for the big-block flash kernels (the
    compiler default 16M rejects their stacks; TPU-compiler flags are not
    legal in client XLA_FLAGS, so they ride jit compiler_options)."""
    try:
        if jax.default_backend() != "cpu":
            return {"xla_tpu_scoped_vmem_limit_kib": "98304"}
    except Exception:
        pass
    return None


def _apply_repetition_penalty(logits, presence, penalty):
    """HF RepetitionPenaltyLogitsProcessor: score/p if >0 else score*p for
    every token already present in the sequence."""
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(presence, penalized, logits)


def _ngram_ban_mask(ids, valid, prefix, vocab):
    """Ban mask [B, V]: tokens t where (prefix..., t) occurs as an n-gram
    anywhere in ids (HF NoRepeatNGramLogitsProcessor over the full
    prompt+generated buffer).

    ids [B, L] full buffer, valid [B, L] marks real tokens,
    prefix [B, n-1] the last n-1 real tokens of the sequence so far.
    Every window position j contributes a ban on ids[j+n-1] iff all n
    window slots are valid and the first n-1 equal the prefix — one
    vectorized pass, no gather loops over sequence positions.
    """
    b, l = ids.shape
    m = prefix.shape[1]  # n - 1
    match = valid[:, m:]
    for k in range(m):
        match = match & (ids[:, k:l - m + k] == prefix[:, k:k + 1]) \
            & valid[:, k:l - m + k]
    nxt = ids[:, m:]
    ban = jnp.zeros((b, vocab), dtype=bool)
    return ban.at[jnp.arange(b)[:, None], nxt].max(match)


def _bigram_ban_mask(ids, valid, last_token, vocab):
    """n=2 convenience wrapper over :func:`_ngram_ban_mask` (kept for the
    unit tests; the generator always carries the general prefix)."""
    return _ngram_ban_mask(ids, valid, last_token[:, None], vocab)


class Generator:
    """Greedy generator for a (model, params) pair.

    Usage: ``gen = Generator(model, cfg, gcfg); out = gen.generate(params,
    batch)`` where batch carries the student_* keys of the collator (eval
    mode).  Returns dict with "sequences" [B, S+N], "valid" [B, S+N],
    "lengths" (prompt + generated real tokens), "prompt_lengths",
    "finished" [B] and "tokens" [B, N].
    """

    def __init__(
        self,
        model: LlavaOnevision,
        model_cfg: LlavaOnevisionConfig,
        gen_cfg: GenerateConfig = GenerateConfig(),
    ):
        self.model = model
        self.cfg = model_cfg
        self.gcfg = gen_cfg
        self._jit_generate = jax.jit(
            self._generate, compiler_options=_tpu_compiler_options()
        )

    # ---- model wrappers -------------------------------------------------
    def _init_caches(self, b: int, total_len: int, dtype):
        c = self.cfg.text
        return [
            {
                "k": jnp.zeros((b, total_len, c.num_key_value_heads, c.head_dim), dtype),
                "v": jnp.zeros((b, total_len, c.num_key_value_heads, c.head_dim), dtype),
            }
            for _ in range(c.num_hidden_layers)
        ]

    def _generate(self, params, batch):
        gc = self.gcfg
        cfg = self.cfg
        ids = batch["student_input_ids"]
        mask = batch["student_attention_mask"]
        b, s = ids.shape
        total = s + gc.max_new_tokens
        vocab = cfg.text.vocab_size
        dtype = self.model.dtype

        lengths = mask.sum(axis=1)  # [B] prompt lengths (right padding)

        caches = self._init_caches(b, total, dtype)

        # ---- prefill: causal + padding mask over the cache buffer ----
        q_pos = jnp.arange(s)[None, :, None]          # [1, S, 1]
        k_pos = jnp.arange(total)[None, None, :]      # [1, 1, total]
        prefill_mask = (k_pos <= q_pos) & (k_pos < lengths[:, None, None])
        logits, _, caches = self.model.apply(
            {"params": params},
            input_ids=ids,
            attention_mask=None,
            pixel_values=batch.get("student_pixel_values"),
            pack_idx=batch.get("pack_idx"),
            pack_weight=batch.get("pack_weight"),
            pack_valid=batch.get("pack_valid"),
            tile_valid=batch.get("tile_valid"),
            positions=jnp.broadcast_to(jnp.arange(s)[None], (b, s)),
            caches=caches,
            cache_index=jnp.int32(0),
            decode_mask=prefill_mask[:, None],  # [B, 1, S, total]
        )
        # last real prompt token's logits per sample
        last_idx = jnp.clip(lengths - 1, 0, s - 1)
        next_logits = jnp.take_along_axis(
            logits, last_idx[:, None, None], axis=1
        )[:, 0].astype(jnp.float32)  # [B, V]

        # id buffer padded out to total for ngram bookkeeping
        buf = jnp.concatenate(
            [ids, jnp.zeros((b, gc.max_new_tokens), ids.dtype)], axis=1
        )
        valid = jnp.concatenate(
            [mask.astype(bool), jnp.zeros((b, gc.max_new_tokens), bool)], axis=1
        )
        presence = jnp.zeros((b, vocab), bool).at[
            jnp.arange(b)[:, None], ids
        ].max(mask.astype(bool))
        # carried n-gram prefix: the last (n-1) real prompt tokens (for
        # ngram off / n=2 this is just the last token)
        nprev = max((gc.no_repeat_ngram_size or 0) - 1, 1)
        pidx = jnp.clip(
            lengths[:, None] - nprev + jnp.arange(nprev)[None, :], 0, s - 1)
        last_tok = jnp.take_along_axis(ids, pidx, axis=1)  # [B, n-1]
        finished = jnp.zeros((b,), bool)

        allowed = None
        if gc.allowed_token_ids is not None:
            allowed = jnp.zeros((vocab,), bool).at[
                jnp.asarray(gc.allowed_token_ids)
            ].set(True)

        def pick_token(logits_f32, presence, buf, valid, last_tok):
            lg = _apply_repetition_penalty(
                logits_f32, presence, gc.repetition_penalty
            )
            if gc.no_repeat_ngram_size and gc.no_repeat_ngram_size >= 2:
                ban = _ngram_ban_mask(buf, valid, last_tok, vocab)
                lg = jnp.where(ban, -jnp.inf, lg)
            if allowed is not None:
                lg = jnp.where(allowed[None, :], lg, -jnp.inf)
            return jnp.argmax(lg, axis=-1).astype(buf.dtype)

        def step(carry, i):
            caches, next_logits, buf, valid, presence, last_tok, finished, cur_len = carry
            tok = pick_token(next_logits, presence, buf, valid, last_tok)
            tok = jnp.where(finished, gc.eos_token_id, tok)

            write_pos = cur_len  # [B]
            buf = buf.at[jnp.arange(b), write_pos].set(tok)
            valid = valid.at[jnp.arange(b), write_pos].max(~finished)
            presence = presence.at[jnp.arange(b), tok].max(~finished)
            new_finished = finished | (tok == gc.eos_token_id)

            # one-token forward
            k_pos = jnp.arange(total)[None, None, :]
            step_mask = (k_pos <= write_pos[:, None, None])[:, None]  # [B,1,1,total]
            logits, _, caches = self.model.apply(
                {"params": params},
                input_ids=tok[:, None],
                attention_mask=None,
                positions=write_pos[:, None],
                caches=caches,
                cache_index=write_pos,
                decode_mask=step_mask,
            )
            next_logits = logits[:, 0].astype(jnp.float32)
            new_prefix = jnp.concatenate(
                [last_tok[:, 1:], tok[:, None]], axis=1)
            return (
                caches, next_logits, buf, valid, presence, new_prefix,
                new_finished, cur_len + 1,
            ), tok

        carry = (caches, next_logits, buf, valid, presence, last_tok, finished, lengths)
        # Scan N-1 steps; the N-th pick happens OUTSIDE the scan so the
        # loop never runs a trailing one-token forward whose logits are
        # discarded (1/N of the decode-step FLOPs at N new tokens).
        carry, toks = jax.lax.scan(
            step, carry, jnp.arange(gc.max_new_tokens - 1)
        )
        _, next_logits, buf, valid, presence, last_tok, finished, cur_len = carry
        tok = pick_token(next_logits, presence, buf, valid, last_tok)
        tok = jnp.where(finished, gc.eos_token_id, tok)
        buf = buf.at[jnp.arange(b), cur_len].set(tok)
        valid = valid.at[jnp.arange(b), cur_len].max(~finished)
        finished = finished | (tok == gc.eos_token_id)
        toks = jnp.concatenate([toks, tok[None]], axis=0)
        return {
            "sequences": buf,
            "valid": valid,
            # prompt + generated real tokens (incl. the closing eos)
            "lengths": valid.sum(axis=1),
            "prompt_lengths": lengths,
            "finished": finished,
            "tokens": toks.T,  # [B, N] in generation order
        }

    def generate(self, params, batch) -> Dict[str, jnp.ndarray]:
        return self._jit_generate(params, batch)
