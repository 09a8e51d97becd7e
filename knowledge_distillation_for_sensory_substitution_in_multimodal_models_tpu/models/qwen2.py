"""Qwen2 decoder-only LM in Flax (0.5B student / 7B teacher variants).

Parity target: the `language_model.model.layers` / `lm_head` structure the
reference navigates (`distillation/LLavaOneVisionModule.py:44-55`,
`logit_based/...:415-435`): RMSNorm pre-norm blocks, biased QKV / bias-free
output projection, GQA, NeoX-style RoPE (theta 1e6), SwiGLU MLP, optional
tied embeddings.

Designed for pjit: pure function of (params, ids/embeds, mask, positions);
supports an optional KV cache for jit-compiled autoregressive decoding.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import functools

from ..configs import Qwen2Config
from ..ops.attention import dot_product_attention
from ..ops.int8 import int8_matmul


class QDense(nn.Module):
    """Int8 (w8a8) drop-in for ``nn.Dense`` on the frozen-teacher path.

    Declares ``kernel_q`` (int8) + ``kernel_scale`` (f32/out-channel) in
    place of ``kernel``; populate with ``ops.int8.quantize_lm_params_int8``
    over a bf16 tree.  See ops/int8.py for the scheme and scope.
    """

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    # "auto" (= the XLA w8a8 form unless KDSS_INT8_IMPL=pallas opts into
    # the fused kernel — see ops/int8.py's A/B record) or "xla": the
    # GSPMD-partitionable form, pinned inside TP-sharded mesh programs
    # where a Pallas custom call cannot be partitioned by the compiler.
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        wq = self.param(
            "kernel_q", nn.initializers.zeros, (in_features, self.features),
            jnp.int8,
        )
        ws = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,),
            jnp.float32,
        )
        y = int8_matmul(x, wq, ws, out_dtype=self.dtype, impl=self.impl)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class QEmbed(nn.Module):
    """Int8 drop-in for ``nn.Embed`` on the frozen-teacher path.

    Declares ``embedding_q`` (int8 [V, D]) + ``embedding_scale`` (f32
    [V, 1] per-row) in place of ``embedding``; populate with
    ``ops.int8.quantize_lm_params_int8(include_embed_head=True)``.  A
    lookup gathers the int8 row and its one scale — half the embedding
    HBM (1.09 GB -> 0.55 GB at the 7B teacher's 152128 x 3584 table).
    Untied-head models only (``attend`` is deliberately absent: a tied
    head must stay differentiable/bf16 — the student never quantizes).
    """

    num_embeddings: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        eq = self.param(
            "embedding_q", nn.initializers.zeros,
            (self.num_embeddings, self.features), jnp.int8,
        )
        es = self.param(
            "embedding_scale", nn.initializers.ones,
            (self.num_embeddings, 1), jnp.float32,
        )
        rows = jnp.take(eq, input_ids, axis=0).astype(jnp.float32)
        scales = jnp.take(es[:, 0], input_ids, axis=0)
        return (rows * scales[..., None]).astype(self.dtype)


def qdense_cls(quant: str):
    """Dense class for a ``quant`` mode string.

    ``"none"`` -> ``nn.Dense``; ``"int8"`` -> QDense with auto impl (the
    XLA w8a8 form unless ``KDSS_INT8_IMPL=pallas``); ``"int8_xla"`` ->
    QDense pinned to the GSPMD-partitionable XLA form — required inside
    TP-sharded mesh programs, where the partitioner cannot split a Pallas
    custom call.
    """
    if quant.startswith("int8"):
        return functools.partial(
            QDense, impl="xla" if quant == "int8_xla" else "auto"
        )
    return nn.Dense


def _remat_policy(name: str):
    """jax.checkpoint policy for a remat-policy string.

    ``"full"`` (None) recomputes the whole layer in backward; ``"dots"``
    saves weight-matmul outputs (dot_generals with no batch dims — the
    qkv/o/gate/up/down projections) so backward recomputes only the
    elementwise/attention work.  ~77 MB/layer extra live bf16 at S=3072
    for the 0.5B student, in exchange for skipping ~2/3 of the remat
    recompute FLOPs."""
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "flash":
        # Save the flash-attention kernel outputs (out + slim lse, named in
        # ops/flash_attention.py's vjp fwd rules) so the backward replay
        # DCEs the flash forward kernel — everything else is still
        # recomputed.  ~6 MB/layer saved activations at S=3072.
        return jax.checkpoint_policies.save_only_these_names(
            "flash_out", "flash_lse"
        )
    if name not in ("full", "", None):
        raise ValueError(f"unknown remat_policy {name!r}")
    return None


class RMSNorm(nn.Module):
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        return (w * xf.astype(self.dtype)).astype(self.dtype)


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions [B, S] -> (cos, sin) each [B, S, head_dim]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, S, H, D]; cos/sin [B, S, D] (NeoX half-rotation convention)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[:, :, None, :] + rotated * sin[:, :, None, :]


class Qwen2Attention(nn.Module):
    cfg: Qwen2Config
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    quant: str = "none"  # "int8": w8a8 block projections (frozen teacher)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cos: jnp.ndarray,
        sin: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        cache: Optional[dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
    ):
        c = self.cfg
        b, s, _ = x.shape
        hd = c.head_dim
        dense = qdense_cls(self.quant)
        q = dense(c.num_attention_heads * hd, use_bias=c.attention_bias,
                  dtype=self.dtype, name="q_proj")(x)
        k = dense(c.num_key_value_heads * hd, use_bias=c.attention_bias,
                  dtype=self.dtype, name="k_proj")(x)
        v = dense(c.num_key_value_heads * hd, use_bias=c.attention_bias,
                  dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, c.num_attention_heads, hd)
        k = k.reshape(b, s, c.num_key_value_heads, hd)
        v = v.reshape(b, s, c.num_key_value_heads, hd)

        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache = None
        if cache is not None:
            # Write k/v at cache_index, attend over the cache.  cache_index
            # may be a scalar (uniform prefill) or [B] (per-sample decode
            # offsets under right padding).
            ck, cv = cache["k"], cache["v"]

            def upd(c, x, idx):
                if jnp.ndim(idx) == 0:
                    return jax.lax.dynamic_update_slice(
                        c, x.astype(c.dtype), (0, idx, 0, 0)
                    )
                return jax.vmap(
                    lambda cb, xb, ib: jax.lax.dynamic_update_slice(
                        cb, xb.astype(cb.dtype), (ib, 0, 0)
                    )
                )(c, x, idx)

            ck = upd(ck, k, cache_index)
            cv = upd(cv, v, cache_index)
            k, v = ck, cv
            new_cache = {"k": ck, "v": cv}
            if s >= 128 and self.attn_impl.startswith("pallas") and mask is not None:
                # One-shot prefill into a fresh cache (the Generator always
                # prefills at cache_index 0, eval/decode.py): the decode_mask
                # rows are causal ∧ kv-padding, so flash re-derives causality
                # and takes the kv-padding from the most permissive row.
                # Avoids materializing [B, H, S, total] f32 probabilities.
                kv_mask = mask[:, :, -1:, :]
                out = dot_product_attention(
                    q, k, v, mask=kv_mask, causal=True, impl=self.attn_impl
                )
            else:
                # Decode steps (Sq=1): grouped-GQA einsum — never
                # materializes K/V repeated to the query head count (that
                # re-broadcast of the whole cache per layer per step was
                # ~60% of the profiled decode step, PERF_NOTES r3).
                from ..ops.attention import gqa_decode_attention

                if s > 1:
                    # Cached multi-token call on the non-flash arm:
                    # gqa_decode_attention applies only the mask it is
                    # given, so causality vs the cache (and validity of
                    # the not-yet-written tail) must be encoded here.  A
                    # caller-supplied decode_mask already contains this —
                    # the AND is then a no-op.
                    total = ck.shape[1]
                    ci = jnp.asarray(
                        cache_index if cache_index is not None else 0
                    )
                    ci2 = ci[:, None] if ci.ndim == 1 else ci.reshape(1, 1)
                    q_pos = ci2 + jnp.arange(s)[None, :]          # [B|1, s]
                    k_pos = jnp.arange(total)[None, None, :]      # [1,1,total]
                    causal = (k_pos <= q_pos[:, :, None])[:, None]
                    mask = causal if mask is None else mask & causal
                out = gqa_decode_attention(q, k, v, mask=mask)
        else:
            impl = self.attn_impl if s >= 128 else "xla"
            out = dot_product_attention(q, k, v, mask=mask, causal=True, impl=impl)

        out = out.reshape(b, s, c.num_attention_heads * hd)
        out = dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                    name="o_proj")(out)
        return out, new_cache


def _mlp_ff(mdl: "Qwen2MLP", x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU core as a free function so the lifted transforms below
    (nn.remat / nn.scan) keep parameters under ``mdl``'s own scope —
    the param tree stays ``mlp/{gate,up,down}_proj`` either way."""
    c = mdl.cfg
    dense = qdense_cls(mdl.quant)
    gate = dense(c.intermediate_size, use_bias=False, dtype=mdl.dtype,
                 name="gate_proj")(x)
    up = dense(c.intermediate_size, use_bias=False, dtype=mdl.dtype,
               name="up_proj")(x)
    return dense(c.hidden_size, use_bias=False, dtype=mdl.dtype,
                 name="down_proj")(nn.silu(gate) * up)


class Qwen2MLP(nn.Module):
    cfg: Qwen2Config
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"
    # seq_chunk > 0: compute the MLP in sequence chunks via
    # nn.scan(nn.remat(core)) when S is a multiple of seq_chunk.  The
    # scanned backward then holds ONE chunk's [chunk, intermediate]
    # gate/up buffers instead of the full [S, intermediate] pair per
    # layer — at the 7B-teacher KD step the per-layer 2x28.5M remat
    # carpet (24 student layers live concurrently under the
    # latency-hiding scheduler, ~1.4 GiB) is what keeps the real-7B
    # single-chip bench from fitting 16 GiB.  Cost: one extra MLP
    # forward inside the (outer-remat) backward, ~+2-3% step FLOPs.
    seq_chunk: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ck = self.seq_chunk
        s = x.shape[1] if x.ndim == 3 else 0
        if ck and s > ck and s % ck == 0:
            b, s, d = x.shape
            xc = x.reshape(b, s // ck, ck, d)
            core = nn.remat(_mlp_ff, prevent_cse=False)

            def body(mdl, carry, xi):
                return carry, core(mdl, xi)

            _, y = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )(self, None, xc)
            return y.reshape(b, s, d)
        return _mlp_ff(self, x)


class Qwen2Layer(nn.Module):
    cfg: Qwen2Config
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    quant: str = "none"
    mlp_chunk: int = 0

    @nn.compact
    def __call__(self, x, cos, sin, mask, cache=None, cache_index=None):
        c = self.cfg
        h, new_cache = Qwen2Attention(
            c, self.dtype, self.attn_impl, self.quant, name="self_attn"
        )(
            RMSNorm(c.rms_norm_eps, self.dtype, name="input_layernorm")(x),
            cos, sin, mask, cache, cache_index,
        )
        x = x + h
        x = x + Qwen2MLP(c, self.dtype, self.quant, self.mlp_chunk,
                         name="mlp")(
            RMSNorm(c.rms_norm_eps, self.dtype, name="post_attention_layernorm")(x)
        )
        return x, new_cache


class Qwen2LM(nn.Module):
    """Decoder LM.  Call with input_ids OR precomputed inputs_embeds.

    Returns (logits, new_caches) where new_caches is None unless a KV cache
    was supplied.
    """

    cfg: Qwen2Config
    dtype: jnp.dtype = jnp.float32
    # Rematerialize each decoder layer in backward (jax.checkpoint): at
    # OneVision sequence lengths (~5-7k tokens) the stored attention
    # probabilities alone would exceed v5e HBM (SURVEY.md §7 "hard parts");
    # the reference sketches torch gradient checkpointing but leaves it
    # commented (`phase1/OnlineKnowledge...:93-94`).
    remat: bool = False
    # "full": recompute the whole layer in backward (lowest memory).
    # "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable —
    # weight-matmul outputs (qkv/o/gate/up/down) are saved and only the
    # cheap elementwise/attention work is recomputed, trading ~77 MB/layer
    # (S=3072 bf16) for skipping the projection re-FLOPs.  Only matters
    # for models with a backward pass (the student).
    remat_policy: str = "full"
    attn_impl: str = "xla"
    # "int8": w8a8 decoder-block projections (embed/norms/lm_head stay
    # bf16).  For the frozen KD teacher — see ops/int8.py.
    quant: str = "none"
    # "int8": per-row int8 token embedding (QEmbed; untied teachers only
    # — the loss kernels take the quantized lm_head separately).
    embed_quant: str = "none"
    # Sequence-chunked MLP (see Qwen2MLP.seq_chunk): HBM-peak lever for
    # the trained student at long S; 0 = off.
    mlp_chunk: int = 0
    # prevent_cse for the per-layer remat.  False (default) lets XLA CSE
    # a backward-recompute op with its forward twin — FASTER (skips the
    # recompute) but the merged value then lives fwd->bwd, silently
    # defeating remat for it: at the real-7B KD step the flash kernels'
    # f32 LSE residuals alone held ~0.8 GiB this way.  True inserts
    # optimization barriers so remat actually discards; the
    # memory-over-speed choice for HBM-tight configs.
    remat_barrier: bool = False

    def setup(self):
        c = self.cfg
        if self.embed_quant == "int8":
            assert not c.tie_word_embeddings, (
                "embed_quant='int8' is for untied (frozen-teacher) models; "
                "a tied head must stay bf16/trainable"
            )
            self.embed_tokens = QEmbed(
                c.vocab_size, c.hidden_size, dtype=self.dtype,
                name="embed_tokens",
            )
        else:
            self.embed_tokens = nn.Embed(
                c.vocab_size, c.hidden_size, dtype=self.dtype,
                embedding_init=nn.initializers.normal(stddev=0.02),
                name="embed_tokens",
            )
        layer_cls = (
            nn.remat(Qwen2Layer, prevent_cse=self.remat_barrier,
                     policy=_remat_policy(self.remat_policy))
            if self.remat else Qwen2Layer
        )
        self.layers = [
            layer_cls(c, self.dtype, self.attn_impl, self.quant,
                      self.mlp_chunk, name=f"layers_{i}")
            for i in range(c.num_hidden_layers)
        ]
        self.norm = RMSNorm(c.rms_norm_eps, self.dtype, name="norm")
        if not c.tie_word_embeddings:
            self.lm_head = nn.Dense(
                c.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head"
            )

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed_tokens(input_ids)

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
        caches: Optional[list] = None,
        cache_index: Optional[jnp.ndarray] = None,
        return_hidden: bool = False,
        compute_logits: bool = True,
        decode_mask: Optional[jnp.ndarray] = None,
    ):
        c = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        x = inputs_embeds
        b, s, _ = x.shape

        if positions is None:
            # Cached calls offset positions by the write index — a bare
            # arange would rotate every decoded token at position 0.
            positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
            if caches is not None and cache_index is not None:
                ci = jnp.asarray(cache_index)
                positions = positions + (
                    ci[:, None] if ci.ndim == 1 else ci
                )
        cos, sin = rope_cos_sin(positions, c.head_dim, c.rope_theta, self.dtype)

        # attention_mask: [B, Skv] padding mask -> [B, 1, Sq, Skv].
        # decode_mask: explicit [B, 1, Sq, Skv] (cached prefill/decode paths
        # encode causality + cache validity there; overrides attention_mask).
        mask = None
        if decode_mask is not None:
            mask = decode_mask.astype(bool)
        elif attention_mask is not None:
            mask = attention_mask[:, None, None, :].astype(bool)

        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            cache_i = caches[i] if caches is not None else None
            x, nc = layer(x, cos, sin, mask, cache_i, cache_index)
            if caches is not None:
                new_caches.append(nc)

        x = self.norm(x)
        if not compute_logits:
            # KD path: the chunked loss computes logits head-chunk-wise from
            # the hidden states, never materializing [B, S, V] (see
            # losses/chunked.py); skip the full lm_head matmul here.
            logits = None
        elif c.tie_word_embeddings:
            logits = self.embed_tokens.attend(x)
        else:
            logits = self.lm_head(x)
        if return_hidden:
            return logits, new_caches, x
        return logits, new_caches
