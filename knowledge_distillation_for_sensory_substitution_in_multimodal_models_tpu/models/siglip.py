"""SigLIP vision tower (SigLIP-SO400M-patch14-384) in Flax.

Architecture parity target: the `vision_tower.vision_model` the reference
depends on (`distillation/LLavaOneVisionModule.py:44-55`,
`feature_based/OnlineKnowledgeDistillationLLavaOneVision.py:96-111`):
conv patch embed + learned position embeddings (no CLS), pre-LN transformer
blocks with biased QKV, gelu-tanh MLP, and a final ``post_layernorm``.

Returns BOTH the last encoder layer output (``hidden_states[-1]``, what the
projector consumes under ``vision_feature_layer=-1`` /
``vision_feature_select_strategy="full"``) and the post-layernorm output
(the reference captures the latter with a forward hook for feature KD; in
Flax it is an explicit output — jit-friendly, no hooks).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..configs import SigLIPVisionConfig
from ..ops.attention import dot_product_attention
from .qwen2 import _remat_policy, qdense_cls


class SigLIPAttention(nn.Module):
    cfg: SigLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    quant: str = "none"  # "int8": w8a8 projections (frozen teacher)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, s, _ = x.shape
        cls = qdense_cls(self.quant)
        dense = lambda name: cls(  # noqa: E731
            c.hidden_size, use_bias=True, dtype=self.dtype, name=name
        )
        q = dense("q_proj")(x).reshape(b, s, c.num_attention_heads, c.head_dim)
        k = dense("k_proj")(x).reshape(b, s, c.num_attention_heads, c.head_dim)
        v = dense("v_proj")(x).reshape(b, s, c.num_attention_heads, c.head_dim)
        out = dot_product_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, s, c.hidden_size)
        return dense("out_proj")(out)


class SigLIPMLP(nn.Module):
    cfg: SigLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        cls = qdense_cls(self.quant)
        h = cls(c.intermediate_size, use_bias=True, dtype=self.dtype,
                name="fc1")(x)
        h = nn.gelu(h, approximate=True)  # gelu_pytorch_tanh
        return cls(c.hidden_size, use_bias=True, dtype=self.dtype,
                   name="fc2")(h)


class SigLIPEncoderLayer(nn.Module):
    cfg: SigLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        ln1 = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm1")
        ln2 = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm2")
        x = x + SigLIPAttention(c, self.dtype, self.attn_impl, self.quant,
                                name="self_attn")(ln1(x))
        x = x + SigLIPMLP(c, self.dtype, self.quant, name="mlp")(ln2(x))
        return x


class SigLIPVisionTower(nn.Module):
    """Returns (last_layer_hidden, post_layernorm_hidden), both [N, T, D]."""

    cfg: SigLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    # Recompute encoder layers in backward; the anyres tile batch makes
    # stored attention probs (~tiles x 16 x 729^2) the memory hot spot.
    remat: bool = False
    remat_policy: str = "full"  # see models/qwen2.py::_remat_policy
    attn_impl: str = "xla"
    quant: str = "none"  # "int8": w8a8 encoder projections (ops/int8.py)
    # prevent_cse for the per-layer remat — see
    # models/qwen2.py::Qwen2LM.remat_barrier (memory-over-speed).
    remat_barrier: bool = False

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pixel_values: [N, H, W, 3] (NHWC), already rescaled/normalized."""
        c = self.cfg
        x = nn.Conv(
            features=c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        n = x.shape[0]
        x = x.reshape(n, -1, c.hidden_size)  # row-major patch order, as torch

        num_positions = c.tokens_per_patch
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(stddev=0.02),
            (num_positions, c.hidden_size),
        )
        x = x + pos.astype(self.dtype)[None]

        layer_cls = (
            nn.remat(SigLIPEncoderLayer, prevent_cse=self.remat_barrier,
                     policy=_remat_policy(self.remat_policy))
            if self.remat
            else SigLIPEncoderLayer
        )
        for i in range(c.num_hidden_layers):
            x = layer_cls(c, self.dtype, self.attn_impl, self.quant,
                          name=f"layers_{i}")(x)

        post = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="post_layernorm"
        )(x)
        return x, post
