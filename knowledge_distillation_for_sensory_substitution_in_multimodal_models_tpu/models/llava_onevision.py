"""LLaVA-OneVision in Flax: SigLIP tower + projector + Qwen2 LM with
static-shape anyres feature packing.

Parity target: HF ``LlavaOnevisionForConditionalGeneration`` as used by the
reference (`distillation/LLavaOneVisionModule.py:15-19`,
`logit_based/OnlineKnowledgeDistillationLLavaOneVision.py:125-169`).

TPU-first differences from the HF graph:

* anyres unpad/downsample/newline packing is precomputed on the host as a
  gather spec (see ``data/anyres.build_pack_spec``); on device it is a
  single weighted gather — fully static shapes, one compiled program for a
  shape bucket.
* the vision ``post_layernorm`` features the reference captures with torch
  forward hooks are an explicit model output (`vision_features`, per-tile,
  with a tile validity mask for the padded tile axis).
* scatter of image features into the token stream uses a cumulative-index
  gather over the image-token mask instead of boolean masked_scatter.

Inputs (all statically shaped):
  input_ids        [B, S]
  attention_mask   [B, S]
  pixel_values     [B, P, H, W, 3]   (P = padded tile budget, NHWC)
  pack_idx         [B, M, 4] int32   (M = max packed image tokens)
  pack_weight      [B, M, 4] float32
  pack_valid       [B, M] bool
  tile_valid       [B, P] bool
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import LlavaOnevisionConfig
from .qwen2 import Qwen2LM
from .siglip import SigLIPVisionTower


class MultiModalProjector(nn.Module):
    cfg: LlavaOnevisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h = nn.Dense(c.text.hidden_size, use_bias=c.projector_bias,
                     dtype=self.dtype, name="linear_1")(x)
        h = nn.gelu(h, approximate=False)  # HF projector_hidden_act="gelu"
        return nn.Dense(c.text.hidden_size, use_bias=c.projector_bias,
                        dtype=self.dtype, name="linear_2")(h)


class LlavaOnevision(nn.Module):
    cfg: LlavaOnevisionConfig
    dtype: jnp.dtype = jnp.float32
    # remat both towers; remat_vision=False keeps vision activations (they
    # are small: ~tiles x 729 x 1152 bf16 per layer) and saves the vision
    # recompute pass in backward
    remat: bool = False
    remat_vision: bool = True
    # remat granularity for BOTH towers when remat is on: "full" (whole
    # layer recomputed) or "dots" (weight-matmul outputs saved; only
    # elementwise/attention recomputed).  See models/qwen2.py::_remat_policy.
    # Only meaningful for the trained model — a frozen teacher has no
    # backward, so its remat never recomputes anything.
    remat_policy: str = "full"
    attn_impl: str = "xla"  # "pallas" = flash-attention kernels
    # Vision-tower attention override; None follows attn_impl.  The tower
    # runs non-causal attention at S=729/d=72, where the flash kernel pads
    # d to 128 lanes (+78% MXU columns) while the full [T, 768, 768] probs
    # are small — "xla" is a measured A/B against the padded kernel
    # (profile: vision attention = 31 ms of the 308 ms KD step).
    vision_attn_impl: Optional[str] = None
    # "int8": w8a8 LM decoder-block projections (frozen-teacher inference
    # path; params via ops.int8.quantize_lm_params_int8).  Projector and
    # norms stay bf16 — see ops/int8.py.
    lm_quant: str = "none"
    # "int8": w8a8 SigLIP encoder projections too
    # (quantize_lm_params_int8(include_vision=True)).
    vision_quant: str = "none"
    # "int8": per-row int8 token embedding + int8 lm_head in the params
    # (quantize_lm_params_int8(include_embed_head=True)); the fused loss
    # kernels stream the int8 head directly (train/step.py::teacher_head).
    embed_quant: str = "none"
    # Sequence-chunked LM MLP (models/qwen2.py::Qwen2MLP.seq_chunk):
    # caps the backward's live [S, intermediate] gate/up buffers at one
    # chunk per layer — the HBM-peak lever that fits the real-7B-teacher
    # KD step on one 16 GiB chip.  0 = off.
    mlp_chunk: int = 0
    # prevent_cse for both towers' remat (memory-over-speed; see
    # models/qwen2.py::Qwen2LM.remat_barrier).
    remat_barrier: bool = False

    def setup(self):
        c = self.cfg
        self.vision_tower = SigLIPVisionTower(
            c.vision, self.dtype, remat=self.remat and self.remat_vision,
            remat_policy=self.remat_policy,
            attn_impl=self.vision_attn_impl or self.attn_impl,
            quant=self.vision_quant,
            remat_barrier=self.remat_barrier,
            name="vision_tower"
        )
        self.multi_modal_projector = MultiModalProjector(c, self.dtype, name="multi_modal_projector")
        self.image_newline = self.param(
            "image_newline",
            nn.initializers.normal(stddev=c.text.hidden_size**-0.5),
            (c.text.hidden_size,),
        )
        self.language_model = Qwen2LM(
            c.text, self.dtype, remat=self.remat,
            remat_policy=self.remat_policy, attn_impl=self.attn_impl,
            quant=self.lm_quant, embed_quant=self.embed_quant,
            mlp_chunk=self.mlp_chunk, remat_barrier=self.remat_barrier,
            name="language_model"
        )

    def encode_images(self, pixel_values: jnp.ndarray):
        """[B, P, H, W, 3] -> (projected [B, P, T, Dt], post_ln [B, P, T, Dv])."""
        b, p, h, w, ch = pixel_values.shape
        flat = pixel_values.reshape(b * p, h, w, ch)
        encoder_out, post_ln = self.vision_tower(flat)
        projected = self.multi_modal_projector(encoder_out)
        t = projected.shape[1]
        return (
            projected.reshape(b, p, t, -1),
            post_ln.reshape(b, p, t, -1),
        )

    def pack_features(self, projected, pack_idx, pack_weight, pack_valid):
        """Gather-pack projected tile features into [B, M, Dt].

        bank[b] = concat(projected[b].reshape(P*T, D), image_newline).
        The 4 bilinear taps run as sequential single-tap gathers: one
        [B, M, 4, D] gather materializes ~175 MB per stream at the real
        7B-teacher shapes (the top HLO temp of the B=2 step), while four
        [B, M, D] gather+mul accumulations peak at ~1/4 of that.
        """
        b, p, t, d = projected.shape
        bank = jnp.concatenate(
            [
                projected.reshape(b, p * t, d),
                jnp.broadcast_to(
                    self.image_newline.astype(projected.dtype)[None, None, :],
                    (b, 1, d),
                ),
            ],
            axis=1,
        )
        idx = pack_idx.astype(jnp.int32)
        w = pack_weight.astype(projected.dtype)
        packed = None
        for k in range(pack_idx.shape[-1]):
            tap = jax.vmap(lambda bank_b, idx_b: bank_b[idx_b])(
                bank, idx[:, :, k]
            )  # [B, M, D]
            term = tap * w[:, :, k][..., None]
            packed = term if packed is None else packed + term
        return packed * pack_valid[..., None].astype(projected.dtype)

    def merge_image_features(self, input_ids, inputs_embeds, packed):
        """Place packed[b, j] at the j-th image-token position of sample b."""
        img_mask = input_ids == self.cfg.image_token_id
        # j-th True position -> feature j (clamped; non-image rows unused)
        feat_pos = jnp.cumsum(img_mask, axis=1) - 1
        feat_pos = jnp.clip(feat_pos, 0, packed.shape[1] - 1)
        img_embeds = jnp.take_along_axis(packed, feat_pos[..., None], axis=1)
        return jnp.where(img_mask[..., None], img_embeds.astype(inputs_embeds.dtype), inputs_embeds)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        pack_idx: Optional[jnp.ndarray] = None,
        pack_weight: Optional[jnp.ndarray] = None,
        pack_valid: Optional[jnp.ndarray] = None,
        tile_valid: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
        caches: Optional[list] = None,
        cache_index: Optional[jnp.ndarray] = None,
        return_hidden: bool = False,
        compute_logits: bool = True,
        decode_mask: Optional[jnp.ndarray] = None,
    ):
        """Returns (logits [B,S,V], vision_features [B,P,Dv], new_caches)
        or, with ``return_hidden=True``, a 4-tuple additionally carrying the
        final-norm hidden states [B,S,D] (logits is None when
        ``compute_logits=False`` — the KD train step computes them chunked).

        vision_features are per-tile mean-pooled post_layernorm outputs (the
        reference's hook side-channel, `phase1/...:243-248`), zeroed at
        padded tiles; combine with `tile_valid` for masked contrastive loss.
        """
        from ..parallel.sharding import constrain

        inputs_embeds = self.language_model.embed(input_ids)
        vision_features = None
        if pixel_values is not None:
            projected, post_ln = self.encode_images(pixel_values)
            packed = self.pack_features(projected, pack_idx, pack_weight, pack_valid)
            # anchor GSPMD: batch over (data, fsdp), feature dim replicated —
            # prevents involuntary resharding between the gather-pack and
            # the token merge under tensor parallelism
            packed = constrain(packed, ("data", "fsdp"), None, None)
            inputs_embeds = constrain(
                inputs_embeds, ("data", "fsdp"), None, None
            )
            inputs_embeds = self.merge_image_features(input_ids, inputs_embeds, packed)
            inputs_embeds = constrain(
                inputs_embeds, ("data", "fsdp"), None, None
            )
            pooled = post_ln.mean(axis=2)  # [B, P, Dv]
            if tile_valid is not None:
                pooled = pooled * tile_valid[..., None].astype(pooled.dtype)
            vision_features = pooled

        out = self.language_model(
            inputs_embeds=inputs_embeds,
            attention_mask=attention_mask,
            positions=positions,
            caches=caches,
            cache_index=cache_index,
            return_hidden=return_hidden,
            compute_logits=compute_logits,
            decode_mask=decode_mask,
        )
        if return_hidden:
            logits, new_caches, hidden = out
            return logits, vision_features, new_caches, hidden
        logits, new_caches = out
        return logits, vision_features, new_caches
