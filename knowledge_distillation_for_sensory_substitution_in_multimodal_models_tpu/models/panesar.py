"""Panesar-style non-LLM VQA baseline in Flax (reference
`further_scripts/Panesar_Recreation/models/vqa_sunrgbd_model.py:5-160`):
VGG16 image encoders + 2-layer LSTM question encoder + one of five RGB-D
fusion modes (hadamard / addition / maxpool / conv1d / fusion_at_start) +
linear classifier head.

TPU-first notes: the LSTM runs as a ``nn.scan``-free ``lax.scan`` over the
sequence via flax's OptimizedLSTMCell (fused gates hit the MXU); VGG16 is
expressed in NHWC so XLA maps the convs directly.  ImageNet-pretrained VGG
weights can be loaded from a local torchvision state dict via
``convert_vgg16_state_dict`` (no network in this environment).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]


class VGG16Features(nn.Module):
    """torchvision vgg16.features in NHWC; input [B, 224, 224, 3]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv_i = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
        return x  # [B, 7, 7, 512]


class ImageEncoder(nn.Module):
    """VGG16 trunk + first two classifier FCs -> [B, 4096]
    (`vqa_sunrgbd_model.py:5-42`; final 1000-way layer dropped)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = VGG16Features(self.dtype, name="features")(x)
        # torch flattens CHW row-major: [B,512,7,7] -> 25088.  Transpose the
        # NHWC activations to NCHW before flattening so converted torch FC
        # weights line up.
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc2")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        return x


class QuestionEncoder(nn.Module):
    """Embedding + 2-layer LSTM; concat final hidden states -> FC -> tanh
    (`vqa_sunrgbd_model.py:44-80`)."""

    vocab_size: int
    embed_size: int = 300
    hidden_size: int = 512
    out_size: int = 4096
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, question):  # [B, S] int32
        emb = nn.Embed(self.vocab_size, self.embed_size, dtype=self.dtype,
                       name="embedding")(question)
        finals = []
        x = emb
        for layer in range(2):
            rnn = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype),
                return_carry=True,
                name=f"lstm_{layer}",
            )
            (c_n, h_n), x = rnn(x)
            finals.append(h_n)
        concat = jnp.concatenate(finals, axis=-1)  # [B, 2*hidden]
        return jnp.tanh(nn.Dense(self.out_size, dtype=self.dtype, name="fc")(concat))


class PanesarVQAModel(nn.Module):
    """`VQASUNRGBDModel` (`vqa_sunrgbd_model.py:82-160`)."""

    vocab_size: int
    num_classes: int = 818
    embed_size: int = 300
    hidden_size: int = 512
    fusion_method: str = "conv1d"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img_rgb, img_depth, question, deterministic=True):
        fm = self.fusion_method.lower()
        if fm == "fusion_at_start":
            combined = jnp.maximum(img_rgb, img_depth)
            img_feat = ImageEncoder(self.dtype, name="img_enc")(
                combined, deterministic
            )
            q_feat = QuestionEncoder(
                self.vocab_size, self.embed_size, self.hidden_size,
                dtype=self.dtype, name="q_enc",
            )(question)
            h = q_feat * img_feat
        else:
            f_rgb = ImageEncoder(self.dtype, name="img_enc_rgb")(
                img_rgb, deterministic
            )
            f_depth = ImageEncoder(self.dtype, name="img_enc_depth")(
                img_depth, deterministic
            )
            g_rgb = QuestionEncoder(
                self.vocab_size, self.embed_size, self.hidden_size,
                dtype=self.dtype, name="q_enc_rgb",
            )(question)
            g_depth = QuestionEncoder(
                self.vocab_size, self.embed_size, self.hidden_size,
                dtype=self.dtype, name="q_enc_depth",
            )(question)
            h_rgb = g_rgb * f_rgb
            h_depth = g_depth * f_depth
            if fm == "hadamard":
                h = h_rgb * h_depth
            elif fm == "addition":
                h = h_rgb + h_depth
            elif fm == "maxpool":
                h = jnp.maximum(h_rgb, h_depth)
            elif fm == "conv1d":
                stacked = jnp.stack([h_rgb, h_depth], axis=-1)  # [B, 4096, 2]
                h = nn.Conv(1, (1,), dtype=self.dtype, name="conv1d")(stacked)
                h = h[..., 0]
            else:
                raise ValueError(f"Unknown fusion method {fm}")
        return nn.Dense(self.num_classes, dtype=self.dtype, name="mlp")(h)


def convert_vgg16_state_dict(sd: Dict, params: Dict, prefix: str = "") -> Dict:
    """Overlay torchvision vgg16 weights (features + classifier[0,3]) onto
    an ImageEncoder param subtree."""
    import numpy as np

    out = jax.tree.map(lambda x: x, params)  # shallow copy
    # torchvision indexes convs by Sequential position (conv, relu, pools)
    positions = []
    pos = 0
    for v in VGG16_CFG:
        if v == "M":
            pos += 1
        else:
            positions.append(pos)
            pos += 2  # conv + relu
    for i, p in enumerate(positions):
        w = np.asarray(sd[f"{prefix}features.{p}.weight"])
        b = np.asarray(sd[f"{prefix}features.{p}.bias"])
        out["features"][f"conv_{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0), "bias": b,
        }
    out["fc1"] = {
        "kernel": np.asarray(sd[f"{prefix}classifier.0.weight"]).T,
        "bias": np.asarray(sd[f"{prefix}classifier.0.bias"]),
    }
    out["fc2"] = {
        "kernel": np.asarray(sd[f"{prefix}classifier.3.weight"]).T,
        "bias": np.asarray(sd[f"{prefix}classifier.3.bias"]),
    }
    return out
