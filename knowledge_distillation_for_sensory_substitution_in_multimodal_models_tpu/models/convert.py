"""HF checkpoint -> Flax parameter conversion.

The reference loads ``llava-hf/llava-onevision-qwen2-{0.5b,7b}-ov-hf`` via
``from_pretrained`` (`phase1/OnlineKnowledgeDistillationLLavaOneVision.py:33-48`).
Here HF weights (a state dict or a local safetensors directory — this
environment has no network egress) are remapped into the Flax param tree of
:class:`~..models.llava_onevision.LlavaOnevision`.

Layout rules:
* torch ``nn.Linear`` weight [out, in]  -> flax Dense kernel [in, out]
* torch ``nn.Conv2d`` weight [O, I, kh, kw] -> flax Conv kernel [kh, kw, I, O]
* embeddings / norms copy through.

Both the new-style key scheme (``model.language_model.layers...``) and the
legacy one (``language_model.model.layers...``) are accepted.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Mapping

import numpy as np

from ..configs import LlavaOnevisionConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().to("cpu").float().numpy()


def _normalize_key(k: str) -> str:
    """Map every known HF key scheme to the canonical new-style scheme."""
    k = re.sub(r"^model\.", "", k)
    k = k.replace("language_model.model.", "language_model.")
    # legacy serialization nests the head under the LM wrapper
    k = k.replace("language_model.lm_head.", "lm_head.")
    return k


def convert_hf_state_dict(
    state_dict: Mapping[str, "np.ndarray"], cfg: LlavaOnevisionConfig
) -> Dict:
    """Return the flax ``params`` pytree for :class:`LlavaOnevision`."""
    sd = {_normalize_key(k): v for k, v in state_dict.items()}

    def take(key: str) -> np.ndarray:
        return _np(sd.pop(key))

    def linear(prefix: str, bias: bool = True) -> Dict:
        out = {"kernel": take(prefix + ".weight").T}
        if bias and prefix + ".bias" in sd:
            out["bias"] = take(prefix + ".bias")
        return out

    def layernorm(prefix: str) -> Dict:
        return {"scale": take(prefix + ".weight"), "bias": take(prefix + ".bias")}

    def rmsnorm(prefix: str) -> Dict:
        return {"weight": take(prefix + ".weight")}

    params: Dict = {}

    # ---- vision tower ----
    vt = "vision_tower.vision_model"
    vision: Dict = {}
    conv_w = take(f"{vt}.embeddings.patch_embedding.weight")
    vision["patch_embedding"] = {
        "kernel": conv_w.transpose(2, 3, 1, 0),
        "bias": take(f"{vt}.embeddings.patch_embedding.bias"),
    }
    vision["position_embedding"] = take(f"{vt}.embeddings.position_embedding.weight")
    for i in range(cfg.vision.num_hidden_layers):
        lp = f"{vt}.encoder.layers.{i}"
        vision[f"layers_{i}"] = {
            "layer_norm1": layernorm(f"{lp}.layer_norm1"),
            "layer_norm2": layernorm(f"{lp}.layer_norm2"),
            "self_attn": {
                "q_proj": linear(f"{lp}.self_attn.q_proj"),
                "k_proj": linear(f"{lp}.self_attn.k_proj"),
                "v_proj": linear(f"{lp}.self_attn.v_proj"),
                "out_proj": linear(f"{lp}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": linear(f"{lp}.mlp.fc1"),
                "fc2": linear(f"{lp}.mlp.fc2"),
            },
        }
    vision["post_layernorm"] = layernorm(f"{vt}.post_layernorm")
    params["vision_tower"] = vision

    # ---- projector / newline ----
    params["multi_modal_projector"] = {
        "linear_1": linear("multi_modal_projector.linear_1"),
        "linear_2": linear("multi_modal_projector.linear_2"),
    }
    params["image_newline"] = take("image_newline")

    # ---- language model ----
    lm: Dict = {"embed_tokens": {"embedding": take("language_model.embed_tokens.weight")}}
    for i in range(cfg.text.num_hidden_layers):
        lp = f"language_model.layers.{i}"
        lm[f"layers_{i}"] = {
            "input_layernorm": rmsnorm(f"{lp}.input_layernorm"),
            "post_attention_layernorm": rmsnorm(f"{lp}.post_attention_layernorm"),
            "self_attn": {
                "q_proj": linear(f"{lp}.self_attn.q_proj"),
                "k_proj": linear(f"{lp}.self_attn.k_proj"),
                "v_proj": linear(f"{lp}.self_attn.v_proj"),
                "o_proj": linear(f"{lp}.self_attn.o_proj", bias=False),
            },
            "mlp": {
                "gate_proj": linear(f"{lp}.mlp.gate_proj", bias=False),
                "up_proj": linear(f"{lp}.mlp.up_proj", bias=False),
                "down_proj": linear(f"{lp}.mlp.down_proj", bias=False),
            },
        }
    lm["norm"] = rmsnorm("language_model.norm")
    if not cfg.text.tie_word_embeddings:
        lm["lm_head"] = linear("lm_head", bias=False)
    else:
        sd.pop("lm_head.weight", None)  # tied; HF may still serialize it
    params["language_model"] = lm

    leftover = [k for k in sd if not k.endswith("rotary_emb.inv_freq")]
    if leftover:
        raise ValueError(f"unconverted HF keys: {leftover[:8]}{'...' if len(leftover) > 8 else ''}")
    return params


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Read all *.safetensors shards in a local HF snapshot directory."""
    from safetensors import safe_open

    state = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for f in files:
        with safe_open(os.path.join(path, f), framework="np") as reader:
            for k in reader.keys():
                state[k] = reader.get_tensor(k)
    return state


def load_llava_onevision_params(path: str, cfg: LlavaOnevisionConfig) -> Dict:
    """Local HF snapshot dir -> flax params (no network)."""
    return convert_hf_state_dict(load_safetensors_dir(path), cfg)
