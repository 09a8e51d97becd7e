"""Int8 (w8a8) matmul path for the frozen KD teacher.

The teacher runs forward-only inside the fused KD step (train/step.py) —
its weights never receive gradients, so they can be quantized once and the
block matmuls executed on the MXU's int8 path (v5e: ~394 int8 TOP/s vs
197 bf16 TFLOP/s) at half the HBM weight traffic.

Scheme (standard symmetric w8a8):
  * weights: per-output-channel absmax int8, quantized ONCE offline
    (``quantize_lm_params_int8``);
  * activations: per-token (row) dynamic absmax int8, quantized on the fly
    inside the layer (a few cheap VPU passes against a 2x faster matmul);
  * accumulation in int32, rescale in f32, output in the model dtype.

``quantize_lm_params_int8`` quantizes the Qwen2 decoder block projections
(q/k/v/o, gate/up/down); with ``include_vision=True`` ("int8_full", the
benched teacher configuration) the SigLIP encoder projections
(q/k/v/out, fc1/fc2) quantize too.  Embeddings, norms, the lm-head, the
patch conv and the projector always stay bf16: the head feeds the KD
loss directly (logit fidelity is what the student distills from) and the
rest are a negligible share of teacher FLOPs.

The reference has no counterpart (its 7B teacher runs eager fp16 under
torch.no_grad, `phase1/OnlineKnowledgeDistillationLLavaOneVision.py:206-225`);
this is TPU-native headroom for the KD product.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

# Modules whose "kernel" is replaced by ("kernel_q", "kernel_scale").
# Must match the QDense call sites in models/qwen2.py exactly.
QUANTIZED_PROJ_NAMES = frozenset(
    {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"}
)
# SigLIP encoder projections (models/siglip.py); patch conv + norms +
# position embedding stay bf16.
QUANTIZED_VISION_NAMES = frozenset(
    {"q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"}
)


def absmax_quantize_weight(
    w: jnp.ndarray, clip: float = 127.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[in, out] f32/bf16 -> (int8 [in, out], f32 per-out-channel scale).

    ``dequant = wq * scale``; symmetric, so zero maps to zero exactly.
    """
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / clip
    scale = jnp.maximum(scale, 1e-8)
    wq = jnp.clip(jnp.round(wf / scale), -clip, clip).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def int8_matmul(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    wscale: jnp.ndarray,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """x [..., in] @ dequant(wq [in, out]) with dynamic per-row activation quant.

    The int8 x int8 -> int32 ``dot_general`` is what engages the MXU's
    double-rate int8 path; everything around it is elementwise VPU work that
    XLA fuses into the surrounding program.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    amax = jnp.maximum(amax, 1e-6)
    xq = jnp.clip(jnp.round(xf * (127.0 / amax)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        wq,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (amax / 127.0) * wscale[None, :]
    return y.astype(out_dtype)


def _quantize_tree(tree: Dict[str, Any], names=QUANTIZED_PROJ_NAMES) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        if k in names and isinstance(v, dict) and "kernel" in v:
            wq, ws = absmax_quantize_weight(v["kernel"])
            nv: Dict[str, Any] = {"kernel_q": wq, "kernel_scale": ws}
            if "bias" in v:
                nv["bias"] = v["bias"]
            out[k] = nv
        elif isinstance(v, dict):
            out[k] = _quantize_tree(v, names)
        else:
            out[k] = v
    return out


def quantize_lm_params_int8(
    params: Dict[str, Any], include_vision: bool = False
) -> Dict[str, Any]:
    """Quantize the decoder-block projections of a LlavaOnevision (or bare
    Qwen2LM) param tree for use with ``quant="int8"`` models.

    ``include_vision=True`` additionally quantizes the SigLIP encoder
    projections (``QUANTIZED_VISION_NAMES``) for a model built with
    ``vision_quant="int8"``.  Everything else (embeddings, norms, lm_head,
    projector, patch conv) passes through unchanged.
    """
    if "language_model" in params:
        new = dict(params)
        new["language_model"] = _quantize_tree(params["language_model"])
        if include_vision and "vision_tower" in params:
            new["vision_tower"] = _quantize_tree(
                params["vision_tower"], QUANTIZED_VISION_NAMES
            )
        return new
    return _quantize_tree(params)
