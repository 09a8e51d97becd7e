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
(q/k/v/out, fc1/fc2) quantize too.  Norms, the patch conv and the
projector always stay bf16 (negligible share of teacher bytes/FLOPs).
``include_embed_head=True`` additionally quantizes the token embedding
(per-row scales; consumed by a model built with ``embed_quant="int8"``)
and the untied lm-head (per-vocab-column scales; the fused loss kernels
in ops/fused_loca.py / ops/fused_kl.py stream the int8 head directly,
dequantizing per vocab block in VMEM — the per-column scale factors out
of the ``hidden @ head`` dot exactly).  At the real 7B teacher the
embed+head pair is 2.2 GB of bf16; int8 halves it AND removes the 1 GB
bf16 head copy the loss kernels otherwise materialize — the levers that
fit the 7B-teacher KD step on a single 16 GB chip (bench.py --teacher 7b).

The reference has no counterpart (its 7B teacher runs eager fp16 under
torch.no_grad, `phase1/OnlineKnowledgeDistillationLLavaOneVision.py:206-225`);
this is TPU-native headroom for the KD product.
"""

from __future__ import annotations

import os as _os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def quant_impl(gspmd: bool) -> str:
    """w8a8 matmul implementation for a program: GSPMD-sharded programs
    (an active mesh / ``attn_impl="pallas_spmd"``) must pin the XLA form —
    the partitioner cannot shard the fused Pallas int8 custom call — while
    single-device programs use the fused Pallas kernel.  Single source of
    the rule for every CLI/bench that builds a quantized model."""
    return "int8_xla" if gspmd else "int8"


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


def int8_matmul_xla(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    wscale: jnp.ndarray,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """x [..., in] @ dequant(wq [in, out]) with dynamic per-row activation quant.

    The int8 x int8 -> int32 ``dot_general`` is what engages the MXU's
    double-rate int8 path; everything around it is elementwise VPU work that
    XLA fuses into the surrounding program.  This is the default form
    everywhere: GSPMD-partitionable (plain HLO) for the TP-sharded
    teacher, and measured faster end-to-end than the fused Pallas kernel
    below (see ``int8_matmul``'s docstring for the A/B).
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


# ---------------------------------------------------------------------------
# Fused Pallas w8a8 matmul (opt-in; measured A/B kept for the record)
#
# Motivation: the XLA form costs ~12 ms/step of standalone activation-
# quant fusions on the KD bench (convert_reduce + clamp_convert over
# every projection input).  Here the quant runs on the VPU inside the
# matmul kernel itself, per [BN, BK] block as it streams through VMEM
# (quant is O(BN*BK) per grid step vs the dot's O(BN*BM*BK)).
#
# Outcome (v5e, r3): isolated parity with the XLA int8 dot (178.6 vs
# 181.2 TOP/s at [3072,2048]x[2048,2048]) but -21% end-to-end on the KD
# step — the producer/consumer elementwise fusions XLA loses across the
# custom-call boundary at every projection cost more than the quant
# passes saved.  Default stays XLA; opt in via KDSS_INT8_IMPL=pallas.
#
# Scales are per-row *per-K-block* (finer than the XLA form's per-row
# global scale, so quantization error is no worse); with a single K block
# (K <= BK) the two forms compute identical values.  Accumulation is f32
# across K blocks in a VMEM scratch; the per-output-channel weight scale
# applies once at the last K step.
# ---------------------------------------------------------------------------

_INT8_BN = int(_os.environ.get("KDSS_INT8_BN", "256"))
_INT8_BM = int(_os.environ.get("KDSS_INT8_BM", "512"))
_INT8_BK = int(_os.environ.get("KDSS_INT8_BK", "512"))


def _pick_block(dim: int, pref: int) -> int:
    """Largest power-of-two block <= pref that divides dim (>=128)."""
    b = pref
    while b > 128 and dim % b:
        b //= 2
    return b


def _int8_mm_kernel(x_ref, wq_ref, ws_ref, o_ref, acc_ref):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-6)
    xq = jnp.clip(jnp.round(xf * (127.0 / amax)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[:] += acc.astype(jnp.float32) * (amax * (1.0 / 127.0))

    @pl.when(kb == pl.num_programs(2) - 1)
    def _done():
        o_ref[:] = (acc_ref[:] * ws_ref[:]).astype(o_ref.dtype)


def int8_matmul_pallas(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    wscale: jnp.ndarray,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Fused act-quant + int8 MXU matmul.  Requires K, M divisible by 128.

    Leading dims of ``x`` flatten to rows; a ragged row count is padded up
    to the row block (padded rows quantize garbage but only pollute their
    own dropped output rows — the dot is row-local in x).
    """
    *lead, k = x.shape
    n = 1
    for d in lead:
        n *= d
    m = wq.shape[1]
    x2 = x.reshape(n, k)
    bn = _pick_block(max(n, 128), _INT8_BN)
    bm = _pick_block(m, _INT8_BM)
    bk = _pick_block(k, _INT8_BK)
    if k % bk or m % bm:
        return int8_matmul_xla(x, wq, wscale, out_dtype)
    n_pad = -n % bn
    if n_pad:
        x2 = jnp.pad(x2, ((0, n_pad), (0, 0)))
    grid = ((n + n_pad) // bn, m // bm, k // bk)
    out = pl.pallas_call(
        _int8_mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bm), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bm), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bn, bm), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, m), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
    )(x2, wq, wscale.reshape(1, m).astype(jnp.float32))
    return out[:n].reshape(*lead, m)


def int8_matmul(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    wscale: jnp.ndarray,
    out_dtype: jnp.dtype = jnp.bfloat16,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch.  ``auto`` resolves to the XLA form: the fused Pallas kernel
    was measured at isolated parity with XLA's int8 dot (178.6 vs 181.2
    TOP/s at the teacher projection shape on v5e) but **-21% end-to-end**
    on the KD step (2.375 vs 3.019 samples/s) — the standalone quant
    fusions it eliminates (~12 ms/step) cost less than the producer/
    consumer elementwise fusions XLA loses across the custom-call
    boundary at every projection.  Kept as an opt-in (``impl="pallas"`` or
    ``KDSS_INT8_IMPL=pallas``) with the A/B recorded in PERF_NOTES; the
    XLA form is also what GSPMD-sharded mesh programs require (the
    partitioner cannot split a Pallas custom call).
    """
    if impl == "auto":
        impl = _os.environ.get("KDSS_INT8_IMPL", "xla")
    if impl == "pallas":
        *lead, k = x.shape
        n = 1
        for d in lead:
            n *= d
        if (
            jax.default_backend() != "cpu"
            and n >= 256
            and k % 128 == 0
            and wq.shape[1] % 128 == 0
        ):
            return int8_matmul_pallas(x, wq, wscale, out_dtype)
    return int8_matmul_xla(x, wq, wscale, out_dtype)


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


def quantize_embedding_int8(
    emb: jnp.ndarray, clip: float = 127.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[V, D] embedding -> (int8 [V, D], f32 [V, 1] per-ROW scale).

    Per-row (per-token-id) scales: an embedding lookup gathers whole rows,
    so dequantization is one gathered scale per token.
    """
    ef = emb.astype(jnp.float32)
    scale = jnp.max(jnp.abs(ef), axis=1, keepdims=True) / clip
    scale = jnp.maximum(scale, 1e-8)
    eq = jnp.clip(jnp.round(ef / scale), -clip, clip).astype(jnp.int8)
    return eq, scale.astype(jnp.float32)


def quantize_lm_params_int8(
    params: Dict[str, Any],
    include_vision: bool = False,
    include_embed_head: bool = False,
) -> Dict[str, Any]:
    """Quantize the decoder-block projections of a LlavaOnevision (or bare
    Qwen2LM) param tree for use with ``quant="int8"`` models.

    ``include_vision=True`` additionally quantizes the SigLIP encoder
    projections (``QUANTIZED_VISION_NAMES``) for a model built with
    ``vision_quant="int8"``.  ``include_embed_head=True`` also quantizes
    the token embedding (for ``embed_quant="int8"`` models; per-row
    scales) and the untied lm_head (per-column scales; the fused loss
    kernels consume the (kernel_q, kernel_scale) pair directly).  The
    projector, norms and patch conv always pass through unchanged.
    """
    if "language_model" in params:
        new = dict(params)
        lm = _quantize_tree(params["language_model"])
        if include_embed_head:
            lm = dict(lm)
            emb = lm["embed_tokens"]
            if "embedding" in emb:
                eq, es = quantize_embedding_int8(emb["embedding"])
                lm["embed_tokens"] = {
                    "embedding_q": eq, "embedding_scale": es,
                }
            if "lm_head" in lm and "kernel" in lm["lm_head"]:
                # Stored VOCAB-MAJOR [Vt, Dt] (r5): the fused loss
                # kernels stream [BV, Dt] row blocks in place, exactly
                # like the student's tied [V, D] head.  The legacy
                # [Dt, Vt] storage forced XLA to retile a 520 MB copy of
                # the whole int8 head (plus a remat twin) ahead of every
                # pallas loss call — the top copy/layout op of the r5
                # step profile and the allocation blocking B=2 on one
                # chip.  Scales stay per-vocab (now per-ROW of wq).
                wq, ws = absmax_quantize_weight(lm["lm_head"]["kernel"])
                lm["lm_head"] = {"kernel_q": wq.T, "kernel_scale": ws}
        new["language_model"] = lm
        if include_vision and "vision_tower" in params:
            new["vision_tower"] = _quantize_tree(
                params["vision_tower"], QUANTIZED_VISION_NAMES
            )
        return new
    return _quantize_tree(params)
