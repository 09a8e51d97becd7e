"""Attention primitives.

The reference relies on whatever HF/torch SDPA dispatches to (flash-attn is
commented out of its requirements).  Here the default is a single fused-XLA
einsum attention (XLA already fuses softmax into the matmuls on TPU); a
Pallas flash-attention kernel for long teacher sequences lives in
``flash_attention.py`` and is selected via ``impl="pallas"``.

Shapes follow the BSHD convention: q [B, Sq, Hq, D], k/v [B, Skv, Hkv, D]
with grouped-query broadcast when Hq > Hkv.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(
        b, s, h * n_rep, d
    )


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Multi-head attention with optional GQA, padding mask and causality.

    mask: [B, Sq, Skv] or [B, 1, Sq, Skv] boolean, True = attend.
    Softmax accumulates in float32 regardless of input dtype (bf16-safe).
    """
    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask, causal=causal, scale=scale)

    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    if hq != hkv:
        k = _repeat_kv(k, hq // hkv)
        v = _repeat_kv(v, hq // hkv)

    scale = (d**-0.5) if scale is None else scale
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale

    skv = k.shape[1]
    if causal:
        causal_mask = jnp.tril(jnp.ones((sq, skv), dtype=bool), k=skv - sq)
        logits = jnp.where(causal_mask[None, None], logits, -jnp.inf)
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None, :, :]
        logits = jnp.where(mask, logits, -jnp.inf)

    # Rows that are fully masked (padding queries) would produce NaN; give
    # them a uniform distribution instead — their outputs are masked
    # downstream anyway.
    all_masked = jnp.all(jnp.isneginf(logits), axis=-1, keepdims=True)
    logits = jnp.where(all_masked, 0.0, logits)

    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out
