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


def xla_chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    chunk: int = 512,
) -> jnp.ndarray:
    """Flash-attention memory behavior out of pure XLA ops.

    Scans over query chunks; each chunk materializes only a
    [B, H, chunk, Skv] probability block, and ``jax.checkpoint`` on the
    chunk body makes the scan backward recompute it instead of saving all
    chunks.  Peak memory O(chunk·Skv) like the Pallas kernel, but the
    matmuls/softmax are stock XLA — on environments where Pallas custom
    calls execute de-optimized (e.g. tunneled chipless-AOT runtimes, see
    bench.py notes) this is ~an order of magnitude faster.

    q [B,Sq,Hq,D], k/v [B,Skv,Hkv,D]; kv_mask [B,Skv] True=attend.
    """
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if hq != hkv:
        k = _repeat_kv(k, hq // hkv)
        v = _repeat_kv(v, hq // hkv)
    scale = (d**-0.5) if scale is None else scale

    pad = (-sq) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else q
    n_chunks = qp.shape[1] // chunk
    qc = qp.reshape(b, n_chunks, chunk, hq, d).swapaxes(0, 1)

    kpos = jnp.arange(skv)[None, None, None, :]
    kvm = None if kv_mask is None else kv_mask[:, None, None, :]

    import functools

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def one(args):
        i, qblk = args
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qblk, k, preferred_element_type=jnp.float32
        ) * scale
        neg = jnp.finfo(jnp.float32).min * 0.5
        if causal:
            qpos = i * chunk + jnp.arange(chunk)[None, None, :, None]
            logits = jnp.where(qpos >= kpos, logits, neg)
        if kvm is not None:
            logits = jnp.where(kvm, logits, neg)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    outs = jax.lax.map(one, (jnp.arange(n_chunks), qc))
    out = outs.swapaxes(0, 1).reshape(b, qp.shape[1], hq, d)
    return out[:, :sq]


def gqa_decode_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single/few-token decode attention without GQA materialization.

    The stock XLA path repeats K/V to the query head count first
    (``_repeat_kv``) — at decode that re-broadcasts the whole KV cache
    ([B, S_total, Hq, D], ~7x the stored bytes for the 0.5B student's
    14q/2kv) on EVERY step of EVERY layer; profiled at ~60% of the decode
    step (docs/PERF_NOTES.md r3).  Here the query is reshaped to
    [B, Sq, Hkv, G, D] and contracted against the cache directly, so the
    only KV traffic is the cache itself.

    mask: [B, 1, Sq, Skv] or [B, Sq, Skv] boolean, True = attend.
    """
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    g = hq // hkv
    scale = (d**-0.5) if scale is None else scale
    qg = q.reshape(b, sq, hkv, g, d)
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None]
        # [B, 1, Sq, Skv] -> [B, 1, 1, Sq, Skv] over (hkv, g)
        logits = jnp.where(mask[:, :, None], logits, -jnp.inf)
    all_masked = jnp.all(jnp.isneginf(logits), axis=-1, keepdims=True)
    logits = jnp.where(all_masked, 0.0, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(b, sq, hq, d)


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
    impl: "xla" (full probs), "xla_chunked" (flash memory behavior, stock
    XLA ops), "pallas" (flash kernel).
    """
    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask, causal=causal, scale=scale)
    if impl == "pallas_spmd":
        from .flash_attention import flash_attention_spmd

        return flash_attention_spmd(q, k, v, mask=mask, causal=causal, scale=scale)
    if impl == "xla_chunked":
        kv_mask = None
        if mask is not None:
            if mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1:
                kv_mask = mask[:, 0, 0, :]
            elif mask.ndim == 2:
                kv_mask = mask
            else:
                raise ValueError(
                    "xla_chunked supports kv-padding masks only; got "
                    f"shape {mask.shape}"
                )
        return xla_chunked_attention(
            q, k, v, kv_mask=kv_mask, causal=causal, scale=scale
        )

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
