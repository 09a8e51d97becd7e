"""Sequence-chunked, never-materialized KD losses.

The reference computes KD losses on fully materialized logits tensors
(`logit_based/OnlineKnowledgeDistillationLLavaOneVision.py:208-261`): with
OneVision anyres sequences (~7k tokens) and a 152k vocab that is two
``[B, S, 152k]`` float tensors (~4.4 GB each in f32) live at once — fine on
an 80GB A100, fatal on a 16GB v5e chip.

TPU-native design: the train step never materializes logits.  It takes the
final *hidden states* of teacher and student plus their (static) head
matrices and scans over sequence chunks; each chunk computes both logits
blocks ([B, C, V]), the partial loss sums, and is wrapped in
``jax.checkpoint`` so the backward pass recomputes the chunk logits instead
of storing them.  Peak logits memory drops from O(S·V) to O(C·V) while the
MXU still sees large [B·C, D] x [D, V] matmuls.

Loss semantics are identical to the full-tensor versions in
``kd_losses.py`` (verified in tests/test_chunked.py):

* ``ce``   — HF shift-by-one masked CE over labels != -100
* ``kl``   — temperature KL, torch ``reduction='mean'`` (divide by B*S*V)
* ``loca`` — paper-correct per-position LoCa calibration (the reference's
  global fancy-indexing variant needs full logits; use
  ``kd_losses.loca_loss(faithful_indexing=True)`` for that).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .kd_losses import IGNORE_INDEX


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int, value=0):
    s = x.shape[axis]
    pad = (-s) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _chunk_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sum NLL, count) over one chunk.  labels already shifted/ignored."""
    mask = labels != IGNORE_INDEX
    safe = jnp.where(mask, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = (logz - gold) * mask
    return nll.sum(), mask.sum()


def chunked_kd_terms(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    labels: jnp.ndarray,
    teacher_hidden: Optional[jnp.ndarray] = None,
    teacher_head: Optional[jnp.ndarray] = None,
    *,
    temperature: float = 1.0,
    loca_alpha: float = 0.8,
    chunk_size: int = 256,
    need_ce: bool = True,
    need_kl: bool = False,
    need_loca: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Compute requested loss terms in one scan over sequence chunks.

    Args:
      student_hidden: [B, S, D] final-norm hidden states.
      student_head:   [D, Vs] lm head (embedding.T when tied).
      labels:         [B, S] int labels (-100 = ignore), *unshifted*; CE
                      shifts internally, KD terms use them as-is (the
                      reference passes unshifted labels to LoCa).
      teacher_hidden: [B, S, Dt] (required for kl/loca).
      teacher_head:   [Dt, Vt]; truncated to Vs inside (reference
                      `logit_based/...:222` prefix-truncation semantics,
                      applied pre-softmax).

    Returns dict with any of "ce", "kl", "loca" as f32 scalars, matching the
    unchunked ``kd_losses`` reductions exactly.
    """
    b, s_len, _ = student_hidden.shape
    vs = student_head.shape[-1]
    need_teacher = need_kl or need_loca
    if need_teacher:
        assert teacher_hidden is not None and teacher_head is not None
        teacher_head = teacher_head[:, :vs]

    # CE labels: shift-by-one -> label for position i is labels[i+1].
    ce_labels = jnp.concatenate(
        [labels[:, 1:], jnp.full((b, 1), IGNORE_INDEX, labels.dtype)], axis=1
    )
    # Padded tail positions must contribute nothing: ignore CE there and
    # mark KD positions invalid via an explicit validity mask.
    pos_valid = jnp.ones((b, s_len), dtype=bool)

    # Keep hidden/head operands in their storage dtype (bf16 on TPU): the
    # MXU accumulates in f32 via preferred_element_type, and logits-side
    # math below is f32.  Casting operands up would double both the weight
    # temp and its gradient (~1.5 GB for the 152k-vocab head).
    sh = _pad_to_multiple(student_hidden, chunk_size, axis=1)
    ce_l = _pad_to_multiple(ce_labels, chunk_size, axis=1, value=IGNORE_INDEX)
    kd_l = _pad_to_multiple(labels, chunk_size, axis=1, value=IGNORE_INDEX)
    pv = _pad_to_multiple(pos_valid, chunk_size, axis=1, value=False)
    n_chunks = sh.shape[1] // chunk_size

    def to_chunks(x):
        return x.reshape(b, n_chunks, chunk_size, *x.shape[2:]).swapaxes(0, 1)

    xs = {
        "sh": to_chunks(sh),
        "ce_l": to_chunks(ce_l),
        "kd_l": to_chunks(kd_l),
        "pv": to_chunks(pv),
    }
    if need_teacher:
        th = _pad_to_multiple(teacher_hidden, chunk_size, axis=1)
        xs["th"] = to_chunks(th)

    ws = student_head
    wt = teacher_head if need_teacher else None

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def body(carry, chunk):
        ce_sum, ce_cnt, kl_sum, loca_sum = carry
        s_logits = jnp.einsum(
            "bcd,dv->bcv", chunk["sh"], ws, preferred_element_type=jnp.float32
        )
        if need_ce:
            d_ce, d_cnt = _chunk_ce(s_logits, chunk["ce_l"])
            ce_sum, ce_cnt = ce_sum + d_ce, ce_cnt + d_cnt
        if need_teacher:
            t_logits = jnp.einsum(
                "bcd,dv->bcv", chunk["th"], wt, preferred_element_type=jnp.float32
            )
            # Zero padded positions' contribution by masking after the fact:
            # softmax rows at padded positions still produce finite values,
            # so scale their elementwise terms to zero.
            scale = chunk["pv"].astype(jnp.float32)
            if need_kl:
                t = t_logits / temperature
                s = s_logits / temperature
                log_p_t = jax.nn.log_softmax(t, axis=-1)
                log_p_s = jax.nn.log_softmax(s, axis=-1)
                p_t = jnp.exp(log_p_t)
                kl_el = (p_t * (log_p_t - log_p_s)).sum(-1) * scale
                kl_sum = kl_sum + kl_el.sum()
            if need_loca:
                # per-position sums, masked to valid positions
                vocab = s_logits.shape[-1]
                p_t = jax.nn.softmax(t_logits / temperature, axis=-1)
                p_s = jax.nn.softmax(s_logits / temperature, axis=-1)
                log_p_s2 = jnp.log(jnp.clip(p_s, 1e-8, None))
                lbl = chunk["kd_l"]
                valid = lbl >= 0
                safe = jnp.where(valid, lbl, 0)
                p_gt = jnp.take_along_axis(p_t, safe[..., None], axis=-1)[..., 0]
                _, top2 = jax.lax.top_k(p_t, 2)
                p_k = jnp.take_along_axis(p_t, top2[..., 1:2], axis=-1)[..., 0]
                sc = loca_alpha / (1.0 - p_gt + p_k)
                prob_sum = p_t.sum(axis=-1)
                target_val = 1.0 - sc * (prob_sum - p_gt)
                out = p_t * sc[..., None]
                is_target = (
                    jnp.arange(vocab)[None, None, :] == safe[..., None]
                )
                out = jnp.where(is_target, target_val[..., None], out)
                loca_t = jnp.where(valid[..., None], out, p_t)
                safe_log = jnp.log(jnp.where(loca_t > 0, loca_t, 1.0))
                el = jnp.where(loca_t > 0, loca_t * (safe_log - log_p_s2), 0.0)
                loca_sum = loca_sum + (el.sum(-1) * scale).sum()
        return (ce_sum, ce_cnt, kl_sum, loca_sum), None

    init = (
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    (ce_sum, ce_cnt, kl_sum, loca_sum), _ = jax.lax.scan(body, init, xs)

    out: Dict[str, jnp.ndarray] = {}
    denom_el = b * s_len * vs  # torch 'mean' over true (unpadded) elements
    if need_ce:
        out["ce"] = ce_sum / jnp.maximum(ce_cnt, 1.0)
    if need_kl:
        out["kl"] = kl_sum / denom_el * (temperature**2)
    if need_loca:
        out["loca"] = loca_sum / denom_el * (temperature**2)
    return out
