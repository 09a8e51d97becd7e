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


def _merge_last(carry_pos, carry_val, pos, val):
    """Merge two last-occurrence (position, value) column tables: keep the
    entry with the LATER flat position (positions are unique, -1 = none)."""
    take = pos > carry_pos
    return jnp.maximum(carry_pos, pos), jnp.where(take, val, carry_val)


def chunked_faithful_loca(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    labels: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    *,
    temperature: float = 1.0,
    alpha: float = 0.8,
    chunk_size: int = 256,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Reference-faithful LoCa without materializing [B, S, V] logits.

    The faithful variant (`logit_based/OnlineKnowledgeDistillationLLavaOne
    Vision.py:240-252`; semantics pinned against torch in
    tests/test_losses.py::test_loca_faithful_matches_torch_fancy_indexing)
    replicates the reference's full-tensor fancy-indexing writes: for each
    label / 2nd-best vocab id it overwrites that WHOLE vocab column across
    every (b, s) position, last write (in [B, S] row-major flat order)
    wins.  That global structure fits in two [V] column tables —
    (last position, written value) for the label writes and the 2nd-best
    writes — so the O(S·V) tensor the materialized path needs
    (train/step.py r4: [B,S,152k] f32, cannot run at production shapes on
    one chip) reduces to a two-pass sequence-chunked scan:

      pass 1 (teacher-only, no grads): per chunk, compute the teacher
        prob block, per-position target/2nd-best write values, and fold
        the chunk's last-occurrence tables into the carried [V] tables
        via scatter-max on GLOBAL flat positions (b * S_pad + s preserves
        the reference's b-major, s-minor write order).
      pass 2 (checkpointed, grads to the student): per chunk, rebuild
        both prob blocks, apply the column tables (label writes first,
        2nd-best overwrites — reference order), and accumulate the KL
        sum.

    Exactly the math of ``kd_losses.loca_loss(faithful_indexing=True)``
    on materialized logits (parity-tested in tests/test_chunked.py),
    including the quirk that invalid-label positions write column 0
    unless NO valid label exists anywhere.
    """
    b, s_len, _ = student_hidden.shape
    vs = student_head.shape[-1]
    dt = teacher_hidden.shape[-1]
    ws = student_head
    # Teacher head forms: dense [Dt, Vt], or the int8 (kernel_q,
    # kernel_scale) pair in either storage orientation (r5 vocab-major
    # [Vt, Dt] or legacy [Dt, Vt]).  The pair is dequantized per CHUNK
    # inside t_probs — the dense [Dt, Vt] bf16 temp
    # (train/step.py::dense_teacher_head, 1.09 GB at the 7B head) was
    # exactly the allocation that kept --loca_faithful from fitting one
    # chip (r5 OOM dump: 566 MB over).  Prefix truncation to the student
    # vocab happens on the head slice (pre-softmax, reference semantics).
    tq = isinstance(teacher_head, tuple)
    if tq:
        wq, wsc = teacher_head
        t_vd = wq.shape[0] != dt
        wsc = wsc.reshape(-1)[:vs]
        wq = wq[:vs] if t_vd else wq[:, :vs]
    else:
        wt = teacher_head[:, :vs]  # pre-softmax prefix truncation

    sh = _pad_to_multiple(student_hidden, chunk_size, axis=1)
    th = _pad_to_multiple(teacher_hidden, chunk_size, axis=1)
    lbl = _pad_to_multiple(labels, chunk_size, axis=1, value=IGNORE_INDEX)
    pv = _pad_to_multiple(
        jnp.ones((b, s_len), dtype=bool), chunk_size, axis=1, value=False)
    s_pad = sh.shape[1]
    n_chunks = s_pad // chunk_size

    def to_chunks(x):
        return x.reshape(b, n_chunks, chunk_size, *x.shape[2:]).swapaxes(0, 1)

    xs = {
        "sh": to_chunks(sh), "th": to_chunks(th),
        "lbl": to_chunks(lbl), "pv": to_chunks(pv),
        "ci": jnp.arange(n_chunks, dtype=jnp.int32),
    }

    def t_probs(th_chunk):
        if tq:
            # Dequantize per VOCAB SLAB: a whole-head ``wq.astype(bf16)``
            # is loop-invariant across the chunk scan, and XLA hoists it
            # into a held [Vs, Dt] bf16 temp (1.01 GB at the 7B head —
            # the allocation that re-OOMed --loca_faithful after the
            # dense-head temp was removed).  Slab slices are distinct
            # inputs, so the converts stay inside the loop at ~1/8 the
            # temp footprint each.
            n_slabs = 8 if vs >= 8 * 128 else 1
            bounds = [vs * i // n_slabs for i in range(n_slabs + 1)]
            parts = []
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                wq_s = (wq[lo:hi] if t_vd else wq[:, lo:hi]).astype(
                    th_chunk.dtype)
                parts.append(jnp.einsum(
                    "bcd,vd->bcv" if t_vd else "bcd,dv->bcv",
                    th_chunk, wq_s,
                    preferred_element_type=jnp.float32) * wsc[lo:hi])
            t_logits = jnp.concatenate(parts, axis=-1)
        else:
            t_logits = jnp.einsum(
                "bcd,dv->bcv", th_chunk, wt,
                preferred_element_type=jnp.float32)
        return jax.nn.softmax(t_logits / temperature, axis=-1)

    def chunk_write_values(p_t, lbl_chunk):
        """Per-position (label write value, 2nd-best id, 2nd-best value)."""
        valid = lbl_chunk >= 0
        safe = jnp.where(valid, lbl_chunk, 0)
        p_gt = jnp.take_along_axis(p_t, safe[..., None], axis=-1)[..., 0]
        _, top2 = jax.lax.top_k(p_t, 2)
        k_idx = top2[..., 1]
        p_k = jnp.take_along_axis(p_t, k_idx[..., None], axis=-1)[..., 0]
        sc = alpha / (1.0 - p_gt + p_k)
        target_val = 1.0 - sc * (p_t.sum(axis=-1) - p_gt)
        return safe, target_val, k_idx, sc * p_k, valid

    def chunk_last(idx, val, gpos, ci):
        """Chunk-local last-occurrence tables on GLOBAL positions."""
        flat_idx = idx.reshape(-1)
        flat_val = val.reshape(-1)
        flat_pos = gpos.reshape(-1)
        last = jnp.full((vs,), -1, jnp.int32).at[flat_idx].max(flat_pos)
        hit = last >= 0
        # global pos -> chunk-local flat index (b-major stride s_pad)
        g = jnp.where(hit, last, 0)
        bi = g // s_pad
        local = bi * chunk_size + (g - bi * s_pad - ci * chunk_size)
        return last, jnp.where(hit, flat_val[local], 0.0)

    def pass1(carry, chunk):
        lbl_pos, lbl_val, k_pos, k_val, any_valid = carry
        p_t = t_probs(chunk["th"])
        safe, target_val, k_idx, k_write, valid = chunk_write_values(
            p_t, chunk["lbl"])
        gpos = (jnp.arange(b, dtype=jnp.int32)[:, None] * s_pad
                + chunk["ci"] * chunk_size
                + jnp.arange(chunk_size, dtype=jnp.int32)[None, :])
        gpos = jnp.where(chunk["pv"], gpos, -1)  # padding never writes
        cp, cv = chunk_last(safe, target_val, gpos, chunk["ci"])
        lbl_pos, lbl_val = _merge_last(lbl_pos, lbl_val, cp, cv)
        cp, cv = chunk_last(k_idx, k_write, gpos, chunk["ci"])
        k_pos, k_val = _merge_last(k_pos, k_val, cp, cv)
        any_valid = jnp.logical_or(
            any_valid, jnp.any(jnp.logical_and(valid, chunk["pv"])))
        return (lbl_pos, lbl_val, k_pos, k_val, any_valid), None

    init = (
        jnp.full((vs,), -1, jnp.int32), jnp.zeros((vs,), jnp.float32),
        jnp.full((vs,), -1, jnp.int32), jnp.zeros((vs,), jnp.float32),
        jnp.zeros((), bool),
    )
    (lbl_pos, lbl_val, k_pos, k_val, any_valid), _ = jax.lax.scan(
        pass1, init,
        jax.lax.stop_gradient({k: v for k, v in xs.items() if k != "sh"}))
    # reference quirk: ignore-labels write column 0 via clamping — unless
    # there is no valid label anywhere (kd_losses.loca_calibrated_probs)
    lbl_hit = jnp.logical_and(lbl_pos >= 0, any_valid)
    k_hit = k_pos >= 0

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def pass2(carry, chunk):
        p_t = t_probs(jax.lax.stop_gradient(chunk["th"]))
        s_logits = jnp.einsum(
            "bcd,dv->bcv", chunk["sh"], ws, preferred_element_type=jnp.float32)
        p_s = jax.nn.softmax(s_logits / temperature, axis=-1)
        log_p_s = jnp.log(jnp.clip(p_s, eps, None))
        out = jnp.where(lbl_hit[None, None, :], lbl_val[None, None, :], p_t)
        out = jnp.where(k_hit[None, None, :], k_val[None, None, :], out)
        safe_log = jnp.log(jnp.where(out > 0, out, 1.0))
        el = jnp.where(out > 0, out * (safe_log - log_p_s), 0.0)
        scale = chunk["pv"].astype(jnp.float32)
        return carry + (el.sum(-1) * scale).sum(), None

    loca_sum, _ = jax.lax.scan(pass2, jnp.zeros((), jnp.float32), xs)
    return loca_sum / (b * s_len * vs) * (temperature**2)
