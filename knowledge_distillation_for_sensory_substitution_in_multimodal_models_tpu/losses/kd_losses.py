"""Distillation loss primitives.

Semantics are matched 1:1 against the reference modules (file:line cited per
function); each has a unit test in ``tests/test_losses.py`` comparing against
an independent torch implementation of the same math.

All reductions follow torch conventions used by the reference:
``F.kl_div(reduction='mean')`` divides by the *total element count* (B*S*V),
not the batch size.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def masked_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """HF-style causal LM loss: shift by one, mean CE over labels != ignore.

    Equals the ``outputs.loss`` the reference reads from
    ``LlavaOnevisionForConditionalGeneration`` forward
    (`distillation/LLavaOneVisionModule.py:115-159`).

    logits: [B, S, V] float; labels: [B, S] int.
    """
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    mask = shift_labels != ignore_index
    safe_labels = jnp.where(mask, shift_labels, 0)
    logz = jax.nn.logsumexp(shift_logits.astype(jnp.float32), axis=-1)
    gold = jnp.take_along_axis(
        shift_logits.astype(jnp.float32), safe_labels[..., None], axis=-1
    )[..., 0]
    nll = (logz - gold) * mask
    denom = jnp.maximum(mask.sum(), 1)
    return nll.sum() / denom


def truncate_teacher_logits(
    teacher_logits: jnp.ndarray, student_vocab: int
) -> jnp.ndarray:
    """Teacher/student vocab mismatch -> prefix truncation.

    Reference: ``teacher_logits[:, :, :student_logits.size(2)]``
    (`knowledge_distillation7b_logit_based/OnlineKnowledgeDistillationLLavaOneVision.py:222`).
    """
    return teacher_logits[:, :, :student_vocab]


def kd_kl_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    temperature: float,
) -> jnp.ndarray:
    """Temperature KL: mean_el[ p_T * (log p_T - log p_S) ] * T^2.

    Matches ``F.kl_div(log_softmax(s/T), softmax(t/T), reduction='mean') * T**2``
    with teacher logits pre-truncated to student vocab
    (`phase1/OnlineKnowledgeDistillationLLavaOneVision.py:330-343`).
    """
    teacher_logits = truncate_teacher_logits(teacher_logits, student_logits.shape[-1])
    t = teacher_logits.astype(jnp.float32) / temperature
    s = student_logits.astype(jnp.float32) / temperature
    log_p_t = jax.nn.log_softmax(t, axis=-1)
    log_p_s = jax.nn.log_softmax(s, axis=-1)
    p_t = jnp.exp(log_p_t)
    kl = p_t * (log_p_t - log_p_s)
    return kl.mean() * (temperature**2)


def _last_occurrence_column_values(
    indices: jnp.ndarray, values: jnp.ndarray, vocab: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each vocab id v, the value at the LAST flat position where
    ``indices == v`` (torch advanced-indexing write order), plus a hit mask.

    Deterministic via scatter-max over flat position ids.
    """
    flat_idx = indices.reshape(-1)
    flat_val = values.reshape(-1)
    n = flat_idx.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    last_pos = jnp.full((vocab,), -1, dtype=jnp.int32).at[flat_idx].max(pos)
    hit = last_pos >= 0
    col_val = flat_val[jnp.where(hit, last_pos, 0)]
    return col_val, hit


def loca_calibrated_probs(
    teacher_probs: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float,
    faithful_indexing: bool = False,
) -> jnp.ndarray:
    """LoCa calibration of teacher probabilities.

    Per-position math (`logit_based/...:240-252`):
      sigma = 1 / (1 - p_gt + p_2nd);  s = alpha * sigma
      target prob -> 1 - s * (sum_probs - p_gt)   (= 1 - s*(1 - p_gt))
      2nd-best prob -> s * p_2nd

    ``faithful_indexing=True`` replicates the reference's full-tensor fancy
    indexing (SURVEY.md §2.5 #3): writes whole vocab *columns* for every
    label / 2nd-best id, last write wins, the scale taken from the last
    position using that id.  ``False`` (default) applies the paper-correct
    per-position scatter and additionally rescales *all* non-target probs by
    s so the calibrated distribution sums to 1.

    Positions with labels < 0 (ignore) are left uncalibrated.
    """
    b, s_len, vocab = teacher_probs.shape
    mask_valid = labels >= 0
    safe_labels = jnp.where(mask_valid, labels, 0)

    p_gt = jnp.take_along_axis(teacher_probs, safe_labels[..., None], axis=-1)[..., 0]
    # top-2: second most confident class
    _, top2_idx = jax.lax.top_k(teacher_probs, 2)
    klogits = top2_idx[..., 1]
    p_k = jnp.take_along_axis(teacher_probs, klogits[..., None], axis=-1)[..., 0]

    sigma = 1.0 / (1.0 - p_gt + p_k)
    s = alpha * sigma

    prob_sum = teacher_probs.sum(axis=-1)
    target_val = 1.0 - s * (prob_sum - p_gt)
    klogit_val = s * p_k

    if faithful_indexing:
        # Column-wise writes over the full [B,S] plane; klogit write happens
        # after (and overwrites) the label write, as in the reference.
        lbl_cols, lbl_hit = _last_occurrence_column_values(
            jnp.where(mask_valid, labels, 0), target_val, vocab
        )
        # exclude pure-ignore batches from writing column 0 spuriously
        if labels.ndim == 2:
            any_valid = mask_valid.reshape(-1).any()
            lbl_hit = jnp.where(any_valid, lbl_hit, False)
        k_cols, k_hit = _last_occurrence_column_values(klogits, klogit_val, vocab)
        v = jnp.arange(vocab)
        out = teacher_probs
        out = jnp.where(lbl_hit[None, None, :], lbl_cols[None, None, :], out)
        out = jnp.where(k_hit[None, None, :], k_cols[None, None, :], out)
        del v
        return out

    # Paper-correct: per-position calibration, distribution re-normalized.
    out = teacher_probs * s[..., None]
    out = jnp.where(
        jnp.arange(vocab)[None, None, :] == safe_labels[..., None],
        target_val[..., None],
        out,
    )
    return jnp.where(mask_valid[..., None], out, teacher_probs)


def loca_loss(
    teacher_logits: jnp.ndarray,
    student_logits: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float,
    alpha: float = 0.8,
    faithful_indexing: bool = False,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """LoCa KD term: KL(calibrated teacher || student) * T^2.

    Matches `compute_loca_loss` (`logit_based/...:208-261`) minus the
    ``+ student_loss`` which the caller adds.  The student side uses
    ``log(clamp(softmax(s/T), eps))`` exactly as the reference.
    """
    teacher_logits = truncate_teacher_logits(teacher_logits, student_logits.shape[-1])
    p_t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / temperature, axis=-1)
    p_s = jax.nn.softmax(student_logits.astype(jnp.float32) / temperature, axis=-1)
    log_p_s = jnp.log(jnp.clip(p_s, eps, None))

    loca_t = loca_calibrated_probs(p_t, labels, alpha, faithful_indexing)

    # torch F.kl_div(input=log q, target=p) pointwise: p*(log p - log q),
    # with 0 contribution where p == 0.
    safe_log_p = jnp.log(jnp.where(loca_t > 0, loca_t, 1.0))
    kl = jnp.where(loca_t > 0, loca_t * (safe_log_p - log_p_s), 0.0)
    return kl.mean() * (temperature**2)


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-24) -> jnp.ndarray:
    """L2 normalize with a gradient that is finite at x == 0.

    ``x / norm(x)`` has a NaN gradient at exactly zero (d||x||/dx = x/||x||)
    — and padded anyres tiles produce exactly-zero feature rows, which
    poisoned phase-1 vision grads through 0 * NaN.  rsqrt(max(|x|^2, eps))
    is flat at 0 instead.
    """
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


def pool_and_normalize(features: jnp.ndarray) -> jnp.ndarray:
    """Mean-pool vision tokens then L2-normalize: [B, T, D] -> [B, D].

    Reference: `phase1/...:243-248` (post_layernorm hook output).
    """
    return _l2_normalize(features.mean(axis=1))


def ntxent_loss(
    student_features: jnp.ndarray,
    teacher_features: jnp.ndarray,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """NT-Xent contrastive loss over in-batch pairs.

    Reference `contrastive_loss` (`phase1/...:393-416`): re-normalizes both
    inputs, sim matrix / temperature, CE against the diagonal.  Identically
    zero at batch size 1 (SURVEY.md §2.5 #2) — preserved.
    """
    s = _l2_normalize(student_features)
    t = _l2_normalize(teacher_features)
    # f32 similarity/softmax regardless of feature dtype: bf16 logits
    # quantize the loss to ~2^-8 relative and wash out small gradients
    logits = jnp.einsum(
        "nd,md->nm", s, t, preferred_element_type=jnp.float32
    ) / temperature
    n = logits.shape[0]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.diagonal(log_probs))


def masked_ntxent_loss(
    student_features: jnp.ndarray,
    teacher_features: jnp.ndarray,
    valid: jnp.ndarray,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """NT-Xent over a statically padded item axis.

    In the reference the contrastive "batch" items are the anyres *tiles*
    captured by the post_layernorm hook (pixel_values is the flattened tile
    batch, so ``hook_out.mean(dim=1)`` is [n_tiles, 1152] — see
    `phase1/OnlineKnowledgeDistillationLLavaOneVision.py:243-248,316-354`).
    On TPU the tile axis is padded to a static budget; ``valid`` masks the
    padding out of both the similarity columns and the reduction.

    student/teacher_features: [N, D]; valid: [N] bool.
    """
    s = _l2_normalize(student_features)
    t = _l2_normalize(teacher_features)
    # f32 similarity/softmax regardless of feature dtype: bf16 logits
    # quantize the loss to ~2^-8 relative and wash out small gradients
    logits = jnp.einsum(
        "nd,md->nm", s, t, preferred_element_type=jnp.float32
    ) / temperature
    neg_inf = jnp.finfo(logits.dtype).min
    logits = jnp.where(valid[None, :], logits, neg_inf)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    diag = jnp.diagonal(log_probs)
    n_valid = jnp.maximum(valid.sum(), 1)
    return -(jnp.where(valid, diag, 0.0).sum() / n_valid)


def ofa_loss(
    teacher_logits: jnp.ndarray,
    student_logits: jnp.ndarray,
    temperature: float,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """OFA focal-style KD (`logit_based/...:263-276`).

    ``mean( -(1 + max_v p_T)^gamma * log_softmax(s/T) )``; note the reference
    applies no vocab truncation here (broadcast over the student vocab).
    """
    p_t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / temperature, axis=-1)
    pt_target = p_t.max(axis=-1, keepdims=True)
    log_p_s = jax.nn.log_softmax(
        student_logits.astype(jnp.float32) / temperature, axis=-1
    )
    return (-((1.0 + pt_target) ** gamma) * log_p_s).mean()


def feature_mse_loss(
    student_features: jnp.ndarray, teacher_features: jnp.ndarray
) -> jnp.ndarray:
    """MSE between (already pooled/normalized) feature vectors.

    Reference: eval-side module `evaluation/onevisionv3/
    OnlineKnowledgeDistillationLLavaOneVision.py:160-166`.
    """
    return jnp.mean((student_features - teacher_features) ** 2)


def vision_phase1_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    student_features: jnp.ndarray,
    teacher_features: jnp.ndarray,
    temperature: float,
    soft_target_weight: float = 0.1,
    contrastive_weight: float = 0.5,
    ntxent_temperature: float = 0.07,
) -> jnp.ndarray:
    """Double-trouble phase-1 loss (`phase1/...:316-354`):
    w_kl * KL(T) + w_c * NT-Xent over pooled vision features."""
    kl = kd_kl_loss(student_logits, teacher_logits, temperature)
    con = ntxent_loss(student_features, teacher_features, ntxent_temperature)
    return soft_target_weight * kl + contrastive_weight * con
