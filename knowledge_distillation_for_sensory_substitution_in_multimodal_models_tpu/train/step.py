"""The single fused train step: teacher forward (no grad) + student
forward/backward + phase-dispatched KD loss + gradient accumulation.

This one compiled program replaces the reference's per-step Lightning loop
(`phase1/OnlineKnowledgeDistillationLLavaOneVision.py:123-131,206-271` plus
Lightning's ``accumulate_grad_batches=64`` outer loop,
`phase1/train_online_kd.py:155`):

* the frozen 7B teacher and the 0.5B student run inside the *same* XLA
  program, so the compiler overlaps teacher inference with student compute
  and never stores teacher activations (nothing differentiates through
  them);
* logits are never materialized — both heads feed the sequence-chunked loss
  (``losses/chunked.py``);
* micro-batch accumulation is a ``lax.scan`` over a leading accumulation
  axis, keeping one resident gradient buffer (the TPU equivalent of
  Lightning's ``accumulate_grad_batches``);
* phase / strategy dispatch is static Python, so each (mode, phase) pair is
  its own specialized program — no dead branches on device.

Batch layout (all leaves statically shaped; ``A`` = accumulation steps):
  student_input_ids / teacher_input_ids        [A, B, S]
  student_attention_mask / teacher_...         [A, B, S]
  student_pixel_values / teacher_...           [A, B, P, H, W, 3]
  pack_idx [A,B,M,4]  pack_weight [A,B,M,4]  pack_valid [A,B,M]
  tile_valid [A,B,P]  labels [A,B,S]
(the pack spec is shared between streams: RGB and depth frames have
identical dimensions, reference quirk SURVEY.md §2.5 #9).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax.training.train_state import TrainState

from ..configs import LlavaOnevisionConfig, TrainConfig
from ..losses.chunked import chunked_faithful_loca, chunked_kd_terms
from ..losses.kd_losses import masked_ntxent_loss
from ..models.llava_onevision import LlavaOnevision


class KDModels(NamedTuple):
    student: LlavaOnevision
    teacher: Optional[LlavaOnevision] = None


def student_head(params: Dict[str, Any], cfg: LlavaOnevisionConfig) -> jnp.ndarray:
    """[D, V] lm-head matrix of the student (tied embeddings for 0.5B)."""
    lm = params["language_model"]
    if cfg.text.tie_word_embeddings:
        return lm["embed_tokens"]["embedding"].T
    return lm["lm_head"]["kernel"]


def teacher_head(params: Dict[str, Any], cfg: LlavaOnevisionConfig):
    """Teacher head, same layout rules (7B is untied -> lm_head).

    An int8-quantized head (``quantize_lm_params_int8(
    include_embed_head=True)``) returns the (kernel_q, kernel_scale) pair
    — the fused loss kernels stream it directly, dequantizing per vocab
    block in VMEM (ops/fused_loca.py::_t_block); non-fused consumers
    dequantize via :func:`dense_teacher_head`."""
    lm = params["language_model"]
    if cfg.text.tie_word_embeddings:
        emb = lm["embed_tokens"]
        assert "embedding" in emb, (
            "tied teacher with a quantized embedding is unsupported: the "
            "tied head must stay bf16 (quantize with "
            "include_embed_head=False)"
        )
        return emb["embedding"].T
    head = lm["lm_head"]
    if "kernel_q" in head:
        return (head["kernel_q"], head["kernel_scale"])
    return head["kernel"]


def dense_teacher_head(wt, dtype=jnp.bfloat16):
    """Dequantize an int8 (kernel_q, kernel_scale) teacher head to dense
    [Dt, Vt] for the non-fused loss paths (chunked scan, faithful-LoCa).
    One [Dt, Vt] temp — the fused kernels avoid it entirely.  Handles
    both storage orientations: the r5 vocab-major [Vt, Dt] (per-row
    scales; see ops/int8.py) and the legacy [Dt, Vt] (per-column)."""
    if isinstance(wt, tuple):
        wq, ws = wt
        if wq.shape[0] == ws.size and wq.shape[0] != wq.shape[1]:
            # vocab-major storage: dequant per row, emit [Dt, Vt]
            return (wq.astype(jnp.float32)
                    * ws.reshape(-1, 1)).T.astype(dtype)
        return (wq.astype(jnp.float32) * ws.reshape(1, -1)).astype(dtype)
    return wt


def _forward_hidden(model, params, batch, prefix: str):
    """Run one stream, returning (hidden [B,S,D], vision_feats [B,P,Dv])."""
    _, vis, _, hidden = model.apply(
        {"params": params},
        input_ids=batch[f"{prefix}_input_ids"],
        attention_mask=batch[f"{prefix}_attention_mask"],
        pixel_values=batch.get(f"{prefix}_pixel_values"),
        pack_idx=batch.get("pack_idx"),
        pack_weight=batch.get("pack_weight"),
        pack_valid=batch.get("pack_valid"),
        tile_valid=batch.get("tile_valid"),
        return_hidden=True,
        compute_logits=False,
    )
    return hidden, vis


def _flat_tile_features(vis: jnp.ndarray, tile_valid: jnp.ndarray):
    """[B,P,Dv] -> ([B*P, Dv], [B*P]) for the tile-level contrastive loss."""
    b, p, d = vis.shape
    return vis.reshape(b * p, d), tile_valid.reshape(b * p)


def make_loss_fn(models: KDModels, cfg: TrainConfig):
    """Pure (student_params, teacher_params, micro_batch) -> (loss, metrics).

    Loss composition per strategy (reference forward dispatch,
    `phase1/OnlineKnowledgeDistillationLLavaOneVision.py:250-263`;
    `logit_based/...:165-173`; `feature_based/...:191-230`):

      baseline       : CE
      logit_based    : LoCa-KL + CE
      feature_based  : w_kl*KL + w_ce*CE + w_c*NT-Xent
      double_trouble : p1 = w_kl*KL + w_c*NT-Xent
                       p2 = LoCa-KL + CE
                       p3 = gamma*(LoCa-KL + CE) + (1-gamma)*CE
    """
    lc = cfg.loss
    mode, phase = cfg.kd_mode, cfg.phase
    if mode == "double_trouble":
        need_kl = phase == 1
        need_loca = phase in (2, 3)
        need_ce = phase in (2, 3)
        need_contrastive = phase == 1
    elif mode == "logit_based":
        need_kl, need_loca, need_ce, need_contrastive = False, True, True, False
    elif mode == "feature_based":
        need_kl, need_loca, need_ce, need_contrastive = True, False, True, True
    elif mode == "baseline":
        need_kl, need_loca, need_ce, need_contrastive = False, False, True, False
    else:
        raise ValueError(f"unknown kd_mode {mode!r}")
    need_teacher = need_kl or need_loca or need_contrastive
    if need_teacher and models.teacher is None:
        raise ValueError(f"kd_mode {mode!r} requires a teacher model")

    # "fused" routes CE and KL through the Pallas vocab-streaming kernels
    # (ops/fused_ce.py, ops/fused_kl.py).  LoCa stays on the chunked path —
    # and when the chunked LoCa scan runs anyway, CE rides the same pass
    # for free, so fusing CE there would only add a redundant head sweep.
    fused = cfg.ce_impl == "fused"

    def loss_fn(params, teacher_params, batch):
        labels = batch["labels"]
        s_hidden, s_vis = _forward_hidden(models.student, params, batch, "student")
        ws = student_head(params, models.student.cfg)

        th = t_vis = wt = None
        if need_teacher:
            t_hidden, t_vis = _forward_hidden(
                models.teacher, teacher_params, batch, "teacher"
            )
            th = jax.lax.stop_gradient(t_hidden)
            t_vis = jax.lax.stop_gradient(t_vis)
            wt = teacher_head(teacher_params, models.teacher.cfg)

        use_faithful_loca = need_loca and lc.loca_faithful_indexing
        fused_loca = fused and need_loca and not use_faithful_loca
        fused_ce = fused and need_ce
        fused_kl = fused and need_kl
        # every mode that needs LoCa also needs CE (see the need_* table
        # above), so the fused dispatch below only handles loca+ce combined
        assert not (fused_loca and not fused_ce), "loca without ce"
        chunk_ce = need_ce and not fused_ce
        chunk_kl = need_kl and not fused_kl
        chunk_loca = need_loca and not use_faithful_loca and not fused_loca
        if chunk_ce or chunk_kl or chunk_loca:
            terms = chunked_kd_terms(
                s_hidden,
                ws,
                labels,
                teacher_hidden=th,
                teacher_head=dense_teacher_head(wt, s_hidden.dtype)
                if wt is not None else None,
                temperature=lc.temperature,
                loca_alpha=lc.loca_alpha,
                chunk_size=cfg.loss_chunk_size,
                need_ce=chunk_ce,
                need_kl=chunk_kl,
                need_loca=chunk_loca,
            )
        else:
            # don't even trace the chunked scan when every term is fused
            terms = {}
        metrics: Dict[str, jnp.ndarray] = dict(terms)
        if fused_ce or fused_kl or fused_loca:
            # The *_spmd wrappers shard rows over (data, fsdp) via
            # shard_map when a mesh is active (the multi-chip phases 2/3
            # path) and fall back to the plain single-device kernels
            # otherwise (ops/fused_spmd.py).
            from ..losses.kd_losses import IGNORE_INDEX
            from ..ops.fused_spmd import (
                fused_ce_loss_spmd,
                fused_kl_loss_spmd,
                fused_loca_ce_loss_spmd,
            )

            impl = cfg.fused_local_impl
            b, s_len, d_model = s_hidden.shape
            flat_h = s_hidden.reshape(b * s_len, d_model)
            ce_labels = None
            if fused_ce:
                ce_labels = jnp.concatenate(
                    [labels[:, 1:],
                     jnp.full((b, 1), IGNORE_INDEX, labels.dtype)], axis=1
                ).reshape(b * s_len)
            def fused_head():
                # A tied student head enters in its native [V, D] embedding
                # layout — no 260 MB transpose copy of the 152k-row table.
                if models.student.cfg.text.tie_word_embeddings:
                    emb = params["language_model"]["embed_tokens"]["embedding"]
                    return emb, "vd"
                return ws, "dv"

            if fused_loca:
                # phases 2/3 + logit_based: one combined pipeline computes
                # both terms (4 head sweeps vs 13 — ops/fused_loca.py).
                ws_fused, layout = fused_head()
                metrics["loca"], metrics["ce"] = fused_loca_ce_loss_spmd(
                    flat_h, ws_fused,
                    th.reshape(b * s_len, th.shape[-1]), wt,
                    labels.reshape(b * s_len), ce_labels,
                    temperature=lc.temperature, alpha=lc.loca_alpha,
                    local_impl=impl, student_head_layout=layout,
                )
            elif fused_ce:
                ws_ce, ce_layout = fused_head()
                metrics["ce"] = fused_ce_loss_spmd(
                    flat_h, ws_ce, ce_labels, local_impl=impl,
                    w_layout=ce_layout,
                )
            if fused_kl:
                ws_kl, kl_layout = fused_head()
                metrics["kl"] = fused_kl_loss_spmd(
                    flat_h, ws_kl,
                    th.reshape(b * s_len, th.shape[-1]), wt,
                    temperature=lc.temperature, local_impl=impl,
                    student_head_layout=kl_layout,
                )
        terms = metrics
        if use_faithful_loca:
            # Reference-faithful LoCa (full-tensor fancy-indexing writes,
            # SURVEY.md §2.5 #3).  The global write structure reduces to
            # two [V] column tables, so this runs seq-chunked — O(C*V)
            # peak instead of the r4 materialized [B,S,152k] f32 that
            # could not execute at production shapes on one chip
            # (losses/chunked.py::chunked_faithful_loca; parity with the
            # materialized kd_losses.loca_loss(faithful_indexing=True)
            # pinned in tests/test_chunked.py).
            # wt passes through raw: an int8 (kernel_q, kernel_scale)
            # teacher head is dequantized per CHUNK inside — the dense
            # [Dt, Vt] bf16 temp dense_teacher_head would build is the
            # allocation that OOMed --loca_faithful on one chip (r5)
            metrics["loca"] = chunked_faithful_loca(
                s_hidden, ws, labels, th, wt,
                temperature=lc.temperature, alpha=lc.loca_alpha,
                chunk_size=cfg.loss_chunk_size,
            )

        if need_contrastive:
            sf, sv = _flat_tile_features(s_vis, batch["tile_valid"])
            tf, _ = _flat_tile_features(t_vis, batch["tile_valid"])
            con = masked_ntxent_loss(sf, tf, sv, lc.ntxent_temperature)
            metrics["contrastive"] = con

        if mode == "baseline":
            loss = terms["ce"]
        elif mode == "logit_based":
            loss = metrics["loca"] + terms["ce"]
        elif mode == "feature_based":
            loss = (
                lc.soft_target_weight * terms["kl"]
                + lc.ce_weight * terms["ce"]
                + lc.contrastive_weight * metrics["contrastive"]
            )
        elif phase == 1:
            loss = (
                lc.soft_target_weight * terms["kl"]
                + lc.contrastive_weight * metrics["contrastive"]
            )
        elif phase == 2:
            loss = metrics["loca"] + terms["ce"]
        else:  # phase 3
            loca_total = metrics["loca"] + terms["ce"]
            loss = lc.gamma * loca_total + (1.0 - lc.gamma) * terms["ce"]

        # report metrics in f32: bf16 resolution (~2^-8 relative) hides
        # small per-step loss movement and breaks evolution checks
        metrics = {k: v.astype(jnp.float32) for k, v in metrics.items()}
        metrics["loss"] = loss.astype(jnp.float32)
        return loss, metrics

    return loss_fn


def make_train_step(models: KDModels, cfg: TrainConfig):
    """Build ``step(state, teacher_params, batch) -> (state, metrics)``.

    ``batch`` carries a leading accumulation axis A; gradients are averaged
    over it inside a ``lax.scan`` before one optimizer update.  jit/pjit is
    applied by the caller (with donate_argnums=0 on the state).
    """
    loss_fn = make_loss_fn(models, cfg)
    grad_fn = jax.grad(loss_fn, has_aux=True)
    # Accumulation-carry dtype lever (VERDICT r4 #3): the f32 carry is a
    # full param-shaped buffer that OOMs one chip at the 7B KD workload
    # for accum >= 4; "bfloat16"/"param" halve (or better) it by carrying
    # the running MEAN in reduced precision.  See configs.py::accum_dtype.
    acc_dt = getattr(cfg, "accum_dtype", "float32")

    def train_step(
        state: TrainState, teacher_params, batch
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        accum = jax.tree.leaves(batch)[0].shape[0]
        exact = acc_dt == "float32"

        def carry_dtype(p):
            return (jnp.float32 if exact
                    else p.dtype if acc_dt == "param" else jnp.bfloat16)

        def micro(carry, micro_batch):
            g_acc, m_acc = carry
            g, m = grad_fn(state.params, teacher_params, micro_batch)
            if exact:
                g_acc = jax.tree.map(jnp.add, g_acc, g)
            else:
                # running mean: pre-scale by 1/A so every add combines
                # same-magnitude terms (bf16 rounding stays ~2^-8 relative
                # instead of growing with the partial-sum magnitude)
                g_acc = jax.tree.map(
                    lambda a, gi: a + (gi.astype(jnp.float32)
                                       / accum).astype(a.dtype),
                    g_acc, g)
            m_acc = jax.tree.map(jnp.add, m_acc, m)
            return (g_acc, m_acc), None

        if accum == 1:
            grads, metrics = grad_fn(
                state.params, teacher_params, jax.tree.map(lambda x: x[0], batch)
            )
        else:
            g0 = jax.tree.map(
                lambda p: jnp.zeros(p.shape, carry_dtype(p)), state.params
            )
            m0 = jax.eval_shape(
                lambda p, b: grad_fn(p, teacher_params, b)[1],
                state.params,
                jax.tree.map(lambda x: x[0], batch),
            )
            m0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), m0)
            (grads, metrics), _ = jax.lax.scan(micro, (g0, m0), batch)
            if exact:
                grads = jax.tree.map(lambda g: g / accum, grads)
            metrics = jax.tree.map(lambda m: m / accum, metrics)

        new_state = state.apply_gradients(grads=grads)
        return new_state, metrics

    return train_step


def make_eval_step(models: KDModels, cfg: TrainConfig):
    """``eval_step(params, teacher_params, micro_batch) -> metrics`` (the
    reference's ``validation_step`` loss, `phase1/...:133-137`)."""
    loss_fn = make_loss_fn(models, cfg)

    def eval_step(params, teacher_params, batch):
        _, metrics = loss_fn(params, teacher_params, batch)
        return metrics

    return eval_step
