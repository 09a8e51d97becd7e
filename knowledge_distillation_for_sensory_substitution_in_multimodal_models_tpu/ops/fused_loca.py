"""Fused LoCa-calibrated KL over the vocabulary (Pallas TPU).

LoCa (paper-correct per-position calibration, see
``losses.kd_losses.loca_calibrated_probs``) needs three per-row statistics
of the teacher distribution — logsumexp, p_gt (at the label) and the
top-2 probability — plus the student logsumexp.  All four stream over
vocab blocks (top-2 via an online (m1, m2) carry), so the full pipeline
keeps logits in VMEM like ops/fused_ce.py / ops/fused_kl.py:

  pass 1: per-row stats (lse_t, lse_s, gold_t, m1, m2) in ONE sweep
  pass 2: calibrated-KL elementwise sum, blockwise
  bwd   : d/ds_j = (p_s_j * sum_v(loca_v) - loca_v_j) * g / T, streamed
          into d_hidden (v-inner) and d_W (n-inner) kernels

Calibration recap (T = temperature; probs at T):
  sigma = 1/(1 - p_gt + p_2nd),  s = alpha * sigma
  loca_j = s * p_t_j  for j != label;  loca_label = 1 - s * (1 - p_gt)
(rows with label < 0 keep the raw teacher distribution, matching the
chunked path).  Values/grads parity-tested against ``loca_loss`` in
tests/test_fused_loca.py.

Two sweep-count reductions on top of the combined LoCa+CE pipeline (both
default-on for the single-chip no-mesh path via ops/fused_spmd.py):

- ``teacher_logits="materialize"``: the teacher logit matrix is computed
  ONCE as a plain XLA matmul and streamed into every sweep instead of
  being recomputed per sweep (KDSS_LOCA_TMAT; +3.1% KD step measured).
- ``KDSS_LOCA_FUSED_BWD=1``: backward runs ONE sweep that contracts the
  combined d_logits both ways (d_hidden via a persistent full-rows VMEM
  accumulator, d_head via the standard per-vocab-block accumulator)
  instead of two sweeps that each rebuild the logits block.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_ce import (BN, BV, NEG, _cdiv, _col_ids, _masked_w, _pad_to,
                       check_teacher_vocab)


def _logits_block(h_ref, w_ref, inv_t):
    return jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_t


def _t_block(ht_ref, wt_ref, inv_t, tmat, wts_ref=None, t_vd=False):
    """Teacher logits block: recomputed from (hidden, head) or — when
    ``tmat`` — streamed from a pre-materialized [N, V] f32 logit matrix
    (already scaled by 1/T) passed in the ``ht`` slot.  Materializing
    trades ~2·N·Dt·V re-FLOPs per sweep for one HBM read of the block —
    a win whenever the [N, V] f32 buffer fits (single-chip B=1).

    ``wts_ref`` (int8-head form): ``wt_ref`` holds an int8 head block and
    ``wts_ref`` its f32 [1, BV] per-vocab dequant scales.  The per-vocab
    scale factors out of the row dot exactly —
    ``h @ (q * s) == (h @ q) * s`` — so the block dequantizes as one VPU
    multiply AFTER the MXU dot, at half the head HBM traffic.  Edge-block
    OOB reads are safe: int8 garbage is always finite, and any NaN/Inf in
    the f32 scale tail lands only in cols >= v_real, which every caller
    masks (same contract as the bf16 edge garbage, see _masked_w).

    ``t_vd`` (static, r5): the int8 head is stored [Vt, Dt] — vocab-major,
    the layout the quantizer now emits — and the block is [BV, Dt] rows
    with the dot contracting both operands' dim 1 (the student vd form).
    The [Dt, Vt] storage forced XLA to materialize a 520 MB retiled copy
    of the whole int8 head (plus a remat twin) before every pallas loss
    call — the top single copy/layout op of the r5 step profile and the
    allocation that blocked B=2/accum fits; vocab-major blocks read the
    parameter in place, exactly like the student's [V, D] tied head."""
    if tmat:
        t = ht_ref[:]
        # "bf16" tmat streams bfloat16 blocks (half the HBM of the f32
        # form); all downstream softmax/lse math stays f32 from here
        return t if t.dtype == jnp.float32 else t.astype(jnp.float32)
    if wts_ref is not None:
        t = jax.lax.dot_general(
            ht_ref[:], wt_ref[:].astype(ht_ref.dtype),
            (((1,), (1,) if t_vd else (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * wts_ref[:]
        return t if inv_t == 1.0 else t * inv_t
    return _logits_block(ht_ref, wt_ref, inv_t)


# --- student-head layout support -------------------------------------------
# The tied 0.5B student head IS the embedding table, natively [V, D]; feeding
# the kernels its transpose costs a 260 MB layout copy per step (plus the
# reverse transpose of the gradient).  ``vd=True`` consumes [V, D] directly
# and emits d_head in [V, D] — zero layout copies end to end.


def _s_logits_block(h_ref, ws_ref, inv_t, vd):
    if vd:
        out = jax.lax.dot_general(
            h_ref[:], ws_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        out = jax.lax.dot_general(
            h_ref[:], ws_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return out if inv_t == 1.0 else out * inv_t


def _masked_ws(ws_ref, j, v_real, vd):
    """Zero out-of-range vocab entries of a student-head block (see
    _masked_w) for either layout."""
    if not vd:
        return _masked_w(ws_ref, j, v_real)
    w = ws_ref[:]
    rows = j * w.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, (w.shape[0], 1), 0
    )
    return jnp.where(rows < v_real, w, jnp.zeros((), w.dtype))


def _ws_block_spec(d, vd, q_major=True):
    if q_major:
        col_dv = lambda i, j: (0, j)  # noqa: E731
        col_vd = lambda i, j: (j, 0)  # noqa: E731
    else:
        col_dv = lambda j, i: (0, j)  # noqa: E731
        col_vd = lambda j, i: (j, 0)  # noqa: E731
    if vd:
        return pl.BlockSpec((BV, d), col_vd, memory_space=pltpu.VMEM)
    return pl.BlockSpec((d, BV), col_dv, memory_space=pltpu.VMEM)


def _stats_kernel(hs_ref, ws_ref, ht_ref, wt_ref, lab_ref,
                  lses_ref, lset_ref, gold_ref, m1_ref, m2_ref,
                  sc_ls, sc_lt, sc_g, sc_m1, sc_m2, sc_ms, sc_mt,
                  *, v_real: int, inv_t: float, n_v: int):
    """One sweep: student lse, teacher lse, teacher gold logit, teacher
    online top-2 logits (m1 >= m2)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        sc_ls[:] = jnp.zeros_like(sc_ls)   # student sumexp
        sc_lt[:] = jnp.zeros_like(sc_lt)   # teacher sumexp
        sc_g[:] = jnp.zeros_like(sc_g)     # teacher gold logit
        sc_m1[:] = jnp.full_like(sc_m1, NEG)
        sc_m2[:] = jnp.full_like(sc_m2, NEG)
        sc_ms[:] = jnp.full_like(sc_ms, NEG)  # student running max
        sc_mt[:] = jnp.full_like(sc_mt, NEG)  # teacher running max

    s = _logits_block(hs_ref, ws_ref, inv_t)
    t = _logits_block(ht_ref, wt_ref, inv_t)
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    s = jnp.where(in_vocab, s, NEG)
    t = jnp.where(in_vocab, t, NEG)

    # online logsumexp (student)
    ms_prev = sc_ms[:, 0:1]
    ms_new = jnp.maximum(ms_prev, jnp.max(s, axis=1, keepdims=True))
    sc_ls[:] = jnp.broadcast_to(
        sc_ls[:, 0:1] * jnp.exp(ms_prev - ms_new)
        + jnp.sum(jnp.exp(s - ms_new), axis=1, keepdims=True),
        sc_ls.shape,
    )
    sc_ms[:] = jnp.broadcast_to(ms_new, sc_ms.shape)

    # online logsumexp (teacher)
    mt_prev = sc_mt[:, 0:1]
    mt_new = jnp.maximum(mt_prev, jnp.max(t, axis=1, keepdims=True))
    sc_lt[:] = jnp.broadcast_to(
        sc_lt[:, 0:1] * jnp.exp(mt_prev - mt_new)
        + jnp.sum(jnp.exp(t - mt_new), axis=1, keepdims=True),
        sc_lt.shape,
    )
    sc_mt[:] = jnp.broadcast_to(mt_new, sc_mt.shape)

    # teacher gold logit
    labels = lab_ref[:, 0]
    onehot = cols == labels[:, None]
    sc_g[:] = sc_g[:] + jnp.broadcast_to(
        jnp.sum(jnp.where(onehot, t, 0.0), axis=1, keepdims=True), sc_g.shape
    )

    # online top-2 teacher logits: merge block top-2 with carried (m1, m2).
    # torch.topk(2) semantics under duplicates: when the block max occurs
    # more than once, the second value IS the max again — masking every
    # occurrence before the second max would under-report it.
    b1 = jnp.max(t, axis=1, keepdims=True)
    dup = jnp.sum(jnp.where(t == b1, 1.0, 0.0), axis=1, keepdims=True) > 1.0
    t_wo_b1 = jnp.where(t == b1, NEG, t)
    b2 = jnp.where(dup, b1, jnp.max(t_wo_b1, axis=1, keepdims=True))
    m1, m2 = sc_m1[:, 0:1], sc_m2[:, 0:1]
    new_m1 = jnp.maximum(m1, b1)
    # second max of the union {m1, m2, b1, b2}
    new_m2 = jnp.maximum(jnp.minimum(m1, b1), jnp.maximum(m2, b2))
    sc_m1[:] = jnp.broadcast_to(new_m1, sc_m1.shape)
    sc_m2[:] = jnp.broadcast_to(new_m2, sc_m2.shape)

    @pl.when(j == n_v - 1)
    def _():
        lses_ref[:] = sc_ms[:, 0:1] + jnp.log(sc_ls[:, 0:1])
        lset_ref[:] = sc_mt[:, 0:1] + jnp.log(sc_lt[:, 0:1])
        gold_ref[:] = sc_g[:, 0:1]
        m1_ref[:] = sc_m1[:, 0:1]
        m2_ref[:] = sc_m2[:, 0:1]


def _loca_block(t, s_logits, cols, labels, lset, lses, scale_row, tval, valid):
    """(loca_t block, log p_s block) given per-row stats."""
    p_t = jnp.exp(t - lset)
    onehot = cols == labels[:, None]
    loca = scale_row * p_t
    loca = jnp.where(onehot, tval, loca)
    loca = jnp.where(valid, loca, p_t)  # ignore-label rows keep raw teacher
    log_ps = s_logits - lses
    return loca, log_ps


def _kl_fwd_kernel(hs_ref, ws_ref, ht_ref, wt_ref, lab_ref,
                   lses_ref, lset_ref, sc_row_ref, tval_ref, vmask_ref,
                   out_ref, acc,
                   *, v_real: int, inv_t: float, n_v: int, eps: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s = _logits_block(hs_ref, ws_ref, inv_t)
    t = _logits_block(ht_ref, wt_ref, inv_t)
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    s = jnp.where(in_vocab, s, NEG)
    t = jnp.where(in_vocab, t, NEG)
    labels = lab_ref[:, 0]
    loca, log_ps = _loca_block(
        t, s, cols, labels, lset_ref[:, 0:1], lses_ref[:, 0:1],
        sc_row_ref[:, 0:1], tval_ref[:, 0:1], vmask_ref[:, 0:1] != 0,
    )
    log_ps = jnp.maximum(log_ps, jnp.log(eps))  # clamp like the reference
    el = jnp.where(
        (loca > 0) & in_vocab,
        loca * (jnp.log(jnp.where(loca > 0, loca, 1.0)) - log_ps),
        0.0,
    )
    acc[:] = acc[:] + jnp.broadcast_to(
        jnp.sum(el, axis=1, keepdims=True), acc.shape
    )

    @pl.when(j == n_v - 1)
    def _():
        out_ref[:] = acc[:, 0:1]


def _dhs_kernel(hs_ref, ws_ref, ht_ref, wt_ref, lab_ref,
                lses_ref, lset_ref, sc_row_ref, tval_ref, vmask_ref,
                g_ref, tsum_ref,
                dhs_ref, acc,
                *, v_real: int, inv_t: float, n_v: int, eps: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s = _logits_block(hs_ref, ws_ref, inv_t)
    t = _logits_block(ht_ref, wt_ref, inv_t)
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    s = jnp.where(in_vocab, s, NEG)
    t = jnp.where(in_vocab, t, NEG)
    labels = lab_ref[:, 0]
    loca, log_ps = _loca_block(
        t, s, cols, labels, lset_ref[:, 0:1], lses_ref[:, 0:1],
        sc_row_ref[:, 0:1], tval_ref[:, 0:1], vmask_ref[:, 0:1] != 0,
    )
    p_s = jnp.exp(log_ps)
    # clamp region (p_s < eps): d log_ps / d s_logits = 0 there
    live = (log_ps > jnp.log(eps)) & (loca > 0) & in_vocab
    # d/ds_j sum_v loca_v*(log loca_v - log p_s_v)
    #   = p_s_j * sum_v(live_v * loca_v) - live_j * loca_j
    ds = (p_s * tsum_ref[:, 0:1] - jnp.where(live, loca, 0.0))
    ds = jnp.where(in_vocab, ds, 0.0) * g_ref[:, 0:1] * inv_t
    acc[:] = acc[:] + jax.lax.dot_general(
        ds.astype(ws_ref.dtype), _masked_w(ws_ref, j, v_real),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_v - 1)
    def _():
        dhs_ref[:] = acc[:].astype(dhs_ref.dtype)


def _dws_kernel(hs_ref, ws_ref, ht_ref, wt_ref, lab_ref,
                lses_ref, lset_ref, sc_row_ref, tval_ref, vmask_ref,
                g_ref, tsum_ref,
                dws_ref, acc,
                *, v_real: int, inv_t: float, n_n: int, eps: float):
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s = _logits_block(hs_ref, ws_ref, inv_t)
    t = _logits_block(ht_ref, wt_ref, inv_t)
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    s = jnp.where(in_vocab, s, NEG)
    t = jnp.where(in_vocab, t, NEG)
    labels = lab_ref[:, 0]
    loca, log_ps = _loca_block(
        t, s, cols, labels, lset_ref[:, 0:1], lses_ref[:, 0:1],
        sc_row_ref[:, 0:1], tval_ref[:, 0:1], vmask_ref[:, 0:1] != 0,
    )
    p_s = jnp.exp(log_ps)
    live = (log_ps > jnp.log(eps)) & (loca > 0) & in_vocab
    ds = (p_s * tsum_ref[:, 0:1] - jnp.where(live, loca, 0.0))
    ds = jnp.where(in_vocab, ds, 0.0) * g_ref[:, 0:1] * inv_t
    acc[:] = acc[:] + jax.lax.dot_general(
        hs_ref[:], ds.astype(hs_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_n - 1)
    def _():
        dws_ref[:] = acc[:].astype(dws_ref.dtype)


def _tsum_kernel(hs_ref, ws_ref, ht_ref, wt_ref, lab_ref,
                 lses_ref, lset_ref, sc_row_ref, tval_ref, vmask_ref,
                 out_ref, acc,
                 *, v_real: int, inv_t: float, n_v: int, eps: float):
    """sum_v of live loca (needed by the backward closed form)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s = _logits_block(hs_ref, ws_ref, inv_t)
    t = _logits_block(ht_ref, wt_ref, inv_t)
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    s = jnp.where(in_vocab, s, NEG)
    t = jnp.where(in_vocab, t, NEG)
    labels = lab_ref[:, 0]
    loca, log_ps = _loca_block(
        t, s, cols, labels, lset_ref[:, 0:1], lses_ref[:, 0:1],
        sc_row_ref[:, 0:1], tval_ref[:, 0:1], vmask_ref[:, 0:1] != 0,
    )
    live = (log_ps > jnp.log(eps)) & (loca > 0) & in_vocab
    acc[:] = acc[:] + jnp.broadcast_to(
        jnp.sum(jnp.where(live, loca, 0.0), axis=1, keepdims=True), acc.shape
    )

    @pl.when(j == n_v - 1)
    def _():
        out_ref[:] = acc[:, 0:1]


def _specs(d, q_major=True):
    if q_major:
        row = lambda i, j: (i, 0)  # noqa: E731
        col = lambda i, j: (0, j)  # noqa: E731
    else:
        row = lambda j, i: (i, 0)  # noqa: E731
        col = lambda j, i: (0, j)  # noqa: E731
    return (
        pl.BlockSpec((BN, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, BV), col, memory_space=pltpu.VMEM),
        pl.BlockSpec((BN, 1), row, memory_space=pltpu.VMEM),
    )


_SEM = dict(dimension_semantics=("parallel", "arbitrary"))


def _row_stats(hs, ws, ht, wt, labels, v_real, inv_t, alpha):
    n, d = hs.shape
    n_n, n_v = n // BN, _cdiv(ws.shape[1], BV)
    hspec, cspec, rspec = _specs(d)
    hspec_t, cspec_t, _ = _specs(ht.shape[1])
    lab2 = labels[:, None].astype(jnp.int32)
    outs = pl.pallas_call(
        functools.partial(_stats_kernel, v_real=v_real, inv_t=inv_t, n_v=n_v),
        grid=(n_n, n_v),
        in_specs=[hspec, cspec, hspec_t, cspec_t, rspec],
        out_specs=[rspec] * 5,
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32)] * 5,
        scratch_shapes=[pltpu.VMEM((BN, 128), jnp.float32)] * 7,
        compiler_params=pltpu.CompilerParams(**_SEM),
    )(hs, ws, ht, wt, lab2)
    lse_s, lse_t, gold_t, m1, m2 = (o[:, 0] for o in outs)

    valid = labels >= 0
    p_gt = jnp.exp(gold_t - lse_t)
    p_2nd = jnp.exp(m2 - lse_t)
    scale_row = alpha / (1.0 - p_gt + p_2nd)
    # target value: 1 - s*(sum p - p_gt) with sum p = 1 after softmax
    tval = 1.0 - scale_row * (1.0 - p_gt)
    return lse_s, lse_t, scale_row, tval, valid, lab2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _loca_rows(hs, ws, ht, wt, labels, v_real, inv_t, alpha, eps):
    return _loca_rows_impl(hs, ws, ht, wt, labels, v_real, inv_t, alpha, eps)[0]


def _tmat_specs(q_major=True):
    """Specs for the materialized-teacher-logits form: the ``ht`` slot
    carries [BN, BV] blocks of the [N, V] f32 logit matrix; the ``wt``
    slot a tiny unread dummy (Pallas needs a ref per input)."""
    if q_major:
        tmap = lambda i, j: (i, j)  # noqa: E731
        dmap = lambda i, j: (0, 0)  # noqa: E731
    else:
        tmap = lambda j, i: (i, j)  # noqa: E731
        dmap = lambda j, i: (0, 0)  # noqa: E731
    return (
        pl.BlockSpec((BN, BV), tmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), dmap, memory_space=pltpu.VMEM),
    )


_TMAT_DUMMY_SHAPE = (8, 128)


def _t_vd(ht, wt) -> bool:
    """Static orientation of an int8 teacher head: True when ``wt[0]`` is
    stored vocab-major [Vt, Dt] (the r5 quantizer layout), False for the
    legacy [Dt, Vt].  Inferred from shapes — ``ht`` is [N, Dt] (or the
    [N, V] tmat matrix, whose callers never ask) — so the custom_vjp
    signatures stay unchanged.  A square head is ambiguous: refuse."""
    wq = wt[0]
    dt = ht.shape[1]
    if wq.shape[0] == dt and wq.shape[1] == dt:
        raise ValueError(
            "square int8 teacher head: orientation is ambiguous — "
            "use distinct Dt/Vt")
    return wq.shape[0] != dt


def _wts_spec(q_major=True):
    """Spec for the int8-head dequant-scale operand: f32 [1, BV] blocks of
    the [1, V] per-vocab-column scale row (see _t_block)."""
    if q_major:
        col = lambda i, j: (0, j)  # noqa: E731
    else:
        col = lambda j, i: (0, j)  # noqa: E731
    return pl.BlockSpec((1, BV), col, memory_space=pltpu.VMEM)


def _call_rows(kernel, hs, ws, ht, wt, lab2, rows, n, d, dt, n_n, n_v,
               out_spec, out_shape, scratch, extra=(), q_major=True,
               ws_spec=None, tmat=False, sem=None):
    """``wt`` may be (wt_q int8 [V, dt] vocab-major — or legacy [dt, V] —
    , wts f32 [1, V]) — the int8-head form: the scale rides as one extra
    operand right after the head and the kernel is invoked with
    ``tq=True`` (and ``t_vd=True`` for vocab-major; see _t_block)."""
    hspec, cspec, rspec = _specs(d, q_major)
    if tmat:
        hspec_t, cspec_t = _tmat_specs(q_major)
    else:
        hspec_t, cspec_t, _ = _specs(dt, q_major)
    if ws_spec is not None:
        cspec = ws_spec
    tq = isinstance(wt, tuple)
    if tq and not tmat and wt[0].shape[0] != dt:
        # vocab-major [V, dt] head: [BV, dt] row blocks, read in place
        cspec_t = _ws_block_spec(dt, True, q_major)
        kernel = functools.partial(kernel, t_vd=True)
    t_ops, t_specs = ((wt[0], wt[1]), [cspec_t, _wts_spec(q_major)]) \
        if tq else ((wt,), [cspec_t])
    if tq:
        kernel = functools.partial(kernel, tq=True)
    in_specs = [hspec, cspec, hspec_t, *t_specs, rspec] + [rspec] * (
        len(rows) + len(extra)
    )
    grid = (n_n, n_v) if q_major else (n_v, n_n)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(**(sem or _SEM)),
    )(hs, ws, ht, *t_ops, lab2, *rows, *extra)


def _loca_rows_impl(hs, ws, ht, wt, labels, v_real, inv_t, alpha, eps):
    n, d = hs.shape
    dt = ht.shape[1]
    n_n, n_v = n // BN, _cdiv(ws.shape[1], BV)
    lse_s, lse_t, scale_row, tval, valid, lab2 = _row_stats(
        hs, ws, ht, wt, labels, v_real, inv_t, alpha
    )
    rows = [lse_s[:, None], lse_t[:, None], scale_row[:, None],
            tval[:, None], valid[:, None].astype(jnp.int32)]
    _, _, rspec = _specs(d)
    kl = _call_rows(
        functools.partial(_kl_fwd_kernel, v_real=v_real, inv_t=inv_t,
                          n_v=n_v, eps=eps),
        hs, ws, ht, wt, lab2, rows, n, d, dt, n_n, n_v,
        rspec, jax.ShapeDtypeStruct((n, 1), jnp.float32),
        [pltpu.VMEM((BN, 128), jnp.float32)],
    )
    return kl[:, 0], (rows, lab2)


def _loca_rows_fwd(hs, ws, ht, wt, labels, v_real, inv_t, alpha, eps):
    kl, (rows, lab2) = _loca_rows_impl(
        hs, ws, ht, wt, labels, v_real, inv_t, alpha, eps
    )
    return kl, (hs, ws, ht, wt, rows, lab2)


def _loca_rows_bwd(v_real, inv_t, alpha, eps, res, g):
    hs, ws, ht, wt, rows, lab2 = res
    n, d = hs.shape
    dt = ht.shape[1]
    v_pad = ws.shape[1]
    n_n, n_v = n // BN, _cdiv(v_pad, BV)
    _, _, rspec = _specs(d)

    tsum = _call_rows(
        functools.partial(_tsum_kernel, v_real=v_real, inv_t=inv_t,
                          n_v=n_v, eps=eps),
        hs, ws, ht, wt, lab2, rows, n, d, dt, n_n, n_v,
        rspec, jax.ShapeDtypeStruct((n, 1), jnp.float32),
        [pltpu.VMEM((BN, 128), jnp.float32)],
    )
    g2 = g[:, None].astype(jnp.float32)

    hspec, _, _ = _specs(d)
    dhs = _call_rows(
        functools.partial(_dhs_kernel, v_real=v_real, inv_t=inv_t,
                          n_v=n_v, eps=eps),
        hs, ws, ht, wt, lab2, rows, n, d, dt, n_n, n_v,
        hspec, jax.ShapeDtypeStruct((n, d), hs.dtype),
        [pltpu.VMEM((BN, d), jnp.float32)],
        extra=(g2, tsum),
    )
    _, cspec2, _ = _specs(d, q_major=False)
    dws = _call_rows(
        functools.partial(_dws_kernel, v_real=v_real, inv_t=inv_t,
                          n_n=n_n, eps=eps),
        hs, ws, ht, wt, lab2, rows, n, d, dt, n_n, n_v,
        cspec2, jax.ShapeDtypeStruct((d, v_pad), ws.dtype),
        [pltpu.VMEM((d, BV), jnp.float32)],
        extra=(g2, tsum), q_major=False,
    )
    return dhs, dws, jnp.zeros_like(ht), jnp.zeros_like(wt), None


_loca_rows.defvjp(_loca_rows_fwd, _loca_rows_bwd)


def fused_loca_sum(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 1.0,
    alpha: float = 0.8,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Sum over rows of the calibrated-KL row sums — pre-reduction LoCa.

    Split out of :func:`fused_loca_loss` so row-sharded callers
    (ops/fused_spmd.py) can psum partial sums before the global mean.
    """
    if isinstance(teacher_head, tuple):
        # standalone path keeps bf16 kernels: dequantize up front (the
        # combined LoCa+CE pipeline — the production path — streams the
        # int8 head through the kernels instead, see fused_loca_ce_sums)
        wq, wsc = teacher_head
        teacher_head = (wq.astype(jnp.float32)
                        * wsc.reshape(1, -1)).astype(teacher_hidden.dtype)
    n = student_hidden.shape[0]
    v_real = student_head.shape[1]
    check_teacher_vocab(teacher_head, v_real)
    inv_t = 1.0 / temperature

    hs = _pad_to(student_hidden, BN, 0)
    ht = _pad_to(teacher_hidden, BN, 0)
    # vocab axis unpadded: ceil-div grid + cols<v_real masking (also
    # truncates the teacher's extra vocab rows without a slice copy)
    ws = student_head
    wt = teacher_head
    lab = _pad_to(jnp.where(labels >= 0, labels, -1).astype(jnp.int32), BN, 0,
                  value=-1)
    if hs.shape[1] % 128 != 0:
        hs = _pad_to(hs, 128, 1)
        ws = _pad_to(ws, 128, 0)
    if ht.shape[1] % 128 != 0:
        ht = _pad_to(ht, 128, 1)
        wt = _pad_to(wt, 128, 0)

    kl_rows = _loca_rows(hs, ws, ht, wt, lab, v_real, inv_t, alpha, eps)
    return kl_rows[:n].sum()


def fused_loca_loss(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 1.0,
    alpha: float = 0.8,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Paper-correct LoCa KL, torch-'mean' reduction * T^2 (matches
    ``losses.kd_losses.loca_loss(faithful_indexing=False)``).

    student_hidden [N, Ds], heads [D, V]; teacher head truncated to the
    student vocab inside.  Teacher inputs are stop-grad.
    """
    n = student_hidden.shape[0]
    v_real = student_head.shape[1]
    total = fused_loca_sum(
        student_hidden, student_head, teacher_hidden, teacher_head, labels,
        temperature=temperature, alpha=alpha, eps=eps,
    )
    return total / (n * v_real) * (temperature ** 2)


# ---------------------------------------------------------------------------
# Combined LoCa + CE pipeline.
#
# Double-trouble phases 2/3 (and logit_based) need BOTH the calibrated KL
# (at temperature T, unshifted labels) and masked CE (at T=1, shifted
# labels).  Run separately (fused_loca + fused_ce) they sweep the student
# head 8x and the teacher head 5x per step; the profiled r2 KD step spent
# 92 ms (24%) in these kernels at MXU speed-of-light — i.e. the only win
# left is *fewer sweeps*.  This combined pipeline computes the raw student
# logits block once and derives both temperature scalings from it:
#
#   pass 1 (stats):   + student T=1 lse and CE gold ride the same sweep
#   pass 2 (fwd):     KL rows + tsum (the backward's sum of live loca)
#                     in one sweep; CE forward is FREE (lse1 - gold1)
#   bwd (dhs / dws):  one combined d_logits =
#                     g_kl/T * (p_sT * tsum - live*loca) + g_ce*(p_s1 - 1y)
#
# 4 (student+teacher) sweeps total vs 13 for the separate ops.
# ---------------------------------------------------------------------------


def _stats_ce_kernel(hs_ref, ws_ref, ht_ref, wt_ref, *rest,
                     v_real: int, inv_t: float, n_v: int, vd: bool,
                     tmat: bool = False, tq: bool = False,
                     t_vd: bool = False):
    """_stats_kernel + student T=1 logsumexp + student CE gold logit.

    ``tq``: the int8-teacher-head form — one extra operand (the f32
    [1, BV] scale block) follows ``wt_ref``; see _t_block.  Non-tq
    programs are byte-identical to before the operand existed."""
    wts_ref = None
    if tq:
        wts_ref, *rest = rest
    (lab_ref, labce_ref,
     lsesT_ref, lset_ref, gold_ref, m1_ref, m2_ref,
     lses1_ref, golds1_ref,
     sc_lsT, sc_lt, sc_g, sc_m1, sc_m2, sc_msT, sc_mt,
     sc_ls1, sc_ms1, sc_gs) = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        sc_lsT[:] = jnp.zeros_like(sc_lsT)
        sc_lt[:] = jnp.zeros_like(sc_lt)
        sc_g[:] = jnp.zeros_like(sc_g)
        sc_m1[:] = jnp.full_like(sc_m1, NEG)
        sc_m2[:] = jnp.full_like(sc_m2, NEG)
        sc_msT[:] = jnp.full_like(sc_msT, NEG)
        sc_mt[:] = jnp.full_like(sc_mt, NEG)
        sc_ls1[:] = jnp.zeros_like(sc_ls1)
        sc_ms1[:] = jnp.full_like(sc_ms1, NEG)
        sc_gs[:] = jnp.zeros_like(sc_gs)

    s_raw = _s_logits_block(hs_ref, ws_ref, 1.0, vd)
    t = _t_block(ht_ref, wt_ref, inv_t, tmat, wts_ref, t_vd)
    cols = _col_ids(j, s_raw.shape[0], s_raw.shape[1])
    in_vocab = cols < v_real
    s1 = jnp.where(in_vocab, s_raw, NEG)
    sT = jnp.where(in_vocab, s_raw * inv_t, NEG)
    t = jnp.where(in_vocab, t, NEG)

    def online_lse(x, sc_m, sc_l):
        m_prev = sc_m[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(x, axis=1, keepdims=True))
        sc_l[:] = jnp.broadcast_to(
            sc_l[:, 0:1] * jnp.exp(m_prev - m_new)
            + jnp.sum(jnp.exp(x - m_new), axis=1, keepdims=True),
            sc_l.shape,
        )
        sc_m[:] = jnp.broadcast_to(m_new, sc_m.shape)

    online_lse(sT, sc_msT, sc_lsT)
    online_lse(s1, sc_ms1, sc_ls1)
    online_lse(t, sc_mt, sc_lt)

    labels = lab_ref[:, 0]
    onehot = cols == labels[:, None]
    sc_g[:] = sc_g[:] + jnp.broadcast_to(
        jnp.sum(jnp.where(onehot, t, 0.0), axis=1, keepdims=True), sc_g.shape
    )
    labels_ce = labce_ref[:, 0]
    onehot_ce = cols == labels_ce[:, None]
    sc_gs[:] = sc_gs[:] + jnp.broadcast_to(
        jnp.sum(jnp.where(onehot_ce, s1, 0.0), axis=1, keepdims=True),
        sc_gs.shape,
    )

    b1 = jnp.max(t, axis=1, keepdims=True)
    # duplicate-max -> b2 = b1 (torch.topk(2) semantics, see _stats_kernel)
    dup = jnp.sum(jnp.where(t == b1, 1.0, 0.0), axis=1, keepdims=True) > 1.0
    t_wo_b1 = jnp.where(t == b1, NEG, t)
    b2 = jnp.where(dup, b1, jnp.max(t_wo_b1, axis=1, keepdims=True))
    m1, m2 = sc_m1[:, 0:1], sc_m2[:, 0:1]
    new_m1 = jnp.maximum(m1, b1)
    new_m2 = jnp.maximum(jnp.minimum(m1, b1), jnp.maximum(m2, b2))
    sc_m1[:] = jnp.broadcast_to(new_m1, sc_m1.shape)
    sc_m2[:] = jnp.broadcast_to(new_m2, sc_m2.shape)

    @pl.when(j == n_v - 1)
    def _():
        lsesT_ref[:] = sc_msT[:, 0:1] + jnp.log(sc_lsT[:, 0:1])
        lset_ref[:] = sc_mt[:, 0:1] + jnp.log(sc_lt[:, 0:1])
        gold_ref[:] = sc_g[:, 0:1]
        m1_ref[:] = sc_m1[:, 0:1]
        m2_ref[:] = sc_m2[:, 0:1]
        lses1_ref[:] = sc_ms1[:, 0:1] + jnp.log(sc_ls1[:, 0:1])
        golds1_ref[:] = sc_gs[:, 0:1]


def _klts_fwd_kernel(hs_ref, ws_ref, ht_ref, wt_ref, *rest,
                     v_real: int, inv_t: float, n_v: int, eps: float,
                     vd: bool, tmat: bool = False, tq: bool = False,
                     t_vd: bool = False):
    """_kl_fwd_kernel that also emits tsum (sum of live loca) per row, so
    the backward skips its dedicated stats sweep."""
    wts_ref = None
    if tq:
        wts_ref, *rest = rest
    (lab_ref, lses_ref, lset_ref, sc_row_ref, tval_ref, vmask_ref,
     out_ref, tsum_ref, acc, acc_ts) = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        acc_ts[:] = jnp.zeros_like(acc_ts)

    s = _s_logits_block(hs_ref, ws_ref, inv_t, vd)
    t = _t_block(ht_ref, wt_ref, inv_t, tmat, wts_ref, t_vd)
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    s = jnp.where(in_vocab, s, NEG)
    t = jnp.where(in_vocab, t, NEG)
    labels = lab_ref[:, 0]
    loca, log_ps = _loca_block(
        t, s, cols, labels, lset_ref[:, 0:1], lses_ref[:, 0:1],
        sc_row_ref[:, 0:1], tval_ref[:, 0:1], vmask_ref[:, 0:1] != 0,
    )
    log_ps_c = jnp.maximum(log_ps, jnp.log(eps))
    el = jnp.where(
        (loca > 0) & in_vocab,
        loca * (jnp.log(jnp.where(loca > 0, loca, 1.0)) - log_ps_c),
        0.0,
    )
    acc[:] = acc[:] + jnp.broadcast_to(
        jnp.sum(el, axis=1, keepdims=True), acc.shape
    )
    live = (log_ps_c > jnp.log(eps)) & (loca > 0) & in_vocab
    acc_ts[:] = acc_ts[:] + jnp.broadcast_to(
        jnp.sum(jnp.where(live, loca, 0.0), axis=1, keepdims=True),
        acc_ts.shape,
    )

    @pl.when(j == n_v - 1)
    def _():
        out_ref[:] = acc[:, 0:1]
        tsum_ref[:] = acc_ts[:, 0:1]


def _combined_ds(s_raw, t, cols, in_vocab, labels, labels_ce,
                 lses_ref, lset_ref, sc_row_ref, tval_ref, vmask_ref,
                 lses1_ref, vmce_ref, g_ref, gce_ref, tsum_ref,
                 inv_t, eps):
    """The shared combined d_logits of LoCa-KL + CE for the bwd kernels."""
    sT = jnp.where(in_vocab, s_raw * inv_t, NEG)
    s1 = jnp.where(in_vocab, s_raw, NEG)
    loca, log_ps = _loca_block(
        t, sT, cols, labels, lset_ref[:, 0:1], lses_ref[:, 0:1],
        sc_row_ref[:, 0:1], tval_ref[:, 0:1], vmask_ref[:, 0:1] != 0,
    )
    p_sT = jnp.exp(log_ps)
    live = (log_ps > jnp.log(eps)) & (loca > 0) & in_vocab
    ds = (p_sT * tsum_ref[:, 0:1] - jnp.where(live, loca, 0.0)) \
        * g_ref[:, 0:1] * inv_t
    p_s1 = jnp.exp(s1 - lses1_ref[:, 0:1])
    onehot_ce = (cols == labels_ce[:, None]).astype(jnp.float32)
    ds = ds + (p_s1 - onehot_ce) * (gce_ref[:, 0:1] * vmce_ref[:, 0:1])
    return jnp.where(in_vocab, ds, 0.0)


def _dhs_ce_kernel(hs_ref, ws_ref, ht_ref, wt_ref, *rest,
                   v_real: int, inv_t: float, n_v: int, eps: float,
                   vd: bool, tmat: bool = False, tq: bool = False,
                     t_vd: bool = False):
    wts_ref = None
    if tq:
        wts_ref, *rest = rest
    (lab_ref, labce_ref, lses_ref, lset_ref, sc_row_ref, tval_ref,
     vmask_ref, lses1_ref, vmce_ref,
     g_ref, gce_ref, tsum_ref,
     dhs_ref, acc) = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s_raw = _s_logits_block(hs_ref, ws_ref, 1.0, vd)
    t = _t_block(ht_ref, wt_ref, inv_t, tmat, wts_ref, t_vd)
    cols = _col_ids(j, s_raw.shape[0], s_raw.shape[1])
    in_vocab = cols < v_real
    t = jnp.where(in_vocab, t, NEG)
    ds = _combined_ds(
        s_raw, t, cols, in_vocab, lab_ref[:, 0], labce_ref[:, 0],
        lses_ref, lset_ref, sc_row_ref, tval_ref, vmask_ref,
        lses1_ref, vmce_ref, g_ref, gce_ref, tsum_ref, inv_t, eps,
    )
    w = _masked_ws(ws_ref, j, v_real, vd)
    acc[:] = acc[:] + jax.lax.dot_general(
        ds.astype(w.dtype), w,
        (((1,), (0,)), ((), ())) if vd else (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_v - 1)
    def _():
        dhs_ref[:] = acc[:].astype(dhs_ref.dtype)


def _dws_ce_kernel(hs_ref, ws_ref, ht_ref, wt_ref, *rest,
                   v_real: int, inv_t: float, n_n: int, eps: float,
                   vd: bool, tmat: bool = False, tq: bool = False,
                     t_vd: bool = False):
    wts_ref = None
    if tq:
        wts_ref, *rest = rest
    (lab_ref, labce_ref, lses_ref, lset_ref, sc_row_ref, tval_ref,
     vmask_ref, lses1_ref, vmce_ref,
     g_ref, gce_ref, tsum_ref,
     dws_ref, acc) = rest
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s_raw = _s_logits_block(hs_ref, ws_ref, 1.0, vd)
    t = _t_block(ht_ref, wt_ref, inv_t, tmat, wts_ref, t_vd)
    cols = _col_ids(j, s_raw.shape[0], s_raw.shape[1])
    in_vocab = cols < v_real
    t = jnp.where(in_vocab, t, NEG)
    ds = _combined_ds(
        s_raw, t, cols, in_vocab, lab_ref[:, 0], labce_ref[:, 0],
        lses_ref, lset_ref, sc_row_ref, tval_ref, vmask_ref,
        lses1_ref, vmce_ref, g_ref, gce_ref, tsum_ref, inv_t, eps,
    )
    if vd:
        # d_head in the embedding's own [V, D] layout
        acc[:] = acc[:] + jax.lax.dot_general(
            ds.astype(hs_ref.dtype), hs_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc[:] = acc[:] + jax.lax.dot_general(
            hs_ref[:], ds.astype(hs_ref.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == n_n - 1)
    def _():
        dws_ref[:] = acc[:].astype(dws_ref.dtype)


def _dhsws_ce_kernel(hs_ref, ws_ref, ht_ref, wt_ref, *rest,
                     v_real: int, inv_t: float, n_n: int, n_v: int,
                     eps: float, vd: bool, tmat: bool = False,
                     partials: bool = False, tq: bool = False,
                     t_vd: bool = False):
    """Fused backward: one sweep computes the combined d_logits block and
    contracts it BOTH ways (d_head and d_hidden), instead of recomputing
    the student/teacher logits in two separate kernels.

    Grid (n_v, n_n) — vocab-major like the dws kernel.  d_head accumulates
    per-j in ``acc_w`` (flushed at the last row block).  d_hidden needs
    the opposite ordering, so it accumulates in a persistent full-rows
    VMEM scratch ``acc_h`` ([N, d] f32 — 11 MB at N=3072/d=896) across the
    entire grid; each (j, i) program adds its contribution to rows
    [i·BN, (i+1)·BN) and the final vocab round writes the finished row
    blocks out.  (The dhs output block IS flushed on earlier vocab rounds
    too — unwritten, carrying garbage — but the final round's flush lands
    last in grid order and overwrites it.)  Because the zero-init/
    accumulate/flush protocol spans BOTH grid dims, the caller must
    declare ("arbitrary", "arbitrary") dimension semantics — a "parallel"
    vocab dim would let Megacore split it across cores (one core never
    zero-inits, the other never flushes) and Mosaic reorder it.

    ``partials=True`` variant: each (j, i) program instead writes its
    d_hidden contribution to its own [1, BN, d] f32 output block (no
    persistent scratch, no block revisits); the caller sums the n_v
    partials in XLA.  Trades n_v·N·d·4 bytes of HBM round-trip for not
    holding the accumulator in VMEM across the whole grid."""
    wts_ref = None
    if tq:
        wts_ref, *rest = rest
    (lab_ref, labce_ref, lses_ref, lset_ref, sc_row_ref, tval_ref,
     vmask_ref, lses1_ref, vmce_ref,
     g_ref, gce_ref, tsum_ref,
     dws_ref, dhs_ref, acc_w, *acc_h_opt) = rest
    acc_h = acc_h_opt[0] if acc_h_opt else None
    j, i = pl.program_id(0), pl.program_id(1)

    if not partials:
        @pl.when((j == 0) & (i == 0))
        def _():
            acc_h[:] = jnp.zeros_like(acc_h)

    @pl.when(i == 0)
    def _():
        acc_w[:] = jnp.zeros_like(acc_w)

    s_raw = _s_logits_block(hs_ref, ws_ref, 1.0, vd)
    t = _t_block(ht_ref, wt_ref, inv_t, tmat, wts_ref, t_vd)
    cols = _col_ids(j, s_raw.shape[0], s_raw.shape[1])
    in_vocab = cols < v_real
    t = jnp.where(in_vocab, t, NEG)
    ds = _combined_ds(
        s_raw, t, cols, in_vocab, lab_ref[:, 0], labce_ref[:, 0],
        lses_ref, lset_ref, sc_row_ref, tval_ref, vmask_ref,
        lses1_ref, vmce_ref, g_ref, gce_ref, tsum_ref, inv_t, eps,
    )
    bn = hs_ref.shape[0]
    w = _masked_ws(ws_ref, j, v_real, vd)
    dsw = ds.astype(w.dtype)
    # d_hidden contribution of this vocab block for this row block
    dh_contrib = jax.lax.dot_general(
        dsw, w,
        (((1,), (0,)), ((), ())) if vd else (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if partials:
        dhs_ref[0] = dh_contrib.astype(dhs_ref.dtype)
    else:
        acc_h[pl.ds(i * bn, bn), :] = (
            acc_h[pl.ds(i * bn, bn), :] + dh_contrib
        )
    # d_head contribution of this row block
    if vd:
        acc_w[:] = acc_w[:] + jax.lax.dot_general(
            dsw, hs_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc_w[:] = acc_w[:] + jax.lax.dot_general(
            hs_ref[:], dsw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == n_n - 1)
    def _():
        dws_ref[:] = acc_w[:].astype(dws_ref.dtype)

    if not partials:
        @pl.when(j == n_v - 1)
        def _():
            dhs_ref[:] = acc_h[pl.ds(i * bn, bn), :].astype(dhs_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _loca_ce_rows(hs, ws, ht, wt, lab_loca, lab_ce, v_real, inv_t, alpha,
                  eps, vd, tmat):
    (kl, ce), _ = _loca_ce_rows_impl(
        hs, ws, ht, wt, lab_loca, lab_ce, v_real, inv_t, alpha, eps, vd, tmat
    )
    return kl, ce


def _materialize_t(ht, wt, inv_t, dtype=jnp.float32):
    """[N, V] teacher logits at 1/T in one XLA matmul (same dot +
    scale as ``_logits_block``, so values match the recompute form up to
    f32 accumulation order).  ``wt`` may be the int8 (kernel_q, scale)
    pair — the per-column scale factors out of the dot exactly.

    ``dtype=jnp.bfloat16`` halves the buffer (934 MB at N=3072,
    V=152128 — the fit-enabling form at the real-7B workload, where the
    f32 matrix's 1.9 GB does not fit beside the 8 GB int8 teacher).  The
    cast costs ~2^-9 relative rounding on the logits BEFORE the f32
    softmax/lse math — a bounded, documented deviation from the
    recompute form, same contract as the accum_dtype=bf16 carry."""
    if isinstance(wt, tuple):
        wq, wts = wt
        t = jax.lax.dot_general(
            ht, wq.astype(ht.dtype),
            (((1,), (1,) if _t_vd(ht, wt) else (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * wts
    else:
        t = jax.lax.dot_general(
            ht, wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if inv_t != 1.0:
        t = t * inv_t
    # XLA fuses the cast into the matmul epilogue: only the narrow
    # buffer ever materializes in HBM
    return t if dtype == jnp.float32 else t.astype(dtype)


def _materialize_kernel(ht_ref, wt_ref, wts_ref, out_ref, *, inv_t, t_vd):
    out_ref[:] = _t_block(ht_ref, wt_ref, inv_t, False, wts_ref,
                          t_vd).astype(out_ref.dtype)


def _materialize_t_int8(ht, wt, inv_t, dtype):
    """[N, V] teacher logits at 1/T from the int8 (kernel_q, scale) head,
    via a vocab-streaming Pallas kernel: each (BN, BV) output block does
    one int8-block dequant-dot in VMEM (_t_block), so no dense bf16 copy
    of the head ever exists.  The XLA-dot form (_materialize_t) relies on
    the convert fusing into the dot — true single-shot, but inside a
    row-chunked scan the int8→bf16 convert is loop-invariant and XLA
    hoists it as a 1.01 GB materialized head copy (measured, r5
    b2_tmat_chunk arm) — this kernel is what makes row-chunked tmat
    viable at all.  Edge-vocab garbage (Vt % BV != 0) lands in cols >=
    v_real, which every sweep masks (same contract as _t_block)."""
    n, dt = ht.shape
    wq, wts = wt
    t_vd = wq.shape[0] != dt
    vt = wq.shape[0] if t_vd else wq.shape[1]
    grid = (n // BN, _cdiv(vt, BV))
    hspec = pl.BlockSpec((BN, dt), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    wspec = (pl.BlockSpec((BV, dt), lambda i, j: (j, 0),
                          memory_space=pltpu.VMEM)
             if t_vd else
             pl.BlockSpec((dt, BV), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM))
    sspec = pl.BlockSpec((1, BV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((BN, BV), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_materialize_kernel, inv_t=inv_t, t_vd=t_vd),
        grid=grid,
        in_specs=[hspec, wspec, sspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((n, vt), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(ht, wq, wts)


def _materialize_t_any(ht, wt, inv_t, dtype):
    if isinstance(wt, tuple):
        return _materialize_t_int8(ht, wt, inv_t, dtype)
    return _materialize_t(ht, wt, inv_t, dtype)


def _loca_ce_rows_impl(hs, ws, ht, wt, lab_loca, lab_ce, v_real, inv_t,
                       alpha, eps, vd, tmat):
    if tmat:
        t_in = _materialize_t_any(
            ht, wt, inv_t,
            jnp.bfloat16 if tmat == "bf16" else jnp.float32,
        )
        wt_in = jnp.zeros(_TMAT_DUMMY_SHAPE, jnp.float32)
    else:
        t_in, wt_in = ht, wt
    return _loca_ce_rows_kernels(
        hs, ws, t_in, wt_in, lab_loca, lab_ce, v_real, inv_t, alpha, eps,
        vd, tmat,
    )


def _loca_ce_rows_kernels(hs, ws, t_in, wt_in, lab_loca, lab_ce, v_real,
                          inv_t, alpha, eps, vd, tmat):
    n, d = hs.shape
    dt = t_in.shape[1]
    v_width = ws.shape[0] if vd else ws.shape[1]
    n_n, n_v = n // BN, _cdiv(v_width, BV)
    hspec, _, rspec = _specs(d)
    tq = isinstance(wt_in, tuple)
    tvd = tq and not tmat and wt_in[0].shape[0] != dt
    if tmat:
        hspec_t, cspec_t = _tmat_specs()
    else:
        hspec_t, cspec_t, _ = _specs(dt)
        if tvd:  # vocab-major int8 head: [BV, dt] row blocks, in place
            cspec_t = _ws_block_spec(dt, True)
    t_ops = (wt_in[0], wt_in[1]) if tq else (wt_in,)
    t_specs = [cspec_t, _wts_spec()] if tq else [cspec_t]
    wspec = _ws_block_spec(d, vd)
    lab2 = lab_loca[:, None].astype(jnp.int32)
    labce2 = lab_ce[:, None].astype(jnp.int32)
    outs = pl.pallas_call(
        functools.partial(_stats_ce_kernel, v_real=v_real, inv_t=inv_t,
                          n_v=n_v, vd=vd, tmat=tmat, tq=tq, t_vd=tvd),
        grid=(n_n, n_v),
        in_specs=[hspec, wspec, hspec_t, *t_specs, rspec, rspec],
        out_specs=[rspec] * 7,
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32)] * 7,
        scratch_shapes=[pltpu.VMEM((BN, 128), jnp.float32)] * 10,
        compiler_params=pltpu.CompilerParams(**_SEM),
    )(hs, ws, t_in, *t_ops, lab2, labce2)
    lse_sT, lse_t, gold_t, m1, m2, lse_s1, gold_s1 = (o[:, 0] for o in outs)

    valid = lab_loca >= 0
    p_gt = jnp.exp(gold_t - lse_t)
    p_2nd = jnp.exp(m2 - lse_t)
    scale_row = alpha / (1.0 - p_gt + p_2nd)
    tval = 1.0 - scale_row * (1.0 - p_gt)
    rows = [lse_sT[:, None], lse_t[:, None], scale_row[:, None],
            tval[:, None], valid[:, None].astype(jnp.int32)]
    kl, tsum = _call_rows(
        functools.partial(_klts_fwd_kernel, v_real=v_real, inv_t=inv_t,
                          n_v=n_v, eps=eps, vd=vd, tmat=tmat),
        hs, ws, t_in, wt_in, lab2, rows, n, d, dt, n_n, n_v,
        [rspec, rspec],
        [jax.ShapeDtypeStruct((n, 1), jnp.float32)] * 2,
        [pltpu.VMEM((BN, 128), jnp.float32)] * 2,
        ws_spec=wspec, tmat=tmat,
    )
    valid_ce = (lab_ce >= 0).astype(jnp.float32)
    ce_rows = (lse_s1 - gold_s1) * valid_ce
    res = (t_in, wt_in, rows, lab2, labce2, lse_s1[:, None],
           valid_ce[:, None], tsum)
    return (kl[:, 0], ce_rows), res


def _loca_ce_rows_fwd(hs, ws, ht, wt, lab_loca, lab_ce, v_real, inv_t,
                      alpha, eps, vd, tmat):
    (kl, ce), res = _loca_ce_rows_impl(
        hs, ws, ht, wt, lab_loca, lab_ce, v_real, inv_t, alpha, eps, vd, tmat
    )
    # res carries t_in (the materialized [N, V] logits when tmat — reused
    # by all three backward sweeps instead of recomputing the teacher dot)
    return (kl, ce), (hs, ws, ht, wt) + res


def _loca_ce_rows_bwd(v_real, inv_t, alpha, eps, vd, tmat, res, g):
    hs, ws, ht, wt, t_in, wt_in, rows, lab2, labce2, lse_s1, vmce, tsum = res
    g_kl, g_ce = g
    n, d = hs.shape
    dt = t_in.shape[1]
    v_width = ws.shape[0] if vd else ws.shape[1]
    n_n, n_v = n // BN, _cdiv(v_width, BV)
    hspec, _, _ = _specs(d)
    # kernel arg order: (..., lab2, labce2, lses, lset, sc_row, tval, vmask,
    #                    lses1, vmce, g, gce, tsum)
    ordered_rows = [labce2] + rows + [lse_s1, vmce]
    extra = (g_kl[:, None].astype(jnp.float32),
             g_ce[:, None].astype(jnp.float32), tsum)
    fused_bwd = _os.environ.get("KDSS_LOCA_FUSED_BWD", "0")
    if fused_bwd in ("1", "2"):
        part = fused_bwd == "2"
        if part:
            # v2: per-(j,i) d_hidden partials to HBM, summed in XLA
            dhs_spec = pl.BlockSpec((1, BN, d), lambda j, i: (j, i, 0),
                                    memory_space=pltpu.VMEM)
            dhs_shape = jax.ShapeDtypeStruct((n_v, n, d), jnp.float32)
            scratch = [pltpu.VMEM((BV, d) if vd else (d, BV), jnp.float32)]
        else:
            # v1: persistent full-rows VMEM accumulator
            dhs_spec, _, _ = _specs(d, q_major=False)
            dhs_shape = jax.ShapeDtypeStruct((n, d), hs.dtype)
            scratch = [pltpu.VMEM((BV, d) if vd else (d, BV), jnp.float32),
                       pltpu.VMEM((n, d), jnp.float32)]
        dws, dhs = _call_rows(
            functools.partial(_dhsws_ce_kernel, v_real=v_real, inv_t=inv_t,
                              n_n=n_n, n_v=n_v, eps=eps, vd=vd, tmat=tmat,
                              partials=part),
            hs, ws, t_in, wt_in, lab2, ordered_rows, n, d, dt, n_n, n_v,
            [_ws_block_spec(d, vd, q_major=False), dhs_spec],
            [jax.ShapeDtypeStruct(ws.shape, ws.dtype), dhs_shape],
            scratch,
            extra=extra, q_major=False,
            ws_spec=_ws_block_spec(d, vd, q_major=False), tmat=tmat,
            # v1's persistent acc_h zero-init/accumulate/flush protocol
            # spans the vocab grid dim too, so neither dim may be declared
            # "parallel" (Megacore would split it across cores and Mosaic
            # may reorder it).  v2 (partials) writes per-(j,i) blocks and
            # keeps the default semantics.
            sem=None if part else dict(
                dimension_semantics=("arbitrary", "arbitrary")
            ),
        )
        if part:
            dhs = dhs.sum(0).astype(hs.dtype)
        return (dhs, dws, jnp.zeros_like(ht), None, None, None)
    dhs = _call_rows(
        functools.partial(_dhs_ce_kernel, v_real=v_real, inv_t=inv_t,
                          n_v=n_v, eps=eps, vd=vd, tmat=tmat),
        hs, ws, t_in, wt_in, lab2, ordered_rows, n, d, dt, n_n, n_v,
        hspec, jax.ShapeDtypeStruct((n, d), hs.dtype),
        [pltpu.VMEM((BN, d), jnp.float32)],
        extra=extra, ws_spec=_ws_block_spec(d, vd), tmat=tmat,
    )
    dws = _call_rows(
        functools.partial(_dws_ce_kernel, v_real=v_real, inv_t=inv_t,
                          n_n=n_n, eps=eps, vd=vd, tmat=tmat),
        hs, ws, t_in, wt_in, lab2, ordered_rows, n, d, dt, n_n, n_v,
        _ws_block_spec(d, vd, q_major=False),
        jax.ShapeDtypeStruct(ws.shape, ws.dtype),
        [pltpu.VMEM((BV, d) if vd else (d, BV), jnp.float32)],
        extra=extra, q_major=False,
        ws_spec=_ws_block_spec(d, vd, q_major=False), tmat=tmat,
    )
    return (dhs, dws, jnp.zeros_like(ht), None, None, None)


_loca_ce_rows.defvjp(_loca_ce_rows_fwd, _loca_ce_rows_bwd)


def fused_loca_ce_sums(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    loca_labels: jnp.ndarray,
    ce_labels: jnp.ndarray,
    temperature: float = 1.0,
    alpha: float = 0.8,
    eps: float = 1e-8,
    student_head_layout: str = "dv",
    teacher_logits: str = "recompute",
):
    """(LoCa row-sum total, CE NLL sum, CE valid count) in one pipeline.

    ``student_head_layout="vd"`` consumes the head as [V, D] — the tied
    student's embedding table natively, avoiding its 260 MB layout-copy
    per step — and returns d_head in [V, D] too.

    ``teacher_logits="materialize"`` computes the [N, V] f32 teacher
    logit matrix ONCE (one XLA matmul) and streams blocks of it through
    all four sweeps, instead of recomputing the 2·N·Dt·V teacher dot in
    every sweep.  Costs N·V·4 bytes of HBM held fwd→bwd (~1.9 GB at
    N=3072, V=152k).  ``"materialize_bf16"`` stores the matrix in
    bfloat16 instead — half the HBM (934 MB; fits beside the 8 GB int8
    7B teacher) and half the sweep read traffic, at ~2^-9 relative
    logit rounding before the f32 softmax (see _materialize_t) — the
    default at the real-7B workload.  The f32 form suits the
    single-chip B=1 stand-in configuration; the
    row-sharded mesh path defaults to "recompute" (per-shard N is small
    and the buffer multiplies per chip) with per-shard materialization
    opt-in via KDSS_LOCA_TMAT_MESH=1 (ops/fused_spmd.py::_mesh_tmode).

    ``loca_labels`` are the UNSHIFTED labels the calibration indexes
    (reference quirk, SURVEY.md §2.5 #3); ``ce_labels`` the shifted
    next-token targets with -100 ignored.  Row-sharded callers
    (ops/fused_spmd.py) psum all three before the global reductions.

    ``teacher_head`` may be the int8 (kernel_q [Dt, Vt], kernel_scale
    [Vt]) pair from ``quantize_lm_params_int8(include_embed_head=True)``:
    the kernels stream the int8 head and dequantize per block in VMEM
    (half the head HBM traffic; no bf16 head copy — see _t_block).
    """
    tmat = {"materialize": "f32", "materialize_bf16": "bf16"}.get(
        teacher_logits, False)
    vd = student_head_layout == "vd"
    n = student_hidden.shape[0]
    v_real = student_head.shape[0] if vd else student_head.shape[1]
    tvd = (isinstance(teacher_head, tuple)
           and teacher_head[0].shape[0] != teacher_hidden.shape[1])
    check_teacher_vocab(teacher_head, v_real, vd=tvd)
    inv_t = 1.0 / temperature

    hs = _pad_to(student_hidden, BN, 0)
    ht = _pad_to(teacher_hidden, BN, 0)
    # vocab axis unpadded: ceil-div grid + cols<v_real masking (also
    # truncates the teacher's extra vocab rows without a slice copy)
    ws = student_head
    wt = teacher_head
    if isinstance(wt, tuple):
        wq, wsc = wt
        wt = (wq, wsc.reshape(1, -1).astype(jnp.float32))
    lab = _pad_to(
        jnp.where(loca_labels >= 0, loca_labels, -1).astype(jnp.int32),
        BN, 0, value=-1,
    )
    labce = _pad_to(
        jnp.where(ce_labels >= 0, ce_labels, -1).astype(jnp.int32),
        BN, 0, value=-1,
    )
    if hs.shape[1] % 128 != 0:
        hs = _pad_to(hs, 128, 1)
        ws = _pad_to(ws, 128, 1 if vd else 0)
    if ht.shape[1] % 128 != 0:
        ht = _pad_to(ht, 128, 1)
        wt = ((_pad_to(wt[0], 128, 1 if tvd else 0), wt[1])
              if isinstance(wt, tuple)
              else _pad_to(wt, 128, 0))

    kl_rows, ce_rows = _loca_ce_rows(
        hs, ws, ht, wt, lab, labce, v_real, inv_t, alpha, eps, vd, tmat
    )
    count = (ce_labels >= 0).sum()
    return kl_rows[:n].sum(), ce_rows[:n].sum(), count


def fused_loca_ce_loss(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    loca_labels: jnp.ndarray,
    ce_labels: jnp.ndarray,
    temperature: float = 1.0,
    alpha: float = 0.8,
    eps: float = 1e-8,
    student_head_layout: str = "dv",
    teacher_logits: str = "recompute",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(LoCa loss, CE loss) — matches ``fused_loca_loss`` +
    ``fused_ce.fused_ce_loss`` exactly, at 4 head sweeps instead of 13."""
    n = student_hidden.shape[0]
    v_real = (student_head.shape[0] if student_head_layout == "vd"
              else student_head.shape[1])
    kl_sum, ce_sum, count = fused_loca_ce_sums(
        student_hidden, student_head, teacher_hidden, teacher_head,
        loca_labels, ce_labels, temperature=temperature, alpha=alpha,
        eps=eps, student_head_layout=student_head_layout,
        teacher_logits=teacher_logits,
    )
    loca = kl_sum / (n * v_real) * (temperature ** 2)
    ce = ce_sum / jnp.maximum(count, 1)
    return loca, ce
