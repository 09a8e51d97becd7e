"""Fused teacher/student KL over the vocabulary (Pallas TPU).

The KD hot path: KL(p_T || p_S) at temperature T between two 152k-vocab
heads.  Like ops/fused_ce.py, logits never reach HBM: pass 1 computes both
logsumexps (via the shared streaming kernel), pass 2 accumulates the
per-row KL sum blockwise; the custom-VJP backward streams again using the
closed form d KL / d s_logits = (p_S - p_T) (teacher side is stop-grad in
KD, so only student hidden/head receive gradients).

Reduction contract matches ``losses.kd_losses.kd_kl_loss`` /
``losses.chunked`` (torch ``reduction='mean'``: divide by N*V, times T^2);
teacher logits are truncated to the student vocab by passing a truncated
teacher head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_ce import (BN, BV, NEG, _cdiv, _col_ids, _logits,
                       _masked_w_any, _pad_to, _w_spec, check_teacher_vocab)
from .fused_loca import (_TMAT_DUMMY_SHAPE, _materialize_t, _t_block,
                         _tmat_specs, _wts_spec)


def _kl_dhs_kernel(hs_ref, ws_ref, ht_ref, wt_ref, *rest,
                   v_real: int, inv_t: float, n_v: int, vd: bool,
                   tmat: bool = False, tq: bool = False,
                     t_vd: bool = False):
    wts_ref = None
    if tq:
        wts_ref, *rest = rest
    lses_ref, lset_ref, g_ref, dhs_ref, acc = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s = _logits(hs_ref[:], ws_ref[:], vd) * inv_t
    t = _t_block(ht_ref, wt_ref, inv_t, tmat, wts_ref, t_vd)
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    ps = jnp.where(in_vocab, jnp.exp(s - lses_ref[:, 0:1]), 0.0)
    pt = jnp.where(in_vocab, jnp.exp(t - lset_ref[:, 0:1]), 0.0)
    ds = ((ps - pt) * g_ref[:, 0:1] * inv_t).astype(ws_ref.dtype)
    acc[:] = acc[:] + jax.lax.dot_general(
        ds, _masked_w_any(ws_ref, j, v_real, vd),
        (((1,), (0,)), ((), ())) if vd else (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_v - 1)
    def _():
        dhs_ref[:] = acc[:].astype(dhs_ref.dtype)


def _kl_dws_kernel(hs_ref, ws_ref, ht_ref, wt_ref, *rest,
                   v_real: int, inv_t: float, n_n: int, vd: bool,
                   tmat: bool = False, tq: bool = False,
                     t_vd: bool = False):
    wts_ref = None
    if tq:
        wts_ref, *rest = rest
    lses_ref, lset_ref, g_ref, dws_ref, acc = rest
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s = _logits(hs_ref[:], ws_ref[:], vd) * inv_t
    t = _t_block(ht_ref, wt_ref, inv_t, tmat, wts_ref, t_vd)
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    ps = jnp.where(in_vocab, jnp.exp(s - lses_ref[:, 0:1]), 0.0)
    pt = jnp.where(in_vocab, jnp.exp(t - lset_ref[:, 0:1]), 0.0)
    ds = ((ps - pt) * g_ref[:, 0:1] * inv_t).astype(hs_ref.dtype)
    if vd:
        acc[:] = acc[:] + jax.lax.dot_general(
            ds, hs_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bv, d] — embedding layout
    else:
        acc[:] = acc[:] + jax.lax.dot_general(
            hs_ref[:], ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == n_n - 1)
    def _():
        dws_ref[:] = acc[:].astype(dws_ref.dtype)


def _row_specs(d, q_major=True):
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _kl_rows(hs, ws, ht, wt, v_real, inv_t, vd=False, tmat=False):
    return _kl_rows_impl(hs, ws, ht, wt, v_real, inv_t, vd, tmat)[0]


def _kl_fwd1_kernel(hs_ref, ws_ref, ht_ref, wt_ref, *rest,
                    v_real: int, inv_t: float, n_v: int, vd: bool,
                    tmat: bool = False, tq: bool = False,
                     t_vd: bool = False):
    """ONE sweep for the whole KL forward (replaces 2 lse passes + a KL
    pass).  Uses the decomposition

      KL_row = sum_v p_t (t - s) - lt + ls
             = (U - W) / Zt - lt + ls

    with U = Σ e^(t-mt)·t, W = Σ e^(t-mt)·s, Zt = Σ e^(t-mt) — all three
    (plus the student's own online lse) rescale under the running-max
    update exactly like a flash-attention accumulator."""
    wts_ref = None
    if tq:
        wts_ref, *rest = rest
    (kl_ref, ls_ref, lt_ref,
     sc_ms, sc_zs, sc_mt, sc_zt, sc_u, sc_w) = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        sc_ms[:] = jnp.full_like(sc_ms, NEG)
        sc_zs[:] = jnp.zeros_like(sc_zs)
        sc_mt[:] = jnp.full_like(sc_mt, NEG)
        sc_zt[:] = jnp.zeros_like(sc_zt)
        sc_u[:] = jnp.zeros_like(sc_u)
        sc_w[:] = jnp.zeros_like(sc_w)

    s = _logits(hs_ref[:], ws_ref[:], vd) * inv_t
    t = _t_block(ht_ref, wt_ref, inv_t, tmat, wts_ref, t_vd)
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    s = jnp.where(in_vocab, s, NEG)
    t = jnp.where(in_vocab, t, NEG)

    # student online lse
    ms_prev = sc_ms[:, 0:1]
    ms_new = jnp.maximum(ms_prev, jnp.max(s, axis=1, keepdims=True))
    sc_zs[:] = jnp.broadcast_to(
        sc_zs[:, 0:1] * jnp.exp(ms_prev - ms_new)
        + jnp.sum(jnp.exp(s - ms_new), axis=1, keepdims=True),
        sc_zs.shape,
    )
    sc_ms[:] = jnp.broadcast_to(ms_new, sc_ms.shape)

    # teacher online (Zt, U, W) under one rescale
    mt_prev = sc_mt[:, 0:1]
    mt_new = jnp.maximum(mt_prev, jnp.max(t, axis=1, keepdims=True))
    alpha = jnp.exp(mt_prev - mt_new)
    p_blk = jnp.exp(t - mt_new)  # 0 at masked/padding cols (t = NEG)
    # mask the PRODUCTS: 0 * NEG = NaN otherwise
    ut = jnp.where(in_vocab, p_blk * t, 0.0)
    wt_b = jnp.where(in_vocab, p_blk * s, 0.0)
    sc_zt[:] = jnp.broadcast_to(
        sc_zt[:, 0:1] * alpha + jnp.sum(p_blk, axis=1, keepdims=True),
        sc_zt.shape,
    )
    sc_u[:] = jnp.broadcast_to(
        sc_u[:, 0:1] * alpha + jnp.sum(ut, axis=1, keepdims=True),
        sc_u.shape,
    )
    sc_w[:] = jnp.broadcast_to(
        sc_w[:, 0:1] * alpha + jnp.sum(wt_b, axis=1, keepdims=True),
        sc_w.shape,
    )
    sc_mt[:] = jnp.broadcast_to(mt_new, sc_mt.shape)

    @pl.when(j == n_v - 1)
    def _():
        zt = sc_zt[:, 0:1]
        ls = sc_ms[:, 0:1] + jnp.log(sc_zs[:, 0:1])
        lt = sc_mt[:, 0:1] + jnp.log(zt)
        ls_ref[:] = ls
        lt_ref[:] = lt
        kl_ref[:] = (sc_u[:, 0:1] - sc_w[:, 0:1]) / zt - lt + ls


def _kl_rows_impl(hs, ws, ht, wt, v_real, inv_t, vd, tmat=False):
    n, d = hs.shape
    v_width = ws.shape[0] if vd else ws.shape[1]
    n_n, n_v = n // BN, _cdiv(v_width, BV)
    hspec, _, rspec = _row_specs(d)
    if tmat:
        from .fused_loca import _materialize_t_any
        t_in = _materialize_t_any(
            ht, wt, inv_t,
            jnp.bfloat16 if tmat == "bf16" else jnp.float32,
        )
        wt_in = jnp.zeros(_TMAT_DUMMY_SHAPE, jnp.float32)
        hspec_t, cspec_t = _tmat_specs()
    else:
        t_in, wt_in = ht, wt
        hspec_t, cspec_t, _ = _row_specs(ht.shape[1])
    tq = isinstance(wt_in, tuple)
    tvd = tq and not tmat and wt_in[0].shape[0] != ht.shape[1]
    if tvd:  # vocab-major int8 head: [BV, dt] row blocks (fused_loca)
        cspec_t = _w_spec(ht.shape[1], True)
    t_ops = (wt_in[0], wt_in[1]) if tq else (wt_in,)
    t_specs = [cspec_t, _wts_spec()] if tq else [cspec_t]
    kl, ls, lt = pl.pallas_call(
        functools.partial(_kl_fwd1_kernel, v_real=v_real, inv_t=inv_t,
                          n_v=n_v, vd=vd, tmat=tmat, tq=tq, t_vd=tvd),
        grid=(n_n, n_v),
        in_specs=[hspec, _w_spec(d, vd), hspec_t, *t_specs],
        out_specs=[rspec] * 3,
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((BN, 128), jnp.float32)] * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(hs, ws, t_in, *t_ops)
    return kl[:, 0], (ls[:, 0], lt[:, 0], t_in, wt_in)


def _kl_rows_fwd(hs, ws, ht, wt, v_real, inv_t, vd, tmat):
    kl, (lse_s, lse_t, t_in, wt_in) = _kl_rows_impl(
        hs, ws, ht, wt, v_real, inv_t, vd, tmat
    )
    # t_in is the materialized [N, V] teacher logits when tmat — reused by
    # both backward sweeps instead of recomputing the teacher dot
    return kl, (hs, ws, ht, wt, t_in, wt_in, lse_s, lse_t)


def _kl_rows_bwd(v_real, inv_t, vd, tmat, res, g):
    hs, ws, ht, wt, t_in, wt_in, lse_s, lse_t = res
    n, d = hs.shape
    v_width = ws.shape[0] if vd else ws.shape[1]
    n_n, n_v = n // BN, _cdiv(v_width, BV)
    g2 = g[:, None].astype(jnp.float32)
    hspec, cspec, rspec = _row_specs(d)
    if tmat:
        hspec_t, cspec_t = _tmat_specs()
    else:
        hspec_t, cspec_t, _ = _row_specs(ht.shape[1])
    tq = isinstance(wt_in, tuple)
    tvd = tq and not tmat and wt_in[0].shape[0] != ht.shape[1]
    if tvd:
        cspec_t = _w_spec(ht.shape[1], True)
    t_ops = (wt_in[0], wt_in[1]) if tq else (wt_in,)
    t_specs = [cspec_t, _wts_spec()] if tq else [cspec_t]

    dhs = pl.pallas_call(
        functools.partial(_kl_dhs_kernel, v_real=v_real, inv_t=inv_t,
                          n_v=n_v, vd=vd, tmat=tmat, tq=tq, t_vd=tvd),
        grid=(n_n, n_v),
        in_specs=[hspec, _w_spec(d, vd), hspec_t, *t_specs,
                  rspec, rspec, rspec],
        out_specs=hspec,
        out_shape=jax.ShapeDtypeStruct((n, d), hs.dtype),
        scratch_shapes=[pltpu.VMEM((BN, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(hs, ws, t_in, *t_ops, lse_s[:, None], lse_t[:, None], g2)

    hspec2, cspec2, rspec2 = _row_specs(d, q_major=False)
    if tmat:
        hspec2_t, cspec2_t = _tmat_specs(q_major=False)
    else:
        hspec2_t, cspec2_t, _ = _row_specs(ht.shape[1], q_major=False)
    if tvd:
        cspec2_t = _w_spec(ht.shape[1], True, q_major=False)
    t_specs2 = [cspec2_t, _wts_spec(q_major=False)] if tq else [cspec2_t]
    dws = pl.pallas_call(
        functools.partial(_kl_dws_kernel, v_real=v_real, inv_t=inv_t,
                          n_n=n_n, vd=vd, tmat=tmat, tq=tq, t_vd=tvd),
        grid=(n_v, n_n),
        in_specs=[hspec2, _w_spec(d, vd, q_major=False), hspec2_t, *t_specs2,
                  rspec2, rspec2, rspec2],
        out_specs=_w_spec(d, vd, q_major=False),
        out_shape=jax.ShapeDtypeStruct(ws.shape, ws.dtype),
        scratch_shapes=[pltpu.VMEM((BV, d) if vd else (d, BV), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(hs, ws, t_in, *t_ops, lse_s[:, None], lse_t[:, None], g2)

    # teacher side is stop-grad in KD (None = symbolic zero; covers the
    # int8 (kernel_q, kernel_scale) tuple form too)
    return dhs, dws, jnp.zeros_like(ht), None


_kl_rows.defvjp(_kl_rows_fwd, _kl_rows_bwd)


def fused_kl_sum(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    temperature: float = 1.0,
    student_head_layout: str = "dv",
    teacher_logits: str = "recompute",
) -> jnp.ndarray:
    """Sum over rows of sum_v p_T (log p_T - log p_S) — pre-reduction KL.

    Split out of :func:`fused_kl_loss` so row-sharded callers
    (ops/fused_spmd.py) can psum partial sums before the global mean.
    ``student_head_layout="vd"`` takes the student head as [V, D] (the
    tied embedding natively — no transpose copy; see fused_loca.py).
    """
    vd = student_head_layout == "vd"
    n, _ = student_hidden.shape
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
        # int8 teacher head: kernels stream (kernel_q, [1, V] f32 scales)
        # and dequantize per vocab block in VMEM (fused_loca._t_block)
        wt = (wt[0], wt[1].reshape(1, -1).astype(jnp.float32))
    if hs.shape[1] % 128 != 0:
        hs = _pad_to(hs, 128, 1)
        ws = _pad_to(ws, 128, 1 if vd else 0)
    if ht.shape[1] % 128 != 0:
        ht = _pad_to(ht, 128, 1)
        wt = ((_pad_to(wt[0], 128, 1 if tvd else 0), wt[1])
              if isinstance(wt, tuple)
              else _pad_to(wt, 128, 0))

    kl_rows = _kl_rows(
        hs, ws, ht, wt, v_real, inv_t, vd,
        {"materialize": "f32", "materialize_bf16": "bf16"}.get(
            teacher_logits, False))
    return kl_rows[:n].sum()


def fused_kl_loss(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    temperature: float = 1.0,
    student_head_layout: str = "dv",
    teacher_logits: str = "recompute",
) -> jnp.ndarray:
    """mean_el[ p_T (log p_T - log p_S) ] * T^2 over [N, V] (torch 'mean').

    student_hidden [N, Ds], student_head [Ds, V]; teacher pre-truncated to
    the same V via ``teacher_head[:, :V]``.  Teacher inputs are treated as
    constants (zero cotangent), matching the KD stop-gradient.
    """
    n = student_hidden.shape[0]
    v_real = (student_head.shape[0] if student_head_layout == "vd"
              else student_head.shape[1])
    total = fused_kl_sum(
        student_hidden, student_head, teacher_hidden, teacher_head,
        temperature=temperature, student_head_layout=student_head_layout,
        teacher_logits=teacher_logits,
    )
    return total / (n * v_real) * (temperature ** 2)
