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

from .fused_ce import BN, BV, NEG, _cdiv, _col_ids, _lse_gold, _masked_w, _pad_to


def _kl_fwd_kernel(hs_ref, ws_ref, ht_ref, wt_ref, lses_ref, lset_ref,
                   kl_ref, acc,
                   *, v_real: int, inv_t: float, n_v: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s = jax.lax.dot_general(
        hs_ref[:], ws_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_t
    t = jax.lax.dot_general(
        ht_ref[:], wt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_t
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    log_pt = jnp.where(in_vocab, t - lset_ref[:, 0:1], NEG)
    log_ps = s - lses_ref[:, 0:1]
    pt = jnp.where(in_vocab, jnp.exp(log_pt), 0.0)
    el = jnp.where(in_vocab, pt * (log_pt - log_ps), 0.0)
    acc[:] = acc[:] + jnp.broadcast_to(
        jnp.sum(el, axis=1, keepdims=True), acc.shape
    )

    @pl.when(j == n_v - 1)
    def _():
        kl_ref[:] = acc[:, 0:1]


def _kl_dhs_kernel(hs_ref, ws_ref, ht_ref, wt_ref, lses_ref, lset_ref,
                   g_ref, dhs_ref, acc,
                   *, v_real: int, inv_t: float, n_v: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s = jax.lax.dot_general(
        hs_ref[:], ws_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_t
    t = jax.lax.dot_general(
        ht_ref[:], wt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_t
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    ps = jnp.where(in_vocab, jnp.exp(s - lses_ref[:, 0:1]), 0.0)
    pt = jnp.where(in_vocab, jnp.exp(t - lset_ref[:, 0:1]), 0.0)
    ds = ((ps - pt) * g_ref[:, 0:1] * inv_t).astype(ws_ref.dtype)
    acc[:] = acc[:] + jax.lax.dot_general(
        ds, _masked_w(ws_ref, j, v_real), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_v - 1)
    def _():
        dhs_ref[:] = acc[:].astype(dhs_ref.dtype)


def _kl_dws_kernel(hs_ref, ws_ref, ht_ref, wt_ref, lses_ref, lset_ref,
                   g_ref, dws_ref, acc,
                   *, v_real: int, inv_t: float, n_n: int):
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    s = jax.lax.dot_general(
        hs_ref[:], ws_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_t
    t = jax.lax.dot_general(
        ht_ref[:], wt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_t
    cols = _col_ids(j, s.shape[0], s.shape[1])
    in_vocab = cols < v_real
    ps = jnp.where(in_vocab, jnp.exp(s - lses_ref[:, 0:1]), 0.0)
    pt = jnp.where(in_vocab, jnp.exp(t - lset_ref[:, 0:1]), 0.0)
    ds = ((ps - pt) * g_ref[:, 0:1] * inv_t).astype(hs_ref.dtype)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _kl_rows(hs, ws, ht, wt, v_real, inv_t):
    return _kl_rows_impl(hs, ws, ht, wt, v_real, inv_t)[0]


def _lses(h, w, v_real, inv_t):
    dummy = jnp.zeros((h.shape[0],), jnp.int32)
    lse, _ = _lse_gold(h * inv_t, w, dummy, v_real)
    return lse


def _kl_rows_impl(hs, ws, ht, wt, v_real, inv_t):
    n, d = hs.shape
    n_n, n_v = n // BN, _cdiv(ws.shape[1], BV)
    lse_s = _lses(hs, ws, v_real, inv_t)
    lse_t = _lses(ht, wt, v_real, inv_t)
    hspec, cspec, rspec = _row_specs(d)
    hspec_t, cspec_t, _ = _row_specs(ht.shape[1])
    kl = pl.pallas_call(
        functools.partial(_kl_fwd_kernel, v_real=v_real, inv_t=inv_t, n_v=n_v),
        grid=(n_n, n_v),
        in_specs=[hspec, cspec, hspec_t, cspec_t, rspec, rspec],
        out_specs=rspec,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BN, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(hs, ws, ht, wt, lse_s[:, None], lse_t[:, None])
    return kl[:, 0], (lse_s, lse_t)


def _kl_rows_fwd(hs, ws, ht, wt, v_real, inv_t):
    kl, (lse_s, lse_t) = _kl_rows_impl(hs, ws, ht, wt, v_real, inv_t)
    return kl, (hs, ws, ht, wt, lse_s, lse_t)


def _kl_rows_bwd(v_real, inv_t, res, g):
    hs, ws, ht, wt, lse_s, lse_t = res
    n, d = hs.shape
    v_pad = ws.shape[1]
    n_n, n_v = n // BN, _cdiv(v_pad, BV)
    g2 = g[:, None].astype(jnp.float32)
    hspec, cspec, rspec = _row_specs(d)
    hspec_t, cspec_t, _ = _row_specs(ht.shape[1])

    dhs = pl.pallas_call(
        functools.partial(_kl_dhs_kernel, v_real=v_real, inv_t=inv_t, n_v=n_v),
        grid=(n_n, n_v),
        in_specs=[hspec, cspec, hspec_t, cspec_t, rspec, rspec, rspec],
        out_specs=hspec,
        out_shape=jax.ShapeDtypeStruct((n, d), hs.dtype),
        scratch_shapes=[pltpu.VMEM((BN, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(hs, ws, ht, wt, lse_s[:, None], lse_t[:, None], g2)

    hspec2, cspec2, rspec2 = _row_specs(d, q_major=False)
    hspec2_t, cspec2_t, _ = _row_specs(ht.shape[1], q_major=False)
    dws = pl.pallas_call(
        functools.partial(_kl_dws_kernel, v_real=v_real, inv_t=inv_t, n_n=n_n),
        grid=(n_v, n_n),
        in_specs=[hspec2, cspec2, hspec2_t, cspec2_t, rspec2, rspec2, rspec2],
        out_specs=cspec2,
        out_shape=jax.ShapeDtypeStruct((d, v_pad), ws.dtype),
        scratch_shapes=[pltpu.VMEM((d, BV), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(hs, ws, ht, wt, lse_s[:, None], lse_t[:, None], g2)

    # teacher side is stop-grad in KD; return zeros to satisfy the vjp
    dht = jnp.zeros_like(ht)
    dwt = jnp.zeros_like(wt)
    return dhs, dws, dht, dwt


_kl_rows.defvjp(_kl_rows_fwd, _kl_rows_bwd)


def fused_kl_sum(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Sum over rows of sum_v p_T (log p_T - log p_S) — pre-reduction KL.

    Split out of :func:`fused_kl_loss` so row-sharded callers
    (ops/fused_spmd.py) can psum partial sums before the global mean.
    """
    n, _ = student_hidden.shape
    v_real = student_head.shape[1]
    inv_t = 1.0 / temperature

    hs = _pad_to(student_hidden, BN, 0)
    ht = _pad_to(teacher_hidden, BN, 0)
    # vocab axis unpadded: ceil-div grid + cols<v_real masking (also
    # truncates the teacher's extra vocab rows without a slice copy)
    ws = student_head
    wt = teacher_head
    if hs.shape[1] % 128 != 0:
        hs = _pad_to(hs, 128, 1)
        ws = _pad_to(ws, 128, 0)
    if ht.shape[1] % 128 != 0:
        ht = _pad_to(ht, 128, 1)
        wt = _pad_to(wt, 128, 0)

    kl_rows = _kl_rows(hs, ws, ht, wt, v_real, inv_t)
    return kl_rows[:n].sum()


def fused_kl_loss(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """mean_el[ p_T (log p_T - log p_S) ] * T^2 over [N, V] (torch 'mean').

    student_hidden [N, Ds], student_head [Ds, V]; teacher pre-truncated to
    the same V via ``teacher_head[:, :V]``.  Teacher inputs are treated as
    constants (zero cotangent), matching the KD stop-gradient.
    """
    n = student_hidden.shape[0]
    v_real = student_head.shape[1]
    total = fused_kl_sum(
        student_hidden, student_head, teacher_hidden, teacher_head,
        temperature=temperature,
    )
    return total / (n * v_real) * (temperature ** 2)
