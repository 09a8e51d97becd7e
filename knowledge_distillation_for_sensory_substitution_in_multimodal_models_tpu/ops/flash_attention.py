"""Pallas TPU flash attention (forward + custom-VJP backward).

Why: at OneVision sequence lengths (~5k anyres tokens) materialized
attention probabilities are [H, S, S] f32 ≈ 1.2 GB *per layer* — the
single-chip OOM observed with the XLA einsum path.  This kernel streams KV
blocks through VMEM with an online softmax, so per-core live memory is
O(block_q x block_k); the backward pass recomputes probabilities from the
saved logsumexp instead of storing them.

Supports:
* GQA (kv heads broadcast over query-head groups via the k/v index_map)
* causal masking (block-level skip + intra-block iota mask)
* kv padding masks [B, Skv]
* head_dim and sequence padding to TPU tile multiples (handled in the
  wrapper; padded kv columns are masked, padded q rows sliced off)

The reference gets attention from whatever torch SDPA dispatches to, with
flash-attn explicitly commented out of its requirements
(`requirements.txt:44`); this is the TPU-native replacement.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import jax.ad_checkpoint
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..parallel.mesh import active_abstract_mesh as _abstract_mesh

# Finite "minus infinity": keeps exp()/max() well-defined for fully masked
# rows (same approach as jax.experimental.pallas.ops flash kernels).
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# Bound-mode dead-row threshold (r5, advisor finding): ``l == 0`` alone has
# a gray band — a row whose max score sits ~87-104 nats below the head
# scalar c produces f32-subnormal p that the ``p.astype(bf16)`` cast (or a
# flush-to-zero VPU) drops from acc while the f32 l stays > 0, evading the
# poison and returning a silently degraded finite output.  Poisoning on
# ``l < 1e-30`` instead closes the band: a row trips it only when its best
# score sits > ~69 nats below c (> ~109 below the raw Cauchy-Schwarz bound,
# since c = bound - 40), still ~e^40 outside anything LN'd activations
# produce, while every row that could have had flushed contributions is
# caught.  Only the sbound kernels use this — the max-shift kernels keep
# the exact ``l >= 1`` invariant (p_max = 1 at the true row max).
_SBOUND_DEAD_L = 1e-30


def _scaled(s: jnp.ndarray, scale: float) -> jnp.ndarray:
    """``s * scale`` unless scale is statically 1.0 (prescaled q): the
    multiply is a full f32 VPU pass over every visited [rows, bk] score
    block, 16x the work of scaling q's [rows, d] once in the wrapper
    (KDSS_FLASH_PRESCALE)."""
    return s if scale == 1.0 else s * scale


def _maybe_prescale(q: jnp.ndarray, scale: float):
    """Fold the softmax scale into q once ([*, d] work, outside the
    custom_vjp so autodiff chains dq = scale * dq_kernel automatically) and
    run the kernels with scale == 1.0, which statically drops the per-block
    ``s * scale`` pass in fwd/dq/dkv and the ``* scale`` in both ds chains.
    Default ON (+4.4% fwd kernel, +0.7% KD step measured): bf16
    re-rounding of q*scale perturbs logits by ~2^-9 relative — the bench
    loss trace moved by 1 digit in the 5th decimal at one step.
    KDSS_FLASH_PRESCALE=0 restores in-kernel scaling.  Read at trace time
    so tests can toggle per-call."""
    import os as _os

    if scale != 1.0 and _os.environ.get("KDSS_FLASH_PRESCALE", "1") == "1":
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
        scale = 1.0
    return q, scale


def _block_mask(
    s: jnp.ndarray,
    *,
    causal: bool,
    iq: jnp.ndarray,
    ik: jnp.ndarray,
    bq: int,
    bk: int,
    kv_mask_blk: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Apply causal/padding masks to one [bq, bk] logits block."""
    if causal:
        q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        k_pos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(q_pos >= k_pos, s, MASK_VALUE)
    if kv_mask_blk is not None:
        s = jnp.where(kv_mask_blk, s, MASK_VALUE)
    return s


def _fwd_kernel(
    q_ref, k_ref, v_ref, kvm_ref,
    o_ref, lse_ref,
    acc_ref, m_ref, l_ref,
    *, causal: bool, scale: float, bq: int, bk: int, n_kv: int,
):
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[:] = jnp.zeros_like(l_ref)

    def compute(masked):
        # keep matmul operands in their storage dtype (bf16): the MXU
        # accumulates in f32 via preferred_element_type; upcasting operands
        # forces f32 MXU passes at a fraction of the bf16 rate
        q = q_ref[0, 0]  # [bq, d]
        k = k_ref[0, 0]  # [bk, d]
        v = v_ref[0, 0]  # [bk, d]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)  # [bq, bk] f32
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            s = _block_mask(
                s, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk, kv_mask_blk=kvm
            )

        m_prev = m_ref[:, 0:1]  # [bq, 1]
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        # Fully-masked rows: every column sits at MASK_VALUE, so m_new ==
        # MASK_VALUE and exp(s - m_new) == 1 per column — NOT 0.  Zero the
        # row explicitly so l stays 0 and the finalize guard emits out=0 /
        # lse=MASK_VALUE (and backward, guarded on lse below, emits zero
        # grads).  Rows with any valid column are unaffected: their masked
        # columns underflow to 0 since m_new >> MASK_VALUE.  Clean blocks
        # skip the select (numeric no-op there, full VPU pass if emitted).
        if masked:
            p = jnp.where(m_new > MASK_VALUE * 0.5, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    # clean/masked dispatch (shared with the GQA kernels): interior
    # causal blocks with clean kv skip every masking pass.
    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(ik == n_kv - 1)
    def _finalize():
        l = l_ref[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:  # fwd-only calls skip the lse output
            lse = jnp.where(
                l == 0.0, MASK_VALUE, m_ref[:, 0:1] + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _fwd_kernel_stream(
    q_ref, k_ref, v_ref, kvm_ref, mh_ref,
    o_ref, lse_ref,
    acc_ref, l_ref,
    *, causal: bool, scale: float, bq: int, bk: int, n_kv: int,
):
    """Per-row streaming variant of :func:`_fwd_kernel`
    (KDSS_FLASH_STREAM=max), base path.

    Same design as :func:`_gqa_fwd_kernel_stream` (see its docstring):
    ``mh`` is the exact per-row masked score max from pass 1
    (:func:`_rowmax_kernel`), constant across kv blocks, so the carried
    recurrence and alpha rescale disappear and both accumulators are
    pure +=.  Validation reference for any input magnitude; the perf
    path is :func:`_fwd_kernel_sbound`.
    """
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    mh = mh_ref[0, 0][:, 0:1]

    def compute(masked):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            s = _block_mask(
                s, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk, kv_mask_blk=kvm
            )
        p = jnp.exp(s - mh)  # masked columns underflow to exactly 0
        if masked:  # fully-masked rows (mh == MASK_VALUE): see GQA twin
            p = jnp.where(mh > MASK_VALUE * 0.5, p, 0.0)
        l_ref[:] = l_ref[:] + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(ik == n_kv - 1)
    def _finalize():
        l = l_ref[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            lse = jnp.where(l == 0.0, MASK_VALUE, mh + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _block_mask_bool(*, causal, iq, ik, bq, bk, kv_mask_blk):
    """Combined causal ∧ kv-padding bool for one [bq, bk] block (True =
    attend); python ``True`` when neither mask applies.  Used by the
    sbound kernels, which need the boolean itself (row-validity
    tracking for the underflow poison) — the default kernels keep their
    measured two-``where`` form in :func:`_block_mask`."""
    m = True
    if causal:
        q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        k_pos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        m = _and(m, q_pos >= k_pos)
    if kv_mask_blk is not None:
        m = _and(m, jnp.broadcast_to(kv_mask_blk, (bq, bk)))
    return m


def _gqa_mask_bool(*, causal, iq, ik, g, bq, bk, kv_mask_blk):
    """GQA-layout (g*bq rows) variant of :func:`_block_mask_bool`."""
    m = True
    if causal:
        q_pos = _q_positions(g, bq, bk, iq)
        k_pos = ik * bk + jax.lax.broadcasted_iota(
            jnp.int32, (g * bq, bk), 1)
        m = _and(m, q_pos >= k_pos)
    if kv_mask_blk is not None:
        m = _and(m, jnp.broadcast_to(kv_mask_blk, (g * bq, bk)))
    return m


def _sbound_track_valid(vc_ref, masked_bool):
    """Accumulate per-row "has >=1 attendable column" into vc_ref.

    ``masked_bool`` is the block's attend-bool ([rows, bk]), python True
    for mask-free interior blocks.  The max-reduce does NOT feed exp, so
    it pipelines at full rate (the phase ablation's `redonly` arm)."""
    if masked_bool is True:
        vc_ref[:] = jnp.ones_like(vc_ref)
    else:
        vc_ref[:] = jnp.maximum(vc_ref[:], jnp.broadcast_to(
            jnp.max(masked_bool.astype(jnp.float32), axis=1, keepdims=True),
            vc_ref.shape))


def _sbound_finalize_o(acc, l, vc_ref, poison_mode):
    """Normalize acc, keeping fully-masked rows at the all-kernels 0
    convention while POISONING valid-but-underflowed rows with NaN:
    bound mode must never return a silently-wrong finite answer (see
    :func:`_stream_mode`).

    ``poison_mode`` (static):
    * ``"dead"`` — no kv mask, so every row has >=1 attendable column
      (causal rows own their diagonal): l == 0 alone implies underflow.
      Finalize-only cost, free.
    * ``"vc"`` — fwd-only call WITH a kv mask: fully-masked rows exist
      and there is no lse output for the wrapper to consult, so the
      kernel tracks per-row validity in vc_ref (the per-block tracking
      measured -2.4% on the KD step — acceptable on fwd-only/serving
      calls, not on the training path).
    * ``"wrapper"`` — with_lse call WITH a kv mask: the wrapper poisons
      from lse + an XLA row-validity mask instead (fuses into the
      surrounding graph for free); the kernel does nothing.

    Dead = ``l < _SBOUND_DEAD_L`` (not ``== 0``): near-underflow rows
    whose p flushed out of acc but left a subnormal-scale f32 l must
    poison too, never return a degraded finite answer (see the
    constant's comment)."""
    dead = l < _SBOUND_DEAD_L
    l_safe = jnp.where(dead, 1.0, l)
    o = acc / l_safe
    if poison_mode == "dead":
        return jnp.where(dead, float("nan"), o)
    if poison_mode == "vc":
        return jnp.where(_and(dead, vc_ref[:, 0:1] > 0.0),
                         float("nan"), o)
    return o


def _rows_valid(kv_mask, causal, sq):
    """[B, sq] bool: q row has >=1 attendable kv column.  ``None`` means
    every row is valid (no kv mask: causal rows own their diagonal,
    non-causal rows see everything)."""
    if kv_mask is None:
        return None
    if causal:
        pref = jnp.cumsum(kv_mask.astype(jnp.int32), axis=1) > 0
        skv = pref.shape[1]
        if skv < sq:  # q padded past kv: those rows see all of kv
            pref = jnp.concatenate(
                [pref,
                 jnp.broadcast_to(pref[:, -1:], (pref.shape[0], sq - skv))],
                axis=1)
        return pref[:, :sq]
    return jnp.broadcast_to(jnp.any(kv_mask, axis=1, keepdims=True),
                            (kv_mask.shape[0], sq))


def _sbound_wrapper_poison(out, lse, kv_mask, causal):
    """Training-path (with_lse) bound-mode poison: NaN the
    valid-but-underflowed rows (lse == MASK_VALUE marks l == 0) outside
    the kernel.  out [..., sq, d], lse [..., sq, 128], kv_mask is
    non-None here (the kvm-free case is handled in-kernel, mode
    "dead")."""
    sq = out.shape[-2]
    dead = lse[..., :1] == MASK_VALUE
    valid = _rows_valid(kv_mask, causal, sq)
    vshape = valid.shape[:1] + (1,) * (out.ndim - 3) + (sq, 1)
    poison = jnp.logical_and(dead, valid.reshape(vshape))
    return jnp.where(poison, jnp.asarray(float("nan"), out.dtype), out)


def _neutralize_dead_rows(lse_slim, delta):
    """Make dead rows inert before they reach the backward kernels.

    Dead rows — fully-masked, or bound-mode underflow-poisoned — carry
    ``lse == MASK_VALUE`` and (under bound mode) a NaN-poisoned residual
    ``out``.  Two failure modes follow if fed to the kernels raw:

    * ``p = exp(s - MASK_VALUE) = exp(s + 2.4e38) = inf`` on any block.
      The kernels' old masked-block-only row guard assumed such rows can
      only appear in masked blocks — true for fully-masked rows, FALSE
      under bound mode, where a valid row underflows in clean blocks too
      (zero-padded q rows trip this whenever the head scalar c exceeds
      ~87, i.e. on fully in-envelope data).
    * ``delta = sum(g * out) = 0 * NaN = NaN`` from the poisoned
      residual, which then multiplies into dk/dv for ALL tokens of the
      block while the sliced loss stays finite — silent gradient
      corruption.

    Fix once in O(S) wrapper space instead of a per-block VPU pass:
    clamp dead lse to +0.7*f32max so ``p = exp(s - lse)`` underflows to
    EXACT 0 for any finite or masked s (s - lse <= -1.7e38; masked
    columns overflow to -inf; exp -> 0 either way), and zero dead delta
    so ``ds = p * (dp - delta)`` is 0 everywhere.  This also covers
    fully-masked rows, so the kernels carry no row guard at all (one
    fewer [rows, bk] f32 select on every masked block of all four
    backward kernels)."""
    dead = lse_slim == MASK_VALUE
    lse_slim = jnp.where(dead, -MASK_VALUE, lse_slim)
    delta = jnp.where(dead, 0.0, delta)
    return lse_slim, delta


def _fwd_kernel_sbound(
    q_ref, k_ref, v_ref, kvm_ref, c_ref, o_ref, lse_ref,
    acc_ref, l_ref, vc_ref,
    *, causal: bool, scale: float, bq: int, bk: int, n_kv: int,
    poison_mode: str,
):
    """Scalar-shift streaming fwd (KDSS_FLASH_STREAM=bound), base path.

    Same exact-math family as :func:`_fwd_kernel_stream`, but the shift
    is a per-(batch, head) SCALAR read from SMEM instead of a per-row
    vector: the r4 ablation (docs/PERF_NOTES.md "scalar vs per-row")
    measured that ANY per-row vector in exp's path costs ~0.5 ms/pass in
    lane-broadcast serialization, while a traced scalar splat keeps the
    QK-epilogue fusion and runs at the MXU floor (0.267 vs 0.776
    ms/pass).  See :func:`_gqa_fwd_kernel_sbound` for the envelope and
    the underflow-poison semantics.
    """
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)
        if poison_mode == "vc":
            vc_ref[:] = jnp.zeros_like(vc_ref)

    # c rides as a FULL [B, H] SMEM array (a blocked (1,1) spec violates
    # the mosaic last-two-dims tiling check for general B/H)
    c = c_ref[pl.program_id(0), pl.program_id(1)]

    def compute(masked):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            if poison_mode == "vc":  # need the attend-bool for vc
                mb = _block_mask_bool(
                    causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                    kv_mask_blk=kvm)
                if mb is not True:
                    s = jnp.where(mb, s, MASK_VALUE)
                _sbound_track_valid(vc_ref, mb)
            else:
                s = _block_mask(s, causal=causal, iq=iq, ik=ik, bq=bq,
                                bk=bk, kv_mask_blk=kvm)
        elif poison_mode == "vc":
            _sbound_track_valid(vc_ref, True)
        p = jnp.exp(s - c)  # masked columns: exp(MASK_VALUE - c) == 0
        l_ref[:] = l_ref[:] + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(ik == n_kv - 1)
    def _finalize():
        l = l_ref[:, 0:1]
        dead = l < _SBOUND_DEAD_L  # see _SBOUND_DEAD_L: gray-band rows too
        l_safe = jnp.where(dead, 1.0, l)
        o = _sbound_finalize_o(acc_ref[:], l, vc_ref, poison_mode)
        o_ref[0, 0] = o.astype(o_ref.dtype)
        if lse_ref is not None:
            lse = jnp.where(dead, MASK_VALUE, c + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _dq_kernel(
    q_ref, k_ref, v_ref, kvm_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    acc_ref,
    *, causal: bool, scale: float, bq: int, bk: int, n_kv: int,
):
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def compute(masked):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]
        delta = delta_ref[0, 0][:, 0:1]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            s = _block_mask(
                s, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk, kv_mask_blk=kvm
            )
        # dead rows (fully-masked or bound-underflowed) need no guard
        # here: the wrapper clamped their lse to +huge, so p == 0 exactly
        # on every block (_neutralize_dead_rows)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = _scaled(p * (dp - delta), scale).astype(k.dtype)
        acc_ref[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(ik == n_kv - 1)
    def _write():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, kvm_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, causal: bool, scale: float, bq: int, bk: int, n_q: int,
):
    ik, iq = pl.program_id(2), pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def compute(masked):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]
        delta = delta_ref[0, 0][:, 0:1]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            s = _block_mask(
                s, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk, kv_mask_blk=kvm
            )
        # dead rows: p == 0 exactly via the wrapper's lse clamp
        # (_neutralize_dead_rows) — no in-kernel guard needed
        p = jnp.exp(s - lse)  # [bq, bk] f32
        p_lo = p.astype(do.dtype)
        dv_acc[:] += jax.lax.dot_general(
            p_lo, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # p^T @ do -> [bk, d]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = _scaled(p * (dp - delta), scale).astype(q.dtype)
        dk_acc[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # ds^T @ q -> [bk, d]

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(iq == n_q - 1)
    def _write():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _specs(b, hq, group, bq, bk, d, kv_mask, q_major: bool):
    """Common BlockSpecs for (q, k, v, kv_mask) given grid layout.

    q_major=True  -> grid (b, hq, n_q, n_kv): q indexed by i, kv by j
    q_major=False -> grid (b, hq, n_kv, n_q): kv indexed by i, q by j
    """
    if q_major:
        qi = lambda b_, h, i, j: (b_, h, i, 0)
        ki = lambda b_, h, i, j: (b_, h // group, j, 0)
        mi = lambda b_, h, i, j: (b_, 0, j)
    else:
        qi = lambda b_, h, i, j: (b_, h, j, 0)
        ki = lambda b_, h, i, j: (b_, h // group, i, 0)
        mi = lambda b_, h, i, j: (b_, 0, i)
    q_spec = pl.BlockSpec((1, 1, bq, d), qi, memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, 1, bk, d), ki, memory_space=pltpu.VMEM)
    # kv mask carried as [B, 1, Skv]: the (1, bk) tail of the block equals /
    # divides the array dims, satisfying the mosaic tiling constraint.
    m_spec = (
        pl.BlockSpec((1, 1, bk), mi, memory_space=pltpu.VMEM)
        if kv_mask is not None
        else None
    )
    return q_spec, k_spec, m_spec


import os

# 1024 measured 6% faster at the step level than 512 (fewer grid
# programs, larger MXU tiles); override via KDSS_FLASH_BLOCK.
_BLOCK_TARGET = int(os.environ.get("KDSS_FLASH_BLOCK", "1024"))


def _pick_block(s: int, target: int = None) -> int:
    """Block <= target minimizing padding waste, ties to the LARGEST such
    block (e.g. 729 -> 768 as one block, not 512 -> padded 1024; equal-pad
    384 loses the tie to 768's fewer programs)."""
    if target is None:
        target = _BLOCK_TARGET
    if s <= 128:
        return 128
    best, best_padded = 128, ((s + 127) // 128) * 128
    for b in (1024, 768, 512, 384, 256, 128):
        if b > target:
            continue
        padded = -(-s // b) * b
        if padded < best_padded or (padded == best_padded and b > best):
            best, best_padded = b, padded
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, kv_mask, causal, scale):
    out, _ = _flash_fwd_impl(q, k, v, kv_mask, causal, scale, with_lse=False)
    return out


def _flash_fwd_impl(q, k, v, kv_mask, causal, scale, with_lse=True):
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv
    bq, bk = _pick_block(sq), _pick_block(skv)
    n_q, n_kv = sq // bq, skv // bk

    q_spec, k_spec, m_spec = _specs(b, hq, group, bq, bk, d, kv_mask, True)
    in_specs = [q_spec, k_spec, k_spec]
    inputs = [q, k, v]
    if kv_mask is not None:
        in_specs.append(m_spec)
        inputs.append(kv_mask.astype(jnp.int8)[:, None, :])
    else:
        in_specs.append(None)
        inputs.append(None)

    mode = _stream_mode()
    stream = mode != "off"
    poison_mode = None
    want_lse = with_lse
    if mode == "bound":
        poison_mode = ("dead" if kv_mask is None
                       else ("vc" if not with_lse else "wrapper"))
        if poison_mode == "vc" and _SBOUND_FWD_POISON() == "lse":
            # fwd-only + kv mask: trade the in-kernel per-block validity
            # tracking (r4: -2.4% on the KD step, whose teacher runs 28
            # fwd-only layers) for an lse emit + the free XLA wrapper
            # poison.  KDSS_SBOUND_FWD_POISON selects; A/B'd on-chip.
            poison_mode, want_lse = "wrapper", True
        kernel = functools.partial(
            _fwd_kernel_sbound, causal=causal, scale=scale, bq=bq, bk=bk,
            n_kv=n_kv, poison_mode=poison_mode)
        if poison_mode != "vc":  # vc scratch only exists in "vc" mode
            kernel = _drop_arg(kernel, 9)
    else:
        kernel = functools.partial(
            _fwd_kernel_stream if stream else _fwd_kernel,
            causal=causal, scale=scale, bq=bq, bk=bk, n_kv=n_kv)
    # Fwd-only calls (decode prefill, eval forward) drop the lse output:
    # its [B, H, S, 128] f32 HBM write is pure waste unless a backward
    # will consume it (or the lse-based fwd poison wants it, see above).
    if not want_lse:
        kernel = _drop_arg(kernel, 6 if stream else 5)
    if kv_mask is None:
        kernel = _drop_arg(kernel, 3)
        in_specs = in_specs[:3]
        inputs = inputs[:3]
    if stream:
        mh_spec = pl.BlockSpec(
            (1, 1, bq, 128), lambda b_, h, i, j: (b_, h, i, 0),
            memory_space=pltpu.VMEM)
        if mode == "bound":  # per-(b, head) SCALAR shift via SMEM
            mhat = _stream_scalar_bound(q, k, scale, reduce_axes=(2,),
                                        group=group)
            mh_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        else:  # exact masked row max, pass 1
            rm_kernel = functools.partial(
                _rowmax_kernel,
                causal=causal, scale=scale, bq=bq, bk=bk, n_kv=n_kv)
            rm_specs = [q_spec, k_spec]
            rm_inputs = [q, k]
            if kv_mask is not None:
                rm_specs.append(m_spec)
                rm_inputs.append(kv_mask.astype(jnp.int8)[:, None, :])
            else:
                rm_kernel = _drop_arg(rm_kernel, 2)
            (mhat,) = pl.pallas_call(
                rm_kernel,
                grid=(b, hq, n_q, n_kv),
                in_specs=rm_specs,
                out_specs=[mh_spec],
                out_shape=[jax.ShapeDtypeStruct(
                    (b, hq, sq, 128), jnp.float32)],
                scratch_shapes=[pltpu.VMEM((bq, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(
                        "parallel", "parallel", "parallel", "arbitrary"),
                ),
            )(*rm_inputs)
        in_specs.append(mh_spec)
        inputs.append(mhat)

    out_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j: (b_, h, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype)]
    if want_lse:
        out_specs.append(
            pl.BlockSpec((1, 1, bq, 128), lambda b_, h, i, j: (b_, h, i, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((b, hq, sq, 128), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(b, hq, n_q, n_kv),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ] + ([pltpu.VMEM((bq, 128), jnp.float32)]  # default: m; bound: vc
             if (not stream) or poison_mode == "vc" else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)
    out = outs[0]
    lse = outs[1] if want_lse else None
    if poison_mode == "wrapper":
        out = _sbound_wrapper_poison(out, lse, kv_mask, causal)
    return out, (lse if with_lse else None)


def _drop_arg(kernel, idx):
    """Adapter: call `kernel` with None spliced in at positional `idx`."""

    def wrapped(*refs):
        refs = list(refs)
        refs.insert(idx, None)
        return kernel(*refs)

    return wrapped


def _flash_vjp_fwd(q, k, v, kv_mask, causal, scale):
    out, lse = _flash_fwd_impl(q, k, v, kv_mask, causal, scale)
    # Residual slimming: the kernel emits lse broadcast to 128 lanes (tile
    # constraint); save only one lane — 128x smaller residual when the
    # surrounding layer is NOT rematerialized.
    # checkpoint_name: under remat with the "flash" policy
    # (models/qwen2.py::_remat_policy) these two residuals are saved from
    # the original forward, so the backward replay DCEs the flash forward
    # kernel instead of re-running it (q/k/v are recomputed from the cheap
    # projections).  A no-op outside remat.
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_out")
    lse_slim = jax.ad_checkpoint.checkpoint_name(lse[..., :1], "flash_lse")
    return out, (q, k, v, kv_mask, out, lse_slim)


def _flash_vjp_bwd(causal, scale, residuals, g):
    q, k, v, kv_mask, out, lse_slim = residuals
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv
    bq, bk = _pick_block(sq), _pick_block(skv)
    n_q, n_kv = sq // bq, skv // bk

    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # [b, hq, sq, 1]
    lse_slim, delta = _neutralize_dead_rows(lse_slim, delta)
    lse = jnp.broadcast_to(lse_slim, (*lse_slim.shape[:-1], 128))
    delta = jnp.broadcast_to(delta, (b, hq, sq, 128))

    has_mask = kv_mask is not None
    kvm = kv_mask.astype(jnp.int8)[:, None, :] if has_mask else None

    # ---- dq ----
    q_spec, k_spec, m_spec = _specs(b, hq, group, bq, bk, d, kv_mask, True)
    lse_spec = pl.BlockSpec((1, 1, bq, 128), lambda b_, h, i, j: (b_, h, i, 0),
                            memory_space=pltpu.VMEM)
    dq_kernel = functools.partial(
        _dq_kernel, causal=causal, scale=scale, bq=bq, bk=bk, n_kv=n_kv
    )
    in_specs = [q_spec, k_spec, k_spec, m_spec, q_spec, lse_spec, lse_spec]
    inputs = [q, k, v, kvm, g, lse, delta]
    if not has_mask:
        dq_kernel = _drop_arg(dq_kernel, 3)
        in_specs = in_specs[:3] + in_specs[4:]
        inputs = inputs[:3] + inputs[4:]
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, hq, n_q, n_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j: (b_, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)

    # ---- dk, dv (per query-head; summed into kv heads afterwards) ----
    q_spec2, k_spec2, m_spec2 = _specs(b, hq, group, bq, bk, d, kv_mask, False)
    lse_spec2 = pl.BlockSpec((1, 1, bq, 128), lambda b_, h, i, j: (b_, h, j, 0),
                             memory_space=pltpu.VMEM)
    kv_out_spec = pl.BlockSpec(
        (1, 1, bk, d), lambda b_, h, i, j: (b_, h, i, 0),
        memory_space=pltpu.VMEM,
    )
    dkv_kernel = functools.partial(
        _dkv_kernel, causal=causal, scale=scale, bq=bq, bk=bk, n_q=n_q
    )
    in_specs = [q_spec2, k_spec2, k_spec2, m_spec2, q_spec2, lse_spec2, lse_spec2]
    inputs = [q, k, v, kvm, g, lse, delta]
    if not has_mask:
        dkv_kernel = _drop_arg(dkv_kernel, 3)
        in_specs = in_specs[:3] + in_specs[4:]
        inputs = inputs[:3] + inputs[4:]
    dk_h, dv_h = pl.pallas_call(
        dkv_kernel,
        grid=(b, hq, n_kv, n_q),
        in_specs=in_specs,
        out_specs=[kv_out_spec, kv_out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, skv, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, skv, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)
    if group > 1:
        dk = dk_h.reshape(b, hkv, group, skv, d).sum(axis=2)
        dv = dv_h.reshape(b, hkv, group, skv, d).sum(axis=2)
    else:
        dk, dv = dk_h, dv_h
    dkvm = None
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), dkvm


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def _pad_axis(x, mult, axis):
    s = x.shape[axis]
    pad = (-s) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """BSHD flash attention.  q [B,Sq,Hq,D], k/v [B,Skv,Hkv,D].

    ``mask``: None, [B, Skv], or a broadcastable [B, 1, 1, Skv] kv-padding
    mask (True = attend).  Arbitrary [B, 1, Sq, Skv] masks are not
    supported here — the callers only produce kv-padding + causal.

    Grouped-query shapes dispatch to the head-batched GQA variant (one
    program per kv-head group instead of per q head; +18% step speed
    measured) unless ``KDSS_FLASH_GQA=0``.

    **Numerical envelope (KDSS_FLASH_STREAM=bound, the default)**: unlike
    torch SDPA (exact at any magnitude), the default fwd kernel shifts
    scores by a per-(batch, head-group) Cauchy-Schwarz scalar, which is
    exact unless a row's best score sits > ~69 nats below that scalar
    (~e^109 dynamic range vs the group's hottest q/k pair — far outside
    LN'd-activation norms, but reachable with raw/unnormalized probes at
    ~4x unit scale).  Out-of-envelope rows are LOUDLY poisoned to NaN,
    never silently wrong.  If NaNs appear, set ``KDSS_FLASH_STREAM=0``
    (carried online softmax) or ``=max`` (exact two-pass row max) before
    the first traced call — both are exact at any magnitude.  See
    :func:`_stream_mode`.
    """
    if _GQA_BATCH and q.shape[2] != k.shape[2]:
        return flash_attention_gqa(q, k, v, mask=mask, causal=causal,
                                   scale=scale)
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if scale is None:
        scale = d**-0.5
    q, scale = _maybe_prescale(q, scale)

    kv_mask = None
    if mask is not None:
        if mask.ndim == 4:
            if mask.shape[1] != 1 or mask.shape[2] != 1:
                raise ValueError(
                    "flash_attention supports kv-padding masks only; got "
                    f"shape {mask.shape}"
                )
            kv_mask = mask[:, 0, 0, :]
        elif mask.ndim == 2:
            kv_mask = mask
        else:
            raise ValueError(f"unsupported mask ndim {mask.ndim}")
        kv_mask = jnp.broadcast_to(kv_mask, (b, skv))

    # BSHD -> BHSD, pad D to lane multiple and S to block multiples.
    qt = _pad_axis(jnp.swapaxes(q, 1, 2), 128, 3)
    kt = _pad_axis(jnp.swapaxes(k, 1, 2), 128, 3)
    vt = _pad_axis(jnp.swapaxes(v, 1, 2), 128, 3)
    bq, bk = _pick_block(sq), _pick_block(skv)
    qt = _pad_axis(qt, bq, 2)
    kt = _pad_axis(kt, bk, 2)
    vt = _pad_axis(vt, bk, 2)
    # The padded lengths must be divisible by the chosen blocks (they are,
    # by construction of _pad_axis); the fwd/bwd impls recompute the same
    # (bq, bk) from the padded shapes.
    if kt.shape[2] != skv:
        # padded kv columns must be masked out
        if kv_mask is None:
            kv_mask = jnp.ones((b, skv), dtype=bool)
    if kv_mask is not None and kv_mask.shape[1] != kt.shape[2]:
        kv_mask = _pad_axis(kv_mask, kt.shape[2], 1)

    out = _flash(qt, kt, vt, kv_mask, causal, scale)
    out = out[:, :, :sq, :d]
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def flash_attention_spmd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    local_impl: str = "pallas",
) -> jnp.ndarray:
    """Multi-chip flash attention: shard_map over the active mesh.

    Pallas custom calls cannot be partitioned by GSPMD, so under a mesh the
    kernel is wrapped in ``shard_map``.  Each axis shards independently
    when its size divides: the batch axis over the (data, fsdp) subset
    that divides ``B``, heads over ``tensor`` when the head counts divide
    (query AND kv heads — the local GQA group must stay integral).  A
    non-dividing axis is simply replicated *inside the shard_map* — e.g.
    the 0.5B student's 14 q / 2 kv heads at tensor=4 keep the flash kernel
    with heads replicated over ``tensor`` rather than falling back to
    prob-materializing XLA attention (whose [B,H,S,S] f32 tensor is the
    exact memory profile flash exists to avoid; at the 7B-mesh shapes it
    would be the largest buffer in the step).

    ``local_impl`` selects the per-shard attention: "pallas" (the flash
    kernel; the production multi-chip path, requires real TPUs —
    interpret-mode Pallas inside shard_map hangs on the CPU backend) or
    "xla"/"xla_chunked" (used by the CPU-mesh tests to validate the
    sharding/spec plumbing, which is identical across impls).
    """
    mesh = _abstract_mesh()
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    if mesh is None:
        return flash_attention(q, k, v, mask=mask, causal=causal, scale=scale)

    axis_sizes = dict(zip(mesh.axis_names, mesh.shape_tuple and
                          [mesh.shape[a] for a in mesh.axis_names]))
    tp = axis_sizes.get("tensor", 1)
    heads_ok = (
        tp > 1 and hq % tp == 0 and hkv % tp == 0
        and (hq // tp) % (hkv // tp) == 0
    )
    dp_axes = []
    prod = 1
    for a in ("data", "fsdp"):
        sz = axis_sizes.get(a, 1)
        if sz > 1 and b % (prod * sz) == 0:
            dp_axes.append(a)
            prod *= sz

    from jax.sharding import PartitionSpec as P

    bspec = tuple(dp_axes) if dp_axes else None
    head_ax = "tensor" if heads_ok else None
    q_spec = P(bspec, None, head_ax, None)
    m_spec = P(bspec, None) if mask is not None else None

    def local(q_, k_, v_, m_):
        if local_impl == "pallas":
            return flash_attention(
                q_, k_, v_, mask=m_, causal=causal, scale=scale
            )
        from .attention import dot_product_attention

        mm = m_[:, None, None, :] if m_ is not None else None
        return dot_product_attention(
            q_, k_, v_, mask=mm, causal=causal, scale=scale, impl=local_impl
        )

    kv_mask = None
    if mask is not None:
        if mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1:
            kv_mask = jnp.broadcast_to(mask[:, 0, 0, :], (b, k.shape[1]))
        elif mask.ndim == 2:
            # match flash_attention's contract: a broadcastable [1, Skv]
            # mask must reach full [B, Skv] BEFORE the shard_map, whose
            # batch in_spec cannot shard a size-1 dim
            kv_mask = jnp.broadcast_to(mask, (b, k.shape[1]))
        else:
            raise ValueError("pallas_spmd supports kv-padding masks only")

    in_specs = (q_spec, q_spec, q_spec, m_spec)
    fn = jax.shard_map(
        local,
        mesh=jax.sharding.get_abstract_mesh(),
        in_specs=in_specs,
        out_specs=q_spec,
        check_vma=False,
    )
    return fn(q, k, v, kv_mask)


# ---------------------------------------------------------------------------
# Head-batched GQA variant (opt-in: KDSS_FLASH_GQA=1)
#
# Q heads sharing one kv head are contiguous in the BHSD layout, so one
# program can process the whole GQA group: block (1, G, bq, d) flattened to
# (G*bq, d).  Cuts program count by G (7x for the 0.5B student) and the
# dk/dv group reduction happens inside the accumulator for free.
# ---------------------------------------------------------------------------

def _q_positions(g, bq, bk, iq):
    """Row r of the flattened (G*bq) block sits at q position iq*bq + r%bq."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (g * bq, bk), 0)
    return iq * bq + jax.lax.rem(rows, bq)


def _gqa_mask(s, *, causal, iq, ik, g, bq, bk, kv_mask_blk):
    if causal:
        q_pos = _q_positions(g, bq, bk, iq)
        k_pos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (g * bq, bk), 1)
        s = jnp.where(q_pos >= k_pos, s, MASK_VALUE)
    if kv_mask_blk is not None:
        s = jnp.where(kv_mask_blk, s, MASK_VALUE)
    return s


def _and(a, b):
    """AND of predicates where either side may be python True."""
    if a is True:
        return b
    if b is True:
        return a
    return jnp.logical_and(a, b)


def _gqa_dispatch(compute, *, causal, iq, ik, bq, bk, kvm_ref):
    """Run ``compute(masked)`` once per visited block, the mask-free body
    on interior blocks.

    The masking selects are ~4 extra f32 VPU passes over every [rows, bk]
    score block — the dominant kernel cost at long S (see
    docs/PERF_NOTES.md round 2) — but only blocks crossing the causal
    diagonal or containing masked kv positions need them.  kv cleanliness
    is a cheap per-block reduction over the [bk] mask row.
    """
    if kvm_ref is not None:
        # f32 reduction: Mosaic has no int8 reductions on TPU
        kv_clean = jnp.min(kvm_ref[0, 0].astype(jnp.float32)) > 0
    else:
        kv_clean = True
    if causal:
        visited = iq * bq + bq - 1 >= ik * bk
        interior = iq * bq >= (ik + 1) * bk  # fully below the diagonal
    else:
        visited, interior = True, True
    clean = _and(interior, kv_clean)
    if clean is True:
        compute(False)
        return

    @pl.when(_and(visited, clean))
    def _():
        compute(False)

    @pl.when(_and(visited, jnp.logical_not(clean)))
    def _():
        compute(True)


def _gqa_fwd_kernel(q_ref, k_ref, v_ref, kvm_ref, o_ref, lse_ref,
                    acc_ref, m_ref, l_ref,
                    *, causal, scale, g, bq, bk, n_kv):
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[:] = jnp.zeros_like(l_ref)

    def compute(masked):
        q = q_ref[0, 0].reshape(g * bq, q_ref.shape[-1])
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            s = _gqa_mask(s, causal=causal, iq=iq, ik=ik, g=g, bq=bq, bk=bk,
                          kv_mask_blk=kvm)
        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        # Fully-masked rows: every column sits at MASK_VALUE, so m_new ==
        # m_prev == MASK_VALUE and exp(s - m_new) == 1 per column — NOT 0.
        # Zero the row explicitly so l stays 0 and the finalize guard emits
        # out=0 / lse=MASK_VALUE (and backward, guarded on lse below, emits
        # zero grads).  Rows with any valid column are unaffected: their
        # masked columns underflow to 0 since m_new >> MASK_VALUE.  Clean
        # blocks skip the select: every column is real there, so m_new is
        # always far above the threshold and the where is a numeric no-op —
        # but a full [rows, bk] f32 VPU pass if emitted.
        if masked:
            p = jnp.where(m_new > MASK_VALUE * 0.5, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape,
        )
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(ik == n_kv - 1)
    def _():
        l = l_ref[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        d = o_ref.shape[-1]
        o_ref[0, 0] = (acc_ref[:] / l_safe).reshape(g, bq, d).astype(o_ref.dtype)
        if lse_ref is not None:  # fwd-only calls skip the lse output
            lse = jnp.where(
                l == 0.0, MASK_VALUE, m_ref[:, 0:1] + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(
                lse, (g * bq, 128)).reshape(g, bq, 128)


def _gqa_fwd_kernel_stream(q_ref, k_ref, v_ref, kvm_ref, mh_ref, o_ref,
                           lse_ref, acc_ref, l_ref,
                           *, causal, scale, g, bq, bk, n_kv):
    """Per-row streaming fwd (KDSS_FLASH_STREAM=max), GQA path.

    ``mh`` is the exact masked per-row score max from pass 1
    (:func:`_gqa_rowmax_kernel`), constant across kv blocks, so the
    online-softmax recurrence disappears: no carried m, no alpha
    rescale, pure-+= accumulators.  Exactness: online softmax is exact
    for ANY per-row m — the e^{-m} factor cancels in acc/l and
    lse = m + log(l) is the same value; with m the true row max this is
    standard flash numerics, robust to any input magnitude.

    NOTE this is the VALIDATION reference, not the perf path: the r4
    scalar-vs-per-row ablation (docs/PERF_NOTES.md) measured that any
    per-ROW vector in exp's path re-serializes the score block
    (lane-broadcast), so this kernel plus its extra pass is slightly
    slower than the default (0.860 vs 0.776 ms/pass).  The fast path is
    :func:`_gqa_fwd_kernel_sbound` (mode="bound", per-head SMEM
    scalar).  Masked columns produce exp(MASK_VALUE - mh) == 0 when mh
    is finite; the where pass below handles fully-masked ROWS, whose
    mh == MASK_VALUE makes exp(0) == 1 per masked column.
    """
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    mh = mh_ref[0, 0].reshape(g * bq, 128)[:, 0:1]

    def compute(masked):
        q = q_ref[0, 0].reshape(g * bq, q_ref.shape[-1])
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            s = _gqa_mask(s, causal=causal, iq=iq, ik=ik, g=g, bq=bq, bk=bk,
                          kv_mask_blk=kvm)
        p = jnp.exp(s - mh)
        # fully-masked rows carry mh == MASK_VALUE, where exp(s - mh) is
        # 1 per masked column, not 0 — zero them (guard-gated: clean
        # blocks cannot contain such rows)
        if masked:
            p = jnp.where(mh > MASK_VALUE * 0.5, p, 0.0)
        l_ref[:] = l_ref[:] + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(ik == n_kv - 1)
    def _():
        l = l_ref[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        d = o_ref.shape[-1]
        o_ref[0, 0] = (acc_ref[:] / l_safe).reshape(g, bq, d).astype(
            o_ref.dtype)
        if lse_ref is not None:  # fwd-only calls skip the lse output
            lse = jnp.where(l == 0.0, MASK_VALUE, mh + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(
                lse, (g * bq, 128)).reshape(g, bq, 128)


def _stream_mode() -> str:
    """KDSS_FLASH_STREAM selects the fwd kernel family:

    * ``"bound"`` (DEFAULT since r4) — streaming kernel fed by a
      per-(batch, head) SCALAR Cauchy-Schwarz bound
      ``scale*max|q|*max|k| - 40`` via SMEM (no second pass, fastest:
      a scalar splat keeps exp fused into the QK epilogue where ANY
      per-row vector costs ~0.46 ms/pass in lane-broadcast
      serialization — measured 2.28x fwd / -25% fwd+bwd at production
      shapes, +3.8% on the 7B KD step, see PERF_NOTES).  Exact math
      within its envelope: a row is poisoned once every one of its
      scores sits > ~69 below the head scalar c (> ~109 below the raw
      bound; the r5 threshold ``l < _SBOUND_DEAD_L`` — earlier than
      the ~87-nat hard-underflow point so the subnormal/bf16-flush
      gray band poisons too instead of silently degrading).  ~e^109
      dynamic range between the group's hottest pair and the row's
      best score is far outside LN'd-activation norms;
      random-orthogonal data at ~4x unit scale is the documented trip
      point.  Degradation is LOUD, never silent: such rows are
      poisoned to NaN (fully-masked rows keep the all-kernels exact-0
      convention), so a wrong finite answer is impossible — fall back
      to ``0`` or ``max`` if NaNs appear.
    * ``"0"`` (or ``"off"``) — the carried-online-softmax kernel.
      Exact for any input magnitude; the pre-r4 default.
    * ``"max"`` (or ``"1"``) — streaming kernel fed by an EXACT per-row
      masked score max from a separate pass.  Exact for any input
      magnitude — standard flash numerics — but measured slightly
      SLOWER than ``0`` (0.860 vs 0.776 ms/pass: the per-row vector in
      exp's path re-serializes, and the extra pass isn't free).
      Validation reference, not a perf mode.

    Read at TRACE time (set before the first traced call — the jit cache
    keeps whichever kernel was traced, same convention as
    KDSS_FLASH_PRESCALE/KDSS_FLASH_ILP)."""
    v = os.environ.get("KDSS_FLASH_STREAM", "bound")
    if v == "1":
        return "max"
    if v == "off":
        return "off"
    if v not in ("0", "max", "bound"):
        raise ValueError(
            f"KDSS_FLASH_STREAM={v!r}: use 0/off, max/1, or bound")
    return "off" if v == "0" else v


def _SBOUND_FWD_POISON() -> str:
    """Poison strategy for bound-mode FWD-ONLY calls WITH a kv mask
    (teacher forward, decode prefill, eval):

    * ``"vc"`` (default) — in-kernel per-row validity tracking; costs a
      per-masked-block reduce+select (r4: -2.4% on the KD step, whose
      int8 teacher runs 28 such layers).
    * ``"lse"`` — emit the lse output anyway and reuse the free XLA
      wrapper poison; costs the [*, S, 128] f32 lse HBM write the
      fwd-only path normally elides (~44 MB/layer at the 7B teacher).

    Read at trace time (KDSS_SBOUND_FWD_POISON); both sides loud-NaN
    identically — this is purely a perf A/B knob."""
    return os.environ.get("KDSS_SBOUND_FWD_POISON", "vc")


def _gqa_fwd_kernel_sbound(q_ref, k_ref, v_ref, kvm_ref, c_ref, o_ref,
                           lse_ref, acc_ref, l_ref, vc_ref,
                           *, causal, scale, g, bq, bk, n_kv,
                           poison_mode):
    """Scalar-shift streaming fwd (KDSS_FLASH_STREAM=bound), GQA path.

    The r4 per-phase ablation first showed the default kernel spends
    ~0.5 of its 0.78 ms/pass on exp's data dependence on a cross-lane
    reduction of s; a follow-up scalar-vs-per-row ablation
    (docs/PERF_NOTES.md, `streaming` / `streaming_rowm` /
    `streaming_smem` arms) pinned the cost precisely: a per-ROW shift
    vector in exp's path — loaded or computed — costs ~0.46 ms in
    lane-broadcast serialization, while a traced SCALAR splat keeps
    scale/exp/astype fused into the QK epilogue and runs at the MXU
    floor (0.267 ms/pass, 2.9x the shipped kernel).

    So the shift here is one scalar per (batch, kv-head group), read
    from SMEM: ``c = scale * max|q_row| * max|k_row| - 40`` over the
    group (Cauchy-Schwarz, so s <= c + 40 everywhere).  Exactness: the
    e^-c factor cancels in acc/l and lse = c + log(l) is the same value
    — standard online-softmax algebra with a constant m.  Overflow is
    impossible (exp <= e^40, so l <= S*e^40 << f32 max).  Underflow is
    per-ROW against the GROUP's scalar: a row is treated as dead once
    ``l < _SBOUND_DEAD_L`` — its best score sits > ~69 below c (> ~109
    below the raw bound), requiring ~e^109 dynamic range between the
    group's hottest and the row's best score, far outside anything
    LN'd activations produce.  The threshold (not ``l == 0``) also
    catches the subnormal gray band where p flushes out of the bf16
    acc while f32 l stays > 0 — those rows must poison, not silently
    degrade.  Dead valid rows are poisoned to NaN in finalize (never a
    silent zero; fully-masked rows — tracked per row in vc_ref when a
    kv mask exists — keep the exact-0 convention; tests pin both).
    Masked columns produce exp(MASK_VALUE - c) == 0 exactly.
    """
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)
        if poison_mode == "vc":
            vc_ref[:] = jnp.zeros_like(vc_ref)

    # c rides as a FULL [B, H] SMEM array (a blocked (1,1) spec violates
    # the mosaic last-two-dims tiling check for general B/H)
    c = c_ref[pl.program_id(0), pl.program_id(1)]

    def compute(masked):
        q = q_ref[0, 0].reshape(g * bq, q_ref.shape[-1])
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            if poison_mode == "vc":  # need the attend-bool for vc
                mb = _gqa_mask_bool(causal=causal, iq=iq, ik=ik, g=g,
                                    bq=bq, bk=bk, kv_mask_blk=kvm)
                if mb is not True:
                    s = jnp.where(mb, s, MASK_VALUE)
                _sbound_track_valid(vc_ref, mb)
            else:
                s = _gqa_mask(s, causal=causal, iq=iq, ik=ik, g=g, bq=bq,
                              bk=bk, kv_mask_blk=kvm)
        elif poison_mode == "vc":
            _sbound_track_valid(vc_ref, True)
        p = jnp.exp(s - c)  # masked columns: exp(MASK_VALUE - c) == 0
        l_ref[:] = l_ref[:] + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(ik == n_kv - 1)
    def _():
        l = l_ref[:, 0:1]
        dead = l < _SBOUND_DEAD_L  # see _SBOUND_DEAD_L: gray-band rows too
        l_safe = jnp.where(dead, 1.0, l)
        d = o_ref.shape[-1]
        o = _sbound_finalize_o(acc_ref[:], l, vc_ref, poison_mode)
        o_ref[0, 0] = o.reshape(g, bq, d).astype(o_ref.dtype)
        if lse_ref is not None:  # fwd-only calls skip the lse output
            lse = jnp.where(dead, MASK_VALUE, c + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(
                lse, (g * bq, 128)).reshape(g, bq, 128)


def _stream_scalar_bound(q_abs_max_src, k, scale, reduce_axes, group=1):
    """Per-(batch, head) scalar Cauchy-Schwarz shift for sbound kernels.

    ``scale * max|q_row| * max|k_row| - 40`` with the max over
    ``reduce_axes`` of the row-norm arrays — [B, HKV] for the GQA
    layout (covering all g heads of the group), [B, HQ] for the base
    layout (k norms repeated per group).  In packed-pair mode the rows
    carry two heads' lanes, which only loosens the bound (the packed
    norm >= each head's) — still valid.  O(S*D) XLA work fused into the
    surrounding graph, vs the O(S^2) serialization it removes.
    """
    qf = q_abs_max_src.astype(jnp.float32)
    qn = jnp.sqrt(jnp.max(jnp.sum(qf * qf, axis=-1), axis=reduce_axes))
    kf = k.astype(jnp.float32)
    kn = jnp.sqrt(jnp.max(jnp.sum(kf * kf, axis=-1), axis=-1))
    if group > 1:  # base layout: per-q-head qn x the group's kv-head kn
        kn = jnp.repeat(kn, group, axis=1)
    return scale * qn * kn - 40.0


def _gqa_rowmax_kernel(q_ref, k_ref, kvm_ref, mh_ref, m_ref,
                       *, causal, scale, g, bq, bk, n_kv):
    """Exact masked per-row score max (pass 1 of KDSS_FLASH_STREAM=max).

    QK + reduce with NOTHING data-dependent downstream of the reduce in
    this kernel — the phase-accounting `redonly` arm showed this shape
    runs at the MXU floor.  Output rides the lse block layout.
    """
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, MASK_VALUE)

    def compute(masked):
        q = q_ref[0, 0].reshape(g * bq, q_ref.shape[-1])
        k = k_ref[0, 0]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            s = _gqa_mask(s, causal=causal, iq=iq, ik=ik, g=g, bq=bq, bk=bk,
                          kv_mask_blk=kvm)
        m_ref[:] = jnp.maximum(
            m_ref[:], jnp.max(s, axis=1, keepdims=True))

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(ik == n_kv - 1)
    def _():
        mh_ref[0, 0] = m_ref[:].reshape(g, bq, 128)


def _rowmax_kernel(q_ref, k_ref, kvm_ref, mh_ref, m_ref,
                   *, causal, scale, bq, bk, n_kv):
    """Base-path (per-head) twin of :func:`_gqa_rowmax_kernel`."""
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, MASK_VALUE)

    def compute(masked):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            s = _block_mask(
                s, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk, kv_mask_blk=kvm)
        m_ref[:] = jnp.maximum(
            m_ref[:], jnp.max(s, axis=1, keepdims=True))

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(ik == n_kv - 1)
    def _():
        mh_ref[0, 0] = jnp.broadcast_to(m_ref[:, 0:1], mh_ref.shape[2:])


def _gqa_fwd_kernel_ilp(q_ref, k_ref, v_ref, kvm_ref, o_ref, lse_ref,
                        acc_ref, m_ref, l_ref, acc2_ref, m2_ref, l2_ref,
                        *, causal, scale, g, bq, bk, n_kv):
    """Two-chain ILP variant of ``_gqa_fwd_kernel`` (KDSS_FLASH_ILP=1,
    bk % 256 == 0).  MEASURED DEAD END — kept opt-in as the record.

    Each [rows, bk] kv block is split into two bk/2 halves carrying fully
    independent (m, l, acc) softmax chains — written manually interleaved
    so the Mosaic scheduler could overlap the dependent VPU chains — and
    merged once at finalize with the standard two-way online-softmax
    merge.  Hardware result (production shapes, marginal-rate microbench):
    0.762 -> 1.031 ms/pass, a 26% REGRESSION.  Mosaic does not interleave
    the chains, and splitting the single [rows, bk] p@v MXU matmul into
    two [rows, bk/2] halves costs more than chain independence buys.
    This falsifies the r3 "dependency-limited" hypothesis: at these block
    sizes ([7168, 1024]) every VPU op has millions of elements of intra-op
    parallelism, so op-boundary dependencies are negligible — the kernel
    floor is exp/reduction *throughput*, not latency (docs/PERF_NOTES.md
    round-3 session-6).
    """
    iq, ik = pl.program_id(2), pl.program_id(3)
    bh = bk // 2

    @pl.when(ik == 0)
    def _():
        for a_, mm_, ll_ in ((acc_ref, m_ref, l_ref),
                             (acc2_ref, m2_ref, l2_ref)):
            a_[:] = jnp.zeros_like(a_)
            mm_[:] = jnp.full_like(mm_, MASK_VALUE)
            ll_[:] = jnp.zeros_like(ll_)

    def compute(masked):
        q = q_ref[0, 0].reshape(g * bq, q_ref.shape[-1])
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        # One [rows, bk] MXU matmul feeds both chains.
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        s1, s2 = s[:, :bh], s[:, bh:]
        if masked:
            kvm1 = kvm2 = None
            if kvm_ref is not None:
                kvm1 = kvm_ref[0, 0:1, :bh] != 0
                kvm2 = kvm_ref[0, 0:1, bh:] != 0
            s1 = _gqa_mask(s1, causal=causal, iq=iq, ik=2 * ik, g=g,
                           bq=bq, bk=bh, kv_mask_blk=kvm1)
            s2 = _gqa_mask(s2, causal=causal, iq=iq, ik=2 * ik + 1, g=g,
                           bq=bq, bk=bh, kv_mask_blk=kvm2)
        # Interleaved independent chains (suffix 1 / 2).
        m1_prev = m_ref[:, 0:1]
        m2_prev = m2_ref[:, 0:1]
        m1_new = jnp.maximum(m1_prev, jnp.max(s1, axis=1, keepdims=True))
        m2_new = jnp.maximum(m2_prev, jnp.max(s2, axis=1, keepdims=True))
        p1 = jnp.exp(s1 - m1_new)
        p2 = jnp.exp(s2 - m2_new)
        if masked:  # fully-masked rows: see _gqa_fwd_kernel
            p1 = jnp.where(m1_new > MASK_VALUE * 0.5, p1, 0.0)
            p2 = jnp.where(m2_new > MASK_VALUE * 0.5, p2, 0.0)
        alpha1 = jnp.exp(m1_prev - m1_new)
        alpha2 = jnp.exp(m2_prev - m2_new)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, 0:1] * alpha1 + jnp.sum(p1, axis=1, keepdims=True),
            l_ref.shape)
        l2_ref[:] = jnp.broadcast_to(
            l2_ref[:, 0:1] * alpha2 + jnp.sum(p2, axis=1, keepdims=True),
            l2_ref.shape)
        acc_ref[:] = acc_ref[:] * alpha1 + jax.lax.dot_general(
            p1.astype(v.dtype), v[:bh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc2_ref[:] = acc2_ref[:] * alpha2 + jax.lax.dot_general(
            p2.astype(v.dtype), v[bh:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m1_new, m_ref.shape)
        m2_ref[:] = jnp.broadcast_to(m2_new, m2_ref.shape)

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(ik == n_kv - 1)
    def _():
        m1 = m_ref[:, 0:1]
        m2 = m2_ref[:, 0:1]
        m = jnp.maximum(m1, m2)
        a1 = jnp.exp(m1 - m)
        a2 = jnp.exp(m2 - m)
        l = l_ref[:, 0:1] * a1 + l2_ref[:, 0:1] * a2
        l_safe = jnp.where(l == 0.0, 1.0, l)
        d = o_ref.shape[-1]
        acc = acc_ref[:] * a1 + acc2_ref[:] * a2
        o_ref[0, 0] = (acc / l_safe).reshape(g, bq, d).astype(o_ref.dtype)
        if lse_ref is not None:
            lse = jnp.where(l == 0.0, MASK_VALUE, m + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(
                lse, (g * bq, 128)).reshape(g, bq, 128)


_ILP_GATE_WARNED = False
_STREAM_ILP_WARNED = False


def _gqa_fwd_ilp_enabled(bk: int) -> bool:
    """ILP fwd needs two >=128-lane halves; read at trace time (tests
    toggle per-call, same convention as KDSS_FLASH_PRESCALE — a jitted
    caller toggling the env var between calls gets the stale kernel from
    the jit cache; set it before the first traced call).

    VMEM note: the ILP variant roughly doubles fwd scratch (an extra
    (g*bq, d) f32 acc plus two (g*bq, 128) buffers — ~11 MB at the
    production 7168-row config); row configs tuned to the default
    kernel's VMEM budget (KDSS_FLASH_ROWS) may need halving with ILP on.
    """
    import os as _os

    if _os.environ.get("KDSS_FLASH_ILP", "0") != "1":
        return False
    if bk % 256 != 0:
        global _ILP_GATE_WARNED
        if not _ILP_GATE_WARNED:
            _ILP_GATE_WARNED = True
            import warnings

            warnings.warn(
                f"KDSS_FLASH_ILP=1 set but kv block size bk={bk} is not a "
                "multiple of 256 — falling back to the default (non-ILP) "
                "fwd kernel for this and any similarly-blocked call. "
                "Raise KDSS_FLASH_BK (or skv) to dispatch the ILP variant.",
                stacklevel=2,
            )
        return False
    return True


def _gqa_dq_kernel(q_ref, k_ref, v_ref, kvm_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, acc_ref,
                   *, causal, scale, g, bq, bk, n_kv):
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def compute(masked):
        d = q_ref.shape[-1]
        q = q_ref[0, 0].reshape(g * bq, d)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].reshape(g * bq, d)
        lse = lse_ref[0, 0].reshape(g * bq, 128)[:, 0:1]
        delta = delta_ref[0, 0].reshape(g * bq, 128)[:, 0:1]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            s = _gqa_mask(s, causal=causal, iq=iq, ik=ik, g=g, bq=bq, bk=bk,
                          kv_mask_blk=kvm)
        # dead rows: p == 0 exactly via the wrapper's lse clamp
        # (_neutralize_dead_rows) — no in-kernel guard needed
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = _scaled(p * (dp - delta), scale).astype(k.dtype)
        acc_ref[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(ik == n_kv - 1)
    def _():
        d = dq_ref.shape[-1]
        dq_ref[0, 0] = acc_ref[:].reshape(g, bq, d).astype(dq_ref.dtype)


def _gqa_dkv_kernel(q_ref, k_ref, v_ref, kvm_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, causal, scale, g, bq, bk, n_q):
    ik, iq = pl.program_id(2), pl.program_id(3)

    @pl.when(iq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def compute(masked):
        d = q_ref.shape[-1]
        q = q_ref[0, 0].reshape(g * bq, d)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].reshape(g * bq, d)
        lse = lse_ref[0, 0].reshape(g * bq, 128)[:, 0:1]
        delta = delta_ref[0, 0].reshape(g * bq, 128)[:, 0:1]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), scale)
        if masked:
            kvm = kvm_ref[0, 0:1, :] != 0 if kvm_ref is not None else None
            s = _gqa_mask(s, causal=causal, iq=iq, ik=ik, g=g, bq=bq, bk=bk,
                          kv_mask_blk=kvm)
        # dead rows: p == 0 exactly via the wrapper's lse clamp
        # (_neutralize_dead_rows) — no in-kernel guard needed
        p = jnp.exp(s - lse)
        # p^T @ do sums over ALL group rows: the GQA dk/dv reduction is free
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = _scaled(p * (dp - delta), scale).astype(q.dtype)
        dk_acc[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=kvm_ref)

    @pl.when(iq == n_q - 1)
    def _():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


# Per-program dispatch overhead on the sequential TPU grid is ~2.7 us
# (profiled r2: 722-program fwd grids put flash at 140 ms/step, ~6x its
# matmul speed-of-light), so blocks should be as big as VMEM allows:
# minimize block COUNT first, padding waste second.
_GQA_ROWS = int(os.environ.get("KDSS_FLASH_ROWS", "2048"))
_GQA_BK = int(os.environ.get("KDSS_FLASH_BK", "512"))


def _pick_block_big(s: int, target: int) -> int:
    """Largest-block pick: fewest blocks, ties broken by least padding."""
    if s <= 128:
        return 128
    best = None
    for b in (1024, 768, 512, 384, 256, 128):
        if b > target:
            continue
        n = -(-s // b)
        key = (n, n * b)
        if best is None or key < best[0]:
            best = (key, b)
    return best[1]


def _gqa_pick_bq(s: int, g: int) -> int:
    """Query block scaled so g*bq stays within the rows budget: the VMEM
    stack (acc/m/l scratch + q/o/lse blocks) grows with g*bq; the default
    budget (2048 rows ~ 11M stack) fits the compiler's default 16M scoped
    limit (g=14 x bq=256 measured 19.02M).  bench.py raises the scoped
    limit via --xla_tpu_scoped_vmem_limit_kib and sets KDSS_FLASH_ROWS
    higher to shrink the grid."""
    return _pick_block_big(s, target=max(128, _GQA_ROWS // max(g, 1)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_gqa(q, k, v, kv_mask, causal, scale):
    return _flash_gqa_fwd_impl(
        q, k, v, kv_mask, causal, scale, with_lse=False)[0]


def _gqa_specs(b, hkv, g, bq, bk, d, kv_mask, q_major=True):
    if q_major:
        qi = lambda b_, h, i, j: (b_, h, i, 0)      # noqa: E731
        ki = lambda b_, h, i, j: (b_, h, j, 0)      # noqa: E731
        mi = lambda b_, h, i, j: (b_, 0, j)         # noqa: E731
    else:
        qi = lambda b_, h, i, j: (b_, h, j, 0)      # noqa: E731
        ki = lambda b_, h, i, j: (b_, h, i, 0)      # noqa: E731
        mi = lambda b_, h, i, j: (b_, 0, i)         # noqa: E731
    # q array layout: [B, HKV, G, S, D]; block (1, 1, G, bq, d)
    qspec = pl.BlockSpec((1, 1, g, bq, d),
                         lambda b_, h, i, j, _qi=qi: (*_qi(b_, h, i, j)[:2], 0,
                                                      _qi(b_, h, i, j)[2],
                                                      _qi(b_, h, i, j)[3]),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, bk, d), ki, memory_space=pltpu.VMEM)
    mspec = (pl.BlockSpec((1, 1, bk), mi, memory_space=pltpu.VMEM)
             if kv_mask is not None else None)
    return qspec, kspec, mspec


def _flash_gqa_fwd_impl(q, k, v, kv_mask, causal, scale, with_lse=True):
    # q [B, HKV, G, S, D]; k/v [B, HKV, S, D]
    b, hkv, g, sq, d = q.shape
    skv = k.shape[2]
    bq, bk = _gqa_pick_bq(sq, g), _pick_block_big(skv, _GQA_BK)
    n_q, n_kv = sq // bq, skv // bk
    qspec, kspec, mspec = _gqa_specs(b, hkv, g, bq, bk, d, kv_mask)
    lspec = pl.BlockSpec((1, 1, g, bq, 128),
                         lambda b_, h, i, j: (b_, h, 0, i, 0),
                         memory_space=pltpu.VMEM)
    mode = _stream_mode()
    stream = mode != "off"
    ilp = (not stream) and _gqa_fwd_ilp_enabled(bk)
    if stream and os.environ.get("KDSS_FLASH_ILP", "0") == "1":
        global _STREAM_ILP_WARNED
        if not _STREAM_ILP_WARNED:
            _STREAM_ILP_WARNED = True
            import warnings

            warnings.warn(
                "KDSS_FLASH_STREAM=1 takes precedence over KDSS_FLASH_ILP=1"
                " — the ILP fwd variant is not dispatched.", stacklevel=2)
    poison_mode = None
    want_lse = with_lse
    if mode == "bound":
        poison_mode = ("dead" if kv_mask is None
                       else ("vc" if not with_lse else "wrapper"))
        if poison_mode == "vc" and _SBOUND_FWD_POISON() == "lse":
            # see _flash_fwd_impl: lse-emit + wrapper poison instead of
            # the in-kernel vc tracking on fwd-only masked calls
            poison_mode, want_lse = "wrapper", True
        kernel = functools.partial(
            _gqa_fwd_kernel_sbound,
            causal=causal, scale=scale, g=g, bq=bq, bk=bk, n_kv=n_kv,
            poison_mode=poison_mode)
        if poison_mode != "vc":  # vc scratch only exists in "vc" mode
            kernel = _drop_arg(kernel, 9)
    elif stream:
        kernel = functools.partial(
            _gqa_fwd_kernel_stream,
            causal=causal, scale=scale, g=g, bq=bq, bk=bk, n_kv=n_kv)
    else:
        kernel = functools.partial(
            _gqa_fwd_kernel_ilp if ilp else _gqa_fwd_kernel,
            causal=causal, scale=scale, g=g, bq=bq, bk=bk, n_kv=n_kv)
    in_specs = [qspec, kspec, kspec]
    inputs = [q, k, v]
    if not want_lse:  # see _flash_fwd_impl: skip the wasted lse write
        kernel = _drop_arg(kernel, 6 if stream else 5)
    if kv_mask is not None:
        in_specs.append(mspec)
        inputs.append(kv_mask.astype(jnp.int8)[:, None, :])
    else:
        kernel = _drop_arg(kernel, 3)
    if stream:
        mh_spec = lspec
        if mode == "bound":  # per-(b, kv-head group) SCALAR shift via SMEM
            mhat = _stream_scalar_bound(q, k, scale, reduce_axes=(2, 3))
            mh_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        else:  # the per-row exact m rides the lse block layout, pass 1
            rm_kernel = functools.partial(
                _gqa_rowmax_kernel,
                causal=causal, scale=scale, g=g, bq=bq, bk=bk, n_kv=n_kv)
            rm_specs = [qspec, kspec]
            rm_inputs = [q, k]
            if kv_mask is not None:
                rm_specs.append(mspec)
                rm_inputs.append(kv_mask.astype(jnp.int8)[:, None, :])
            else:
                rm_kernel = _drop_arg(rm_kernel, 2)
            (mhat,) = pl.pallas_call(
                rm_kernel,
                grid=(b, hkv, n_q, n_kv),
                in_specs=rm_specs,
                out_specs=[lspec],
                out_shape=[jax.ShapeDtypeStruct(
                    (b, hkv, g, sq, 128), jnp.float32)],
                scratch_shapes=[pltpu.VMEM((g * bq, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(
                        "parallel", "parallel", "parallel", "arbitrary"),
                ),
            )(*rm_inputs)
        in_specs.append(mh_spec)
        inputs.append(mhat)
    out_specs = [qspec] + ([lspec] if want_lse else [])
    out_shape = [jax.ShapeDtypeStruct((b, hkv, g, sq, d), q.dtype)] + (
        [jax.ShapeDtypeStruct((b, hkv, g, sq, 128), jnp.float32)]
        if want_lse else []
    )
    if stream:
        scratch = [
            pltpu.VMEM((g * bq, d), jnp.float32),
            pltpu.VMEM((g * bq, 128), jnp.float32),
        ] + ([pltpu.VMEM((g * bq, 128), jnp.float32)]  # row-validity (vc)
             if poison_mode == "vc" else [])
    else:
        scratch = [
            pltpu.VMEM((g * bq, d), jnp.float32),
            pltpu.VMEM((g * bq, 128), jnp.float32),
            pltpu.VMEM((g * bq, 128), jnp.float32),
        ] * (2 if ilp else 1)
    outs = pl.pallas_call(
        kernel,
        grid=(b, hkv, n_q, n_kv),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(*inputs)
    out = outs[0]
    lse = outs[1] if want_lse else None
    if poison_mode == "wrapper":
        out = _sbound_wrapper_poison(out, lse, kv_mask, causal)
    return out, (lse if with_lse else None)


def _flash_gqa_vjp_fwd(q, k, v, kv_mask, causal, scale):
    out, lse = _flash_gqa_fwd_impl(q, k, v, kv_mask, causal, scale)
    # see _flash_vjp_fwd: saved under the "flash" remat policy so the
    # backward replay skips this kernel
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_out")
    lse_slim = jax.ad_checkpoint.checkpoint_name(lse[..., :1], "flash_lse")
    return out, (q, k, v, kv_mask, out, lse_slim)


def _flash_gqa_vjp_bwd(causal, scale, res, gout):
    q, k, v, kv_mask, out, lse_slim = res
    b, hkv, g, sq, d = q.shape
    skv = k.shape[2]
    bq, bk = _gqa_pick_bq(sq, g), _pick_block_big(skv, _GQA_BK)
    n_q, n_kv = sq // bq, skv // bk
    delta = jnp.sum(gout.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    lse_slim, delta = _neutralize_dead_rows(lse_slim, delta)
    lse = jnp.broadcast_to(lse_slim, (*lse_slim.shape[:-1], 128))
    delta = jnp.broadcast_to(delta, (b, hkv, g, sq, 128))
    has_mask = kv_mask is not None
    kvm = kv_mask.astype(jnp.int8)[:, None, :] if has_mask else None

    qspec, kspec, mspec = _gqa_specs(b, hkv, g, bq, bk, d, kv_mask)
    lspec = pl.BlockSpec((1, 1, g, bq, 128),
                         lambda b_, h, i, j: (b_, h, 0, i, 0),
                         memory_space=pltpu.VMEM)
    dq_kernel = functools.partial(_gqa_dq_kernel, causal=causal, scale=scale,
                                  g=g, bq=bq, bk=bk, n_kv=n_kv)
    in_specs = [qspec, kspec, kspec, mspec, qspec, lspec, lspec]
    inputs = [q, k, v, kvm, gout, lse, delta]
    if not has_mask:
        dq_kernel = _drop_arg(dq_kernel, 3)
        in_specs = in_specs[:3] + in_specs[4:]
        inputs = inputs[:3] + inputs[4:]
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, hkv, n_q, n_kv),
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((g * bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(*inputs)

    qspec2, kspec2, mspec2 = _gqa_specs(b, hkv, g, bq, bk, d, kv_mask,
                                        q_major=False)
    lspec2 = pl.BlockSpec((1, 1, g, bq, 128),
                          lambda b_, h, i, j: (b_, h, 0, j, 0),
                          memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, bk, d), lambda b_, h, i, j: (b_, h, i, 0),
                          memory_space=pltpu.VMEM)
    dkv_kernel = functools.partial(_gqa_dkv_kernel, causal=causal,
                                   scale=scale, g=g, bq=bq, bk=bk, n_q=n_q)
    in_specs = [qspec2, kspec2, kspec2, mspec2, qspec2, lspec2, lspec2]
    inputs = [q, k, v, kvm, gout, lse, delta]
    if not has_mask:
        dkv_kernel = _drop_arg(dkv_kernel, 3)
        in_specs = in_specs[:3] + in_specs[4:]
        inputs = inputs[:3] + inputs[4:]
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, hkv, n_kv, n_q),
        in_specs=in_specs,
        out_specs=[kvspec, kvspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(*inputs)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


_flash_gqa.defvjp(_flash_gqa_vjp_fwd, _flash_gqa_vjp_bwd)


# Head-batched GQA is the default for grouped-query shapes: measured
# 453 ms/step vs 536 ms (2.21 vs 1.86 samples/s) on the baseline_depth
# config, numerically identical losses.  KDSS_FLASH_GQA=0 opts out.
_GQA_BATCH = os.environ.get("KDSS_FLASH_GQA", "1") == "1"

# Packed-pair mode for d <= 64 heads (KDSS_FLASH_PACK2=0 opts out): the MXU
# contracts over 128 rows, so a d=64 QK^T wastes half the array on zero
# padding.  Packing TWO kv heads into the 128-lane dim — k/v lanes
# [k_even | k_odd], q rows block-diagonal ([q_even | 0] for even-group
# rows, [0 | q_odd] for odd) — makes every matmul in the existing kernels
# compute both heads' exact scores/outputs in the cycles one padded head
# used to take: QK^T contraction zeros select the right half, PV/dq fill
# the otherwise-idle output lanes, and ds^T q / p^T do land dk/dv already
# packed.  Pure layout change outside the custom_vjp (pad/stack/slice are
# XLA ops, so autodiff unpacks all gradients); kernels are untouched.
_PACK2 = os.environ.get("KDSS_FLASH_PACK2", "1") == "1"


def _pack_pairs_q(q5, d):
    """[B, HKV, G, S, d<=64] -> block-diagonal [B, HKV/2, 2G, S, 128]."""
    b, hkv, g, s, _ = q5.shape
    qe = jnp.pad(q5[:, 0::2], ((0, 0),) * 4 + ((0, 128 - d),))
    qo = jnp.pad(q5[:, 1::2], ((0, 0),) * 4 + ((64, 64 - d),))
    # [B, H2, 2, G, S, 128] -> merge (2, G); kernel rows cycle per bq so
    # group order within the flattened axis is irrelevant
    return jnp.stack([qe, qo], axis=2).reshape(b, hkv // 2, 2 * g, s, 128)


def _pack_pairs_kv(x4, d):
    """[B, HKV, S, d<=64] -> lane-concatenated [B, HKV/2, S, 128]."""
    b, hkv, s, _ = x4.shape
    xp = jnp.pad(x4, ((0, 0),) * 3 + ((0, 64 - d),))
    return (
        xp.reshape(b, hkv // 2, 2, s, 64)
        .swapaxes(2, 3)
        .reshape(b, hkv // 2, s, 128)
    )


def flash_attention_gqa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Head-batched variant of :func:`flash_attention` (same contract)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    group = hq // hkv
    if scale is None:
        scale = d**-0.5
    q, scale = _maybe_prescale(q, scale)

    kv_mask = None
    if mask is not None:
        if mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1:
            kv_mask = jnp.broadcast_to(mask[:, 0, 0, :], (b, skv))
        elif mask.ndim == 2:
            kv_mask = jnp.broadcast_to(mask, (b, skv))
        else:
            raise ValueError(f"unsupported mask ndim {mask.ndim}")

    # BSHD -> [B, HKV, G, S, D], pad d/seq
    qt = jnp.swapaxes(q, 1, 2).reshape(b, hkv, group, sq, d)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    packed = _PACK2 and d <= 64 and hkv % 2 == 0
    if packed:
        qt = _pack_pairs_q(qt, d)    # [B, HKV/2, 2G, S, 128]
        kt = _pack_pairs_kv(kt, d)   # [B, HKV/2, S, 128]
        vt = _pack_pairs_kv(vt, d)
    else:
        qt = _pad_axis(qt, 128, 4)
        kt = _pad_axis(kt, 128, 3)
        vt = _pad_axis(vt, 128, 3)
    bq, bk = _gqa_pick_bq(sq, qt.shape[2]), _pick_block_big(skv, _GQA_BK)
    qt = _pad_axis(qt, bq, 3)
    kt = _pad_axis(kt, bk, 2)
    vt = _pad_axis(vt, bk, 2)
    if kt.shape[2] != skv and kv_mask is None:
        kv_mask = jnp.ones((b, skv), dtype=bool)
    if kv_mask is not None and kv_mask.shape[1] != kt.shape[2]:
        kv_mask = _pad_axis(kv_mask, kt.shape[2], 1)

    out = _flash_gqa(qt, kt, vt, kv_mask, causal, scale)
    if packed:
        # [B, H2, (2, G), S, 128]: even groups live in lanes 0:d, odd in
        # 64:64+d; (h2, parity, g) row-major == original head order
        o = out[:, :, :, :sq, :].reshape(b, hkv // 2, 2, group, sq, 128)
        out = jnp.stack(
            [o[:, :, 0, :, :, :d], o[:, :, 1, :, :, 64:64 + d]], axis=2
        ).reshape(b, hq, sq, d)
    else:
        out = out[:, :, :, :sq, :d].reshape(b, hq, sq, d)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)
