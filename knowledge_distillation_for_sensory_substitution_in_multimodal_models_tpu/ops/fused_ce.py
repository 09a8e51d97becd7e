"""Fused cross-entropy over a large vocabulary (Pallas TPU).

The chunked loss (losses/chunked.py) reduces peak logits memory from
O(S·V) to O(chunk·V), but each chunk still round-trips a [chunk, 152k] f32
logits block (plus softmax temporaries) through HBM.  This kernel closes
that gap: logits never leave VMEM.  Streaming over vocab blocks with an
online logsumexp (the flash-attention trick applied to the classifier
head), forward emits only per-row (lse, gold); the custom-VJP backward
recomputes logits blockwise and accumulates d_hidden and d_W on the fly.

  forward:  grid (n_blocks, v_blocks), v innermost
            lse/gold accumulate in VMEM scratch across v blocks
  backward: dh kernel  — grid (n, v), v innermost, acc over v
            dW kernel  — grid (v, n), n innermost, acc over n

API: :func:`fused_ce_loss` (hidden [N, D], W [D, V], labels [N]) -> mean CE
over labels != -100, shift applied by the caller.  Equals
``losses.kd_losses.masked_cross_entropy`` on pre-shifted inputs
(tests/test_fused_ce.py, values and gradients).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0.7 * float(jnp.finfo(jnp.float32).max)
IGNORE = -100


def _col_ids(j, bn, bv):
    return j * bv + jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1)


def _masked_w(w_ref, j, v_real):
    """Zero the out-of-range vocab lanes of a (d, BV) head block.

    With the unpadded-vocab ceil-div grid the edge block reads past the
    array; those lanes can be NaN/Inf garbage.  Kernels that only SELECT
    against logits (``jnp.where(cols < v_real, ...)``) are safe, but any
    contraction over the vocab axis touches the garbage (0*NaN = NaN), so
    the weight block itself must be sanitized there.
    """
    w = w_ref[:]
    cols = j * w.shape[1] + jax.lax.broadcasted_iota(
        jnp.int32, (1, w.shape[1]), 1
    )
    return jnp.where(cols < v_real, w, jnp.zeros((), w.dtype))


def _masked_w_any(w_ref, j, v_real, vd):
    """_masked_w for either head layout: [d, BV] ("dv") or [BV, d] ("vd")."""
    if not vd:
        return _masked_w(w_ref, j, v_real)
    w = w_ref[:]
    rows = j * w.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, (w.shape[0], 1), 0
    )
    return jnp.where(rows < v_real, w, jnp.zeros((), w.dtype))


def _logits(h, w, vd):
    """[bn, bv] logits block for a [d, bv] ("dv") or [bv, d] ("vd") head
    block — vd is the tied embedding's native layout (see fused_loca.py)."""
    dims = (((1,), (1,)), ((), ())) if vd else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(h, w, dims, preferred_element_type=jnp.float32)


def _fwd_kernel(h_ref, w_ref, lab_ref, lse_ref, gold_ref, m_sc, l_sc, g_sc,
                *, v_real: int, bn: int, bv: int, n_v: int, vd: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG)
        l_sc[:] = jnp.zeros_like(l_sc)
        g_sc[:] = jnp.zeros_like(g_sc)

    h = h_ref[:]
    logits = _logits(h, w_ref[:], vd)  # [bn, bv]
    cols = _col_ids(j, bn, bv)
    logits = jnp.where(cols < v_real, logits, NEG)

    m_prev = m_sc[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    l_sc[:] = jnp.broadcast_to(
        l_sc[:, 0:1] * alpha + jnp.sum(jnp.exp(logits - m_new), axis=1,
                                       keepdims=True),
        l_sc.shape,
    )
    m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)

    labels = lab_ref[:, 0]  # [bn]
    onehot = cols == labels[:, None]
    g_sc[:] = g_sc[:] + jnp.broadcast_to(
        jnp.sum(jnp.where(onehot, logits, 0.0), axis=1, keepdims=True),
        g_sc.shape,
    )

    @pl.when(j == n_v - 1)
    def _():
        lse_ref[:] = m_sc[:, 0:1] + jnp.log(l_sc[:, 0:1])
        gold_ref[:] = g_sc[:, 0:1]


def _dh_kernel(h_ref, w_ref, lab_ref, lse_ref, rs1_ref, rs2_ref, dh_ref, acc,
               *, v_real: int, bn: int, bv: int, n_v: int, vd: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    h = h_ref[:]
    logits = _logits(h, w_ref[:], vd)
    cols = _col_ids(j, bn, bv)
    logits = jnp.where(cols < v_real, logits, NEG)
    p = jnp.exp(logits - lse_ref[:, 0:1])
    labels = lab_ref[:, 0]
    onehot = (cols == labels[:, None]).astype(jnp.float32)
    # d logits = g_lse * p + g_gold * onehot (general cotangents)
    p = p * rs1_ref[:, 0:1] + onehot * rs2_ref[:, 0:1]
    p = jnp.where(cols < v_real, p, 0.0).astype(h.dtype)
    w = _masked_w_any(w_ref, j, v_real, vd)
    acc[:] = acc[:] + jax.lax.dot_general(
        p, w,
        (((1,), (0,)), ((), ())) if vd else (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_v - 1)
    def _():
        dh_ref[:] = acc[:].astype(dh_ref.dtype)


def _dw_kernel(h_ref, w_ref, lab_ref, lse_ref, rs1_ref, rs2_ref, dw_ref, acc,
               *, v_real: int, bn: int, bv: int, n_n: int, vd: bool):
    j, i = pl.program_id(0), pl.program_id(1)  # grid (v, n), n innermost

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    h = h_ref[:]
    logits = _logits(h, w_ref[:], vd)
    cols = _col_ids(j, h.shape[0], logits.shape[1])
    logits = jnp.where(cols < v_real, logits, NEG)
    p = jnp.exp(logits - lse_ref[:, 0:1])
    labels = lab_ref[:, 0]
    onehot = (cols == labels[:, None]).astype(jnp.float32)
    p = p * rs1_ref[:, 0:1] + onehot * rs2_ref[:, 0:1]
    p = jnp.where(cols < v_real, p, 0.0).astype(h.dtype)
    if vd:
        acc[:] = acc[:] + jax.lax.dot_general(
            p, h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bv, d] — the embedding's own layout
    else:
        acc[:] = acc[:] + jax.lax.dot_general(
            h, p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [d, bv]

    @pl.when(i == n_n - 1)
    def _():
        dw_ref[:] = acc[:].astype(dw_ref.dtype)


def _pad_to(x, mult, axis, value=0):
    s = x.shape[axis]
    pad = (-s) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def check_teacher_vocab(teacher_head, v_real: int, vd: bool = False):
    """The KD kernels mask teacher columns >= v_real (prefix truncation,
    reference `logit_based/...:222`) — that only clamps correctly when the
    teacher vocab is at least the student's.  Fail loudly otherwise.
    ``vd``: the teacher head is in [V, D] layout (vocab on axis 0).
    ``teacher_head`` may be the int8 (kernel_q, kernel_scale) pair —
    its per-vocab scale length IS the teacher vocab, independent of the
    kernel_q storage orientation (r5 vocab-major or legacy)."""
    if isinstance(teacher_head, tuple):
        import numpy as _np

        vt = int(_np.prod(teacher_head[1].shape))
    else:
        vt = teacher_head.shape[0] if vd else teacher_head.shape[1]
    if vt < v_real:
        raise ValueError(
            f"teacher head vocab {vt} < student vocab {v_real}: prefix "
            "truncation assumes teacher_vocab >= student_vocab"
        )


# Row/vocab block sizes.  Profiled r2: at (256, 512) the dh/dw backward
# grids hit ~5.6k programs each (~2.7us dispatch floor per program on the
# sequential TPU grid) — over half their runtime.  bench.py raises these
# (with --xla_tpu_scoped_vmem_limit_kib) to shrink the grid; defaults stay
# within the compiler's 16M scoped-VMEM default.
import os as _os

BN = int(_os.environ.get("KDSS_FUSED_BN", "256"))
BV = int(_os.environ.get("KDSS_FUSED_BV", "512"))


def _w_spec(d, vd, q_major=True):
    if q_major:
        col_dv = lambda i, j: (0, j)  # noqa: E731
        col_vd = lambda i, j: (j, 0)  # noqa: E731
    else:
        col_dv = lambda j, i: (0, j)  # noqa: E731
        col_vd = lambda j, i: (j, 0)  # noqa: E731
    if vd:
        return pl.BlockSpec((BV, d), col_vd, memory_space=pltpu.VMEM)
    return pl.BlockSpec((d, BV), col_dv, memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _lse_gold(h, w, labels, v_real, vd=False):
    return _lse_gold_impl(h, w, labels, v_real, vd)


def _lse_gold_impl(h, w, labels, v_real, vd) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # The vocab grid is ceil-div: the head is NOT padded to a BV multiple
    # (a padded copy of a [D, 152k] head costs hundreds of MB of HLO temps
    # per head, PERF_NOTES) — edge-block reads past V are garbage that the
    # kernels' ``cols < v_real`` masks discard, and edge-block writes are
    # dropped by Pallas.  Verified on hardware before relying on it.
    n, d = h.shape
    v_width = w.shape[0] if vd else w.shape[1]
    n_n, n_v = n // BN, _cdiv(v_width, BV)
    lab2 = labels[:, None].astype(jnp.int32)
    kernel = functools.partial(
        _fwd_kernel, v_real=v_real, bn=BN, bv=BV, n_v=n_v, vd=vd
    )
    lse, gold = pl.pallas_call(
        kernel,
        grid=(n_n, n_v),
        in_specs=[
            pl.BlockSpec((BN, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            _w_spec(d, vd),
            pl.BlockSpec((BN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BN, 128), jnp.float32),
            pltpu.VMEM((BN, 128), jnp.float32),
            pltpu.VMEM((BN, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(h, w, lab2)
    return lse[:, 0], gold[:, 0]


def _lse_gold_fwd(h, w, labels, v_real, vd):
    out = _lse_gold_impl(h, w, labels, v_real, vd)
    return out, (h, w, labels, out[0])


def _lse_gold_bwd(v_real, vd, res, g):
    h, w, labels, lse = res
    g_lse, g_gold = g  # [n] cotangents
    n, d = h.shape
    v_width = w.shape[0] if vd else w.shape[1]  # real width (no BV padding)
    n_n, n_v = n // BN, _cdiv(v_width, BV)
    lab2 = labels[:, None].astype(jnp.int32)
    lse2 = lse[:, None]
    # d lse / d logits = p ; d gold / d logits = onehot
    rs1 = g_lse[:, None].astype(jnp.float32)
    rs2 = g_gold[:, None].astype(jnp.float32)

    dh = pl.pallas_call(
        functools.partial(_dh_kernel, v_real=v_real, bn=BN, bv=BV, n_v=n_v,
                          vd=vd),
        grid=(n_n, n_v),
        in_specs=[
            pl.BlockSpec((BN, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            _w_spec(d, vd),
            pl.BlockSpec((BN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BN, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), h.dtype),
        scratch_shapes=[pltpu.VMEM((BN, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(h, w, lab2, lse2, rs1, rs2)

    dw = pl.pallas_call(
        functools.partial(_dw_kernel, v_real=v_real, bn=BN, bv=BV, n_n=n_n,
                          vd=vd),
        grid=(n_v, n_n),
        in_specs=[
            pl.BlockSpec((BN, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            _w_spec(d, vd, q_major=False),
            pl.BlockSpec((BN, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=_w_spec(d, vd, q_major=False),
        out_shape=jax.ShapeDtypeStruct(w.shape, w.dtype),
        scratch_shapes=[pltpu.VMEM((BV, d) if vd else (d, BV), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(h, w, lab2, lse2, rs1, rs2)

    return dh, dw, None


_lse_gold.defvjp(_lse_gold_fwd, _lse_gold_bwd)


def fused_ce_sum(hidden: jnp.ndarray, w: jnp.ndarray, labels: jnp.ndarray,
                 w_layout: str = "dv"):
    """(sum of NLL over valid rows, valid count) — the pre-reduction CE.

    Split out of :func:`fused_ce_loss` so row-sharded callers
    (ops/fused_spmd.py) can psum the partial sums before dividing.
    ``w_layout="vd"`` takes the head as [V, D] (a tied embedding natively,
    no transpose copy) and returns its gradient in the same layout.
    """
    vd = w_layout == "vd"
    n, d = hidden.shape
    v_real = w.shape[0] if vd else w.shape[1]
    valid = labels != IGNORE
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)

    h_p = _pad_to(hidden, BN, 0)
    lab_p = _pad_to(safe, BN, 0)
    w_p = w  # vocab axis unpadded: ceil-div grid + cols<v_real masking
    if d % 128 != 0:
        h_p = _pad_to(h_p, 128, 1)
        w_p = _pad_to(w_p, 128, 1 if vd else 0)

    lse, gold = _lse_gold(h_p, w_p, lab_p, v_real, vd)
    nll = (lse - gold)[:n] * valid
    return nll.sum(), valid.sum()


def fused_ce_loss(hidden: jnp.ndarray, w: jnp.ndarray, labels: jnp.ndarray,
                  w_layout: str = "dv"):
    """Mean CE over ``labels != -100``; labels pre-shifted by the caller.

    hidden [N, D] (any float dtype), w [D, V] (or [V, D] with
    ``w_layout="vd"``), labels [N] int.
    """
    nll_sum, count = fused_ce_sum(hidden, w, labels, w_layout=w_layout)
    return nll_sum / jnp.maximum(count, 1)
