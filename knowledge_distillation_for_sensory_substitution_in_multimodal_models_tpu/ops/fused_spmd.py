"""Mesh-aware wrappers for the fused vocab-streaming loss kernels.

Pallas custom calls are opaque to GSPMD: invoked directly inside a
mesh-jitted program, the partitioner replicates their operands and every
chip sweeps the full [N, V] logits space.  These wrappers instead shard
the row axis N = B*S over the dividing mesh axes (data/fsdp/tensor — the
head matrices enter replicated, so tensor can carry rows too) with
``shard_map``
— each shard runs the kernel on its rows only — then ``psum`` the
per-shard partial sums and apply the global reduction outside.  The head
matrices enter replicated (one all-gather of a vocab-sharded teacher
head per step; XLA CSEs it across CE/KL/LoCa since all three see the
same operand).

This is the production multi-chip loss path for double-trouble phases
2/3 (reference anchor: `distillation/knowledge_distillation7b_double_trouble/
phase3/train_online_kd.py:108-116` +
`knowledge_distillation7b_logit_based/OnlineKnowledgeDistillationLLavaOneVision.py:208-261`),
which cannot fit one chip and therefore only ever run under a mesh.

``local_impl`` selects the per-shard math: ``"pallas"`` (the fused
kernels; production TPU path — interpret-mode Pallas inside shard_map
hangs on the CPU backend, so this arm is TPU-only) or ``"xla"`` (same
per-row quantities in stock XLA ops; used by the CPU-mesh equivalence
tests, which therefore validate the sharding/psum plumbing and the
reduction contract on every path the pallas arm shares).

With no active mesh each wrapper falls back to its single-device fused
kernel.  Under a mesh whose data axes don't divide the rows (including
the 1-device mesh), the kernel still runs — fully replicated inside the
shard_map — so the production custom-call-in-shard_map path is exercised
on any mesh shape.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..losses.kd_losses import IGNORE_INDEX, loca_calibrated_probs
from ..parallel.mesh import active_abstract_mesh as _abstract_mesh
from .fused_ce import check_teacher_vocab, fused_ce_loss, fused_ce_sum
from .fused_kl import fused_kl_loss, fused_kl_sum
from .fused_loca import (
    fused_loca_ce_loss,
    fused_loca_ce_sums,
    fused_loca_loss,
    fused_loca_sum,
)


def _single_tmode() -> str:
    """Teacher-logits form for the single-device pallas path.
    ``KDSS_LOCA_TMAT``: "1" (default) = materialize the [N, V] f32
    logits once per step (+3.1% measured at the stand-in, r3); "bf16" =
    materialize in bfloat16 — half the buffer and half the sweep read
    traffic at ~2^-9 logit rounding (see fused_loca._materialize_t; the
    form bench.py selects at the real-7B vocab, where the f32 matrix's
    1.9 GB does not fit beside the 8 GB int8 teacher); "0" = recompute
    the teacher dot in every sweep."""
    v = os.environ.get("KDSS_LOCA_TMAT", "1")
    if v == "bf16":
        return "materialize_bf16"
    return "materialize" if v == "1" else "recompute"


def _tmat_row_chunk(n: int, tmode: str) -> Optional[int]:
    """Row-chunk size for the bf16 materialized-teacher-logits form, or
    None to run single-shot.  The bf16 tmat exists for the real-7B fit,
    where even its 891 MB [3072, 152128] buffer left the chip ~2 MB
    short at runtime (r5 accum-fit arms); chunking rows through a
    checkpointed scan keeps one [c, V] slab live at a time (298 MB at
    c=1024) at unchanged FLOPs — XLA was already rematerializing the
    single-shot buffer between fwd and bwd.  The f32 form is NOT
    chunked: it predates this lever and its single-shot sum order is
    pinned by the stand-in's canonical loss trace.
    ``KDSS_LOCA_TMAT_CHUNK``: row-chunk override (0 = single-shot)."""
    if tmode != "materialize_bf16":
        return None
    env = os.environ.get("KDSS_LOCA_TMAT_CHUNK")
    if env is not None:
        c = int(env)
        return c if 0 < c < n and n % c == 0 else None
    for c in (1024, 1536, 512, 768):
        if n > c and n % c == 0:
            return c
    return None


def _mesh_tmode() -> str:
    """Teacher-logits form for the per-shard pallas arm.  Default
    recompute; ``KDSS_LOCA_TMAT_MESH=1`` opts into materializing each
    shard's [N_shard, V] f32 teacher logits once per step and streaming
    them through every sweep (the single-chip default, +3.1% measured).
    Costs ~N_shard x 152k x 4B of HBM per chip — ~0.9 GiB at the 7B dims
    on the (1,2,4) mesh, inside the AOT headroom (docs/PERF_NOTES.md, r3
    roofline refresh) — pending multi-chip hardware measurement."""
    return ("materialize"
            if os.environ.get("KDSS_LOCA_TMAT_MESH", "0") == "1"
            else "recompute")


def _row_axes(mesh, n_rows: int) -> Tuple[str, ...]:
    """Axis combo (subset of data/fsdp/tensor, mesh order) MAXIMIZING the
    shard count that divides N.  The head matrices enter the wrappers
    replicated, so loss rows can shard over ``tensor`` too — on a
    tensor-dominant mesh (e.g. a (1,1,8) v5e-8) the [N, V] sweep would
    otherwise run fully replicated on every chip."""
    names = ("data", "fsdp", "tensor")
    sizes = {a: mesh.shape[a] for a in mesh.axis_names}
    best, best_prod = (), 1
    for bits in range(1, 8):
        axes = tuple(a for i, a in enumerate(names) if bits >> i & 1)
        prod = 1
        for a in axes:
            prod *= sizes.get(a, 1)
        if prod > best_prod and n_rows % prod == 0:
            best, best_prod = axes, prod
    return best


# ---------------------------------------------------------------------------
# Per-shard XLA reference math (CPU-mesh tests + AOT memory estimation;
# same contracts as the *_sum kernels above).
#
# The dense forms materialize [N_shard, V] logits plus several derived
# tensors — ~15 GB/chip at the 7B KD shapes (N=3072, V=152k), which is what
# the Pallas kernels exist to avoid.  ``_rowchunked`` therefore scans the
# row axis in blocks with ``jax.checkpoint`` (backward recomputes each
# block's logits), giving the XLA arm the kernels' O(chunk x V) memory
# behavior so CPU-mesh equivalence tests and `parallel/aot.py` HBM budgets
# reflect the production profile.
# ---------------------------------------------------------------------------


def _row_chunk(n: int) -> Optional[int]:
    # 128 first: ~24 chunk x V f32 buffers are concurrently live across the
    # recompute+backward of one chunk (measured via buffer assignment), so
    # the chunk size directly scales the XLA arm's peak (128 x 152k x 4B x
    # 24 ~ 1.9 GB vs 7.5 GB at 512).
    for c in (128, 256, 512, 64):
        if n > c and n % c == 0:
            return c
    return None


def _rowchunked(fn, row_args: Tuple[jnp.ndarray, ...], n_out: int,
                chunk: Optional[int] = None):
    """Sum ``fn``'s scalar outputs over row chunks, rematerializing each
    chunk's intermediates in backward.  Exact up to f32 sum association.
    ``chunk`` overrides the XLA-arm default (_row_chunk): the pallas
    tmat caller uses larger rows-per-launch (see _tmat_row_chunk)."""
    n = row_args[0].shape[0]
    c = chunk if chunk is not None else _row_chunk(n)
    if c is None:
        return fn(*row_args)
    chunked = tuple(a.reshape(n // c, c, *a.shape[1:]) for a in row_args)
    out_sds = jax.eval_shape(
        fn, *(jax.ShapeDtypeStruct((c,) + a.shape[1:], a.dtype)
              for a in row_args)
    )
    if n_out == 1:
        out_sds = (out_sds,)

    def body(carry, xs):
        outs = fn(*xs)
        if n_out == 1:
            outs = (outs,)
        return tuple(cc + o.astype(cc.dtype) for cc, o in zip(carry, outs)), None

    if os.environ.get("KDSS_ROWCHUNK_REMAT", "1") == "1":
        # interpret-mode Pallas carries an IO effect that cannot live
        # under remat partial-eval — CPU parity tests flip this env to
        # run the chunked path un-remat'd (memory is irrelevant there);
        # the TPU path always remats (that is the lever's entire point)
        body = functools.partial(jax.checkpoint, prevent_cse=False)(body)

    init = tuple(jnp.zeros((), s.dtype) for s in out_sds)
    outs, _ = jax.lax.scan(body, init, chunked)
    return outs[0] if n_out == 1 else outs


def _head_matmul(h, w, vd: bool):
    """h [N, D] x head -> [N, V] f32; ``vd=True`` takes w as [V, D] (the
    tied embedding's native layout — no transpose copy of the table)."""
    spec = "nd,vd->nv" if vd else "nd,dv->nv"
    return jnp.einsum(spec, h, w, preferred_element_type=jnp.float32)


def _t_head_matmul(ht, wt, v: int):
    """Teacher logits [N, v] for the XLA arm.  ``wt`` is the dense
    [Dt, Vt] head or the int8 (kernel_q, kernel_scale) pair — the
    per-vocab-column scale factors out of the dot exactly, so the pair
    form computes ``(h @ q) * scale`` with no dense head copy (the chip
    holds only the replicated int8 head: half the bf16 bytes)."""
    if isinstance(wt, tuple):
        wq, wsc = wt
        # full-width dot, then slice the LOGITS: slicing the operand
        # (wq[:, :v]) materializes a near-full int8 head copy per chip
        # (+0.5 GiB at 7B dims in the AOT budget); the extra Vt - v
        # columns are 0.1% of the FLOPs and the convert fuses into the
        # dot's operand load.  Handles both storage orientations (r5
        # vocab-major [Vt, Dt] and legacy [Dt, Vt] — ops/int8.py).
        spec = ("nd,vd->nv" if wq.shape[0] != ht.shape[1]
                else "nd,dv->nv")
        t = jnp.einsum(spec, ht, wq.astype(ht.dtype),
                       preferred_element_type=jnp.float32)
        return t[:, :v] * wsc.reshape(-1)[:v]
    return _head_matmul(ht, wt[:, :v], False)


def _ce_sum_xla(h, w, labels, vd: bool = False):
    logits = _head_matmul(h, w, vd)
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    lse = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    return ((lse - gold) * valid).sum(), valid.sum()


def _kl_sum_xla(hs, ws, ht, wt, temperature, vd: bool = False):
    v = ws.shape[0] if vd else ws.shape[1]
    s = _head_matmul(hs, ws, vd) / temperature
    t = _t_head_matmul(ht, wt, v) / temperature
    log_ps = jax.nn.log_softmax(s, axis=-1)
    log_pt = jax.nn.log_softmax(t, axis=-1)
    pt = jnp.exp(log_pt)
    return (pt * (log_pt - log_ps)).sum()


def _loca_sum_xla(hs, ws, ht, wt, labels, temperature, alpha, eps,
                  vd: bool = False):
    v = ws.shape[0] if vd else ws.shape[1]
    s = _head_matmul(hs, ws, vd) / temperature
    t = _t_head_matmul(ht, wt, v) / temperature
    p_t = jax.nn.softmax(t, axis=-1)
    p_s = jax.nn.softmax(s, axis=-1)
    log_ps = jnp.log(jnp.clip(p_s, eps, None))
    loca_t = loca_calibrated_probs(p_t[None], labels[None], alpha)[0]
    safe_log = jnp.log(jnp.where(loca_t > 0, loca_t, 1.0))
    return jnp.where(loca_t > 0, loca_t * (safe_log - log_ps), 0.0).sum()


# ---------------------------------------------------------------------------
# shard_map wrappers
# ---------------------------------------------------------------------------


def _sharded_sums(local_fn, row_args, rep_args, axes, mesh, n_out: int):
    """shard_map ``local_fn`` with rows sharded over ``axes`` and the rest
    replicated; returns ``n_out`` psum'd scalars.

    ``axes=()`` wraps the kernel fully replicated (every device computes
    all rows, no psum) — the 1-device-mesh case, where the value of the
    shard_map is executing the exact production code path (Pallas custom
    call inside shard_map) rather than sharding work.
    """
    row_spec = []
    for a in row_args:
        row_spec.append(P(axes if axes else None,
                          *([None] * (a.ndim - 1))))
    # a rep entry may be the int8 (kernel_q, kernel_scale) teacher-head
    # pair: flatten to plain-array operands for shard_map and rebuild
    # inside the body (each chip then holds the replicated int8 head —
    # half the bf16 bytes — and the local arm dequantizes per block)
    rep_flat, rep_def = jax.tree_util.tree_flatten(tuple(rep_args))
    rep_spec = [P(*([None] * a.ndim)) for a in rep_flat]

    def body(*args):
        rows = args[:len(row_args)]
        reps = jax.tree_util.tree_unflatten(rep_def, args[len(row_args):])
        outs = local_fn(*rows, *reps)
        if n_out == 1:
            outs = (outs,)
        if axes:
            outs = tuple(jax.lax.psum(o, axes) for o in outs)
        return outs

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(row_spec + rep_spec),
        out_specs=tuple(P() for _ in range(n_out)),
        check_vma=False,
    )
    outs = fn(*row_args, *rep_flat)
    return outs[0] if n_out == 1 else outs


def fused_ce_loss_spmd(
    hidden: jnp.ndarray,
    w: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    local_impl: str = "pallas",
    w_layout: str = "dv",
) -> jnp.ndarray:
    """Row-sharded fused CE: mean NLL over ``labels != -100`` globally."""
    mesh = _abstract_mesh()
    if mesh is None:
        return fused_ce_loss(hidden, w, labels, w_layout=w_layout)
    axes = _row_axes(mesh, hidden.shape[0])

    def local(h, lab, w_):
        if local_impl == "pallas":
            return fused_ce_sum(h, w_, lab, w_layout=w_layout)
        return _rowchunked(
            lambda hh, ll: _ce_sum_xla(hh, w_, ll, vd=w_layout == "vd"),
            (h, lab), n_out=2,
        )

    nll_sum, count = _sharded_sums(
        local, [hidden, labels], [w], axes, mesh, n_out=2
    )
    return nll_sum / jnp.maximum(count, 1)


def fused_kl_loss_spmd(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    temperature: float = 1.0,
    *,
    local_impl: str = "pallas",
    student_head_layout: str = "dv",
) -> jnp.ndarray:
    """Row-sharded fused KL, torch-'mean' reduction * T^2 over global N·V."""
    mesh = _abstract_mesh()
    n = student_hidden.shape[0]
    vd = student_head_layout == "vd"
    v_real = student_head.shape[0] if vd else student_head.shape[1]
    check_teacher_vocab(teacher_head, v_real)
    if mesh is None:
        # materialized teacher logits on the single-device path (see
        # fused_loca_ce_loss_spmd below for rationale + measurement)
        tmode = _single_tmode()
        c = _tmat_row_chunk(n, tmode)
        if c is not None:
            # row-chunked bf16 tmat — see fused_loca_ce_loss_spmd
            def fn(hs_c, ht_c):
                return fused_kl_sum(
                    hs_c, student_head, ht_c, teacher_head,
                    temperature=temperature,
                    student_head_layout=student_head_layout,
                    teacher_logits=tmode,
                )

            total = _rowchunked(
                fn, (student_hidden, teacher_hidden), n_out=1, chunk=c)
            return total / (n * v_real) * (temperature ** 2)
        return fused_kl_loss(
            student_hidden, student_head, teacher_hidden, teacher_head,
            temperature=temperature, student_head_layout=student_head_layout,
            teacher_logits=tmode,
        )
    axes = _row_axes(mesh, n)

    def local(hs, ht, ws, wt):
        if local_impl == "pallas":
            return fused_kl_sum(hs, ws, ht, wt, temperature=temperature,
                                student_head_layout=student_head_layout,
                                teacher_logits=_mesh_tmode())
        return _rowchunked(
            lambda h1, h2: _kl_sum_xla(h1, ws, h2, wt, temperature, vd=vd),
            (hs, ht), n_out=1,
        )

    total = _sharded_sums(
        local, [student_hidden, teacher_hidden],
        [student_head, teacher_head], axes, mesh, n_out=1,
    )
    return total / (n * v_real) * (temperature ** 2)


def fused_loca_loss_spmd(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 1.0,
    alpha: float = 0.8,
    eps: float = 1e-8,
    *,
    local_impl: str = "pallas",
) -> jnp.ndarray:
    """Row-sharded fused LoCa KL, torch-'mean' * T^2 over global N·V.

    LoCa's calibration statistics (teacher lse / p_gt / top-2) are per-row,
    so row sharding splits the work without any cross-shard stat exchange.
    """
    mesh = _abstract_mesh()
    n = student_hidden.shape[0]
    v_real = student_head.shape[1]
    check_teacher_vocab(teacher_head, v_real)
    if mesh is None:
        return fused_loca_loss(
            student_hidden, student_head, teacher_hidden, teacher_head,
            labels, temperature=temperature, alpha=alpha, eps=eps,
        )
    axes = _row_axes(mesh, n)

    def local(hs, ht, lab, ws, wt):
        if local_impl == "pallas":
            return fused_loca_sum(
                hs, ws, ht, wt, lab,
                temperature=temperature, alpha=alpha, eps=eps,
            )
        return _rowchunked(
            lambda h1, h2, ll: _loca_sum_xla(
                h1, ws, h2, wt, ll, temperature, alpha, eps),
            (hs, ht, lab), n_out=1,
        )

    total = _sharded_sums(
        local, [student_hidden, teacher_hidden, labels],
        [student_head, teacher_head], axes, mesh, n_out=1,
    )
    return total / (n * v_real) * (temperature ** 2)


def fused_loca_ce_loss_spmd(
    student_hidden: jnp.ndarray,
    student_head: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    teacher_head: jnp.ndarray,
    loca_labels: jnp.ndarray,
    ce_labels: jnp.ndarray,
    temperature: float = 1.0,
    alpha: float = 0.8,
    eps: float = 1e-8,
    *,
    local_impl: str = "pallas",
    student_head_layout: str = "dv",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-sharded combined LoCa+CE (phases 2/3's whole logit loss in one
    pipeline — 4 head sweeps instead of 13, see ops/fused_loca.py).

    Returns (loca_loss, ce_loss) with the same global reductions as
    ``fused_loca_loss_spmd`` and ``fused_ce_loss_spmd``.
    ``student_head_layout="vd"`` takes the tied student head as [V, D]
    (the embedding natively — no transpose copy).
    """
    mesh = _abstract_mesh()
    n = student_hidden.shape[0]
    vd = student_head_layout == "vd"
    v_real = student_head.shape[0] if vd else student_head.shape[1]
    check_teacher_vocab(teacher_head, v_real)
    if mesh is None:
        # Single-device form: materialize the [N, V] f32 teacher logits
        # once and stream them through all four sweeps instead of
        # recomputing the teacher dot per sweep (~3x 2·N·Dt·V FLOPs saved
        # for ~1.9 GB HBM at the KD shapes — measured +3.1% KD step on
        # v5e, loss trace unchanged to 5 decimals; docs/PERF_NOTES.md).
        # KDSS_LOCA_TMAT=0 restores recompute; =bf16 materializes in
        # bfloat16 (half the buffer — the real-7B default, bench.py).
        # The mesh path below defaults to recompute (per-shard rows are
        # few); KDSS_LOCA_TMAT_MESH=1 opts in per-shard materialization
        # (see _mesh_tmode).
        tmode = _single_tmode()
        c = _tmat_row_chunk(n, tmode)
        if c is not None:
            # Row-chunked bf16 tmat (see _tmat_row_chunk): materialize
            # [c, V] per chunk inside a checkpointed scan so only one
            # chunk's logits are ever live (298 MB at c=1024 vs the
            # 891 MB single-shot that missed the 7B B=1 fit by ~2 MB).
            # XLA already rematerialized the single-shot buffer between
            # fwd and bwd, so the replay adds no FLOPs it wasn't paying.
            def fn(hs_c, ht_c, lab_c, labce_c):
                return fused_loca_ce_sums(
                    hs_c, student_head, ht_c, teacher_head, lab_c, labce_c,
                    temperature=temperature, alpha=alpha, eps=eps,
                    student_head_layout=student_head_layout,
                    teacher_logits=tmode,
                )

            kl_sum, ce_sum, count = _rowchunked(
                fn,
                (student_hidden, teacher_hidden, loca_labels, ce_labels),
                n_out=3, chunk=c,
            )
            loca = kl_sum / (n * v_real) * (temperature ** 2)
            ce = ce_sum / jnp.maximum(count, 1)
            return loca, ce
        return fused_loca_ce_loss(
            student_hidden, student_head, teacher_hidden, teacher_head,
            loca_labels, ce_labels, temperature=temperature, alpha=alpha,
            eps=eps, student_head_layout=student_head_layout,
            teacher_logits=tmode,
        )
    axes = _row_axes(mesh, n)

    def local(hs, ht, lab, labce, ws, wt):
        if local_impl == "pallas":
            return fused_loca_ce_sums(
                hs, ws, ht, wt, lab, labce,
                temperature=temperature, alpha=alpha, eps=eps,
                student_head_layout=student_head_layout,
                teacher_logits=_mesh_tmode(),
            )

        def both(h1, h2, ll, llce):
            loca_sum = _loca_sum_xla(h1, ws, h2, wt, ll, temperature,
                                     alpha, eps, vd=vd)
            ce_sum, count = _ce_sum_xla(h1, ws, llce, vd=vd)
            return loca_sum, ce_sum, count

        return _rowchunked(both, (hs, ht, lab, labce), n_out=3)

    kl_sum, ce_sum, count = _sharded_sums(
        local, [student_hidden, teacher_hidden, loca_labels, ce_labels],
        [student_head, teacher_head], axes, mesh, n_out=3,
    )
    loca = kl_sum / (n * v_real) * (temperature ** 2)
    ce = ce_sum / jnp.maximum(count, 1)
    return loca, ce
