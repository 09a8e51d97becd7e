"""Per-phase cycle accounting for the flash fwd kernel (VERDICT r4 #5).

Mosaic exposes no in-kernel cycle counter in this JAX build, so the
accounting is built by ABLATION: four kernel variants share the exact
grid, block specs, pipeline and HBM traffic of the shipped
``_gqa_fwd_kernel`` and differ only in which compute phases run.
Marginal-rate timing between a short and a long chained run (the
microbench convention — single-chain walls carry the ~30 ms tunnel RTT)
then gives per-pass times whose DIFFERENCES attribute cost per phase:

  arm        body
  ----       ----
  full       the shipped kernel (imported, not copied)
  noexp      exp(x) -> 0.125*x in both softmax exps (same dataflow,
             reductions and rescale kept; isolates the transcendental
             throughput)
  nored      exp kept; the jnp.max/jnp.sum row reductions and the alpha
             rescale replaced by constants (isolates reduction +
             rescale VPU passes)
  nomax      only the cross-lane row-max replaced by a constant; sum,
             alpha, l/m bookkeeping all kept (isolates the max)
  nosum      only the cross-lane jnp.sum(p) replaced by a constant;
             max/alpha/bookkeeping kept (isolates the sum)
  nosub      only the [rows,1]->[rows,bk] broadcast-subtract in
             exp(s - m_new) dropped (exp(s*1e-2)); everything else kept
             (isolates the lane-broadcast of the running max)
  noalpha    alpha chain dropped (no exp(m_prev-m_new), acc/l rescales
             become plain adds); max/sum/subtract/stores kept
  nostorem   the m_ref broadcast-store replaced by a broadcast-free
             self-store (isolates the [rows,128] bookkeeping stores)
  nomaxsum   BOTH cross-lane reductions constant; subtract/alpha/stores
             all kept (tests whether the two reductions interact — e.g.
             one hides under the PV matmul, two cannot)
  redonly    both reductions computed and consumed into l, but the
             softmax recurrence is severed (no subtract/alpha/m-store):
             isolates raw reduction throughput from recurrence stalls
  local      block-LOCAL softmax + [rows,128] merge: exp(s - m_j) with
             m_j the block's own max (no carried value in the full-width
             path), carried (m, l, acc) updated by the standard two-way
             online-softmax merge after the PV matmul.  Numerically
             identical attention output (asserted vs full) — the
             candidate fix if the recurrence stall is real
  bound      like local but m_j is the Cauchy-Schwarz upper bound
             scale*|q_i|*max_blk|k| - 40 computed from q/k NORMS — no
             cross-lane reduction of s anywhere in exp's dependency
             path, so scale+exp+astype can fuse into the QK epilogue.
             Online softmax is EXACT for any per-row m_j >= max - ~80
             (the e^-m factor cancels in the l division; the -40 shift
             doubles the underflow margin and cannot overflow since
             exp(s - m_j) <= e^40).  Output asserted vs full
  mxu        p = s cast to bf16 straight into the p@v dot (no softmax
             at all): the MXU + pipeline floor for this grid

  exp cost        = full - noexp
  reductions cost = full - nored - (exp delta is kept in both)
  softmax total   = full - mxu
  floor           = mxu  (compare against the 2*rows*bk*d MACs
                    speed-of-light)

Production student-LM shapes by default (B=1, hkv=2, g=7, S=3072,
d=64 padded to 128 lanes — exactly what the shipped wrapper feeds the
kernel), production block budgets via KDSS_FLASH_ROWS/KDSS_FLASH_BK.

Usage: python scripts/flash_phase_ablation.py [--iters 50] [--seq 3072]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("KDSS_FLASH_ROWS", "7168")
os.environ.setdefault("KDSS_FLASH_BK", "1024")


def _variant_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                    *, causal, scale, g, bq, bk, n_kv, arm):
    """The shipped _gqa_fwd_kernel body with phases ablated per ``arm``.

    Mirrors ops/flash_attention.py::_gqa_fwd_kernel (no-mask, fwd-only
    form) — kept in the scripts/ instrument so the shipped kernel stays
    unmodified; any structural change there should be mirrored here.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.flash_attention import (
        _gqa_dispatch,
        _gqa_mask,
        _scaled,
    )

    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    def compute(masked):
        q = q_ref[0, 0].reshape(g * bq, q_ref.shape[-1])
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32), scale)
        if masked:
            s = _gqa_mask(s, causal=causal, iq=iq, ik=ik, g=g, bq=bq,
                          bk=bk, kv_mask_blk=None)
        if arm == "mxu":
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return
        exp = (lambda x: x * 0.125) if arm == "noexp" else jnp.exp
        m_prev = m_ref[:, 0:1]
        if arm == "nored":
            # constants replace the row max/sum and the alpha rescale;
            # exp and every elementwise pass over [rows, bk] stay
            m_new = m_prev
            p = exp(s * 1e-4)
            l_ref[:] = l_ref[:] + 1.0
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return
        if arm == "streaming":
            # GLOBAL constant bound (valid for the test data: max s ~ 4,
            # online softmax exact for any m >= max - ~80): m is the same
            # for every kv block, so there is NO alpha rescale and the
            # accumulators are pure += — both serialization sources gone
            p = exp(s - 4.0)
            l_ref[:] = l_ref[:] + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[:] = jnp.full_like(m_ref, 4.0)
            return
        if arm == "streaming_rowm":
            # per-ROW bound from the q norms x a global k-norm bound (20
            # covers the test data whp; asserted vs full): still constant
            # across kv blocks -> pure += accumulators, no alpha
            qn = jnp.sqrt(jnp.sum(
                q.astype(jnp.float32) * q.astype(jnp.float32),
                axis=1, keepdims=True))
            m_j = qn * (20.0 * scale) - 20.0
            p = exp(s - m_j)
            l_ref[:] = l_ref[:] + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[:] = jnp.broadcast_to(m_j, m_ref.shape)
            return
        if arm == "bound":
            # row bound from q/k norms: independent of s, so nothing
            # gates the QK-epilogue fusion of scale/exp/astype
            qn = jnp.sqrt(jnp.sum(
                q.astype(jnp.float32) * q.astype(jnp.float32),
                axis=1, keepdims=True))
            kn2 = jnp.max(jnp.sum(
                k.astype(jnp.float32) * k.astype(jnp.float32), axis=1))
            m_j = qn * (jnp.sqrt(kn2) * scale) - 40.0
            p = exp(s - m_j)
            l_j = jnp.sum(p, axis=1, keepdims=True)
            o_j = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_new = jnp.maximum(m_prev, m_j)
            a_prev = exp(m_prev - m_new)
            a_j = exp(m_j - m_new)
            l_ref[:] = jnp.broadcast_to(
                l_ref[:, 0:1] * a_prev + l_j * a_j, l_ref.shape)
            acc_ref[:] = acc_ref[:] * a_prev + o_j * a_j
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            return
        if arm == "local":
            # block-local softmax: the full-width ops depend only on this
            # block's QK result, so Mosaic can pipeline blocks; the carried
            # state enters only via the cheap [rows, 128] merge below
            m_j = jnp.max(s, axis=1, keepdims=True)
            p = exp(s - m_j)
            if masked:
                p = jnp.where(m_j > -5e29, p, 0.0)
            l_j = jnp.sum(p, axis=1, keepdims=True)
            o_j = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_new = jnp.maximum(m_prev, m_j)
            a_prev = exp(m_prev - m_new)
            a_j = exp(m_j - m_new)
            l_ref[:] = jnp.broadcast_to(
                l_ref[:, 0:1] * a_prev + l_j * a_j, l_ref.shape)
            acc_ref[:] = acc_ref[:] * a_prev + o_j * a_j
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            return
        if arm in ("nomax", "nomaxsum"):
            # constant bound replaces the cross-lane row max; every other
            # pass (subtract, exp, sum, alpha, l/m stores) stays live
            m_new = jnp.maximum(m_prev, 4.0)
        else:
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        if arm == "nosub":
            p = exp(s * 1e-2)
        elif arm == "redonly":
            p = exp(s * 1e-2)
            l_ref[:] = jnp.broadcast_to(
                l_ref[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
                + m_new * 1e-9, l_ref.shape)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return
        else:
            p = exp(s - m_new)
        if masked:
            p = jnp.where(m_new > -5e29, p, 0.0)
        alpha = exp(m_prev - m_new)
        if arm in ("nosum", "nomaxsum"):
            # constant replaces the cross-lane jnp.sum(p); alpha mult and
            # the l store stay live
            psum = alpha * 0.0 + 1.0
        else:
            psum = jnp.sum(p, axis=1, keepdims=True)
        if arm == "noalpha":
            l_ref[:] = jnp.broadcast_to(l_ref[:, 0:1] + psum, l_ref.shape)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            l_ref[:] = jnp.broadcast_to(
                l_ref[:, 0:1] * alpha + psum, l_ref.shape)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if arm == "nostorem":
            m_ref[:] = m_ref[:] * 1.0000001
        else:
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=None)

    @pl.when(ik == n_kv - 1)
    def _():
        l = l_ref[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        d = o_ref.shape[-1]
        o_ref[0, 0] = (acc_ref[:] / l_safe).reshape(g, bq, d).astype(
            o_ref.dtype)


def _streaming_smem_kernel(q_ref, k_ref, v_ref, c_ref, o_ref,
                           acc_ref, m_ref, l_ref,
                           *, causal, scale, g, bq, bk, n_kv):
    """streaming arm, but the shift is a TRACED scalar read from SMEM
    (the production shape: a wrapper-computed global C-S bound) instead
    of a compile-time constant — isolates whether Mosaic's QK-epilogue
    fusion survives a runtime scalar splat."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.flash_attention import (
        _gqa_dispatch,
        _scaled,
    )

    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    c = c_ref[0]

    def compute(masked):
        q = q_ref[0, 0].reshape(g * bq, q_ref.shape[-1])
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = _scaled(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32), scale)
        if masked:
            from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.flash_attention import (
                _gqa_mask,
            )
            s = _gqa_mask(s, causal=causal, iq=iq, ik=ik, g=g, bq=bq,
                          bk=bk, kv_mask_blk=None)
        p = jnp.exp(s - c)
        l_ref[:] = l_ref[:] + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    _gqa_dispatch(compute, causal=causal, iq=iq, ik=ik, bq=bq, bk=bk,
                  kvm_ref=None)

    @pl.when(ik == n_kv - 1)
    def _():
        l = l_ref[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        d = o_ref.shape[-1]
        o_ref[0, 0] = (acc_ref[:] / l_safe).reshape(g, bq, d).astype(
            o_ref.dtype)


def build(arm, b, hkv, g, sq, d):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops import (
        flash_attention as fa,
    )

    bq = fa._gqa_pick_bq(sq, g)
    bk = fa._pick_block_big(sq, fa._GQA_BK)
    n_q, n_kv = sq // bq, sq // bk
    qspec, kspec, _ = fa._gqa_specs(b, hkv, g, bq, bk, d, None)

    if arm == "streaming_smem":
        scale = d**-0.5
        kernel = functools.partial(
            _streaming_smem_kernel, causal=True, scale=scale, g=g,
            bq=bq, bk=bk, n_kv=n_kv)
        inner = pl.pallas_call(
            kernel,
            grid=(b, hkv, n_q, n_kv),
            in_specs=[qspec, kspec, kspec,
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[qspec],
            out_shape=[jax.ShapeDtypeStruct(
                (b, hkv, g, sq, d), jnp.bfloat16)],
            scratch_shapes=[
                pltpu.VMEM((g * bq, d), jnp.float32),
                pltpu.VMEM((g * bq, 128), jnp.float32),
                pltpu.VMEM((g * bq, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
        )

        def call(q, k, v):
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            qn = jnp.sqrt(jnp.max(jnp.sum(qf * qf, axis=-1)))
            kn = jnp.sqrt(jnp.max(jnp.sum(kf * kf, axis=-1)))
            c = jnp.maximum(scale * qn * kn, 0.0).reshape(1)
            return inner(q, k, v, c)

        return call, (bq, bk, n_q, n_kv)

    if arm == "full":
        kernel = functools.partial(
            fa._gqa_fwd_kernel, causal=True, scale=d**-0.5, g=g, bq=bq,
            bk=bk, n_kv=n_kv)
        kernel = fa._drop_arg(fa._drop_arg(kernel, 5), 3)  # no lse, no mask
    else:
        kernel = functools.partial(
            _variant_kernel, causal=True, scale=d**-0.5, g=g, bq=bq,
            bk=bk, n_kv=n_kv, arm=arm)

    call = pl.pallas_call(
        kernel,
        grid=(b, hkv, n_q, n_kv),
        in_specs=[qspec, kspec, kspec],
        out_specs=[qspec],
        out_shape=[jax.ShapeDtypeStruct((b, hkv, g, sq, d), jnp.bfloat16)],
        scratch_shapes=[
            pltpu.VMEM((g * bq, d), jnp.float32),
            pltpu.VMEM((g * bq, 128), jnp.float32),
            pltpu.VMEM((g * bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )
    return call, (bq, bk, n_q, n_kv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--seq", type=int, default=3072)
    ap.add_argument("--heads", type=int, default=14)
    ap.add_argument("--kv_heads", type=int, default=2)
    ap.add_argument("--arms", default="full,noexp,nored,nomax,nosum,mxu")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    os.makedirs("/tmp/kdss_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/kdss_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    b, sq = 1, args.seq
    hkv = args.kv_heads
    g = args.heads // hkv
    d = 128  # the shipped wrapper pads head_dim 64 -> 128 lanes
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, hkv, g, sq, d), jnp.bfloat16)
    k = jax.random.normal(k2, (b, hkv, sq, d), jnp.bfloat16)
    v = jax.random.normal(k3, (b, hkv, sq, d), jnp.bfloat16)

    results = {}
    outs = {}
    for arm in args.arms.split(","):
        call, dims = build(arm, b, hkv, g, sq, d)
        if arm in ("full", "local", "bound", "streaming", "streaming_rowm",
                   "streaming_smem"):
            # 'local'/'bound' compute the SAME attention output — assert
            outs[arm] = jax.jit(
                lambda q, k, v, _c=call: _c(q, k, v)[0],
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": "98304"},
            )(q, k, v)
            if "full" in outs and len(outs) >= 2:
                import numpy as np
                a = np.asarray(outs["full"], dtype=np.float32)
                for other in outs:
                    if other == "full":
                        continue
                    bt = np.asarray(outs[other], dtype=np.float32)
                    err = float(np.max(np.abs(a - bt)))
                    print(f"{other}-vs-full max abs err: {err:.2e}",
                          flush=True)
                    assert err < 2e-2, f"{other} arm diverged from full"

        opts = {"xla_tpu_scoped_vmem_limit_kib": "98304"}

        def chain(n, _call=call, _opts=opts):
            @lambda f: jax.jit(f, compiler_options=_opts)
            def f(q, k, v):
                def body(c, _):
                    (o,) = _call(c, k, v)
                    # feed the output back so iterations cannot be DCE'd
                    # or overlapped into one pass
                    return o.astype(q.dtype) * 1e-3 + q, None
                c, _ = jax.lax.scan(body, q, None, length=n)
                return c
            return f

        short, long_ = args.iters, args.iters * 3
        fs, fl = chain(short), chain(long_)
        jax.device_get(fs(q, k, v)[0, 0, 0, 0])  # compile+warm
        jax.device_get(fl(q, k, v)[0, 0, 0, 0])
        t0 = time.time(); jax.device_get(fs(q, k, v)[0, 0, 0, 0])
        ts = time.time() - t0
        t0 = time.time(); jax.device_get(fl(q, k, v)[0, 0, 0, 0])
        tl = time.time() - t0
        ms = (tl - ts) / (long_ - short) * 1e3
        results[arm] = ms
        print(f"{arm:8s} {ms:.3f} ms/pass  (blocks bq,bk,nq,nkv={dims})",
              flush=True)

    for a, lbl in (("nomax", "row max (cross-lane)"),
                   ("nosum", "p sum (cross-lane)"),
                   ("nosub", "m broadcast-subtract"),
                   ("noalpha", "alpha rescale chain"),
                   ("nostorem", "m broadcast-store"),
                   ("nomaxsum", "both reductions"),
                   ("redonly", "all but reductions")):
        if a in results and "full" in results:
            print(f"  {lbl:24s} {results['full'] - results[a]:.3f} ms/pass")
    if {"full", "noexp", "nored", "mxu"} <= results.keys():
        f, ne, nr, mx = (results[a] for a in ("full", "noexp", "nored", "mxu"))
        # causal: ~half the kv blocks visited; MACs = 2*S^2*d*heads/2
        macs = 2 * sq * sq * d * (g * hkv) / 2
        sol = macs / 394e12 * 1e3  # bf16 MXU peak ~197T, 2 MACs/flop -> s
        print(f"\nphase accounting (ms/pass):")
        print(f"  exp (transcendental)     {f - ne:.3f}")
        print(f"  reductions + rescale     {f - nr - (f - ne):.3f}")
        print(f"  softmax total            {f - mx:.3f}")
        print(f"  MXU + pipeline floor     {mx:.3f}  "
              f"(pure-MACs speed-of-light ~{sol:.3f})")
        print(f"  full                     {f:.3f}")


if __name__ == "__main__":
    main()
